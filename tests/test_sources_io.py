from __future__ import annotations

from pyspark.sql import functions as F


def test_vefile_roundtrip(spark, tmp_path):
    from graphscope_spark.sources.io import load_graph_vefiles

    (tmp_path / "g.v").write_text("1\n2\n3\n4\n")
    (tmp_path / "g.e").write_text("1 2 1.5\n2 3 2.0\n3 4 0.5\n")
    g = load_graph_vefiles(
        spark, str(tmp_path / "g.v"), str(tmp_path / "g.e"), weighted=True,
        num_partitions=4,
    )
    assert g.num_vertices == 4 and g.num_edges == 3
    assert abs(g.edges.agg(F.sum("weight")).collect()[0][0] - 4.0) < 1e-12
    g.unpersist()


def test_from_numpy_coo(spark):
    import numpy as np

    from graphscope_spark.sources.io import from_numpy_coo

    g = from_numpy_coo(spark, np.array([1, 2]), np.array([2, 3]), num_partitions=4)
    assert g.num_edges == 2 and g.num_vertices == 3
    g.unpersist()


def test_graph_parquet_roundtrip(spark, tmp_path):
    from graphscope_spark.sources.io import load_graph_parquet
    from tests.conftest import make_graph

    g = make_graph(spark, [(1, 2), (2, 3)], [1, 2, 3])
    g.write_parquet(str(tmp_path / "g"))
    g2 = load_graph_parquet(spark, str(tmp_path / "g"), num_partitions=4)
    assert g2.num_edges == 2 and g2.num_vertices == 3
    g.unpersist()
    g2.unpersist()


def test_dense_ids(spark):
    from graphscope_spark.sources.io import dense_ids

    df = spark.createDataFrame([("x",), ("y",), ("z",), ("x",)], "name string")
    m = dense_ids(df, "name")
    rows = m.collect()
    ids = sorted(r["id"] for r in rows)
    assert ids == [0, 1, 2]
    assert {r["name"] for r in rows} == {"x", "y", "z"}
    # deterministic across partitionings
    m2 = dense_ids(df.repartition(7), "name")
    assert sorted(map(tuple, m.collect())) == sorted(map(tuple, m2.collect()))


def test_modify_vertices_edges(spark):
    """MODIFY_VERTICES / MODIFY_EDGES: functional add/remove mutations."""
    from tests.conftest import make_graph

    g = make_graph(spark, [(1, 2), (2, 3), (3, 1)], vertices=[1, 2, 3])

    g2 = g.add_edges(spark.createDataFrame([(3, 4), (4, 1)], "src long, dst long"))
    assert g2.num_vertices == 4 and g2.num_edges == 5  # endpoint 4 auto-added

    g3 = g2.remove_edges(spark.createDataFrame([(1, 2)], "src long, dst long"))
    assert g3.num_edges == 4 and g3.num_vertices == 4

    g4 = g3.remove_vertices(spark.createDataFrame([(3,)], "id long"))
    assert g4.num_vertices == 3
    rows = {(r["src"], r["dst"]) for r in g4.edges.collect()}
    assert rows == {(4, 1)}  # every edge incident to 3 is gone

    g5 = g4.add_vertices(spark.createDataFrame([(9,), (1,)], "id long"))
    assert g5.num_vertices == 4  # 9 added, 1 deduped

    # mutations feed algorithms unchanged
    from graphscope_spark.algorithms.wcc import wcc

    comp = {r["id"]: r["component"] for r in wcc(g4).collect()}
    assert comp[1] == comp[4] and comp[2] != comp[1]
