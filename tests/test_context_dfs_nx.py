from __future__ import annotations

import numpy as np

from tests.conftest import ALL_FIXTURES, make_graph


def test_dfs_preorder(spark):
    from graphscope_spark.algorithms.dfs import dfs

    # diamond 1->2,1->3,2->4,3->4: preorder from 1 = 1,2,4,3
    vertices, edges = ALL_FIXTURES["diamond"]
    g = make_graph(spark, edges, vertices)
    got = {r["id"]: (r["order"], r["parent"]) for r in dfs(g, 1).collect()}
    assert got[1] == (0, None)
    assert got[2] == (1, 1)
    assert got[4] == (2, 2)
    assert got[3] == (3, 1)
    g.unpersist()


def test_context_selectors_and_add_column(spark, tmp_path):
    from graphscope_spark.algorithms.pagerank import pagerank
    from graphscope_spark.context import Context

    vertices, edges = ALL_FIXTURES["diamond"]
    g = make_graph(spark, edges, vertices)
    ctx = Context(g, pagerank(g, max_iter=30))
    ids = ctx.to_numpy("v.id")
    vals = ctx.to_numpy("r")
    assert sorted(ids.tolist()) == [1, 2, 3, 4]
    assert abs(vals.sum() - 1.0) < 1e-6
    pdf = ctx.to_dataframe({"node": "v.id", "rank": "r"})
    assert list(pdf.columns) == ["node", "rank"] and len(pdf) == 4
    assert np.all(np.diff(pdf["node"].to_numpy()) > 0)  # ordered by id
    ctx.output(str(tmp_path / "pr"), {"id": "v.id", "pagerank": "r"})
    back = spark.read.parquet(str(tmp_path / "pr"))
    assert back.count() == 4
    g2 = ctx.add_column("pr")
    assert "pr" in g2.vertices.columns
    g.unpersist()


def test_nx_facade(spark):
    import graphscope_spark.nx as nx

    vertices, edges = ALL_FIXTURES["two_components"]
    g = make_graph(spark, edges, vertices)
    comp = {r["id"]: r["component"] for r in nx.connected_components(g).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[4] == comp[5] == comp[6] == 4
    assert len(nx.__all__) >= 30
    g.unpersist()
