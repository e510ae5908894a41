"""Multi-label property graph + per-vertex @pregel compat surface."""

from __future__ import annotations

import math

import pytest

from tests.conftest import make_graph, p2p_mid
from tests.oracles import sssp_oracle


def test_property_graph_labels_project(spark):
    from graphscope_spark.graph.property_graph import PropertyGraph

    users = spark.createDataFrame(
        [(0, "u0"), (1, "u1"), (2, "u2")], "id long, name string"
    )
    items = spark.createDataFrame(
        [(100, "i0", 9.5), (101, "i1", None)], "id long, title string, price double"
    )
    knows = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    buys = spark.createDataFrame(
        [(0, 100, 2.0), (2, 101, 1.0)], "src long, dst long, qty double"
    )
    pg = (
        PropertyGraph()
        .add_vertices("user", users)
        .add_vertices("item", items)
        .add_edges("knows", "user", "user", knows)
        .add_edges("buys", "user", "item", buys)
    )
    assert pg.schema() == {
        "vertices": {"user": ["name"], "item": ["title", "price"]},
        "edges": {"knows/user/user": [], "buys/user/item": ["qty"]},
    }
    with pytest.raises(ValueError):
        pg.add_vertices("user", users)
    with pytest.raises(ValueError):
        pg.add_edges("x", "user", "ghost", knows)

    g = pg.to_simple(e_prop="qty")
    assert g.num_vertices == 5
    assert g.num_edges == 4
    # weight survives projection on the edge table that has it
    ws = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert ws[(0, 100)] == 2.0 and ws[(0, 1)] is None

    # label subset projection: user-only subgraph
    gu = pg.to_simple(vertex_labels=["user"])
    assert gu.num_vertices == 3 and gu.num_edges == 2
    g.unpersist()
    gu.unpersist()


def test_consolidate_columns(spark):
    from graphscope_spark.graph.property_graph import PropertyGraph

    v = spark.createDataFrame(
        [(0, 1.0, None), (1, None, 2.0)], "id long, a double, b double"
    )
    pg = PropertyGraph().add_vertices("x", v)
    pg2 = pg.consolidate_columns("x", ["a", "b"], "ab")
    got = {r["id"]: r["ab"] for r in pg2.vertices["x"].collect()}
    assert got == {0: 1.0, 1: 2.0}


def test_pregel_vertex_sssp_matches_oracle(spark):
    """SSSP authored per-vertex with the reference's @pregel shape."""
    from graphscope_spark.engine.pregel_vertex import pregel, run_pregel_vertex

    INF = float("inf")

    @pregel(vd_type="double", md_type="double")
    class SSSP:
        @staticmethod
        def Init(v, context):
            if v.id == 1:
                v.set_value(0.0)
                for dst, w in v.out_edges():
                    v.send(dst, w)
            else:
                v.set_value(INF)
            v.vote_to_halt()

        @staticmethod
        def Combine(messages):
            return min(messages)

        @staticmethod
        def Compute(messages, v, context):
            best = min(messages) if messages else INF
            if best < v.value():
                v.set_value(best)
                for dst, w in v.out_edges():
                    v.send(dst, best + w)
            v.vote_to_halt()

    vertices, edges = p2p_mid(n=60, m=240)
    wedges = [(s, d, 1.0 + (s + d) % 4) for s, d in edges]
    g = make_graph(spark, wedges, vertices, weights=True)
    got = {r["id"]: r["value"] for r in run_pregel_vertex(g, SSSP, 100).collect()}
    want = sssp_oracle(vertices, wedges, 1)
    for v in vertices:
        if math.isinf(want[v]):
            assert math.isinf(got[v])
        else:
            assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    g.unpersist()


def test_graphar_roundtrip(spark, tmp_path):
    from graphscope_spark.graph.property_graph import PropertyGraph
    from graphscope_spark.sources.graphar import read_graphar, write_graphar

    users = spark.createDataFrame(
        [(i, f"u{i}") for i in range(50)], "id long, name string"
    )
    knows = spark.createDataFrame(
        [(i, (i * 7) % 50) for i in range(50) if i != (i * 7) % 50],
        "src long, dst long",
    )
    pg = PropertyGraph().add_vertices("user", users).add_edges(
        "knows", "user", "user", knows
    )
    base = str(tmp_path / "ar")
    write_graphar(pg, base, name="g", chunk_size=16)
    back = read_graphar(spark, base, name="g")
    assert set(back.vertices) == {"user"}
    assert set(back.edges) == {("knows", "user", "user")}
    assert sorted(map(tuple, back.vertices["user"].collect())) == sorted(
        map(tuple, users.collect())
    )
    assert sorted(map(tuple, back.edges[("knows", "user", "user")].collect())) \
        == sorted(map(tuple, knows.collect()))
    # chunked layout on disk: multiple part files for chunk_size < n
    import glob

    assert len(glob.glob(f"{base}/vertex/user/chunks/part-*")) >= 3


def test_pregel_vertex_combine_pushdown(spark):
    """combine_op='min' pushes the Combine into the shuffle aggregate
    (map-side partial combine, O(1) inbox) — result identical to the
    collect_list path."""
    from graphscope_spark.engine.pregel_vertex import pregel, run_pregel_vertex

    INF = float("inf")

    @pregel(vd_type="double", md_type="double")
    class SSSP:
        combine_op = "min"

        @staticmethod
        def Init(v, context):
            if v.id == 1:
                v.set_value(0.0)
                for dst, w in v.out_edges():
                    v.send(dst, w)
            else:
                v.set_value(INF)
            v.vote_to_halt()

        @staticmethod
        def Combine(messages):
            return min(messages)

        @staticmethod
        def Compute(messages, v, context):
            best = min(messages) if messages else INF
            if best < v.value():
                v.set_value(best)
                for dst, w in v.out_edges():
                    v.send(dst, best + w)
            v.vote_to_halt()

    vertices, edges = p2p_mid(n=60, m=240)
    wedges = [(s, d, 1.0 + (s + d) % 4) for s, d in edges]
    g = make_graph(spark, wedges, vertices, weights=True)
    got = {r["id"]: r["value"] for r in run_pregel_vertex(g, SSSP, 100).collect()}
    want = sssp_oracle(vertices, wedges, 1)
    for v in vertices:
        if math.isinf(want[v]):
            assert math.isinf(got[v])
        else:
            assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    g.unpersist()
