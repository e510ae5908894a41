"""Pattern-match lowering vs brute-force binding enumeration."""

from __future__ import annotations

from itertools import product

from tests.conftest import ALL_FIXTURES, make_graph, p2p_mid


def _brute(vertices, edges, pattern, distinct=False):
    es = set(edges)
    tags = sorted({t for a, _, b in pattern for t in (a, b)})
    out = set()
    for combo in product(vertices, repeat=len(tags)):
        bind = dict(zip(tags, combo))
        if distinct and len(set(combo)) != len(combo):
            continue
        ok = True
        for a, d, b in pattern:
            u, v = bind[a], bind[b]
            if d == "out":
                hit = (u, v) in es
            elif d == "in":
                hit = (v, u) in es
            else:
                hit = (u, v) in es or (v, u) in es
            if not hit:
                ok = False
                break
        if ok:
            out.add(combo)
    return out


def test_match_triangle_and_path(spark):
    from graphscope_spark.operators.match import match

    vertices, edges = ALL_FIXTURES["tri_cluster"]
    g = make_graph(spark, edges, vertices)
    tri = [("a", "out", "b"), ("b", "out", "c"), ("a", "out", "c")]
    got = {tuple(r) for r in match(g, tri).collect()}
    assert got == _brute(vertices, edges, tri)

    p3 = [("a", "out", "b"), ("b", "out", "c")]
    got = {tuple(r) for r in match(g, p3).collect()}
    assert got == _brute(vertices, edges, p3)
    g.unpersist()


def test_match_diamond_distinct_and_both(spark):
    from graphscope_spark.operators.match import match

    vertices, edges = p2p_mid(n=25, m=120, seed=3)
    g = make_graph(spark, edges, vertices)
    dia = [("a", "out", "b"), ("a", "out", "c"), ("b", "out", "d"),
           ("c", "out", "d")]
    got = {tuple(r) for r in match(g, dia, distinct_vertices=True).collect()}
    assert got == _brute(vertices, edges, dia, distinct=True)

    wedge = [("a", "both", "b"), ("b", "both", "c")]
    got = {tuple(r) for r in match(g, wedge).collect()}
    assert got == _brute(vertices, edges, wedge)
    g.unpersist()


def test_match_wco_parity(spark):
    """WCO expand-intersect plan must produce the same bindings as the
    binary-join plan on triangle and 4-clique patterns."""
    from graphscope_spark.operators.match import match

    vertices, edges = p2p_mid(n=40, m=400, seed=9)
    g = make_graph(spark, edges, vertices)
    tri = [("a", "out", "b"), ("b", "out", "c"), ("a", "out", "c")]
    plain = {tuple(r) for r in match(g, tri).collect()}
    wco = {tuple(r) for r in match(g, tri, wco=True).collect()}
    assert wco == plain and len(plain) > 0

    k4 = [("a", "both", "b"), ("a", "both", "c"), ("a", "both", "d"),
          ("b", "both", "c"), ("b", "both", "d"), ("c", "both", "d")]
    plain = {tuple(r) for r in match(g, k4, distinct_vertices=True).collect()}
    wco = {tuple(r) for r in match(g, k4, distinct_vertices=True,
                                   wco=True).collect()}
    assert wco == plain
    g.unpersist()


def test_expand_intersect_operator(spark):
    from graphscope_spark.operators.wco import adjacency_lists, expand_intersect

    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (0, 3), (1, 3), (0, 4)], "src long, dst long"
    )
    adj = adjacency_lists(edges, "out")
    bindings = spark.createDataFrame([(0, 1)], "a long, b long")
    got = {r["c"] for r in
           expand_intersect(bindings, adj, ["a", "b"], "c").collect()}
    assert got == {2, 3}
