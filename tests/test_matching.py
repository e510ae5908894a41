"""Maximal independent set + maximal matching: validity and maximality."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import ALL_FIXTURES, make_graph, p2p_mid


def _und(edges):
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return adj


def test_mis_valid_and_maximal(spark):
    from graphscope_spark.algorithms.matching import maximal_independent_set

    vertices, edges = p2p_mid(n=120, m=700, seed=3)
    adj = _und(edges)
    g = make_graph(spark, edges, vertices)
    mis = {r["id"] for r in maximal_independent_set(g).collect()}
    # independence
    for v in mis:
        assert not (adj[v] & mis), v
    # maximality: every non-member has a member neighbor
    for v in vertices:
        if v not in mis:
            assert adj[v] & mis, v
    # determinism
    mis2 = {r["id"] for r in maximal_independent_set(g).collect()}
    assert mis2 == mis
    g.unpersist()


def test_maximal_matching_valid_and_maximal(spark):
    from graphscope_spark.algorithms.matching import maximal_matching

    vertices, edges = p2p_mid(n=100, m=420, seed=8)
    adj = _und(edges)
    g = make_graph(spark, edges, vertices)
    m = {(r["src"], r["dst"]) for r in maximal_matching(g).collect()}
    used = [v for e in m for v in e]
    # validity: vertex-disjoint edges of the graph
    assert len(used) == len(set(used))
    pairs = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    assert m <= pairs
    # maximality: no remaining edge with both endpoints free
    free = set(vertices) - set(used)
    for a, b in pairs:
        assert not (a in free and b in free), (a, b)
    g.unpersist()


def test_mis_star(spark):
    from graphscope_spark.algorithms.matching import maximal_independent_set

    vertices, edges = ALL_FIXTURES["star_hub"]
    g = make_graph(spark, edges, vertices)
    mis = {r["id"] for r in maximal_independent_set(g).collect()}
    # either the hub alone, or all leaves
    assert mis == {0} or mis == set(range(1, 51))
    g.unpersist()


def _kruskal(vertices, wedges):
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for w, a, b in sorted((w, min(a, b), max(a, b)) for a, b, w in wedges
                          if a != b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            forest.add((a, b, w))
    return forest


def test_minimum_spanning_forest(spark):
    from graphscope_spark.algorithms.msf import minimum_spanning_forest

    vertices, edges = p2p_mid(n=90, m=300, seed=17)
    wedges = [(a, b, float(1 + (a * 13 + b * 7) % 97)) for a, b in edges]
    g = make_graph(spark, wedges, vertices, weights=True)
    got = {(r["src"], r["dst"], r["weight"])
           for r in minimum_spanning_forest(g).collect()}
    want = _kruskal(vertices, wedges)
    # same total weight and same forest under the shared (w, a, b) total order
    assert sum(w for _, _, w in got) == sum(w for _, _, w in want)
    assert got == want
    g.unpersist()
