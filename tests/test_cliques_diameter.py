"""k-clique enumeration and double-sweep diameter vs brute-force oracles."""

from __future__ import annotations

from collections import defaultdict, deque
from itertools import combinations

from tests.conftest import ALL_FIXTURES, make_graph, p2p_mid


def _brute_cliques(vertices, edges, k):
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    out = set()
    for combo in combinations(sorted(vertices), k):
        if all(b in adj[a] for a, b in combinations(combo, 2)):
            out.add(combo)
    return out


def test_k_cliques_small(spark):
    from graphscope_spark.algorithms.cliques import k_cliques

    vertices, edges = ALL_FIXTURES["tri_cluster"]  # contains a 4-clique
    g = make_graph(spark, edges, vertices)
    got = {tuple(sorted(r["vs"])) for r in k_cliques(g, 4).collect()}
    assert got == _brute_cliques(vertices, edges, 4)
    got3 = {tuple(sorted(r["vs"])) for r in k_cliques(g, 3).collect()}
    assert got3 == _brute_cliques(vertices, edges, 3)
    g.unpersist()


def test_k_cliques_random(spark):
    from graphscope_spark.algorithms.cliques import k_cliques

    vertices, edges = p2p_mid(n=30, m=200, seed=5)
    g = make_graph(spark, edges, vertices)
    for k in (3, 4, 5):
        got = {tuple(sorted(r["vs"])) for r in k_cliques(g, k).collect()}
        assert got == _brute_cliques(vertices, edges, k), k
    g.unpersist()


def _ecc(adj, s):
    dist = {s: 0}
    q = deque([s])
    while q:
        u = q.popleft()
        for w in adj[u]:
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


def test_diameter_two_sweep(spark):
    from graphscope_spark.algorithms.diameter import diameter_approx

    vertices, edges = p2p_mid(n=60, m=140, seed=11)
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
    g = make_graph(spark, edges, vertices)
    row = diameter_approx(g).collect()[0]
    start = row["start"]
    d1 = _ecc(adj, start)
    far_want = min(v for v in d1 if d1[v] == max(d1.values()))
    assert row["far"] == far_want
    d2 = _ecc(adj, far_want)
    assert row["diameter_lb"] == max(d2.values())
    g.unpersist()
