from __future__ import annotations

from collections import defaultdict, deque

from tests.conftest import ALL_FIXTURES, make_graph, p2p_mid


def _brandes_oracle(vertices, edges, normalized=True):
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    cb = {v: 0.0 for v in vertices}
    for s in vertices:
        sigma = {v: 0.0 for v in vertices}
        dist = {v: -1 for v in vertices}
        preds = defaultdict(list)
        sigma[s] = 1.0
        dist[s] = 0
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in adj[u]:
                if dist[w] < 0:
                    dist[w] = dist[u] + 1
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = {v: 0.0 for v in vertices}
        for w in reversed(order):
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
            if w != s:
                cb[w] += delta[w]
    n = len(vertices)
    if normalized and n > 2:
        for v in cb:
            cb[v] /= (n - 1) * (n - 2)
    return cb


def test_betweenness_diamond(spark):
    from graphscope_spark.algorithms.betweenness import betweenness_centrality

    vertices, edges = ALL_FIXTURES["diamond"]
    g = make_graph(spark, edges, vertices)
    got = {r["id"]: r["centrality"] for r in betweenness_centrality(g).collect()}
    want = _brandes_oracle(vertices, edges)
    for v in vertices:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    g.unpersist()


def test_betweenness_random(spark):
    from graphscope_spark.algorithms.betweenness import betweenness_centrality

    vertices, edges = p2p_mid(n=25, m=80)
    g = make_graph(spark, edges, vertices)
    got = {r["id"]: r["centrality"] for r in betweenness_centrality(g).collect()}
    want = _brandes_oracle(vertices, edges)
    for v in vertices:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    g.unpersist()
