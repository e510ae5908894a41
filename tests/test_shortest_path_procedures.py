"""ShortestPathExpand operator + ProcedureCall registry."""

from __future__ import annotations

import random
from collections import deque

from tests.conftest import make_graph


def _rand_graph(spark, n=40, m=110, seed=9):
    random.seed(seed)
    edges = set()
    while len(edges) < m:
        a, b = random.randrange(n), random.randrange(n)
        if a != b:
            edges.add((a, b))
    return sorted(edges), make_graph(spark, sorted(edges), vertices=list(range(n)))


def _bfs_dist(edges, n, s):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    dist = {s: 0}
    q = deque([s])
    while q:
        u = q.popleft()
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_shortest_path_expand(spark):
    from graphscope_spark.operators.relational import shortest_path_expand

    edges, g = _rand_graph(spark)
    n = 40
    pairs = [(a, b) for a in (0, 1, 2) for b in (5, 17, 33, 0)]
    pdf = spark.createDataFrame(pairs, "a long, b long")
    rows = {(r["a"], r["b"]): r for r in shortest_path_expand(g, pdf).collect()}

    eset = set(edges)
    for a, b in pairs:
        dist = _bfs_dist(edges, n, a)
        if b not in dist:
            assert (a, b) not in rows
            continue
        r = rows[(a, b)]
        assert r["hops"] == dist[b], (a, b, r["hops"], dist[b])
        path = list(r["path"])
        assert path[0] == a and path[-1] == b
        assert len(path) == dist[b] + 1
        for u, v in zip(path, path[1:]):
            assert (u, v) in eset, f"non-edge {u}->{v} in path {path}"


def test_procedure_call(spark):
    import pytest

    from graphscope_spark.operators.procedures import (
        call_procedure,
        list_procedures,
        register_procedure,
    )

    _, g = _rand_graph(spark)
    assert "pagerank_ldbc" in list_procedures()
    out = call_procedure("pagerank_ldbc", g, rounds=3)
    assert out.count() == 40

    with pytest.raises(KeyError):
        call_procedure("no_such_proc", g)

    register_procedure("degrees_x2", lambda gg: gg.out_degrees())
    assert call_procedure("degrees_x2", g).count() == 40
