"""Subgraph counts (rectangles, cyclic/tailed triangles) vs brute force."""

from __future__ import annotations

import itertools
import random

from tests.conftest import make_graph


def test_subgraph_counts(spark):
    from graphscope_spark.algorithms.subgraph_counts import (
        cyclic_triangles,
        rectangles,
        tailed_triangles,
    )

    random.seed(4)
    n = 14
    edges = set()
    while len(edges) < 32:
        a, b = random.randrange(n), random.randrange(n)
        if a != b:
            edges.add((a, b))
    und = {(min(a, b), max(a, b)) for a, b in edges}
    adj = {v: set() for v in range(n)}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    g = make_graph(spark, sorted(edges), vertices=list(range(n)), num_partitions=4)

    c4 = 0
    for quad in itertools.combinations(range(n), 4):
        a, b, c, d = quad
        for w, x, y, z in [(a, b, c, d), (a, b, d, c), (a, c, b, d)]:
            if x in adj[w] and y in adj[x] and z in adj[y] and w in adj[z]:
                c4 += 1
    assert rectangles(g).collect()[0]["n"] == c4

    cyc = sum(
        1
        for a, b, c in itertools.permutations(range(n), 3)
        if (a, b) in edges and (b, c) in edges and (c, a) in edges
    )
    assert cyclic_triangles(g).collect()[0]["n"] == cyc // 3

    tris = [
        t
        for t in itertools.combinations(range(n), 3)
        if all(y in adj[x] for x, y in itertools.combinations(t, 2))
    ]
    tt = sum(len(adj[v]) - 2 for t in tris for v in t)
    assert tailed_triangles(g).collect()[0]["n"] == tt
