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


def test_directed_census_brute_force(spark):
    """The four directed-triangle counts vs a literal Python rendering of
    the reference headers' set-intersection sums."""
    import random

    from tests.conftest import make_graph

    from graphscope_spark.algorithms.subgraph_counts import (
        directed_triangle_census,
    )

    random.seed(41)
    n = 18
    edges = set()
    while len(edges) < 70:
        a, b = random.randrange(n), random.randrange(n)
        if a != b:
            edges.add((a, b))
    # force some mutual pairs so in/out/cycle counts are non-trivial
    for a, b in list(edges)[:15]:
        edges.add((b, a))
    E = sorted(edges)
    out = {v: {b for a, b in E if a == v} for v in range(n)}
    inn = {v: {a for a, b in E if b == v} for v in range(n)}
    acyclic = sum(len(out[u] & out[v]) for u, v in E)
    mutual = [(u, v) for u, v in E if (v, u) in edges]
    in_tri = sum(len(out[u] & out[v]) for u, v in mutual if u > v)
    out_tri = sum(len(inn[u] & inn[v]) for u, v in mutual if u > v)
    cycle_plus = sum(len(inn[u] & out[v]) for u, v in mutual)
    assert in_tri > 0 and out_tri > 0 and cycle_plus > 0 and acyclic > 0

    g = make_graph(spark, E, vertices=list(range(n)))
    row = directed_triangle_census(g).collect()[0]
    assert (
        row["acyclic"], row["in_tri"], row["out_tri"], row["cycle_plus"]
    ) == (acyclic, in_tri, out_tri, cycle_plus)
