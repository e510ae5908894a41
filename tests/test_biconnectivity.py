"""Biconnectivity vs a sequential Tarjan oracle (iterative DFS low-link)."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import make_graph, p2p_mid


def _tarjan_oracle(vertices, edges):
    """Returns (bridges set, articulation set, bcc partition as frozensets
    of canonical undirected edges)."""
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    disc, low = {}, {}
    bridges, arts = set(), set()
    bccs = []
    stack = []  # edge stack
    timer = [0]

    def canon(a, b):
        return (min(a, b), max(a, b))

    for root in sorted(vertices):
        if root in disc:
            continue
        # iterative DFS
        work = [(root, None, iter(sorted(adj[root])))]
        disc[root] = low[root] = timer[0]
        timer[0] += 1
        root_children = 0
        while work:
            v, parent, it = work[-1]
            advanced = False
            for w in it:
                if w == parent and not advanced:
                    # skip the tree edge back to parent exactly once
                    parent = None  # only skip one multiplicity
                    continue
                if w not in disc:
                    stack.append(canon(v, w))
                    disc[w] = low[w] = timer[0]
                    timer[0] += 1
                    if v == root:
                        root_children += 1
                    work.append((w, v, iter(sorted(adj[w]))))
                    advanced = True
                    break
                elif disc[w] < disc[v]:
                    stack.append(canon(v, w))
                    low[v] = min(low[v], disc[w])
            if not advanced:
                work.pop()
                if work:
                    u = work[-1][0]
                    low[u] = min(low[u], low[v])
                    if low[v] >= disc[u] and u != root:
                        arts.add(u)
                    if low[v] > disc[u]:
                        bridges.add(canon(u, v))
                    if low[v] >= disc[u]:
                        grp = set()
                        while stack and stack[-1] != canon(u, v):
                            grp.add(stack.pop())
                        if stack:
                            grp.add(stack.pop())
                        if grp:
                            bccs.append(frozenset(grp))
        if root_children >= 2:
            arts.add(root)
        if stack:
            bccs.append(frozenset(stack))
            stack.clear()
    return bridges, arts, set(bccs)


def _sparse_graph(n=120, seed=7):
    import random

    rng = random.Random(seed)
    vertices = list(range(n))
    edges = set()
    # a path backbone + random chords => bridges, cycles, articulation mix
    for i in range(n - 1):
        if rng.random() < 0.8:
            edges.add((i, i + 1))
    for _ in range(n // 3):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((a, b))
    return vertices, sorted(edges)


def _check(spark, vertices, edges):
    from graphscope_spark.algorithms.biconnectivity import (
        articulation_points,
        bcc_edges,
        bridges,
    )

    g = make_graph(spark, edges, vertices)
    want_bridges, want_arts, want_bccs = _tarjan_oracle(vertices, edges)

    got_bridges = {(r["src"], r["dst"]) for r in bridges(g).collect()}
    assert got_bridges == want_bridges

    got_arts = {r["id"] for r in articulation_points(g).collect()}
    assert got_arts == want_arts

    groups = defaultdict(set)
    for r in bcc_edges(g).collect():
        groups[r["bcc"]].add((r["src"], r["dst"]))
    got_bccs = {frozenset(v) for v in groups.values()}
    assert got_bccs == want_bccs
    g.unpersist()


def test_bcc_small_shapes(spark):
    # two triangles joined by a bridge + a pendant
    vertices = [0, 1, 2, 3, 4, 5, 6]
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (5, 6)]
    _check(spark, vertices, edges)


def test_bcc_path_and_cycle(spark):
    vertices = list(range(8))
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 2), (6, 7)]
    _check(spark, vertices, edges)


def test_bcc_random_sparse(spark):
    vertices, edges = _sparse_graph(n=120, seed=7)
    _check(spark, vertices, edges)


def test_bcc_random_sparse_2(spark):
    vertices, edges = _sparse_graph(n=90, seed=23)
    _check(spark, vertices, edges)
