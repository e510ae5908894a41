"""Flash extras: coloring, densest subgraph, k-center, orderings — each vs
an independent Python replay of the reference header's semantics."""

from __future__ import annotations

import random
from collections import deque

from tests.conftest import make_graph


def _graph(spark, n=50, m=140, seed=3):
    random.seed(seed)
    edges = set()
    while len(edges) < m:
        a, b = random.randrange(n), random.randrange(n)
        if a != b:
            edges.add((a, b))
    edges = sorted(edges)
    g = make_graph(spark, edges, vertices=list(range(n)))
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return g, edges, adj


def _cores(adj):
    verts = list(adj)
    deg = {v: len(adj[v]) for v in verts}
    core, rem, alive, k = {}, dict(deg), set(verts), 0
    radj = {v: set(adj[v]) for v in verts}
    while alive:
        k = max(k, min(rem[v] for v in alive))
        peel = [v for v in alive if rem[v] <= k]
        while peel:
            v = peel.pop()
            if v not in alive:
                continue
            core[v] = k
            alive.discard(v)
            for nb in radj[v]:
                radj[nb].discard(v)
                rem[nb] -= 1
                if nb in alive and rem[nb] <= k:
                    peel.append(nb)
    return core


def test_graph_coloring(spark):
    from graphscope_spark.algorithms.flash_extras import graph_coloring

    g, edges, adj = _graph(spark)
    deg = {v: len(adj[v]) for v in adj}
    c = {v: 0 for v in adj}
    while True:
        cc = {}
        for v in adj:
            used = {
                c[nb] for nb in adj[v]
                if deg[nb] > deg[v] or (deg[nb] == deg[v] and nb > v)
            }
            m = 0
            while m in used:
                m += 1
            cc[v] = m
        if cc == c:
            break
        c = cc
    got = {r["id"]: r["color"] for r in graph_coloring(g).collect()}
    assert got == c
    for a, b in edges:  # proper coloring
        assert got[a] != got[b]


def test_densest_subgraph(spark):
    from graphscope_spark.algorithms.flash_extras import densest_subgraph_2approx

    g, edges, adj = _graph(spark, seed=5)
    core = _cores(adj)
    cmax = max(core.values())
    s = {v for v in adj if core[v] == cmax}
    und = {(min(a, b), max(a, b)) for a, b in edges}
    ne = 2 * sum(1 for a, b in und if a in s and b in s)
    row = densest_subgraph_2approx(g).collect()[0]
    assert (row["n_vertices"], row["n_ordered_pairs"]) == (len(s), ne)


def test_k_center(spark):
    from graphscope_spark.algorithms.flash_extras import k_center

    g, edges, adj = _graph(spark, seed=7)
    deg = {v: len(adj[v]) for v in adj}
    INF = 2147483647

    def bfs(s):
        d = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for nb in adj[u]:
                if nb not in d:
                    d[nb] = d[u] + 1
                    q.append(nb)
        return d

    dis = {v: INF for v in adj}
    center = max(adj, key=lambda v: (deg[v], v))
    for i in range(4):
        for v, dd in bfs(center).items():
            dis[v] = min(dis[v], dd)
        if i == 3:
            break
        center = max(adj, key=lambda v: (dis[v], v))
    want = {v: (dis[v] if dis[v] != INF else None) for v in adj}
    got = {r["id"]: r["dis"] for r in k_center(g, k=4).collect()}
    assert got == want


def _rank_replay(adj, core, thr_fn, same_core):
    deg = {v: len(adj[v]) for v in adj}
    d = (
        dict(deg)
        if not same_core
        else {v: sum(1 for nb in adj[v] if core[nb] >= core[v]) for v in adj}
    )
    frontier = set(adj)
    rank = {}
    rnd = 0
    while frontier:
        now = {v for v in frontier if rank.get(v) is None and d[v] <= thr_fn(v)}
        for v in now:
            rank[v] = rnd
        cnt = {}
        for v in now:
            for nb in adj[v]:
                if rank.get(nb) is None and nb not in now:
                    if same_core and core[nb] != core[v]:
                        continue
                    cnt[nb] = cnt.get(nb, 0) + 1
        for v, c in cnt.items():
            d[v] -= c
        frontier = set(cnt)
        rnd += 1
    return {v: rank.get(v, -1) for v in adj}


def test_orderings(spark):
    from graphscope_spark.algorithms.flash_extras import (
        degeneracy_ordering,
        onion_layer_ordering,
    )

    g, edges, adj = _graph(spark, seed=17, n=60, m=170)
    core = _cores(adj)
    dg = max(core.values())
    want = _rank_replay(adj, core, lambda v: dg, False)
    got = {r["id"]: r["rank"] for r in degeneracy_ordering(g).collect()}
    assert got == want
    want = _rank_replay(adj, core, lambda v: core[v], True)
    got = {r["id"]: r["rank"] for r in onion_layer_ordering(g).collect()}
    assert got == want


def test_lpa_by_color(spark):
    """Async LPA scheduled by coloring (lpa-by-color.h) vs exact replay on
    the clique+bridge fixture — cliques must survive as communities."""
    from graphscope_spark.algorithms.lpa_color import lpa_by_color

    verts = list(range(240))  # 40 cliques of 6
    edges = set()
    for grp in range(40):
        base = 6 * grp
        for i in range(6):
            for j in range(i + 1, 6):
                edges.add((base + i, base + j))
    for grp in range(40):
        h = (grp * 37 + 11) % 40
        if h != grp:
            edges.add((min(6 * grp + 5, 6 * h + 4), max(6 * grp + 5, 6 * h + 4)))
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(adj[v]) for v in verts}
    col = {v: 0 for v in verts}
    while True:
        cc = {}
        for v in verts:
            used = {
                col[nb] for nb in adj[v]
                if deg[nb] > deg[v] or (deg[nb] == deg[v] and nb > v)
            }
            m = 0
            while m in used:
                m += 1
            cc[v] = m
        if cc == col:
            break
        col = cc
    ncol = max(col.values()) + 1
    lab = {v: v for v in verts}
    while True:
        changed = 0
        for j in range(ncol):
            newl = {}
            for v in verts:
                if col[v] != j or not adj[v]:
                    continue
                cnt = {}
                for nb in adj[v]:
                    cnt[lab[nb]] = cnt.get(lab[nb], 0) + 1
                newl[v] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            for v, lv in newl.items():
                if lab[v] != lv:
                    changed += 1
                lab[v] = lv
        if changed == 0:
            break

    g = make_graph(spark, sorted(edges), vertices=verts)
    got = {r["id"]: r["label"] for r in lpa_by_color(g).collect()}
    assert got == lab
    assert len(set(got.values())) >= 30  # cliques survive
