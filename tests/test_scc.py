from __future__ import annotations

from tests.conftest import make_graph, p2p_mid


def _tarjan_oracle(vertices, edges):
    """Iterative Tarjan SCC; returns id -> max id in its SCC."""
    from collections import defaultdict

    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]

    for root in vertices:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            advanced = False
            nbrs = adj[v]
            while pi < len(nbrs):
                w = nbrs[pi]
                pi += 1
                if w not in index:
                    work[-1] = (v, pi)
                    work.append((w, 0))
                    advanced = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work[-1] = (v, pi)
            if pi >= len(nbrs):
                work.pop()
                if work:
                    u = work[-1][0]
                    low[u] = min(low[u], low[v])
                if low[v] == index[v]:
                    members = []
                    while True:
                        w = stack.pop()
                        on_stack.discard(w)
                        members.append(w)
                        if w == v:
                            break
                    m = max(members)
                    for w in members:
                        comp[w] = m
    return comp


def test_scc_two_cycles_and_chain(spark):
    from graphscope_spark.algorithms.scc import scc

    # cycle {1,2,3}, cycle {4,5}, chain 3->4, isolated 6
    vertices = [1, 2, 3, 4, 5, 6]
    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 4), (3, 4)]
    g = make_graph(spark, edges, vertices)
    got = {r["id"]: r["component"] for r in scc(g).collect()}
    assert got == _tarjan_oracle(vertices, edges)
    assert got[1] == got[2] == got[3] == 3
    assert got[4] == got[5] == 5
    assert got[6] == 6
    g.unpersist()


def test_scc_random(spark):
    from graphscope_spark.algorithms.scc import scc

    vertices, edges = p2p_mid(n=60, m=150)
    g = make_graph(spark, edges, vertices)
    got = {r["id"]: r["component"] for r in scc(g).collect()}
    assert got == _tarjan_oracle(vertices, edges)
    g.unpersist()
