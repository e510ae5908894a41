"""Pure-Python reference oracles (no Spark, no external deps).

These reimplement the reference semantics the goldens encode (FIXTURES.md §F4):

* pagerank — NetworkX-exact (apps/pagerank/pagerank_networkx.h:54-163)
* wcc      — min reachable id over the undirected closure
             (apps/projected/wcc_projected.h:70-182)
* cdlp     — synchronous LPA, most-frequent neighbor label, min tie-break
             (LDBC rule; grape::CDLP fixed rounds, run_app.h:254-263)
* triangles— per-vertex count, degree-then-id orientation
             (apps/clustering/triangles.h:78-91)
"""

from __future__ import annotations

from collections import Counter, defaultdict


def pagerank_oracle(
    vertices: list[int],
    edges: list[tuple],
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    fixed_rounds: int | None = None,
) -> dict[int, float]:
    """edges: (src, dst) or (src, dst, weight). Returns id -> rank."""
    n = len(vertices)
    out_w: dict[int, float] = defaultdict(float)
    adj: dict[int, list[tuple[int, float]]] = defaultdict(list)
    for e in edges:
        s, d = e[0], e[1]
        w = float(e[2]) if len(e) > 2 else 1.0
        out_w[s] += w
        adj[s].append((d, w))
    x = {v: 1.0 / n for v in vertices}
    dangling = [v for v in vertices if out_w[v] == 0.0]
    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for _ in range(rounds):
        xlast = x
        x = {v: 0.0 for v in vertices}
        ds = sum(xlast[v] for v in dangling)
        base = alpha * ds / n + (1.0 - alpha) / n
        for s, nbrs in adj.items():
            contrib = xlast[s] / out_w[s]
            for d, w in nbrs:
                x[d] += alpha * contrib * w
        for v in vertices:
            x[v] += base
        err = sum(abs(x[v] - xlast[v]) for v in vertices)
        if fixed_rounds is None and err < n * tol:
            break
    return x


def wcc_oracle(vertices: list[int], edges: list[tuple]) -> dict[int, int]:
    parent = {v: v for v in vertices}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for e in edges:
        ra, rb = find(e[0]), find(e[1])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in vertices}


def cdlp_oracle(
    vertices: list[int], edges: list[tuple], rounds: int = 10
) -> dict[int, int]:
    """Synchronous LPA on the directed graph treated per LDBC: each edge
    contributes its endpoint's label in both directions (duplicates count)."""
    nbrs: dict[int, list[int]] = defaultdict(list)
    for e in edges:
        nbrs[e[0]].append(e[1])
        nbrs[e[1]].append(e[0])
    label = {v: v for v in vertices}
    for _ in range(rounds):
        new = {}
        for v in vertices:
            if not nbrs[v]:
                new[v] = label[v]
                continue
            c = Counter(label[u] for u in nbrs[v])
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == label:
            break
        label = new
    return label


def triangles_oracle(vertices: list[int], edges: list[tuple]) -> dict[int, int]:
    """Per-vertex triangle counts on the undirected simple graph."""
    und = set()
    for e in edges:
        a, b = e[0], e[1]
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(adj[v]) for v in vertices}

    def rank(v):
        return (deg.get(v, 0), v)

    # degree-then-id orientation (triangles.h:78-91)
    oriented: dict[int, set[int]] = defaultdict(set)
    for a, b in und:
        lo, hi = (a, b) if rank(a) < rank(b) else (b, a)
        oriented[lo].add(hi)
    tc = {v: 0 for v in vertices}
    for u in list(oriented):
        for v in oriented[u]:
            common = oriented[u] & oriented[v]
            for w in common:
                tc[u] += 1
                tc[v] += 1
                tc[w] += 1
    return tc


def bfs_oracle(vertices: list[int], edges: list[tuple], source: int) -> dict[int, int]:
    """Directed BFS depth from source; unreachable -> -1 (bfs_generic.h)."""
    adj: dict[int, list[int]] = defaultdict(list)
    for e in edges:
        adj[e[0]].append(e[1])
    depth = {v: -1 for v in vertices}
    depth[source] = 0
    frontier = [source]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if depth[v] == -1:
                    depth[v] = d
                    nxt.append(v)
        frontier = nxt
    return depth


def sssp_oracle(
    vertices: list[int], edges: list[tuple], source: int
) -> dict[int, float]:
    """Directed Dijkstra; unreachable -> inf (grape::SSSP semantics)."""
    import heapq

    adj: dict[int, list[tuple[int, float]]] = defaultdict(list)
    for e in edges:
        w = float(e[2]) if len(e) > 2 else 1.0
        adj[e[0]].append((e[1], w))
    dist = {v: float("inf") for v in vertices}
    dist[source] = 0.0
    pq = [(0.0, source)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist[u]:
            continue
        for v, w in adj[u]:
            nd = d + w
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist
