"""DFS — sequential by nature (apps/dfs/dfs.h, run_app.h:459-467).

DFS order is inherently sequential: the reference passes a single token
around the graph, one step per superstep, O(V) supersteps. A faithful
distributed rendering is O(V) Spark jobs AND O(V) driver round-trips — the
worst possible shape (documented poor fit, SURVEY §2.2). Instead the
adjacency is collected to the driver ONCE (a single distributed sort +
collect) and the token walk runs in-memory, guarded by ``max_collect_edges``
with a loud error: DFS on a graph too big to collect is refused, because no
execution strategy makes a sequential token walk scale anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph
from graphscope_spark.engine.tuning import tuned_loop

__all__ = ["dfs"]


@tuned_loop
def dfs(
    graph: Graph, source: int, max_collect_edges: int = 5_000_000
) -> DataFrame:
    """(id, order, parent) in DFS preorder from ``source`` (smallest-id
    neighbor first); unreachable → order -1, parent null."""
    n_edges = graph.num_edges
    if n_edges > max_collect_edges:
        raise ValueError(
            f"dfs is a sequential token walk; {n_edges} edges exceed "
            f"max_collect_edges={max_collect_edges}. DFS order on a graph "
            "this size is not computable by any parallel strategy — sample "
            "or use bfs()."
        )
    # one distributed job: adjacency sorted so the driver walk is a replay
    adj: dict[int, list[int]] = {}
    for r in (
        graph.edges.groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("nbrs"))
        .collect()
    ):
        adj[int(r["src"])] = [int(x) for x in r["nbrs"]]

    visited: dict[int, int] = {int(source): 0}
    parent: dict[int, int | None] = {int(source): None}
    stack = [int(source)]
    order = 1
    while stack:
        v = stack[-1]
        nxt = None
        for u in adj.get(v, ()):  # sorted ascending
            if u not in visited:
                nxt = u
                break
        if nxt is None:
            stack.pop()  # backtrack
        else:
            visited[nxt] = order
            parent[nxt] = v
            order += 1
            stack.append(nxt)
    rows = [
        (int(r["id"]), visited.get(int(r["id"]), -1), parent.get(int(r["id"])))
        for r in graph.vertices.select("id").collect()
    ]
    return graph.spark.createDataFrame(rows, "id long, order int, parent long")
