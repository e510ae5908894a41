"""DFS — sequential token passing (apps/dfs/dfs.h, run_app.h:459-467).

DFS order is inherently sequential: the reference passes a single token
around the graph, one step per superstep. The Spark rendering is the same
loop (documented poor fit, SURVEY §2.2): one active vertex per round, so the
runtime is O(V) supersteps — correct on any size, sensible only on small
graphs or as a semantics reference. Each step pushes the token to the
smallest-id unvisited out-neighbor, backtracking via a parent pointer kept
in the state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph

__all__ = ["dfs"]


def dfs(graph: Graph, source: int, max_steps: int | None = None) -> DataFrame:
    """(id, order, parent) in DFS preorder from ``source``; unreachable →
    order -1, parent null. Driver-held visited set mirrors the reference's
    token state; adjacency stays distributed (one lookup query per step)."""
    edges = graph.edges.select("src", "dst").persist()
    visited: dict[int, int] = {int(source): 0}
    parent: dict[int, int | None] = {int(source): None}
    stack = [int(source)]
    order = 1
    steps = 0
    limit = max_steps or (graph.num_vertices * 4)
    while stack and steps < limit:
        steps += 1
        v = stack[-1]
        nbrs = [
            r["dst"]
            for r in edges.filter(F.col("src") == v).select("dst").collect()
        ]
        nxt = None
        for u in sorted(nbrs):
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
    edges.unpersist()
    rows = [
        (int(r["id"]), visited.get(int(r["id"]), -1), parent.get(int(r["id"])))
        for r in graph.vertices.select("id").collect()
    ]
    return graph.spark.createDataFrame(rows, "id long, order int, parent long")
