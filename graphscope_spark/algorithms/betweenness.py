"""Betweenness centrality — Brandes' algorithm as per-source BFS fan-out.

Reference: ``apps/centrality/betweenness/*.h`` (SURVEY §2.2 — "Brandes via
per-source BFS fan-out; expensive"). Exact betweenness is O(V·E); the
distributed rendering runs Brandes' forward/backward passes as DataFrame
levels for each source in ``sources`` (sample sources at scale — the
standard approximation; all vertices = exact).

Per source: forward BFS accumulating σ (shortest-path counts) level by
level; backward pass accumulating dependencies δ(v) = Σ_w σv/σw·(1+δw) from
the deepest level up. Levels are kept as a list of small DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph.graph import Graph

__all__ = ["betweenness_centrality"]


def betweenness_centrality(
    graph: Graph,
    sources: list[int] | None = None,
    normalized: bool = True,
    max_depth: int = 10_000,
) -> DataFrame:
    """(id, centrality). Directed Brandes; ``sources=None`` → exact (all
    vertices as sources). When sampling, scores are scaled by n/|sources|."""
    spark = graph.spark
    edges = graph.edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    n = graph.num_vertices
    if sources is None:
        sources = [r["id"] for r in graph.vertices.select("id").collect()]

    acc: DataFrame | None = None
    for s in sources:
        # ---- forward: levels of (id, sigma) --------------------------------
        levels: list[DataFrame] = []
        frontier = spark.createDataFrame([(int(s), 1.0)], "id long, sigma double")
        frontier = frontier.localCheckpoint(eager=True)
        visited = frontier.select("id")
        levels.append(frontier)
        for _ in range(max_depth):
            nxt = (
                edges.join(frontier.withColumnRenamed("id", "src"), "src")
                .join(visited.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("sigma").alias("sigma"))
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            levels.append(nxt)
            visited = visited.unionAll(nxt.select("id")).localCheckpoint(eager=True)
            frontier = nxt

        # ---- backward: delta per level -------------------------------------
        delta = levels[-1].select("id", F.lit(0.0).alias("delta"))
        contrib_total: DataFrame | None = None
        for d in range(len(levels) - 1, 0, -1):
            below = levels[d].join(delta, "id").select(
                "id", "sigma", "delta"
            )
            if d > 0 and contrib_total is None:
                pass
            # dependency flowing to level d-1 predecessors
            preds = levels[d - 1]
            flow = (
                edges.withColumnRenamed("src", "pid").withColumnRenamed("dst", "id")
                .join(below, "id")
                .join(preds.select(F.col("id").alias("pid"), F.col("sigma").alias("psig")), "pid")
                .select(
                    F.col("pid").alias("id"),
                    (F.col("psig") / F.col("sigma") * (1.0 + F.col("delta"))).alias("d"),
                )
                .groupBy("id")
                .agg(F.sum("d").alias("delta"))
            )
            delta_prev = (
                preds.select("id")
                .join(flow, "id", "left")
                .select("id", F.coalesce("delta", F.lit(0.0)).alias("delta"))
                .localCheckpoint(eager=True)
            )
            part = below.select("id", F.col("delta").alias("score"))
            contrib_total = (
                part if contrib_total is None else contrib_total.unionAll(part)
            )
            delta = delta_prev
        if contrib_total is not None:
            acc = contrib_total if acc is None else acc.unionAll(contrib_total)
            acc = acc.groupBy("id").agg(F.sum("score").alias("score")).localCheckpoint(
                eager=True
            )

    if acc is None:
        acc = spark.createDataFrame([], "id long, score double")
    scale = 1.0
    if len(sources) < n:
        scale *= n / len(sources)
    if normalized and n > 2:
        scale /= (n - 1) * (n - 2)
    out = (
        graph.vertices.select("id")
        .join(acc, "id", "left")
        .select(
            "id",
            (F.coalesce("score", F.lit(0.0)) * F.lit(scale)).alias("centrality"),
        )
    )
    edges.unpersist()
    return out
