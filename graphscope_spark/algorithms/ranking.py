"""PPR and ArticleRank — fixed-round ranking supersteps.

* :func:`ppr` — personalized PageRank, semantics of the reference's
  ``apps/flash/ranking/ppr.h:41-71``: UNDIRECTED edges (``EU``), restart
  probability 0.5 pinned to the source — per round
  ``val'(v) = 0.5·Σ_{u∈N(v)} val(u)/deg(u) + 0.5·[v == source]``, starting
  from ``val = [v == source]``, for exactly ``max_iters`` rounds. No
  normalization, no convergence test (matching the reference app).
* :func:`articlerank` — ``apps/flash/ranking/articlerank.h:42-73``:
  DIRECTED edges (``ED``), contributions divided by ``outdeg + avg_outdeg``
  (the ArticleRank damping of hub influence) — per round
  ``val'(v) = d·Σ_{u→v} val(u)/(outdeg(u)+avg) + (1−d)``, starting from
  ``val = 0``, for exactly ``max_iters`` rounds. ``avg`` is the mean
  out-degree over ALL vertices (``GetTotalVerticesNum`` denominator).

Both run the plan+finalize superstep protocol over the standard co-partitioned
edge layout (repartition(P, src) + persist + shuffle_hash hints), so steady
state moves exactly one message-table per round — same as pagerank.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.engine.superstep import run_supersteps
from graphscope_spark.graph.graph import Graph

__all__ = ["ppr", "articlerank"]


def ppr(graph: Graph, source: int, max_iters: int = 10) -> DataFrame:
    """(id, ppr) — flash-PPR from ``source`` over the undirected graph."""
    P = graph.num_partitions
    und = graph.to_undirected(dedup=True)
    deg = und.edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    links = (
        und.edges.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("share"))
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def init() -> DataFrame:
        return graph.vertices.select(
            "id",
            F.when(F.col("id") == source, 1.0).otherwise(0.0).alias("val"),
        ).repartition(P, "id")

    def body(state: DataFrame, rnd: int):
        msgs = (
            links.join(
                state.select("id", "val").hint("shuffle_hash"),
                links.src == F.col("id"),
            )
            .select("dst", (F.lit(0.5) * F.col("share") * F.col("val")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("m"))
        )
        restart = F.when(state.id == source, 0.5).otherwise(0.0)
        plan = state.join(
            msgs.hint("shuffle_hash"), state.id == msgs.dst, "left"
        ).select(
            state.id.alias("id"),
            (F.coalesce(F.col("m"), F.lit(0.0)) + restart).alias("val"),
        )
        return plan, lambda st: {"converged": False}

    try:
        res = run_supersteps(init, body, max_rounds=max_iters)
    finally:
        links.unpersist()
        und.unpersist()
    return res.state.select("id", F.col("val").alias("ppr"))


def articlerank(graph: Graph, max_iters: int = 10, damping: float = 0.85) -> DataFrame:
    """(id, articlerank) — flash-ArticleRank over the directed graph."""
    P = graph.num_partitions
    n = graph.num_vertices
    deg = graph.edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    # avg outdeg over ALL vertices: |E| / |V| (articlerank.h:57-60 GetSum/n)
    avg = graph.edges.count() / n
    links = (
        graph.edges.select("src", "dst")
        .join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / (F.col("deg") + F.lit(avg))).alias("share"))
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def init() -> DataFrame:
        return graph.vertices.select("id", F.lit(0.0).alias("val")).repartition(
            P, "id"
        )

    def body(state: DataFrame, rnd: int):
        msgs = (
            links.join(
                state.select("id", "val").hint("shuffle_hash"),
                links.src == F.col("id"),
            )
            .select(
                "dst", (F.lit(damping) * F.col("share") * F.col("val")).alias("c")
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("m"))
        )
        plan = state.join(
            msgs.hint("shuffle_hash"), state.id == msgs.dst, "left"
        ).select(
            state.id.alias("id"),
            (F.coalesce(F.col("m"), F.lit(0.0)) + F.lit(1.0 - damping)).alias("val"),
        )
        return plan, lambda st: {"converged": False}

    try:
        res = run_supersteps(init, body, max_rounds=max_iters)
    finally:
        links.unpersist()
    return res.state.select("id", F.col("val").alias("articlerank"))
