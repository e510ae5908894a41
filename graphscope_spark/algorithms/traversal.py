"""SSSP and BFS — frontier-relaxation supersteps.

* :func:`sssp` — single-source shortest paths, the semantics of
  ``grape::SSSPOpt`` (reference run_app.h:211-219; PIE walkthrough
  docs/analytical_engine/programming_model_pie.md:40-95): distributed
  Bellman-Ford with a frontier — only vertices whose distance improved relax
  their out-edges next round; fixpoint when the frontier empties.
  Unreachable vertices keep +inf (reported as null in the result).
* :func:`bfs` — depth from source (apps/bfs/bfs_generic.h, depth output);
  unreachable = -1.

Both run the plan+finalize superstep protocol (one localCheckpoint per round)
with the standard edge layout: edges ``repartition(P, "src")`` + persisted, so
the frontier⋈edges probe shuffles only the (small) frontier; ``shuffle_hash``
hints on both the probe and the state update keep Catalyst from broadcasting
the full-state side (the measured serialization landmine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.engine.superstep import SuperstepResult, run_supersteps
from graphscope_spark.graph.graph import Graph

__all__ = ["sssp", "bfs"]


def sssp(
    graph: Graph,
    source: int,
    weight_col: str | None = "weight",
    max_iter: int = 10_000,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    resume: bool = True,
    return_result: bool = False,
    warm_start: DataFrame | None = None,
) -> DataFrame | SuperstepResult:
    """Returns ``(id, distance)``; unreachable → null. ``warm_start``
    seeds iteration from a prior state ``(id, dist, changed)`` — the
    Ingress delta-recompute entry (engine/ingress.sssp_delta)."""
    P = graph.num_partitions
    w = (
        F.col(weight_col).cast("double")
        if weight_col and weight_col in graph.edges.columns
        else F.lit(1.0)
    )
    edges = (
        graph.edges.select("src", "dst", w.alias("w"))
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def init() -> DataFrame:
        if warm_start is not None:
            return warm_start.select("id", "dist", "changed").repartition(P, "id")
        return graph.vertices.select(
            "id",
            F.when(F.col("id") == source, 0.0).otherwise(float("inf")).alias("dist"),
            (F.col("id") == source).alias("changed"),
        ).repartition(P, "id")

    def body(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        frontier = state.filter("changed").select("id", "dist")
        relax = (
            edges.join(frontier.hint("shuffle_hash"), edges.src == frontier.id)
            .groupBy("dst")
            .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
        )
        better = F.col("cand").isNotNull() & (F.col("cand") < F.col("dist"))
        plan = state.join(
            relax.hint("shuffle_hash"), state.id == relax.dst, "left"
        ).select(
            state.id.alias("id"),
            F.when(better, F.col("cand")).otherwise(F.col("dist")).alias("dist"),
            better.alias("changed"),
        )

        def finalize(st: DataFrame) -> dict:
            active = st.filter("changed").count()
            return {"converged": active == 0, "active": active}

        return plan, finalize

    try:
        res = run_supersteps(
            init, body, max_rounds=max_iter, checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every, resume=resume,
        )
    finally:
        edges.unpersist()
    if return_result:
        return res
    return res.state.select(
        "id",
        F.when(F.col("dist") != float("inf"), F.col("dist")).alias("distance"),
    )


def bfs(
    graph: Graph,
    source: int,
    max_depth: int = 10_000,
    return_result: bool = False,
    warm_start: DataFrame | None = None,
) -> DataFrame | SuperstepResult:
    """Returns ``(id, depth)``; unreachable → -1 (bfs_generic.h default).
    ``warm_start`` seeds ``(id, depth, changed)`` — engine/ingress.bfs_delta."""
    P = graph.num_partitions
    edges = (
        graph.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def init() -> DataFrame:
        return graph.vertices.select(
            "id",
            F.when(F.col("id") == source, 0).otherwise(-1).cast("int").alias("depth"),
            (F.col("id") == source).alias("changed"),
        ).repartition(P, "id")

    def body(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        # depth = min(parent depth) + 1, NOT the round counter: identical on
        # a cold start (round-r frontier has depth r-1) and stays correct
        # when warm-started mid-fixpoint from a delta (round counters reset)
        frontier = state.filter("changed").select("id", "depth")
        reached = (
            edges.join(frontier.hint("shuffle_hash"), edges.src == frontier.id)
            .groupBy("dst")
            .agg((F.min("depth") + 1).alias("cand"))
        )
        newly = F.col("cand").isNotNull() & (
            (F.col("depth") == -1) | (F.col("cand") < F.col("depth"))
        )
        plan = state.join(
            reached.hint("shuffle_hash"), state.id == reached.dst, "left"
        ).select(
            state.id.alias("id"),
            F.when(newly, F.col("cand"))
            .otherwise(F.col("depth"))
            .cast("int")
            .alias("depth"),
            newly.alias("changed"),
        )

        def finalize(st: DataFrame) -> dict:
            active = st.filter("changed").count()
            return {"converged": active == 0, "active": active}

        return plan, finalize

    try:
        res = run_supersteps(init, body, max_rounds=max_depth)
    finally:
        edges.unpersist()
    if return_result:
        return res
    return res.state.select("id", "depth")
