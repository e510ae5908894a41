"""Composite-state multi-source traversal kernels.

Per-source fan-out (one BFS per source, a driver loop of Spark jobs) dies at
scale: S sources cost S × (diameter) jobs and S driver round-trips. These
kernels instead run ONE superstep loop over composite state keyed by
``(source, id)`` — the same shape the reference's closeness app batches into
its per-round message exchange (apps/centrality/closeness/
closeness_centrality.h) and the standard batched-Brandes formulation for
betweenness. Cost: diameter rounds total, independent of |sources|; state
and message volume scale with |sources| × frontier, which is the intrinsic
work of the problem.

State holds only DISCOVERED pairs (not |sources| × |V| rows), so sparse
reachability stays sparse.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.engine.superstep import run_supersteps
from graphscope_spark.graph.graph import Graph
from graphscope_spark.engine.tuning import tuned_loop

__all__ = ["multi_source_bfs", "multi_source_bfs_parents", "multi_source_brandes"]


def _seed_df(graph: Graph, sources: Sequence[int] | DataFrame) -> DataFrame:
    if isinstance(sources, DataFrame):
        return sources.select(F.col(sources.columns[0]).cast("long").alias("source"))
    return graph.spark.createDataFrame(
        [(int(s),) for s in sources], "source long"
    )


def multi_source_bfs(
    graph: Graph,
    sources: Sequence[int] | DataFrame,
    reverse: bool = False,
    max_depth: int = 10_000,
) -> DataFrame:
    """(source, id, depth) for every pair where ``id`` is reachable from
    ``source`` — all sources advanced in lock-step, one shuffle per level.

    ``reverse=True`` traverses incoming edges (distance TO the source),
    without materializing a reversed graph.
    """
    P = graph.num_partitions
    a, b = ("dst", "src") if reverse else ("src", "dst")
    edges = (
        graph.edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .repartition(P, "u")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    seeds = _seed_df(graph, sources)

    def init() -> DataFrame:
        return seeds.select(
            "source",
            F.col("source").alias("id"),
            F.lit(0).alias("depth"),
            F.lit(True).alias("changed"),
        ).repartition(P, "id")

    def body(state: DataFrame, rnd: int):
        frontier = state.filter("changed").select("source", "id")
        newly = (
            edges.join(frontier.hint("shuffle_hash"), edges.u == frontier.id)
            .select("source", F.col("v").alias("id"))
            .distinct()
            .join(state.select("source", "id"), ["source", "id"], "left_anti")
        )
        plan = state.select(
            "source", "id", "depth", F.lit(False).alias("changed")
        ).unionByName(
            newly.select(
                "source", "id", F.lit(rnd).alias("depth"), F.lit(True).alias("changed")
            )
        )

        def finalize(st: DataFrame) -> dict:
            active = st.filter("changed").count()
            return {"converged": active == 0, "active": active}

        return plan, finalize

    try:
        res = run_supersteps(init, body, max_rounds=max_depth)
    finally:
        edges.unpersist()
    return res.state.select("source", "id", "depth")


@tuned_loop
def multi_source_brandes(
    graph: Graph,
    sources: Sequence[int] | DataFrame,
    max_depth: int = 10_000,
) -> DataFrame:
    """Batched Brandes: (id, score) = Σ_{s ∈ sources} δ_s(id), the raw
    (unscaled) betweenness dependency accumulated over the source batch.

    Forward pass: one composite-state BFS carrying σ (shortest-path counts)
    per (source, id). Backward pass: one job per DEPTH LEVEL (not per
    source) propagating δ from the deepest level up. Total jobs ≈
    2 × diameter regardless of |sources|.
    """
    P = graph.num_partitions
    edges = (
        graph.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    seeds = _seed_df(graph, sources)

    # ---- forward: (source, id, depth, sigma) -----------------------------
    def init() -> DataFrame:
        return seeds.select(
            "source",
            F.col("source").alias("id"),
            F.lit(0).alias("depth"),
            F.lit(1.0).alias("sigma"),
            F.lit(True).alias("changed"),
        ).repartition(P, "id")

    def body(state: DataFrame, rnd: int):
        frontier = state.filter("changed").select("source", "id", "sigma")
        msgs = (
            edges.join(frontier.hint("shuffle_hash"), edges.src == frontier.id)
            .groupBy("source", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sig"))
            .join(state.select("source", "id"), ["source", "id"], "left_anti")
        )
        plan = state.select(
            "source", "id", "depth", "sigma", F.lit(False).alias("changed")
        ).unionByName(
            msgs.select(
                "source",
                "id",
                F.lit(rnd).alias("depth"),
                F.col("sig").alias("sigma"),
                F.lit(True).alias("changed"),
            )
        )

        def finalize(st: DataFrame) -> dict:
            active = st.filter("changed").count()
            return {"converged": active == 0, "active": active}

        return plan, finalize

    res = run_supersteps(init, body, max_rounds=max_depth)
    visited = res.state.select("source", "id", "depth", "sigma").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    max_d = visited.agg(F.max("depth")).collect()[0][0] or 0

    # ---- backward: δ per level, deepest first ----------------------------
    spark = graph.spark
    delta_above = (
        visited.filter(F.col("depth") == max_d)
        .select("source", "id", F.lit(0.0).alias("delta"))
        .localCheckpoint(eager=True)
    )
    contribs: list[DataFrame] = []
    if max_d >= 1:
        contribs.append(delta_above)
    for d in range(max_d - 1, 0, -1):
        below = (
            visited.filter(F.col("depth") == d + 1)
            .join(delta_above, ["source", "id"])
            .select("source", "id", "sigma", "delta")
        )
        flow = (
            edges.join(
                below.hint("shuffle_hash"),
                (edges.dst == below.id),
            )
            .select(
                "source",
                F.col("src").alias("pid"),
                (F.lit(1.0) + F.col("delta")).alias("dd"),
                F.col("sigma").alias("sig_w"),
            )
        )
        level = visited.filter(F.col("depth") == d).select("source", "id", "sigma")
        delta_above = (
            level.join(
                flow,
                (level.source == flow.source) & (level.id == flow.pid),
                "left",
            )
            .groupBy(level.source.alias("source"), level.id.alias("id"))
            .agg(
                F.coalesce(
                    F.sum(F.col("sigma") / F.col("sig_w") * F.col("dd")), F.lit(0.0)
                ).alias("delta")
            )
            .localCheckpoint(eager=True)
        )
        if d >= 1:
            contribs.append(delta_above)

    if not contribs:
        out = spark.createDataFrame([], "id long, score double")
    else:
        allc = contribs[0]
        for c in contribs[1:]:
            allc = allc.unionByName(c)
        out = allc.groupBy("id").agg(F.sum("delta").alias("score"))
    out = out.localCheckpoint(eager=True)
    visited.unpersist()
    edges.unpersist()
    return out


def multi_source_bfs_parents(
    graph: Graph,
    sources: Sequence[int] | DataFrame,
    max_depth: int = 10_000,
) -> DataFrame:
    """(source, id, depth, parent) — BFS forest per source with a
    deterministic parent choice (minimum frontier predecessor), the state
    ShortestPathExpand reconstructs paths from. Same composite-state batch
    protocol as :func:`multi_source_bfs`: diameter rounds total."""
    P = graph.num_partitions
    edges = (
        graph.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    seeds = _seed_df(graph, sources)

    def init() -> DataFrame:
        return seeds.select(
            "source",
            F.col("source").alias("id"),
            F.lit(0).alias("depth"),
            F.lit(None).cast("long").alias("parent"),
            F.lit(True).alias("changed"),
        ).repartition(P, "id")

    def body(state: DataFrame, rnd: int):
        frontier = state.filter("changed").select("source", "id")
        newly = (
            edges.join(frontier.hint("shuffle_hash"), edges.src == frontier.id)
            .groupBy("source", F.col("dst").alias("id"))
            .agg(F.min("src").alias("parent"))
            .join(state.select("source", "id"), ["source", "id"], "left_anti")
        )
        plan = state.select(
            "source", "id", "depth", "parent", F.lit(False).alias("changed")
        ).unionByName(
            newly.select(
                "source", "id", F.lit(rnd).alias("depth"), "parent",
                F.lit(True).alias("changed"),
            )
        )

        def finalize(st: DataFrame) -> dict:
            active = st.filter("changed").count()
            return {"converged": active == 0, "active": active}

        return plan, finalize

    try:
        res = run_supersteps(init, body, max_rounds=max_depth)
    finally:
        edges.unpersist()
    return res.state.select("source", "id", "depth", "parent")
