"""Fluid communities — density-weighted label spreading from k seeds.

Reference: ``apps/flash/clustering/fluid-community.h:44-107`` (Parés et al.'s
published Fluid Communities) and its color-scheduled deterministic variant
``fluid-by-color.h:89-174``: s seed vertices start one community each; a
vertex adopts the community with the highest *density-weighted* presence in
its closed neighborhood, ``d[i] = |{self ∪ neighbors with label i}| /
cnt[i]``, where the community sizes ``cnt`` are frozen at the start of each
sweep (the reference's once-per-round ``Reduce(cnt_loc, cnt)``); a labeled
vertex switches only when strictly better (``d[i] > d[lab]``, ties keep the
incumbent; among new labels ties take the smallest i — the reference's
ascending strict-``>`` scan). Unlabeled (-1) vertices adopt any positive
density.

Determinism: like :mod:`~graphscope_spark.algorithms.lpa_color`, updates are
scheduled one graph-coloring class at a time (fluid-by-color.h), so no edge
updates both endpoints in one step and the fixpoint is engine-reproducible.
``d[i]`` is computed as ONE integer-count division (mathematically equal to
the reference's ``Σ 1/cnt[i]`` over identical terms), so scores are
bit-identical across engines and the DuckDB oracle replays exactly.

The reference seeds randomly (``rand_r % n``); seeds here are an explicit
parameter — at cluster scale you pick them (top-degree, stratified sample),
and determinism is what makes the result testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph.graph import Graph
from graphscope_spark.engine.tuning import tuned_loop

__all__ = ["fluid_communities"]


@tuned_loop
def fluid_communities(
    graph: Graph, seeds: list[int], max_sweeps: int = 64
) -> DataFrame:
    """``(id, label)`` — label = seed index 0..len(seeds)-1, or -1 for
    vertices no community reached (disconnected from every seed)."""
    from graphscope_spark.algorithms.flash_extras import graph_coloring

    if not seeds:
        raise ValueError("fluid_communities needs at least one seed vertex")
    P = graph.num_partitions
    spark = graph.edges.sparkSession
    colors = graph_coloring(graph).persist(StorageLevel.MEMORY_AND_DISK)
    n_colors = colors.agg(F.max("color")).collect()[0][0] + 1
    und = graph.to_undirected(dedup=True)
    edges = (
        und.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    seed_df = spark.createDataFrame(
        [(int(v), i) for i, v in enumerate(seeds)], "id long, seed_lab int"
    )
    state = (
        colors.join(seed_df, "id", "left")
        .select(
            "id",
            F.coalesce("seed_lab", F.lit(-1)).cast("int").alias("lab"),
            "color",
            F.lit(False).alias("chg"),
        )
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )

    converged = False
    try:
        for _ in range(max_sweeps):
            # community sizes frozen for the whole sweep (fluid-community.h:100
            # reduces cnt once per outer round)
            csize = (
                state.filter("lab >= 0")
                .groupBy("lab")
                .agg(F.count(F.lit(1)).alias("csize"))
            )
            for j in range(n_colors):
                # the class-j semi-join distributes over the union, so apply
                # it BEFORE attaching neighbor labels: the edge table shrinks
                # to ~|E|/n_colors rows per step instead of every step paying
                # the full edges⋈labels join (same rows, one full join's work
                # per sweep in total).
                classj = state.filter(F.col("color") == j).select("id")
                self_c = (
                    state.filter("lab >= 0")
                    .select("id", "lab")
                    .join(classj, "id", "left_semi")
                )
                nbr_c = (
                    edges.join(
                        classj.withColumnRenamed("id", "dst"), "dst", "left_semi"
                    )
                    .join(
                        state.select(
                            F.col("id").alias("src"), F.col("lab").alias("nl")
                        ).filter("nl >= 0"),
                        "src",
                    )
                    .select(F.col("dst").alias("id"), F.col("nl").alias("lab"))
                )
                cnts = (
                    self_c.unionByName(nbr_c)
                    .groupBy("id", "lab")
                    .agg(F.count(F.lit(1)).alias("a"))
                    .join(F.broadcast(csize), "lab")
                    .withColumn("score", F.col("a") / F.col("csize"))
                    .join(state.select("id", F.col("lab").alias("curlab")), "id")
                )
                best = cnts.groupBy("id").agg(
                    F.max(F.struct(F.col("score"), (-F.col("lab")).alias("negl"))).alias(
                        "b"
                    ),
                    F.max(
                        F.when(F.col("lab") == F.col("curlab"), F.col("score"))
                    ).alias("curscore"),
                ).select(
                    "id",
                    F.when(
                        F.col("curscore").isNull()
                        | (F.col("b.score") > F.col("curscore")),
                        (-F.col("b.negl")).cast("int"),
                    ).alias("newl"),
                )
                # ONE materialization per class step; changes accumulate in chg
                # and are counted once per sweep (barrier budget: the per-class
                # count doubled wall time for no information)
                state = (
                    state.join(best, "id", "left")
                    .select(
                        "id",
                        F.coalesce("newl", "lab").alias("lab"),
                        "color",
                        (
                            F.col("chg")
                            | (F.coalesce("newl", "lab") != F.col("lab"))
                        ).alias("chg"),
                    )
                    .localCheckpoint(eager=True)
                )
            if state.filter("chg").isEmpty():
                converged = True
                break
            state = state.withColumn("chg", F.lit(False))
        if not converged:
            import warnings

            warnings.warn(
                f"fluid_communities: max_sweeps={max_sweeps} exhausted before a "
                "change-free sweep — labels may not be final",
                stacklevel=2,
            )
    finally:
        edges.unpersist()
        colors.unpersist()
    return state.select("id", F.col("lab").alias("label"))
