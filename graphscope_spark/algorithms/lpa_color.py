"""LPA scheduled by graph coloring — deterministic asynchronous LPA.

Reference: ``apps/flash/clustering/lpa-by-color.h:15-146`` — first color the
graph (color.h rounds), then run label propagation one COLOR CLASS at a
time: within a sweep, class 0 updates against current labels, then class 1
sees class 0's fresh labels, and so on. Because adjacent vertices never
share a color, no edge updates both endpoints in the same step — the
classic async-LPA determinism/oscillation fix. The reference breaks count
ties by neighbor iteration order; here ties break by (count desc, label
asc) so the whole process is engine-reproducible (and DuckDB-replayable).

Each class step is one join + count aggregate + argmax against the CURRENT
label table; a sweep costs (#colors) such steps, and sweeps repeat until a
full sweep changes no label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph.graph import Graph
from graphscope_spark.engine.tuning import tuned_loop

__all__ = ["lpa_by_color"]


@tuned_loop
def lpa_by_color(graph: Graph, max_sweeps: int = 64) -> DataFrame:
    """(id, label) at the async fixpoint (no label changes in a sweep)."""
    from graphscope_spark.algorithms.flash_extras import graph_coloring

    P = graph.num_partitions
    colors = graph_coloring(graph).persist(StorageLevel.MEMORY_AND_DISK)
    n_colors = colors.agg(F.max("color")).collect()[0][0] + 1
    und = graph.to_undirected(dedup=True)
    edges = (
        und.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    state = (
        colors.select(
            "id", F.col("id").alias("label"), "color",
            F.lit(False).alias("chg"),
        )
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )
    for _ in range(max_sweeps):
        for j in range(n_colors):
            # semi-join FIRST: only class-j destinations matter this step,
            # so prune the edge table to ~|E|/n_colors rows BEFORE attaching
            # neighbor labels — written join order previously shipped the
            # full edges⋈labels join through every color step (a sweep cost
            # n_colors full joins instead of one in total). Same rows.
            cnts = (
                edges.join(
                    state.filter(F.col("color") == j).select(
                        F.col("id").alias("dst")
                    ),
                    "dst",
                    "left_semi",
                )
                .join(
                    state.select(F.col("id").alias("src"), F.col("label").alias("nl")),
                    "src",
                )
                .groupBy(F.col("dst").alias("id"), F.col("nl"))
                .agg(F.count(F.lit(1)).alias("c"))
            )
            # argmax by (count desc, label asc): pack as (c, -label) struct max
            best = cnts.groupBy("id").agg(
                F.max(F.struct(F.col("c"), (-F.col("nl")).alias("negl"))).alias("b")
            ).select("id", (-F.col("b.negl")).alias("newl"))
            # ONE materialization per class step; changes accumulate in chg
            # and are tested once per sweep — a per-class count() job bought
            # no information and doubled the barrier budget (same lesson as
            # fluid_communities).
            state = (
                state.join(best, "id", "left")
                .select(
                    "id",
                    F.coalesce("newl", "label").alias("label"),
                    "color",
                    (
                        F.col("chg")
                        | (F.coalesce("newl", "label") != F.col("label"))
                    ).alias("chg"),
                )
                .localCheckpoint(eager=True)
            )
        if state.filter("chg").isEmpty():
            break
        state = state.withColumn("chg", F.lit(False))
    else:
        raise RuntimeError(f"lpa_by_color: no fixpoint in {max_sweeps} sweeps")
    edges.unpersist()
    und.unpersist()
    colors.unpersist()
    return state.select("id", "label")
