"""Maximal independent set and maximal matching — Luby-style rounds.

Reference inventory: ``apps/flash/matching/mis.h`` and
``apps/flash/matching/mm-opt.h`` (SURVEY §2.2 FLASH suite). Both use the
classic deterministic-random rounds (Luby 1986, public): per round every
active element draws a hash priority; local minima (smaller than every
active neighbor) enter the result; their neighborhood deactivates. O(log n)
rounds with high probability; each round is one shuffle.

Priorities come from the engine-portable md5 hash (operators/dedup.
portable_str_hash) so the whole iteration has an exact DuckDB twin — the
driver oracle replays the same rounds bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph.graph import Graph

__all__ = ["maximal_independent_set", "maximal_matching"]


def _prio(expr, rnd: int):
    from graphscope_spark.operators.dedup import portable_str_hash

    return portable_str_hash(F.concat(F.lit(f"{rnd}:"), expr.cast("string")))


def maximal_independent_set(graph: Graph, max_rounds: int = 64) -> DataFrame:
    """(id) — a maximal independent set of the undirected simple graph;
    deterministic (hash priorities, min-(prio, id) wins)."""
    und = graph.to_undirected(dedup=True)
    edges = und.edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    active = graph.vertices.select("id").localCheckpoint(eager=True)
    mis = None
    for rnd in range(1, max_rounds + 1):
        if active.isEmpty():
            break
        pa = active.select("id", _prio(F.col("id"), rnd).alias("p"))
        # neighbor minimum over ACTIVE neighbors only
        ae = (
            edges.join(pa.withColumnRenamed("id", "src").withColumnRenamed("p", "ps"), "src")
            .join(pa.select(F.col("id").alias("dst"), F.col("p").alias("pd")), "dst")
        )
        nbr_min = ae.groupBy(F.col("src").alias("id")).agg(
            F.min(F.struct("pd", "dst")).alias("nm")
        )
        winners = (
            pa.join(nbr_min, "id", "left")
            .filter(
                F.col("nm").isNull()
                | (F.struct(F.col("p"), F.col("id")) < F.struct(
                    F.col("nm.pd"), F.col("nm.dst")))
            )
            .select("id")
            .localCheckpoint(eager=True)
        )
        mis = winners if mis is None else mis.unionByName(winners)
        mis = mis.localCheckpoint(eager=True)
        dropped = (
            edges.join(winners.withColumnRenamed("id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .unionByName(winners)
        )
        active = active.join(dropped, "id", "left_anti").localCheckpoint(eager=True)
    edges.unpersist()
    und.unpersist()
    if mis is None:
        mis = graph.spark.createDataFrame([], "id long")
    return mis


def maximal_matching(graph: Graph, max_rounds: int = 64) -> DataFrame:
    """(src, dst) — a maximal matching (src < dst) of the undirected simple
    graph; deterministic (per-round edge hash priorities, local minima over
    edges sharing an endpoint win)."""
    und = graph.to_undirected(dedup=True)
    pairs = (
        und.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    und.unpersist()
    matched = None
    active = pairs
    for rnd in range(1, max_rounds + 1):
        if active.isEmpty():
            break
        pe = active.select(
            "a", "b",
            _prio(F.concat(F.col("a").cast("string"), F.lit("_"),
                           F.col("b").cast("string")), rnd).alias("p"),
        ).localCheckpoint(eager=True)
        # min (p, a, b) per endpoint
        ends = pe.select(F.col("a").alias("v"), "p", "a", "b").unionByName(
            pe.select(F.col("b").alias("v"), "p", "a", "b")
        )
        vmin = ends.groupBy("v").agg(F.min(F.struct("p", "a", "b")).alias("m"))
        winners = (
            pe.join(vmin.withColumnRenamed("v", "a"), "a")
            .filter(
                (F.col("m.p") == F.col("p"))
                & (F.col("m.a") == F.col("a"))
                & (F.col("m.b") == F.col("b"))
            )
            .drop("m")
            .join(vmin.withColumnRenamed("v", "b"), "b")
            .filter(
                (F.col("m.p") == F.col("p"))
                & (F.col("m.a") == F.col("a"))
                & (F.col("m.b") == F.col("b"))
            )
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        matched = winners if matched is None else matched.unionByName(winners)
        matched = matched.localCheckpoint(eager=True)
        mv = winners.select(F.col("a").alias("v")).unionByName(
            winners.select(F.col("b").alias("v"))
        ).distinct()
        active = (
            active.join(mv.withColumnRenamed("v", "a"), "a", "left_anti")
            .join(mv.withColumnRenamed("v", "b"), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    if matched is None:
        matched = graph.spark.createDataFrame([], "a long, b long")
    return matched.select(F.col("a").alias("src"), F.col("b").alias("dst"))
