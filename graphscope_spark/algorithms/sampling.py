"""Sampling path — seeded random walks (apps/sampling_path/sampling_path.h).

Reference semantics (SURVEY §2.2 "Sampling path"): expand fixed-length paths
from seed vertices by randomly choosing one out-neighbor per step. Here the
choice is DETERMINISTIC pseudo-randomness — at step t the walker at v moves
to argmin over out-neighbors u of the portable hash ``h(seed:t:v:u)`` — so
results are identical across runs, partition counts, and engines (the
DuckDB oracle replays the same walk).

One superstep per hop: frontier ⋈ edges → per-walker (hash, dst) min — the
same shuffle shape as BFS with a deterministic coin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph.graph import Graph

__all__ = ["sampling_path", "neighbor_sample"]


def sampling_path(
    graph: Graph,
    sources: list[int] | DataFrame,
    steps: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(walker, hops, path) — one walk per source vertex, ``path`` as a
    '->'-joined string; a walk stops early at a vertex with no out-edge."""
    from graphscope_spark.operators.dedup import portable_str_hash

    P = graph.num_partitions
    edges = graph.edges.select("src", "dst").repartition(P, "src").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if isinstance(sources, DataFrame):
        seeds = sources.select(F.col(sources.columns[0]).cast("long").alias("walker"))
    else:
        seeds = graph.spark.createDataFrame(
            [(int(s),) for s in sources], "walker long"
        )
    state = seeds.select(
        "walker",
        F.col("walker").alias("cur"),
        F.lit(0).alias("hops"),
        F.col("walker").cast("string").alias("path"),
        F.lit(True).alias("alive"),
    ).localCheckpoint(eager=True)

    for t in range(1, steps + 1):
        frontier = state.filter("alive")
        cand = frontier.join(edges, frontier.cur == edges.src).select(
            "walker", "hops", "path",
            F.col("dst"),
            portable_str_hash(
                F.concat_ws(":", F.lit(seed), F.lit(t), F.col("cur"), F.col("dst"))
            ).alias("h"),
        )
        step = (
            cand.groupBy("walker")
            .agg(F.min(F.struct("h", "dst")).alias("m"))
            .select("walker", F.col("m.dst").alias("nxt"))
        )
        state = (
            state.join(step, "walker", "left")
            .select(
                "walker",
                F.when(F.col("alive") & F.col("nxt").isNotNull(), F.col("nxt"))
                .otherwise(F.col("cur"))
                .alias("cur"),
                F.when(
                    F.col("alive") & F.col("nxt").isNotNull(), F.col("hops") + 1
                )
                .otherwise(F.col("hops"))
                .alias("hops"),
                F.when(
                    F.col("alive") & F.col("nxt").isNotNull(),
                    F.concat_ws("->", "path", F.col("nxt").cast("string")),
                )
                .otherwise(F.col("path"))
                .alias("path"),
                (F.col("alive") & F.col("nxt").isNotNull()).alias("alive"),
            )
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    return state.select("walker", "hops", "path")


def neighbor_sample(
    graph: Graph,
    seeds: list[int],
    fanouts: list[int],
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """GNN-training k-hop neighbor sampling: ``(root, hop, src, dst)`` —
    for every frontier vertex, keep a deterministic fanout-bounded sample
    of its out-edges (node-wise sampling: a vertex draws the same neighbor
    sample wherever it appears, the cache-friendly GraphSAGE layout; the
    reference ships this in its learning engine's samplers, which SURVEY
    declares out of engine scope — this is the data-pipeline rendering).

    The per-vertex draw reuses :func:`operators.text.stratified_sample`
    with the source vertex as the stratum: seeded-hash ranking with a
    broadcast per-stratum threshold prefilter, so a hub's million edges
    are cut to ~2·k JVM-side before the exact top-k window — no
    single-task hotspot at 100 TB. ``hash_fn="portable"`` makes every
    draw bit-reproducible in DuckDB (the oracle path); xxhash64 is the
    production path. One join + one bounded window per hop.
    """
    from graphscope_spark.operators.text import stratified_sample

    edges = graph.edges.select("src", "dst")
    spark = edges.sparkSession
    frontier = spark.createDataFrame(
        [(int(s), int(s)) for s in seeds], "root long, v long"
    )
    outs = []
    for hop, k in enumerate(fanouts, start=1):
        active = frontier.select(F.col("v").alias("src")).distinct()
        cand = edges.join(active, "src")
        picked = stratified_sample(
            cand, "src", int(k), id_col="dst", seed=seed, hash_fn=hash_fn
        )
        out = (
            frontier.join(picked.withColumnRenamed("src", "v"), "v")
            .select(
                "root",
                F.lit(hop).cast("int").alias("hop"),
                F.col("v").alias("src"),
                "dst",
            )
        )
        outs.append(out)
        frontier = out.select("root", F.col("dst").alias("v")).distinct()
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
