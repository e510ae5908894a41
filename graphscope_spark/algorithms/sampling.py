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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph.graph import Graph

__all__ = [
    "sampling_path",
    "neighbor_sample",
    "random_walks",
    "negative_sample",
    "edge_sample",
]


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


def _hash_col(hash_fn: str, expr):
    from graphscope_spark.operators.dedup import portable_str_hash, _P

    if hash_fn == "portable":
        return portable_str_hash(expr)
    return F.abs(F.xxhash64(expr)) % F.lit(_P)


def random_walks(
    graph: Graph,
    sources: list[int] | DataFrame,
    walk_length: int = 4,
    walks_per_source: int = 1,
    p: float = 2.0,
    q: float = 0.5,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """node2vec-style biased random walks → ``(walker, source, hops, path)``.

    Reference: the learning engine's random-walk sampler
    (learning_engine/graph-learn/graphlearn/src/core/operator/sampler/,
    random_walk.cc) — walks feed DeepWalk/node2vec embedding training.
    SURVEY declares the learning engine out of engine scope; this is the
    data-pipeline rendering on the same superstep machinery as
    :func:`sampling_path`.

    Determinism: at step t the walker w at vertex ``cur`` (having arrived
    from ``prev``) scores each out-neighbor u as ``h(seed:w:t:cur:u) · f``
    and moves to the argmin (ties on u), where the integer factor f encodes
    node2vec's second-order bias tiers — f_return = round(4·p) for u = prev,
    f_common = 4 for u adjacent to prev, f_far = round(4·q) otherwise
    (smaller factor ⇒ more likely to win the race). This is a
    DETERMINISTIC rendering of the p/q preference ordering, bit-replayable
    in DuckDB (``hash_fn="portable"``), not a categorical draw — a seeded
    engine has no distribution, but the three-tier return/BFS/DFS bias is
    node2vec's. The first step (no ``prev``) is tier-uniform.

    Scale shape: per step one frontier⋈edges (candidates), one
    partitioning-aligned left join against the edge set for the
    prev-adjacency flag, and one combiner-friendly groupBy-min — a hub's
    million candidates partial-aggregate map-side; no windows, no per-vertex
    state beyond (cur, prev).
    """
    # factors clamped so key = h·f stays inside int64 (h < 2³¹ ⇒ f ≤ 2³¹)
    f_return = min(max(int(round(4 * p)), 1), 1 << 31)
    f_common = 4
    f_far = min(max(int(round(4 * q)), 1), 1 << 31)
    P = graph.num_partitions
    edges = (
        graph.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # prev-adjacency probe table (src=prev, dst=candidate)
    nb = edges.select(
        F.col("src").alias("_p"), F.col("dst").alias("_d"),
        F.lit(1).alias("_is_nb"),
    )
    if isinstance(sources, DataFrame):
        seeds = sources.select(
            F.col(sources.columns[0]).cast("long").alias("source")
        )
    else:
        seeds = graph.spark.createDataFrame(
            [(int(s),) for s in sources], "source long"
        )
    state = (
        seeds.crossJoin(
            graph.spark.range(walks_per_source).select(
                F.col("id").alias("_j")
            )
        )
        .select(
            (F.col("source") * walks_per_source + F.col("_j")).alias("walker"),
            "source",
            F.col("source").alias("cur"),
            F.lit(-1).cast("long").alias("prev"),
            F.lit(0).alias("hops"),
            F.col("source").cast("string").alias("path"),
            F.lit(True).alias("alive"),
        )
        .localCheckpoint(eager=True)
    )

    for t in range(1, walk_length + 1):
        frontier = state.filter("alive")
        cand = frontier.join(edges, frontier.cur == edges.src).select(
            "walker", "prev", "cur", "dst",
            _hash_col(
                hash_fn,
                F.concat_ws(
                    ":", F.lit(seed), F.col("walker"), F.lit(t),
                    F.col("cur"), F.col("dst"),
                ),
            ).alias("h"),
        )
        cand = cand.join(
            nb, (cand.prev == nb._p) & (cand.dst == nb._d), "left"
        ).select(
            "walker", "dst",
            (
                F.col("h")
                * F.when(F.col("dst") == F.col("prev"), F.lit(f_return))
                .when(F.col("_is_nb") == 1, F.lit(f_common))
                .otherwise(F.lit(f_far))
            ).alias("key"),
        )
        step = (
            cand.groupBy("walker")
            .agg(F.min(F.struct("key", "dst")).alias("m"))
            .select("walker", F.col("m.dst").alias("nxt"))
        )
        adv = F.col("alive") & F.col("nxt").isNotNull()
        state = (
            state.join(step, "walker", "left")
            .select(
                "walker", "source",
                F.when(adv, F.col("nxt")).otherwise(F.col("cur")).alias("cur"),
                F.when(adv, F.col("cur")).otherwise(F.col("prev")).alias("prev"),
                F.when(adv, F.col("hops") + 1).otherwise(F.col("hops"))
                .alias("hops"),
                F.when(
                    adv, F.concat_ws("->", "path", F.col("nxt").cast("string"))
                ).otherwise(F.col("path")).alias("path"),
                adv.alias("alive"),
            )
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    return state.select("walker", "source", "hops", "path")


def negative_sample(
    graph: Graph,
    sources: list[int] | DataFrame,
    k: int = 5,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    n_buckets: int = 1024,
) -> DataFrame:
    """Degree-weighted negative sampling → ``(src, draw, neg)``.

    Reference: the learning engine's negative sampler
    (learning_engine/graph-learn/graphlearn/src/core/operator/sampler/,
    negative_sampler.cc — in-degree-weighted draws that are NOT existing
    neighbors, the contrastive-training staple). Deterministic rendering:

    1. weight w(v) = in-degree(v) over the whole graph (the unigram table);
    2. vertices laid out on the integer line ordered by id —
       [lo(v), lo(v)+w(v)) via a two-phase distributed prefix sum
       (range-repartition by id → partition-local cumsum → broadcast
       per-partition offsets; no global single-partition window);
    3. draw d = h(seed:src:draw) mod Σw lands in one vertex's interval;
    4. draws that hit a TRUE neighbor of src (or src itself) are dropped
       (filter-after-sampling, the standard contrastive recipe — output
       may carry fewer than k rows per source).

    The interval probe is an equijoin on ``bucket = d // B`` (each interval
    exploded over the ≤ w/B+1 buckets it overlaps) + a range filter — no
    broadcast-nested-loop range join; hub intervals explode to at most
    ``n_buckets`` rows each. Bit-replayable in DuckDB with
    ``hash_fn="portable"``.
    """
    from pyspark.sql import Window

    spark = graph.spark
    P = graph.num_partitions
    deg = (
        graph.edges.groupBy(F.col("dst").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # two-phase prefix sum in id order (scale-safe: no global window).
    # The range exchange MUST be pinned before branching: RangePartitioner
    # samples its boundaries with an rdd.id-seeded RNG, so the offsets
    # branch (a separate broadcast job) would otherwise recompute the
    # exchange with DIFFERENT boundaries than the window branch and the
    # two pid layouts would disagree (measured at sf0.1: 140-unit lo skew).
    # The prefix sum itself is boundary-independent (global v order), so
    # results stay deterministic across runs and partition counts.
    parted = (
        deg.repartitionByRange(P, "v")
        .localCheckpoint(eager=True)
        .withColumn("_pid", F.spark_partition_id())
    )
    wloc = Window.partitionBy("_pid").orderBy("v")
    local = parted.withColumn(
        "_lo_local", F.sum("w").over(wloc) - F.col("w")
    )
    offsets = (
        local.groupBy("_pid").agg(F.sum("w").alias("_cnt"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_off")
    )
    ranges = (
        local.join(F.broadcast(offsets), "_pid")
        .select(
            "v", "w", (F.col("_lo_local") + F.col("_off")).alias("lo")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    total = ranges.agg(F.sum("w").alias("t")).collect()[0]["t"]
    if not total:
        ranges.unpersist()
        return spark.createDataFrame([], "src long, draw int, neg long")
    bucket_width = max(1, int(total) // n_buckets)
    # explode each interval over the buckets it overlaps
    rb = ranges.select(
        "v", "lo", (F.col("lo") + F.col("w") - 1).alias("hi"),
        F.explode(
            F.sequence(
                (F.col("lo") / bucket_width).cast("long"),
                ((F.col("lo") + F.col("w") - 1) / bucket_width).cast("long"),
            )
        ).alias("bucket"),
    )
    if isinstance(sources, DataFrame):
        seeds = sources.select(
            F.col(sources.columns[0]).cast("long").alias("src")
        )
    else:
        seeds = spark.createDataFrame([(int(s),) for s in sources], "src long")
    draws = seeds.crossJoin(
        spark.range(k).select(F.col("id").cast("int").alias("draw"))
    ).select(
        "src", "draw",
        (
            _hash_col(
                hash_fn,
                F.concat_ws(":", F.lit(seed), F.col("src"), F.col("draw")),
            )
            % F.lit(int(total))
        ).alias("d"),
    )
    hits = (
        draws.withColumn(
            "bucket", (F.col("d") / bucket_width).cast("long")
        )
        .join(rb, "bucket")
        .where((F.col("d") >= F.col("lo")) & (F.col("d") <= F.col("hi")))
        .select("src", "draw", F.col("v").alias("neg"))
    )
    # filter-after: drop true neighbors and self
    pos = graph.edges.select(
        F.col("src").alias("src"), F.col("dst").alias("neg")
    )
    out = (
        hits.join(pos, ["src", "neg"], "left_anti")
        .where(F.col("neg") != F.col("src"))
    )
    return out


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
            # materialize the (tiny, ≤|frontier|·k-row) hop output: it is
            # referenced by BOTH the result union and the next hop's
            # frontier, and without truncation hop h's plan re-embeds the
            # whole hop h-1 sampling pipeline several times over
            # (guide §3.3: materialise intermediates referenced repeatedly).
            .localCheckpoint(eager=True)
        )
        outs.append(out)
        frontier = out.select("root", F.col("dst").alias("v")).distinct()
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def topk_neighbor_sample(
    graph: Graph,
    k: int,
    weight_col: str = "weight",
    salt: int = 32,
) -> DataFrame:
    """GLE TopkSampler parity: for every vertex, its ``k`` strongest
    out-neighbors by edge weight → ``(src, dst, w, rk)``, deterministic
    (ties broken on dst ascending).

    Reference: the learning engine's topk sampler
    (learning_engine/graph-learn/graphlearn/src/core/operator/sampler/,
    topk_sampler.cc — the deterministic alternative to the edge-weight
    random sampler, used for attention-style strongest-neighbor
    aggregation).

    Scale shape: a single window over ``partitionBy(src)`` puts a hub
    vertex's entire adjacency in one task, so the top-k is computed in two
    bounded phases instead — (1) a local top-k inside ``(src, salt)``
    sub-groups where ``salt = pmod(hash(dst), salt_n)`` splits any hub's
    edges across ``salt_n`` tasks, then (2) the exact top-k over the
    ≤ ``salt_n·k`` survivors per vertex. Phase 2's window input is bounded
    per vertex regardless of degree — no single-task hotspot at any hub
    size, same two-level pattern as the salted aggregations in
    operators/dedup.py.
    """
    w = F.col(weight_col).cast("double").alias("w")
    edges = graph.edges.select("src", "dst", w)
    kk = int(k)
    local = Window.partitionBy("src", "_salt").orderBy(
        F.col("w").desc(), F.col("dst").asc()
    )
    survivors = (
        edges.withColumn("_salt", F.pmod(F.xxhash64("dst"), F.lit(int(salt))))
        .withColumn("_lrk", F.row_number().over(local))
        .where(F.col("_lrk") <= kk)
    )
    final = Window.partitionBy("src").orderBy(
        F.col("w").desc(), F.col("dst").asc()
    )
    return (
        survivors.withColumn("rk", F.row_number().over(final))
        .where(F.col("rk") <= kk)
        .select("src", "dst", "w", "rk")
    )


def weighted_neighbor_sample(
    graph: Graph,
    k: int,
    weight_col: str = "weight",
    seed: int = 42,
    hash_fn: str = "xxhash64",
    scale: int = 1000,
    salt: int = 32,
) -> DataFrame:
    """GLE EdgeWeightSampler parity: for every vertex with out-edges, ``k``
    weight-proportional neighbor draws WITH replacement →
    ``(src, draw, dst)``, deterministic.

    Reference: the learning engine's edge-weight sampler
    (learning_engine/graph-learn/graphlearn/src/core/operator/sampler/,
    edge_weight_sampler.cc — probability ∝ edge weight, the attention-ish
    alternative to uniform neighbor draws). Deterministic rendering: each
    vertex lays its neighbors on an integer line (weights scaled to ints by
    ``round(w·scale)``, neighbor order fixed), and draw ``i`` probes the
    line at ``h(seed:src:i) mod W_v`` — the same integer-line trick as
    :func:`negative_sample`, but per-vertex. ``hash_fn="portable"`` makes
    every draw bit-replayable in DuckDB.

    Scale shape (hub-safe, no range join):

    * per-vertex prefix sum in two bounded phases — within-block cumsum
      over ``(src, block)`` sub-groups (``block = pmod(hash(dst), salt)``
      splits a hub's adjacency across ``salt`` window groups) + a block-
      offset window over ≤ ``salt`` rows per vertex;
    * the interval probe is a bucketed equijoin: each interval lands in
      ≤ 2 buckets of width ``B ≥ max(w_int)``, each draw in exactly one —
      join on ``(src, bucket)``, filter containment. No per-row Python,
      no driver loop; one scalar all-reduce for ``B``.
    """
    w = F.col(weight_col).cast("double")
    wint = F.round(w * scale).cast("long").alias("wint")
    edges = (
        graph.edges.select("src", "dst", wint)
        .where(F.col("wint") > 0)
    )
    b = F.pmod(_hash_col(hash_fn, F.col("dst").cast("string")), F.lit(int(salt)))
    blocked = edges.withColumn("_b", b)

    in_block = (
        Window.partitionBy("src", "_b")
        .orderBy("dst")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    block_tot = blocked.groupBy("src", "_b").agg(
        F.sum("wint").alias("_bw")
    )
    prev_blocks = (
        Window.partitionBy("src")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = block_tot.withColumn(
        "_off", F.coalesce(F.sum("_bw").over(prev_blocks), F.lit(0))
    ).select("src", "_b", "_off")
    intervals = (
        blocked.withColumn(
            "_cin", F.coalesce(F.sum("wint").over(in_block), F.lit(0))
        )
        .join(offsets, ["src", "_b"])
        .select(
            "src", "dst", "wint", (F.col("_off") + F.col("_cin")).alias("lo")
        )
    )

    totals = edges.groupBy("src").agg(F.sum("wint").alias("_w"))
    maxw = edges.agg(F.max("wint")).collect()[0][0]
    if maxw is None:
        return intervals.select(
            "src", F.lit(0).alias("draw"), "dst"
        ).limit(0)
    bucket_w = int(maxw)

    # full-width 63-bit probe for the fast path: _hash_col caps at 2^31-1,
    # so a hub with W_v > 2^31 would never probe intervals past 2^31 (those
    # neighbors get zero probability) and modulo bias grows as W_v nears the
    # hash range. The portable/oracle path keeps the 31-bit hash (DuckDB
    # replay) — its documented bound is W_v = sum(round(w·scale)) ≪ 2^31.
    draw_key = F.concat_ws(":", F.lit(seed), F.col("src"), F.col("draw"))
    if hash_fn == "portable":
        draw_hash = _hash_col(hash_fn, draw_key)
    else:
        draw_hash = F.abs(F.xxhash64(draw_key)) % F.lit((1 << 63) - 25)
    draws = (
        totals.select("src", "_w", F.explode(
            F.sequence(F.lit(0), F.lit(int(k) - 1))
        ).alias("draw"))
        .withColumn("t", F.pmod(draw_hash, F.col("_w")))
        .withColumn("_bk", (F.col("t") / bucket_w).cast("long"))
    )
    buckets = intervals.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                (F.col("lo") / bucket_w).cast("long"),
                ((F.col("lo") + F.col("wint") - 1) / bucket_w).cast("long"),
            )
        ),
    )
    return (
        draws.join(buckets, ["src", "_bk"])
        .where((F.col("t") >= F.col("lo"))
               & (F.col("t") < F.col("lo") + F.col("wint")))
        .select("src", "draw", "dst")
    )


def edge_sample(
    graph: Graph,
    k: int,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic uniform edge-batch sample → ``(src, dst)``, k rows.

    Reference: the learning engine's edge sampler
    (learning_engine/graph-learn/graphlearn/src/core/operator/sampler/,
    edge_sampler.cc — RandomEdgeSampler: uniform edge batches feeding
    unsupervised link-prediction training). Deterministic rendering: rank
    every edge by ``h(seed:src:dst)`` (ties on (src, dst)) and keep the k
    smallest — a seeded uniform draw that is identical across runs,
    partition counts, and engines (``hash_fn="portable"`` is bit-replayable
    in DuckDB).

    Scale shape: one scan + TakeOrdered (per-partition top-k, driver merges
    P·k candidate rows) — no global sort materialization, no shuffle of the
    edge table; k is a training batch size (10³-10⁵), so P·k stays tiny
    next to E.
    """
    h = _hash_col(
        hash_fn,
        F.concat_ws(":", F.lit(seed), F.col("src"), F.col("dst")),
    )
    return (
        graph.edges.select("src", "dst", h.alias("_h"))
        .orderBy("_h", "src", "dst")
        .limit(int(k))
        .select("src", "dst")
    )
