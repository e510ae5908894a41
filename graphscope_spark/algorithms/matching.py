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
from graphscope_spark.engine.tuning import tuned_loop

__all__ = [
    "maximal_independent_set",
    "maximal_matching",
    "min_cover_greedy",
    "min_dominating_set",
    "min_edge_cover",
]


def _check_maximal(active: DataFrame, what: str, max_rounds: int) -> None:
    """ADVICE r2: a '*maximal*' contract must fail loudly, not silently
    return a partial result, when the round budget is exhausted."""
    if not active.isEmpty():
        raise RuntimeError(
            f"{what}: {max_rounds} rounds exhausted with active elements "
            "remaining — result would not be maximal; raise max_rounds"
        )


def _prio(expr, rnd: int):
    from graphscope_spark.operators.dedup import portable_str_hash

    return portable_str_hash(F.concat(F.lit(f"{rnd}:"), expr.cast("string")))


@tuned_loop
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
    _check_maximal(active, "maximal_independent_set", max_rounds)
    edges.unpersist()
    und.unpersist()
    if mis is None:
        mis = graph.spark.createDataFrame([], "id long")
    return mis


@tuned_loop
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
    _check_maximal(active, "maximal_matching", max_rounds)
    if matched is None:
        matched = graph.spark.createDataFrame([], "a long, b long")
    return matched.select(F.col("a").alias("src"), F.col("b").alias("dst"))


@tuned_loop
def min_cover_greedy(graph: Graph, max_rounds: int = 256) -> DataFrame:
    """(id) — a small vertex cover via parallel greedy, the exact semantics
    of the reference's ``apps/flash/matching/min-cover-greedy.h:31-96``:
    every round, each still-active vertex whose (residual-degree, id) beats
    every uncovered neighbor's enters the cover; its uncovered neighbors
    subtract the number of newly-covered neighbors from their residual
    degree; vertices drop out when covered or residual degree hits 0.
    Deterministic (ties broken by id — ``nb_id > id`` in filter1).

    Two barriers per round (winners, active update); rounds = the greedy
    peeling depth of the degree distribution (~30 on the link-graph
    fixtures), independent of |V|.
    """
    P = graph.num_partitions
    und = graph.to_undirected(dedup=True)
    edges = (
        und.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    # active = uncovered with residual degree > 0 (isolated verts never join)
    active = deg.localCheckpoint(eager=True)
    winners_per_round: list[DataFrame] = []
    rounds_left = max_rounds
    while rounds_left > 0 and not active.isEmpty():
        rounds_left -= 1
        # nb_best(v) = lexmax (d, id) over ACTIVE neighbors — inactive
        # uncovered neighbors have d <= 0 < v.d and can never beat (filter1)
        a_src = active.select(F.col("id").alias("src"))
        a_dst = active.select(F.col("id").alias("dst"), F.col("d").alias("dd"))
        nb_best = (
            edges.join(a_src, "src", "left_semi")
            .join(a_dst, "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.max(F.struct(F.col("dd"), F.col("dst"))).alias("best"))
        )
        winners = (
            active.join(nb_best, "id", "left")
            .filter(
                F.col("best").isNull()
                | (F.struct(F.col("d"), F.col("id"))
                   > F.struct(F.col("best.dd"), F.col("best.dst")))
            )
            .select("id")
            .localCheckpoint(eager=True)
        )
        winners_per_round.append(winners)
        cnt = (
            edges.join(winners.withColumnRenamed("id", "src"), "src", "left_semi")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.count(F.lit(1)).cast("long").alias("hit"))
        )
        active = (
            active.join(winners, "id", "left_anti")
            .join(cnt, "id", "left")
            .select("id", (F.col("d") - F.coalesce("hit", F.lit(0))).alias("d"))
            .filter(F.col("d") > 0)
            .localCheckpoint(eager=True)
        )
    _check_maximal(active, "min_cover_greedy", max_rounds)
    edges.unpersist()
    und.unpersist()
    if not winners_per_round:
        return graph.spark.createDataFrame([], "id long")
    cover = winners_per_round[0]
    for w in winners_per_round[1:]:
        cover = cover.unionByName(w)
    return cover


def min_dominating_set(graph: Graph, max_rounds: int = 256) -> DataFrame:
    """(id) — a small dominating set via the reference's 2-hop-argmax greedy
    (``apps/flash/matching/min-dominating-set.h:30-95``): each round every
    undominated vertex propagates the lexicographic max of
    (undominated-neighbor-count, id) two hops through undominated neighbors;
    vertices that are their own 2-hop argmax join the set and dominate their
    neighborhood. Deterministic.

    The two propagation hops are fused into one plan (the first hop is
    recomputed by the second — cheaper than a barrier at the ~1s/job floor),
    so each round costs two barriers (best, active update).
    """
    P = graph.num_partitions
    und = graph.to_undirected(dedup=True)
    edges = (
        und.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    # active = undominated; cnt = #undominated neighbors
    active = (
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    winners_per_round: list[DataFrame] = []
    rounds_left = max_rounds

    def _propagate(best: DataFrame) -> DataFrame:
        nbr = (
            edges.join(
                best.select(F.col("id").alias("src"), F.col("best").alias("nb")),
                "src",
            )
            .join(best.select(F.col("id").alias("dst")), "dst", "left_semi")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.max("nb").alias("nbmax"))
        )
        return best.join(nbr, "id", "left").select(
            "id",
            F.when(
                F.col("nbmax").isNotNull() & (F.col("nbmax") > F.col("best")),
                F.col("nbmax"),
            ).otherwise(F.col("best")).alias("best"),
        )

    from graphscope_spark.engine.tuning import iterative_loop

    with iterative_loop(graph.spark, P):
        while rounds_left > 0 and not active.isEmpty():
            rounds_left -= 1
            best = active.select(
                "id",
                F.struct(F.col("cnt"), F.col("id").alias("bid")).alias("best"),
            )
            # min-dominating-set.h:66-67 — local applied twice (2-hop argmax)
            best = _propagate(_propagate(best)).localCheckpoint(eager=True)
            winners = best.filter(F.col("id") == F.col("best.bid")).select("id")
            winners_per_round.append(winners)
            dominated = (
                edges.join(
                    winners.withColumnRenamed("id", "src"), "src", "left_semi"
                )
                .select(F.col("dst").alias("id"))
                .unionByName(winners)
                .distinct()
            )
            survivors = active.join(dominated, "id", "left_anti").select("id")
            # recompute cnt = #still-undominated neighbors (filter2/local2)
            newcnt = (
                edges.join(
                    survivors.withColumnRenamed("id", "src"), "src", "left_semi"
                )
                .join(
                    survivors.withColumnRenamed("id", "dst"), "dst", "left_semi"
                )
                .groupBy(F.col("src").alias("id"))
                .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            )
            active = (
                survivors.join(newcnt, "id", "left")
                .select("id", F.coalesce("cnt", F.lit(0)).alias("cnt"))
                .localCheckpoint(eager=True)
            )
    _check_maximal(active, "min_dominating_set", max_rounds)
    edges.unpersist()
    und.unpersist()
    if not winners_per_round:
        return graph.spark.createDataFrame([], "id long")
    chosen = winners_per_round[0]
    for w in winners_per_round[1:]:
        chosen = chosen.unionByName(w)
    return chosen


@tuned_loop
def min_edge_cover(graph: Graph, max_rounds: int = 256) -> DataFrame:
    """(id, partner, matched) — an edge cover built the reference's way
    (``apps/flash/matching/min-edge-cover.h:42-93``): rounds of mutual
    min-(degree, id) proposals form a maximal matching (each round: active
    vertices propose to their lightest unmatched neighbor; mutual proposals
    match; proposals aimed at vertices touched this round are cleared and
    re-proposed); every remaining unmatched non-isolated vertex is then
    covered by its min-(degree, id) incident edge. Deterministic
    (the reference's own tie-break is already (nb.d, nb_id)).

    Measured negative results on barrier reduction (r4, sf0.1 A/B, same
    session): (a) a fused single-state (id, prop, partner) loop with 2
    checkpoints/round hits exponentially growing localCheckpoint times
    after ~8 rounds (0.7s → 121s/round at sf0.001) despite truncated
    plans and constant row counts; (b) keeping this layout but leaving
    `newly`/`cleared` lazy (3 checkpoints/round) measured 81.6s vs 66.6s
    for this 5-checkpoint version. The 5 materializations stand — each
    intermediate here is referenced 2+ times per round, and on this
    engine recomputing them costs more than checkpointing them."""
    P = graph.num_partitions
    und = graph.to_undirected(dedup=True)
    edges = (
        und.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    deg.count()

    # global state: proposals (id, prop) and matches (id, partner)
    props = graph.spark.createDataFrame([], "id long, prop long")
    matched = graph.spark.createDataFrame([], "id long, partner long")
    active = deg.select("id").localCheckpoint(eager=True)  # non-isolated
    rounds_left = max_rounds
    while rounds_left > 0 and not active.isEmpty():
        rounds_left -= 1
        unmatched_dst = (
            deg.select(F.col("id").alias("dst"), F.col("d").alias("dd"))
            .join(matched.select(F.col("id").alias("dst")), "dst", "left_anti")
        )
        new_props = (
            edges.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(unmatched_dst, "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min(F.struct("dd", "dst")).alias("m"))
            .select("id", F.col("m.dst").alias("prop"))
        )
        props = (
            props.join(active, "id", "left_anti")
            .unionByName(new_props)
            .localCheckpoint(eager=True)
        )
        proposers = new_props.select("id")
        # mutual proposals → matches (both endpoints unmatched by invariant)
        mutual = (
            props.alias("x")
            .join(
                props.alias("y"),
                (F.col("x.prop") == F.col("y.id"))
                & (F.col("y.prop") == F.col("x.id")),
            )
            .select(F.col("x.id").alias("id"), F.col("x.prop").alias("partner"))
        )
        newly = mutual.join(matched, "id", "left_anti").localCheckpoint(eager=True)
        matched = matched.unionByName(newly).localCheckpoint(eager=True)
        touched = proposers.unionByName(newly.select("id")).distinct()
        # clear proposals aimed at touched vertices (check3): owners re-enter
        cleared = (
            props.join(matched.select("id"), "id", "left_anti")
            .join(touched.withColumnRenamed("id", "prop"), "prop", "left_semi")
            .select("id")
            .localCheckpoint(eager=True)
        )
        props = props.join(cleared, "id", "left_anti").localCheckpoint(eager=True)
        active = cleared
    _check_maximal(active, "min_edge_cover", max_rounds)
    # cover the unmatched non-isolated by their min-(d, id) incident edge
    unm = deg.select("id").join(matched.select("id"), "id", "left_anti")
    fallback = (
        edges.join(unm.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(
            deg.select(F.col("id").alias("dst"), F.col("d").alias("dd")), "dst"
        )
        .groupBy(F.col("src").alias("id"))
        .agg(F.min(F.struct("dd", "dst")).alias("m"))
        .select("id", F.col("m.dst").alias("partner"), F.lit(False).alias("matched"))
    )
    out = matched.select("id", "partner", F.lit(True).alias("matched")).unionByName(
        fallback
    )
    out = out.localCheckpoint(eager=True)
    edges.unpersist()
    deg.unpersist()
    und.unpersist()
    return out
