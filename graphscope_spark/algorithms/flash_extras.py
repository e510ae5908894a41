"""Flash clustering/measurement extras: coloring, densest subgraph, k-center.

* :func:`graph_coloring` — ``apps/flash/clustering/color.h:42-81``: every
  round each vertex takes the smallest color unused by its HIGHER-priority
  neighbors (priority = (deg, id), ``check`` at :55-57), until no color
  changes. Deterministic greedy coloring; proper by construction at the
  fixpoint.
* :func:`densest_subgraph_2approx` —
  ``apps/flash/subgraph/densest-sub-2-approx.h:43-93``: core decomposition,
  take the max-core vertex set S; density = (#ordered neighbor pairs inside
  S) / |S| — Charikar's peel 2-approximation evaluated at the densest core.
* :func:`k_center` — ``apps/flash/measurement/k-center.h:43-77``: greedy
  farthest-point: seed at the max-degree vertex, then k−1 times BFS from
  the newest center (dis = min over centers) and pick the farthest vertex.
  The reference breaks ties by traversal order (nondeterministic); here ties
  break lexicographically by (value, id) so results are exactly reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph.graph import Graph
from graphscope_spark.engine.tuning import tuned_loop

__all__ = ["graph_coloring", "densest_subgraph_2approx", "k_center",
           "degeneracy_ordering", "onion_layer_ordering"]

_UNREACH = 2147483647  # flash's INT_MAX sentinel for unreached vertices


@tuned_loop
def graph_coloring(graph: Graph, max_rounds: int = 512) -> DataFrame:
    """(id, color) — deterministic greedy coloring (color.h semantics)."""
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
    # higher-priority → lower-priority orientation (check at color.h:55-57)
    dd = deg.select(F.col("id").alias("dst"), F.col("d").alias("dd"))
    ds = deg.select(F.col("id").alias("src"), F.col("d").alias("sd"))
    hed = (
        edges.join(ds, "src")
        .join(dd, "dst")
        .filter(
            (F.col("sd") > F.col("dd"))
            | ((F.col("sd") == F.col("dd")) & (F.col("src") > F.col("dst")))
        )
        .select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    state = (
        graph.vertices.select("id", F.lit(0).cast("int").alias("c"))
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        used = (
            hed.join(
                state.select(F.col("id").alias("src"), F.col("c").alias("sc")).hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.collect_set("sc").alias("cols"))
        )
        # mex: smallest color in [0, |cols|] not present — whole-stage codegen
        mex = F.expr(
            "array_min(filter(sequence(0, size(cols)), "
            "x -> NOT array_contains(cols, x)))"
        )
        nxt = (
            state.join(used.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.when(F.col("cols").isNull(), F.lit(0))
                .otherwise(mex)
                .cast("int")
                .alias("cc"),
                "c",
            )
            .select(
                "id",
                F.col("cc").alias("c"),
                (F.col("cc") != F.col("c")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = nxt.filter("changed").count()
        state = nxt.select("id", "c")
        if n_changed == 0:
            break
    else:
        raise RuntimeError(f"graph_coloring: no fixpoint in {max_rounds} rounds")
    edges.unpersist()
    hed.unpersist()
    und.unpersist()
    return state.select("id", F.col("c").alias("color"))


def densest_subgraph_2approx(graph: Graph) -> DataFrame:
    """One row ``(n_vertices, n_ordered_pairs, density)`` for the max-core
    subgraph (density = ordered pairs / vertices, the reference's exact
    accounting: each undirected inside-edge counts twice)."""
    from graphscope_spark.algorithms.kcore import core_numbers

    cores = core_numbers(graph).persist(StorageLevel.MEMORY_AND_DISK)
    cmax = cores.agg(F.max("core")).collect()[0][0]
    s = cores.filter(F.col("core") == cmax).select("id")
    und = graph.to_undirected(dedup=True)
    ne = (
        und.edges.join(s.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(s.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .count()
    )
    nv = s.count()
    cores.unpersist()
    und.unpersist()
    return graph.spark.createDataFrame(
        [(nv, ne, float(ne) / nv if nv else 0.0)],
        "n_vertices long, n_ordered_pairs long, density double",
    )


@tuned_loop
def k_center(graph: Graph, k: int = 4) -> DataFrame:
    """(id, dis) — distance to the nearest of the k greedily-chosen centers
    (null = unreached by any center)."""
    from graphscope_spark.engine.multisource import multi_source_bfs

    P = graph.num_partitions
    und = graph.to_undirected(dedup=True)
    deg = und.edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    verts = (
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce("d", F.lit(0)).alias("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    first = verts.orderBy(F.col("d").desc(), F.col("id").desc()).limit(1)
    center = first.collect()[0]["id"]

    dis = graph.vertices.select(
        "id", F.lit(_UNREACH).cast("long").alias("dis")
    ).localCheckpoint(eager=True)
    for i in range(k):
        bfs = multi_source_bfs(und, [int(center)])
        dis = (
            dis.join(
                bfs.select("id", F.col("depth").cast("long").alias("nd")),
                "id",
                "left",
            )
            .select("id", F.least("dis", F.coalesce("nd", F.lit(_UNREACH))).alias("dis"))
            .localCheckpoint(eager=True)
        )
        if i == k - 1:
            break
        far = dis.orderBy(F.col("dis").desc(), F.col("id").desc()).limit(1)
        center = far.collect()[0]["id"]
    verts.unpersist()
    und.unpersist()
    return dis.select(
        "id", F.when(F.col("dis") != _UNREACH, F.col("dis")).alias("dis")
    )


def _rank_rounds(
    graph: Graph,
    init_d: DataFrame,
    threshold_col,
    same_core_only: bool,
    max_rounds: int,
) -> DataFrame:
    """Shared ranking loop of degeneracy-/onion-ordering: each round, FRONTIER
    vertices whose residual ``d`` ≤ threshold take ``rank = round``; their
    unranked (optionally same-core) neighbors receive decrements and form the
    next frontier. ``d`` lives in a global unranked state so a vertex dropped
    from the frontier re-enters with its accumulated decrements when it next
    receives (EdgeMapSparse cond semantics). rank = -1 for vertices the
    process never ranks (possible for onion's same-core gating)."""
    P = graph.num_partitions
    und = graph.to_undirected(dedup=True)
    edges = (
        und.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # rank and frontier membership (f = received a decrement last round)
    # live INSIDE the one checkpointed state: the now/survivor splits and
    # the emptiness probe are then filters over the checkpoint instead of a
    # semi-join + anti-join + a probe that re-runs the decrement join.
    state = init_d.select(
        "id", "d", "core",
        F.lit(-1).cast("int").alias("rank"),
        F.lit(True).alias("f"),
    ).localCheckpoint(eager=True)
    now_cond = F.col("f") & (F.col("rank") < 0) & (F.col("d") <= threshold_col)
    for rnd in range(max_rounds):
        now = state.filter(now_cond)
        recv = edges.join(
            now.select(F.col("id").alias("src"), F.col("core").alias("score")),
            "src",
        )
        recv = recv.join(
            state.filter((F.col("rank") < 0) & ~now_cond).select(
                F.col("id").alias("dst"), F.col("core").alias("dcore")
            ),
            "dst",
        )
        if same_core_only:
            recv = recv.filter(F.col("dcore") == F.col("score"))
        cnt = recv.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).cast("long").alias("hit")
        )
        state = (
            state.join(cnt, "id", "left")
            .select(
                "id",
                (F.col("d") - F.coalesce("hit", F.lit(0))).alias("d"),
                "core",
                F.when(F.col("rank") >= 0, F.col("rank"))
                .when(now_cond, F.lit(rnd))
                .otherwise(F.lit(-1))
                .cast("int")
                .alias("rank"),
                F.col("hit").isNotNull().alias("f"),
            )
            .localCheckpoint(eager=True)
        )
        if state.filter("f AND rank < 0").isEmpty():
            break
    edges.unpersist()
    und.unpersist()
    return (
        graph.vertices.select("id")
        .join(state.select("id", "rank"), "id", "left")
        .select("id", F.coalesce("rank", F.lit(-1)).cast("int").alias("rank"))
    )


@tuned_loop
def degeneracy_ordering(graph: Graph, max_rounds: int = 512) -> DataFrame:
    """(id, rank) — removal round in the ≤degeneracy peel
    (``apps/flash/core/degeneracy-ordering.h:89-107``): dg = max core
    number; each round every active vertex with residual degree ≤ dg is
    removed with ``rank = round``; decrements flow to its unranked
    neighbors. -1 = never re-examined (reference frontier semantics)."""
    from graphscope_spark.algorithms.kcore import core_numbers

    cores = core_numbers(graph).persist(StorageLevel.MEMORY_AND_DISK)
    dg = cores.agg(F.max("core")).collect()[0][0] or 0
    und = graph.to_undirected(dedup=True)
    deg = und.edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    init = (
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce("d", F.lit(0)).alias("d"), F.lit(0).alias("core"))
    )
    und.unpersist()
    out = _rank_rounds(graph, init, F.lit(int(dg)), False, max_rounds)
    cores.unpersist()
    return out


@tuned_loop
def onion_layer_ordering(graph: Graph, max_rounds: int = 512) -> DataFrame:
    """(id, rank) — onion layers
    (``apps/flash/core/onion-layer-ordering.h:69-95``): d = #neighbors with
    core ≥ own core; each round vertices with d ≤ own core take the layer
    rank; decrements flow only to SAME-core unranked neighbors."""
    from graphscope_spark.algorithms.kcore import core_numbers

    cores = core_numbers(graph).persist(StorageLevel.MEMORY_AND_DISK)
    und = graph.to_undirected(dedup=True)
    cc = cores.select(F.col("id").alias("dst"), F.col("core").alias("ncore"))
    d0 = (
        und.edges.join(cores.select(F.col("id").alias("src"), "core"), "src")
        .join(cc, "dst")
        .filter(F.col("ncore") >= F.col("core"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    init = (
        cores.join(d0, "id", "left")
        .select("id", F.coalesce("d", F.lit(0)).alias("d"), "core")
    )
    und.unpersist()
    out = _rank_rounds(graph, init, F.col("core"), True, max_rounds)
    cores.unpersist()
    return out
