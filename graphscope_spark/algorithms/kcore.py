"""k-core and k-shell — iterative peeling.

Reference: ``apps/kcore/kcore.h`` (run_app.h:359-367) removes vertices with
undirected degree < k until fixpoint; the k-core is the surviving induced
subgraph. ``apps/kshell/kshell.h`` assigns each vertex the largest k for
which it survives. Peeling is a driver loop over anti-joins — degrees are
recomputed on the shrinking edge set, so each round's work decreases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph.graph import Graph
from graphscope_spark.engine.tuning import tuned_loop

__all__ = ["k_core", "k_core_search", "k_shell", "core_numbers"]


def core_numbers(graph: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id, core) — exact coreness via the distributed h-index iteration
    (Montresor/De Pellegrini/Miorandi, "Distributed k-core decomposition",
    2011 — public): start at c(v) = deg(v); repeat
    c(v) ← min(c(v), H({c(u) : u ∈ N(v)})) until fixpoint, where H is the
    h-index (max h with ≥h neighbors at c ≥ h). Converges to the exact core
    number; each round is ONE shuffle (neighbor estimates) + a window
    ranking — versus the chained peel which costs Σ_k rounds_k shuffles."""
    from pyspark.sql.window import Window

    P = graph.num_partitions
    und = graph.to_undirected(dedup=True)
    edges = und.edges.select("src", "dst").repartition(P, "src").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("c")
    )

    def init() -> DataFrame:
        return (
            graph.vertices.select("id")
            .join(deg, "id", "left")
            .select("id", F.coalesce("c", F.lit(0)).cast("int").alias("c"))
            .repartition(P, "id")
        )

    from graphscope_spark.engine.superstep import run_supersteps

    w = Window.partitionBy("src").orderBy(F.col("cn").desc())

    def body(state: DataFrame, rnd: int):
        nbr = edges.join(
            state.select(F.col("id").alias("dst"), F.col("c").alias("cn")).hint(
                "shuffle_hash"
            ),
            "dst",
        ).select("src", "cn")
        h = (
            nbr.withColumn("rk", F.row_number().over(w))
            .groupBy(F.col("src").alias("id"))
            .agg(F.max(F.least(F.col("rk"), F.col("cn"))).alias("h"))
        )
        plan = state.join(h.hint("shuffle_hash"), "id", "left").select(
            "id",
            F.least(F.col("c"), F.coalesce("h", F.lit(0))).cast("int").alias("c"),
            (F.least(F.col("c"), F.coalesce("h", F.lit(0))) < F.col("c")).alias(
                "_changed"
            ),
        )

        def finalize(st: DataFrame) -> dict:
            changed = st.filter("_changed").count()
            return {"converged": changed == 0, "changed": changed}

        return plan, finalize

    try:
        res = run_supersteps(init, body, max_rounds=max_iter)
    finally:
        edges.unpersist()
        und.unpersist()
    return res.state.select("id", F.col("c").alias("core"))


def _peel(edges: DataFrame, k: int, max_iter: int) -> DataFrame:
    """Peel until fixpoint (or max_iter); returns surviving edges."""
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    prev = edges.count()
    for _ in range(max_iter):
        deg = edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        keep = deg.filter(F.col("deg") >= k).select("id")
        nxt = (
            edges.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n = nxt.count()
        edges.unpersist()
        edges = nxt.persist(StorageLevel.MEMORY_AND_DISK)
        if n == prev:
            break
        prev = n
    return edges


@tuned_loop
def k_core(graph: Graph, k: int, max_iter: int = 10_000) -> DataFrame:
    """(id, in_core: boolean) — membership of the undirected k-core."""
    und = graph.to_undirected(dedup=True)
    surviving = _peel(und.edges.select("src", "dst"), k, max_iter)
    members = surviving.select(F.col("src").alias("id")).distinct()
    out = graph.vertices.select("id").join(
        members.withColumn("in_core", F.lit(True)), "id", "left"
    ).select("id", F.coalesce("in_core", F.lit(False)).alias("in_core"))
    und.unpersist()
    return out


@tuned_loop
def k_core_search(graph: Graph, k: int, max_iter: int = 10_000) -> DataFrame:
    """(id, d) — members of the undirected k-core with their RESIDUAL
    degree d (the degree within the core's induced subgraph), d >= k.

    Reference: ``apps/flash/core/k-core-search.h:42-63`` — init v.d =
    Deg(id); each round peels {v : d < k} and ``EdgeMapDense`` decrements
    the surviving neighbors' d; the answer is {v : d >= k} (``GlobalRes``
    is its size = this result's row count). A survivor's residual d equals
    its degree on the peel-fixpoint edge set, so one groupBy over
    :func:`_peel`'s output reproduces the flash per-vertex value without
    per-round decrement bookkeeping — same number of distributed rounds,
    one aggregation at the end instead of a decrement message per peel.
    """
    if k < 1:
        raise ValueError("k_core_search requires k >= 1 (k=0 is all vertices)")
    und = graph.to_undirected(dedup=True)
    surviving = _peel(und.edges.select("src", "dst"), k, max_iter)
    out = surviving.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("int").alias("d")
    )
    und.unpersist()
    return out


@tuned_loop
def k_shell(
    graph: Graph,
    max_k: int | None = None,
    max_iter: int = 10_000,
    mode: str = "hindex",
) -> DataFrame:
    """(id, shell) — largest k such that the vertex is in the k-core
    (== the core number).

    ``mode="hindex"`` (default): one :func:`core_numbers` run — O(few)
    supersteps total. ``mode="peel"``: the literal chained peel (one loop
    per k), kept as the semantics reference."""
    if mode == "hindex":
        out = core_numbers(graph, max_iter=max_iter)
        shell = F.col("core")
        if max_k is not None:
            shell = F.least(shell, F.lit(max_k))
        return out.select("id", shell.cast("int").alias("shell"))
    und = graph.to_undirected(dedup=True)
    edges = und.edges.select("src", "dst")
    shell = graph.vertices.select("id", F.lit(0).alias("shell"))
    shell = shell.persist(StorageLevel.MEMORY_AND_DISK)
    k = 1
    while True:
        edges = _peel(edges, k, max_iter)
        if edges.isEmpty():
            break
        members = edges.select(F.col("src").alias("id")).distinct()
        new_shell = (
            shell.join(members.withColumn("_m", F.lit(True)), "id", "left")
            .select(
                "id",
                F.when(F.col("_m").isNotNull(), k).otherwise(F.col("shell")).alias("shell"),
            )
            .localCheckpoint(eager=True)
        )
        shell.unpersist()
        shell = new_shell.persist(StorageLevel.MEMORY_AND_DISK)
        k += 1
        if max_k is not None and k > max_k:
            break
    und.unpersist()
    return shell.select("id", "shell")
