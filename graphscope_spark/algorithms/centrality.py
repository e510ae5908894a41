"""Centralities: degree, eigenvector, Katz, closeness.

Reference inventory (SURVEY.md §2.2):
* degree — apps/centrality/degree/degree_centrality.h (run_app.h:418-426;
  type in/out/both, value = degree / (N-1)). One-shot AGG.
* eigenvector — apps/centrality/eigenvector/eigenvector_centrality.h:
  power iteration x ← Aᵀx, L2-normalized, tol on Σ|Δ|·... (we use
  Σ|Δ| < n·tol like the reference family).
* katz — apps/centrality/katz/katz_centrality.h: x ← α·Aᵀx + β, L2 norm.
* closeness — apps/centrality/closeness/closeness_centrality.h:
  1/Σdist over reachable, scaled by reachable fraction (Wasserman-Faust);
  exact per-source SSSP fan-out — O(V) runs, offered for small vertex sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.engine.superstep import run_supersteps
from graphscope_spark.graph.graph import Graph

__all__ = ["degree_centrality", "eigenvector_centrality", "katz_centrality",
           "closeness_centrality", "harmonic_centrality"]


def degree_centrality(graph: Graph, degree_type: str = "both") -> DataFrame:
    """(id, centrality): degree/(N-1); type ∈ {in, out, both}."""
    n = graph.num_vertices
    denom = float(max(n - 1, 1))
    outd = graph.out_degrees()
    ind = graph.in_degrees()
    if degree_type == "out":
        deg = outd.select("id", F.col("out_degree").alias("d"))
    elif degree_type == "in":
        deg = ind.select("id", F.col("in_degree").alias("d"))
    else:
        deg = outd.join(ind, "id").select(
            "id", (F.col("out_degree") + F.col("in_degree")).alias("d")
        )
    return deg.select("id", (F.col("d") / denom).alias("centrality"))


def _power_iteration(
    graph: Graph, update_base, alpha: float, max_iter: int, tol: float
) -> DataFrame:
    """x ← (α·Aᵀx + β) / ||·||₂ with DEFERRED normalization: the state holds
    raw (pre-division) values, the driver carries the L2-norm scalar, and the
    division folds into the next round's plan as α' = α/n2 — one
    materialization + one scalar all-reduce per round (plan+finalize
    protocol), plus a second cheap scan over the materialized state for the
    tolerance test only when tol > 0."""
    P = graph.num_partitions
    n = graph.num_vertices
    edges = (
        graph.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    scal = {"n2": 1.0}

    def init() -> DataFrame:
        return graph.vertices.select(
            "id", F.lit(1.0 / n).alias("raw")
        ).repartition(P, "id")

    def body(state: DataFrame, rnd: int):
        n2_prev = scal["n2"]
        msgs = (
            edges.join(
                state.select("id", "raw").hint("shuffle_hash"),
                edges.src == F.col("id"),
            )
            .groupBy("dst")
            .agg(F.sum("raw").alias("m"))
        )
        new_raw = (
            F.lit(alpha / n2_prev) * F.coalesce(F.col("m"), F.lit(0.0))
            + F.lit(update_base)
        )
        plan = state.join(
            msgs.hint("shuffle_hash"), state.id == msgs.dst, "left"
        ).select(
            state.id.alias("id"),
            new_raw.alias("raw"),
            (F.col("raw") / F.lit(n2_prev)).alias("x_old"),
        )

        def finalize(st: DataFrame) -> dict:
            n2 = (
                st.agg(F.sqrt(F.sum(F.col("raw") * F.col("raw")))).collect()[0][0]
                or 1.0
            )
            scal["n2"] = n2 if n2 != 0 else 1.0
            if tol <= 0:
                return {"converged": False, "n2": n2}
            eps = (
                st.agg(
                    F.sum(F.abs(F.col("raw") / F.lit(scal["n2"]) - F.col("x_old")))
                ).collect()[0][0]
                or 0.0
            )
            return {"converged": eps < n * tol, "eps": eps, "n2": n2}

        return plan, finalize

    res = run_supersteps(init, body, max_rounds=max_iter)
    edges.unpersist()
    return res.state.select("id", (F.col("raw") / F.lit(scal["n2"])).alias("x"))


def eigenvector_centrality(
    graph: Graph, max_iter: int = 100, tol: float = 1e-6
) -> DataFrame:
    """(id, centrality), L2-normalized dominant eigenvector of Aᵀ."""
    out = _power_iteration(graph, update_base=0.0, alpha=1.0, max_iter=max_iter, tol=tol)
    return out.select("id", F.col("x").alias("centrality"))


def katz_centrality(
    graph: Graph,
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iter: int = 100,
    tol: float = 1e-6,
) -> DataFrame:
    """(id, centrality): x = α·Aᵀx + β, L2-normalized."""
    out = _power_iteration(graph, update_base=beta, alpha=alpha, max_iter=max_iter, tol=tol)
    return out.select("id", F.col("x").alias("centrality"))


def closeness_centrality(
    graph: Graph,
    sources: list[int] | DataFrame | None = None,
    max_all_vertices: int = 65_536,
) -> DataFrame:
    """(id, centrality) for the given vertex ids — ONE composite-state
    multi-source BFS for the whole batch (diameter rounds total, not
    |sources| × diameter jobs; engine/multisource.py). Wasserman-Faust
    scaling: ((r-1)/(n-1)) · ((r-1)/Σdist), r = #reachable via *incoming*
    paths (distance on reversed edges, matching NetworkX/GraphScope —
    reference apps/centrality/closeness/closeness_centrality.h).

    ``sources=None`` computes all vertices, refused above
    ``max_all_vertices`` (exact all-sources closeness is O(V·E) work by any
    algorithm — pass an explicit sample at scale).
    """
    from graphscope_spark.engine.multisource import multi_source_bfs

    n = graph.num_vertices
    if sources is None:
        if n > max_all_vertices:
            raise ValueError(
                f"closeness over all {n} vertices is O(V*E); pass an explicit "
                "sources list/DataFrame (e.g. a seeded sample) at this scale"
            )
        sources = graph.vertices.select(F.col("id").alias("source"))
    dist = multi_source_bfs(graph, sources, reverse=True)
    st = dist.groupBy("source").agg(
        F.count(F.lit(1)).alias("r"), F.sum("depth").cast("double").alias("tot")
    )
    c = F.when(
        (F.col("tot") > 0) & (F.lit(n) > 1),
        ((F.col("r") - 1) / F.lit(float(n - 1)))
        * ((F.col("r") - 1) / F.col("tot")),
    ).otherwise(0.0)
    return st.select(F.col("source").alias("id"), c.alias("centrality"))


def harmonic_centrality(
    graph: Graph,
    sources: list[int] | DataFrame | None = None,
    max_all_vertices: int = 65_536,
) -> DataFrame:
    """(id, centrality): H(v) = Σ_{s ∈ sources, s≠v} 1/d(s, v) over the
    UNDIRECTED graph — the accumulation of the reference's
    ``apps/flash/centrality/harmonic.h:73-84`` (``d.val += 1.0/i`` when
    vertex ``d`` is first reached at BFS level ``i`` from a sampled source),
    made deterministic by taking an explicit source batch instead of the
    reference's ``rand_r`` sample. One composite-state multi-source BFS for
    the whole batch (engine/multisource.py): diameter rounds total.

    ``sources=None`` uses every vertex (exact harmonic centrality), refused
    above ``max_all_vertices`` — at scale pass a seeded sample, as the
    reference does (n_sample=500).
    """
    from graphscope_spark.engine.multisource import multi_source_bfs

    n = graph.num_vertices
    if sources is None:
        if n > max_all_vertices:
            raise ValueError(
                f"harmonic over all {n} vertices is O(V*E); pass an explicit "
                "sources list/DataFrame (seeded sample) at this scale"
            )
        sources = graph.vertices.select(F.col("id").alias("source"))
    und = graph.to_undirected(dedup=True)
    dist = multi_source_bfs(und, sources)
    h = (
        dist.filter(F.col("depth") > 0)
        .groupBy("id")
        .agg(F.sum(F.lit(1.0) / F.col("depth")).alias("centrality"))
    )
    out = graph.vertices.select("id").join(h, "id", "left").select(
        "id", F.coalesce(F.col("centrality"), F.lit(0.0)).alias("centrality")
    )
    und.unpersist()
    return out
