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
           "closeness_centrality"]


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
    P = graph.num_partitions
    n = graph.num_vertices
    edges = graph.edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)

    def init() -> DataFrame:
        return graph.vertices.select("id", F.lit(1.0 / n).alias("x")).repartition(
            P, "id"
        )

    def body(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        msgs = (
            edges.join(state.select("id", "x").hint("shuffle_hash"), edges.src == F.col("id"))
            .groupBy("dst")
            .agg(F.sum("x").alias("m"))
        )
        raw = alpha * F.coalesce(F.col("m"), F.lit(0.0)) + F.lit(update_base)
        tmp = (
            state.join(msgs.hint("shuffle_hash"), state.id == msgs.dst, "left")
            .select(state.id.alias("id"), raw.alias("raw"), F.col("x").alias("x_old"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        norm_row = tmp.agg(F.sqrt(F.sum(F.col("raw") * F.col("raw"))).alias("n2")).collect()[0]
        n2 = norm_row["n2"] or 1.0
        n2 = n2 if n2 != 0 else 1.0
        new_state = tmp.select(
            "id", (F.col("raw") / n2).alias("x"),
            F.abs(F.col("raw") / n2 - F.col("x_old")).alias("delta"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        eps = new_state.agg(F.sum("delta")).collect()[0][0] or 0.0
        tmp.unpersist()
        return new_state.select("id", "x"), {"converged": eps < n * tol, "eps": eps}

    res = run_supersteps(init, body, max_rounds=max_iter)
    edges.unpersist()
    return res.state


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


def closeness_centrality(graph: Graph, sources: list[int] | None = None) -> DataFrame:
    """(id, centrality) for the given vertex ids (default: all — expensive;
    the reference's closeness app is likewise a per-source BFS fan-out).
    Wasserman-Faust scaling: ((r-1)/(n-1)) · ((r-1)/Σdist), r = #reachable
    via *incoming* paths (distance measured on the reversed graph, matching
    NetworkX/GraphScope convention)."""
    from graphscope_spark.algorithms.traversal import sssp

    n = graph.num_vertices
    rev = graph.reverse()
    if sources is None:
        sources = [r["id"] for r in graph.vertices.select("id").collect()]
    rows = []
    for s in sources:
        d = sssp(rev, s, weight_col=None).filter(F.col("distance").isNotNull())
        agg = d.agg(F.sum("distance").alias("t"), F.count(F.lit(1)).alias("r")).collect()[0]
        tot, r = agg["t"], agg["r"]
        if tot and tot > 0 and n > 1:
            c = ((r - 1) / (n - 1)) * ((r - 1) / tot)
        else:
            c = 0.0
        rows.append((int(s), float(c)))
    rev.unpersist()
    return graph.spark.createDataFrame(rows, "id long, centrality double")
