"""HITS hubs & authorities (apps/hits/hits.h, run_app.h:377-385).

Mutual power iteration with per-round L1 normalization (the reference
follows the NetworkX formulation: normalize each vector by its sum when
``normalized=True``): auth ← Σ hub over in-edges, hub ← Σ auth over
out-edges; stop when Σ|Δauth| < tol or after ``max_round`` rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.engine.superstep import run_supersteps
from graphscope_spark.graph.graph import Graph

__all__ = ["hits"]


def hits(
    graph: Graph,
    tolerance: float = 1e-8,
    max_round: int = 100,
    normalized: bool = True,
) -> DataFrame:
    """Returns ``(id, hub, auth)``."""
    P = graph.num_partitions
    n = graph.num_vertices
    edges = graph.edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)

    def init() -> DataFrame:
        return graph.vertices.select(
            "id", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
        ).repartition(P, "id")

    def body(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        # auth(v) = Σ hub(u) over u→v
        a_msg = (
            edges.join(state.select("id", "hub").hint("shuffle_hash"), edges.src == F.col("id"))
            .groupBy("dst")
            .agg(F.sum("hub").alias("a"))
        )
        mid = (
            state.join(a_msg.hint("shuffle_hash"), state.id == a_msg.dst, "left")
            .select("id", "hub", F.coalesce("a", F.lit(0.0)).alias("auth_raw"),
                    F.col("auth").alias("auth_old"))
        )
        a_sum = mid.agg(F.sum("auth_raw")).collect()[0][0] or 1.0
        a_norm = a_sum if (normalized and a_sum != 0) else 1.0
        mid = mid.select(
            "id", "hub", (F.col("auth_raw") / a_norm).alias("auth"), "auth_old"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        # hub(u) = Σ auth(v) over u→v
        h_msg = (
            edges.join(mid.select(F.col("id").alias("_v"), F.col("auth").alias("_a")).hint("shuffle_hash"),
                       edges.dst == F.col("_v"))
            .groupBy("src")
            .agg(F.sum("_a").alias("h"))
        )
        new_state = (
            mid.join(h_msg.hint("shuffle_hash"), mid.id == h_msg.src, "left")
            .select(mid.id.alias("id"),
                    F.coalesce("h", F.lit(0.0)).alias("hub_raw"),
                    "auth", "auth_old")
        )
        h_sum = new_state.agg(F.sum("hub_raw")).collect()[0][0] or 1.0
        h_norm = h_sum if (normalized and h_sum != 0) else 1.0
        new_state = new_state.select(
            "id", (F.col("hub_raw") / h_norm).alias("hub"), "auth",
            F.abs(F.col("auth") - F.col("auth_old")).alias("delta"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        eps = new_state.agg(F.sum("delta")).collect()[0][0] or 0.0
        mid.unpersist()
        return new_state.select("id", "hub", "auth"), {
            "converged": eps < tolerance,
            "eps": eps,
        }

    res = run_supersteps(init, body, max_rounds=max_round)
    edges.unpersist()
    return res.state.select("id", "hub", "auth")
