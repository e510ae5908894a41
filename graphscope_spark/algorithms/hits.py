"""HITS hubs & authorities (apps/hits/hits.h, run_app.h:377-385).

Mutual power iteration with per-round L1 normalization (the reference
follows the NetworkX formulation: normalize each vector by its sum when
``normalized=True``): auth ← Σ hub over in-edges, hub ← Σ auth over
out-edges; stop when Σ|Δauth| < tol or after ``max_round`` rounds.

Execution: normalization is DEFERRED — the state carries *raw* sums and the
driver carries the norm scalars, folding the division into the next phase's
plan (hub = H_raw/ΣH_raw is invariant to the auth-norm factor, so the factor
cancels; the affine-free algebra makes this exact). Each round is two
plan+finalize supersteps (auth phase, hub phase), each with exactly ONE
materialization and ONE scalar all-reduce — versus the naive 3 driver
collects + 2 persists per round (measured 2× faster at sf0.1).
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
    edges = (
        graph.edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # driver-carried norm scalars (grape::Communicator::Sum analogs)
    scal = {"sa": 1.0, "sh": 1.0, "eps": None}

    def init() -> DataFrame:
        v = graph.vertices.select("id")
        return v.select(
            "id",
            F.lit(1.0 / n).alias("a_raw"),
            F.lit(1.0 / n).alias("h_raw"),
            F.lit(1.0 / n).alias("auth_old"),
        ).repartition(P, "id")

    def body(state: DataFrame, superstep: int):
        phase_auth = superstep % 2 == 1

        if phase_auth:
            # auth_raw(v) = Σ_{u→v} hub(u); hub = h_raw/sh (scalar folded in)
            sh = scal["sh"]
            msg = (
                edges.join(
                    state.select("id", "h_raw").hint("shuffle_hash"),
                    edges.src == F.col("id"),
                )
                .groupBy("dst")
                .agg((F.sum("h_raw") / F.lit(sh)).alias("m"))
            )
            sa_prev = scal["sa"]
            plan = state.join(
                msg.hint("shuffle_hash"), state.id == msg.dst, "left"
            ).select(
                state.id.alias("id"),
                F.coalesce("m", F.lit(0.0)).alias("a_raw"),
                "h_raw",
                (F.col("a_raw") / F.lit(sa_prev)).alias("auth_old"),
            )

            def finalize(st: DataFrame) -> dict:
                s = st.agg(F.sum("a_raw")).collect()[0][0] or 0.0
                scal["sa"] = s if (normalized and s != 0) else 1.0
                return {"converged": False, "a_sum": s}

            return plan, finalize

        # hub phase: h_raw(u) = Σ_{u→v} a_raw(v) — the 1/sa factor cancels
        # inside hub's own normalization, so raw sums are exact here.
        msg = (
            edges.join(
                state.select(F.col("id").alias("_v"), "a_raw").hint("shuffle_hash"),
                edges.dst == F.col("_v"),
            )
            .groupBy("src")
            .agg(F.sum("a_raw").alias("m"))
        )
        plan = state.join(
            msg.hint("shuffle_hash"), state.id == msg.src, "left"
        ).select(
            state.id.alias("id"),
            "a_raw",
            F.coalesce("m", F.lit(0.0)).alias("h_raw"),
            "auth_old",
        )

        def finalize(st: DataFrame) -> dict:
            sa = scal["sa"]
            row = st.agg(
                F.sum("h_raw").alias("sh"),
                F.sum(F.abs(F.col("a_raw") / F.lit(sa) - F.col("auth_old"))).alias(
                    "eps"
                ),
            ).collect()[0]
            s = row["sh"] or 0.0
            scal["sh"] = s if (normalized and s != 0) else 1.0
            eps = row["eps"] or 0.0
            scal["eps"] = eps
            return {"converged": eps < tolerance, "eps": eps}

        return plan, finalize

    res = run_supersteps(init, body, max_rounds=2 * max_round)
    edges.unpersist()
    sa, sh = scal["sa"], scal["sh"]
    return res.state.select(
        "id",
        (F.col("h_raw") / F.lit(sh)).alias("hub"),
        (F.col("a_raw") / F.lit(sa)).alias("auth"),
    )
