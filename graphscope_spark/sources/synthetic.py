"""Deterministic synthetic edge tables for benchmarking.

Generated distributed (``spark.range`` + hash expressions, no driver data,
no Python row work) so the generator itself scales to any edge count. The
degree distribution is power-law-ish on the destination side (dst ∝ u²
quantile mapping) to reproduce the hub skew of real link graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["power_law_edges"]


def power_law_edges(
    spark: SparkSession,
    n_edges: int,
    n_vertices: int,
    seed: int = 42,
    skew: float = 2.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src, dst) — src uniform, dst power-law (hubs at low ids)."""
    parts = num_partitions or spark.sparkContext.defaultParallelism
    df = spark.range(0, n_edges, 1, parts)
    u1 = F.pmod(F.xxhash64(F.col("id") * 2 + F.lit(seed)), F.lit(1_000_003)) / 1_000_003.0
    u2 = F.pmod(F.xxhash64(F.col("id") * 2 + F.lit(seed + 1)), F.lit(1_000_003)) / 1_000_003.0
    src = F.floor(u1 * n_vertices).cast("long")
    dst = F.floor(F.pow(u2, skew) * n_vertices).cast("long")
    return (
        df.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
