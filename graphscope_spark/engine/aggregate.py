"""Skew-aware aggregation helpers.

The north rule calls for "salted hash-shuffle of frontier messages with
explicit skew splitting for hub vertices". Context on when that matters in
Spark: for *algebraic* aggregates (sum/min/max/count) Spark already performs
map-side partial aggregation, so a hub destination receives one partial row
per upstream task, not one row per edge — the classic MPI-combiner behavior
(grape's message combine). Salting is the explicit second line of defense
for (a) holistic aggregates (collect_list/mode) where partial aggregation
still materializes per-key rows, and (b) extreme hubs where even
one-row-per-task fan-in is unbalanced.

``salted_agg`` does the two-level combine: partial by (key, salt), final by
key. Salt is derived from the *other* endpoint so it is deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "with_salt"]


def with_salt(df: DataFrame, from_col: str, buckets: int, out: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, buckets) derived from an existing column."""
    return df.withColumn(out, F.pmod(F.xxhash64(F.col(from_col)), F.lit(buckets)))


def salted_agg(
    df: DataFrame,
    key: str,
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    salt_from: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-level aggregation: groupBy(key, salt).agg(partial) →
    groupBy(key).agg(final).

    ``partial_aggs`` aggregate raw rows into per-(key, salt) partials; each
    must ``.alias(...)`` a name that ``final_aggs`` then re-aggregates. E.g.
    sum: partial ``sum(x).alias("s")``, final ``sum("s").alias("s")``.
    """
    salted = with_salt(df, salt_from, buckets)
    partial = salted.groupBy(key, "_salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)
