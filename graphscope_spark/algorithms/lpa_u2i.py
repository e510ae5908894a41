"""LPA-U2I — bipartite multi-label propagation (user→item→user).

Reference semantics (apps/lpa/lpa_u2i.h:80-245; python surface
app/lpa.py:57-84 ``lpa_u2i(g, max_round)``): U vertices carry a vector of
real-valued labels (anchored where the value is exactly 0 or 1); I vertices
start at 0. Rounds alternate:

* u2i (even steps): ``i.label[p] = Σ_{u→i} u.label[p]·w``        (:168-183)
* i2u (odd steps):  ``tmp[p] = Σ_{u→i} i.label[p]·w``; then
  ``u.label[p] = (tmp[p] − out_deg(u)·u.label[p]) /
                 (Σ_{u→i} in_deg(i) − out_deg(u))``
  unless the label is anchored (0/1) or the denominator is 0   (:199-233).

Spark rendering: labels live in LONG format (id, prop_id, value) so the
per-property sums are plain (key, prop) aggregations — no array UDFs, pure
whole-stage-codegen arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = ["lpa_u2i"]


def lpa_u2i(
    u_labels: DataFrame,
    edges: DataFrame,
    max_round: int = 10,
    weight_col: str | None = "weight",
) -> tuple[DataFrame, DataFrame]:
    """u_labels: (id, prop_id, value) anchored where value∈{0,1};
    edges: (u, i[, weight]). Returns (u_labels, i_labels) in long format
    after ``max_round`` alternating steps (step counting mirrors the
    reference: step 2 = first u2i, step 3 = first i2u, ...)."""
    spark = edges.sparkSession
    w = F.col(weight_col).cast("double") if weight_col and weight_col in edges.columns else F.lit(1.0)
    e = edges.select(F.col("u"), F.col("i"), w.alias("w")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out_deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("out_deg"))
    in_deg = e.groupBy("i").agg(F.count(F.lit(1)).alias("in_deg"))
    # Σ in-degree of out-neighbors, per u  (lpa_u2i.h:80-104)
    onids = (
        e.join(in_deg, "i")
        .groupBy("u")
        .agg(F.sum("in_deg").alias("onids"))
    )
    u_stats = out_deg.join(onids, "u").persist(StorageLevel.MEMORY_AND_DISK)

    u_lab = u_labels.select(
        F.col("id").alias("u"), "prop_id", F.col("value").cast("double")
    ).localCheckpoint(eager=True)
    i_lab = spark.createDataFrame([], "i long, prop_id int, value double")

    for step in range(2, max_round + 1):
        if step % 2 == 0:  # u2i
            i_lab = (
                e.join(u_lab, "u")
                .groupBy("i", "prop_id")
                .agg(F.sum(F.col("value") * F.col("w")).alias("value"))
                .localCheckpoint(eager=True)
            )
        else:  # i2u
            tmp = (
                e.join(i_lab, "i")
                .groupBy("u", "prop_id")
                .agg(F.sum(F.col("value") * F.col("w")).alias("tmp"))
            )
            joined = (
                u_lab.join(tmp, ["u", "prop_id"], "left")
                .join(u_stats, "u", "left")
            )
            anchored = (F.col("value") == 0.0) | (F.col("value") == 1.0)
            denom_ok = F.col("onids") != F.col("out_deg")
            new_val = F.when(anchored, F.col("value")).otherwise(
                F.when(
                    denom_ok,
                    (
                        F.coalesce("tmp", F.lit(0.0))
                        - F.col("out_deg") * F.col("value")
                    )
                    / (F.col("onids") - F.col("out_deg")),
                ).otherwise(F.col("value"))
            )
            u_lab = joined.select(
                "u", "prop_id", new_val.alias("value")
            ).localCheckpoint(eager=True)
    e.unpersist()
    u_stats.unpersist()
    return (
        u_lab.select(F.col("u").alias("id"), "prop_id", "value"),
        i_lab.select(F.col("i").alias("id"), "prop_id", "value"),
    )
