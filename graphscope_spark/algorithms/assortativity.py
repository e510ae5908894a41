"""Assortativity + boundary one-shot aggregations.

Reference: ``apps/assortativity/*.h`` (attribute / degree / average-degree-
connectivity) and ``apps/boundary/*.h`` (node/edge boundary) — SURVEY.md
§2.2. All are single-pass AGG jobs: joint distributions via groupBy +
correlation expressions; boundaries via semi/anti joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph

__all__ = [
    "degree_assortativity",
    "attribute_assortativity",
    "average_degree_connectivity",
    "node_boundary",
    "edge_boundary",
]


def degree_assortativity(graph: Graph) -> float:
    """Pearson correlation of (out-degree(src), in-degree(dst)) over edges
    (the degree-mixing definition on directed graphs)."""
    outd = graph.out_degrees().withColumnRenamed("id", "src")
    ind = graph.in_degrees().withColumnRenamed("id", "dst")
    e = graph.edges.join(outd, "src").join(ind, "dst")
    # corr() raises DIVIDE_BY_ZERO under ANSI when a side has zero variance;
    # compute the pieces and guard on the driver.
    row = e.agg(
        F.covar_pop(
            F.col("out_degree").cast("double"), F.col("in_degree").cast("double")
        ).alias("cov"),
        F.stddev_pop(F.col("out_degree").cast("double")).alias("sx"),
        F.stddev_pop(F.col("in_degree").cast("double")).alias("sy"),
    ).collect()[0]
    if not row["sx"] or not row["sy"]:
        return float("nan")
    return float(row["cov"] / (row["sx"] * row["sy"]))


def attribute_assortativity(graph: Graph, attr: str) -> float:
    """Attribute assortativity coefficient (categorical): (tr(M) - ||M²||) /
    (1 - ||M²||) over the attribute mixing matrix M."""
    v = graph.vertices.select("id", F.col(attr).alias("_a"))
    e = (
        graph.edges.join(v.withColumnRenamed("id", "src").withColumnRenamed("_a", "_sa"), "src")
        .join(v.withColumnRenamed("id", "dst").withColumnRenamed("_a", "_da"), "dst")
    )
    m = e.groupBy("_sa", "_da").agg(F.count(F.lit(1)).alias("c"))
    total = m.agg(F.sum("c")).collect()[0][0]
    rows = m.collect()
    cats = sorted({r["_sa"] for r in rows} | {r["_da"] for r in rows})
    idx = {c: i for i, c in enumerate(cats)}
    import numpy as np

    M = np.zeros((len(cats), len(cats)))
    for r in rows:
        M[idx[r["_sa"]], idx[r["_da"]]] = r["c"] / total
    a = M.sum(axis=1)
    b = M.sum(axis=0)
    ab = float((a * b).sum())
    tr = float(np.trace(M))
    return (tr - ab) / (1 - ab) if ab != 1 else 1.0


def average_degree_connectivity(graph: Graph) -> DataFrame:
    """(degree, avg_nbr_degree): mean neighbor degree per degree class on
    the undirected simple graph."""
    und = graph.to_undirected(dedup=True)
    deg = und.edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    e = (
        und.edges.join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "sdeg"), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("ddeg")), "dst")
    )
    out = e.groupBy(F.col("sdeg").alias("degree")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ddeg").alias("sum_nbr_degree"),
        F.avg("ddeg").alias("avg_nbr_degree"),
    )
    und.unpersist()
    return out


def node_boundary(graph: Graph, s: DataFrame) -> DataFrame:
    """Vertices outside S with an in-edge from S (apps/boundary/node_boundary.h)."""
    sv = s.select("id")
    reached = (
        graph.edges.join(sv.withColumnRenamed("id", "src"), "src", "left_semi")
        .select(F.col("dst").alias("id"))
        .distinct()
    )
    return reached.join(sv, "id", "left_anti")


def edge_boundary(graph: Graph, s: DataFrame) -> DataFrame:
    """Edges from S to V∖S (apps/boundary/edge_boundary.h)."""
    sv = s.select("id")
    return (
        graph.edges.join(sv.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(sv.withColumnRenamed("id", "dst"), "dst", "left_anti")
        .select("src", "dst")
    )


def numeric_assortativity(graph: Graph, attr: str) -> float:
    """Numeric attribute assortativity: Pearson correlation of the numeric
    vertex attribute across edge endpoints (the reference client app
    numeric_assortativity_coefficient; NetworkX semantics)."""
    v = graph.vertices.select("id", F.col(attr).cast("double").alias("_x"))
    e = (
        graph.edges.join(
            v.withColumnRenamed("id", "src").withColumnRenamed("_x", "_sx"), "src"
        ).join(
            v.withColumnRenamed("id", "dst").withColumnRenamed("_x", "_dx"), "dst"
        )
    )
    row = e.agg(
        F.covar_pop("_sx", "_dx").alias("cov"),
        F.stddev_pop("_sx").alias("sx"),
        F.stddev_pop("_dx").alias("sy"),
    ).collect()[0]
    if not row["sx"] or not row["sy"]:
        return float("nan")
    return float(row["cov"] / (row["sx"] * row["sy"]))
