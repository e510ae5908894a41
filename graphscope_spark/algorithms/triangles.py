"""Triangle counting, LCC, transitivity, average clustering.

Semantics of the reference's ``apps/clustering/triangles.h:43-158``: on the
undirected simple graph (self-loops and duplicate edges removed), orient each
edge u→v iff ``(deg(u), id(u)) < (deg(v), id(v))`` (:78-91 — the classic
degree-then-id orientation that caps oriented out-degree at O(√m)), count
common oriented neighbors per oriented edge (:119-139), and credit all three
corners (:129-131). One-shot DataFrame job, no iteration:

    oriented  = edges where rank(src) < rank(dst)       (≈ m/2 rows)
    wedges    = oriented ⋈ oriented on shared src       (Σ deg_o(v)² rows)
    triangles = wedges ⋉ oriented                       (semi-join closes the
                                                         third edge)
    counts    = explode 3 corners → groupBy(id).count

The wedge self-join is the heavy operator; the orientation bounds it exactly
as in the reference (SURVEY.md §7.3 risk 4). LCC divides by deg·(deg−1)/2
(apps/clustering/clustering.h), transitivity is 3·closed/open triples, and
avg_clustering the vertex mean (apps/clustering/avg_clustering.h,
transitivity.h).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph.graph import Graph

__all__ = ["triangles", "lcc", "transitivity", "avg_clustering"]


def _oriented(graph: Graph) -> tuple[DataFrame, DataFrame]:
    """(oriented_edges(src,dst), degrees(id, degree)) on the simple graph."""
    und = graph.to_undirected(dedup=True)
    deg = und.edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    e = (
        und.edges.join(deg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("degree", "sdeg")
        .join(
            deg.select(F.col("id").alias("dst"), F.col("degree").alias("ddeg")),
            "dst",
        )
    )
    oriented = e.filter(
        (F.col("sdeg") < F.col("ddeg"))
        | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst")
    return oriented, deg


def triangle_corners(graph: Graph) -> DataFrame:
    """All triangles as (a, b, c) corner triples (internal helper)."""
    oriented, _ = _oriented(graph)
    oriented = oriented.persist(StorageLevel.MEMORY_AND_DISK)
    w1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    w2 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    # Each unordered out-neighbor pair {v,w} of u appears in both orders;
    # exactly one order matches the rank-oriented closing edge, so each
    # triangle survives the semi-join exactly once.
    wedges = w1.join(w2, "u").filter(F.col("v") != F.col("w"))
    tri = wedges.join(
        oriented.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
        "left_semi",
    )
    return tri.select(F.col("u").alias("a"), F.col("v").alias("b"), F.col("w").alias("c"))


def triangles(graph: Graph) -> DataFrame:
    """Per-vertex triangle counts: ``(id, triangles)``, zeros included."""
    tri = triangle_corners(graph).persist(StorageLevel.MEMORY_AND_DISK)
    corners = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    out = graph.vertices.select("id").join(counts, "id", "left").select(
        "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )
    return out


def lcc(graph: Graph) -> DataFrame:
    """Local clustering coefficient: ``(id, lcc)``; 0 when degree < 2."""
    und = graph.to_undirected(dedup=True)
    deg = und.edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    tc = triangles(graph)
    pairs = (F.col("degree") * (F.col("degree") - 1) / 2.0)
    return (
        tc.join(deg, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce("degree", F.lit(0)) >= 2,
                F.col("triangles") / pairs,
            )
            .otherwise(0.0)
            .alias("lcc"),
        )
    )


def transitivity(graph: Graph) -> float:
    """Global transitivity = 3·triangles / open+closed triples."""
    und = graph.to_undirected(dedup=True)
    deg = und.edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    triples = deg.agg(
        F.sum(F.col("degree") * (F.col("degree") - 1) / 2.0).alias("t")
    ).collect()[0]["t"]
    n_tri = triangle_corners(graph).count()
    return (3.0 * n_tri / triples) if triples else 0.0


def avg_clustering(graph: Graph) -> float:
    """Mean LCC over all vertices."""
    row = lcc(graph).agg(F.avg("lcc").alias("a")).collect()[0]
    return float(row["a"] or 0.0)
