"""Global subgraph counts: rectangles (C4), cyclic and tailed triangles.

Reference apps: ``apps/flash/subgraph/rectangle.h`` (4-cycle counting via
degree orientation), ``cyclic-triangle.h`` (directed 3-cycles),
``tailed-triangle.h`` (triangle + pendant edge). Each is computed here as
one declarative aggregate with a closed counting convention:

* rectangles — distinct 4-cycles of the simple undirected graph:
  ``Σ_{u<w} C(λ(u,w), 2) / 2`` (λ = #common neighbors; each cycle is seen
  once per diagonal pair, hence /2).
* cyclic_triangles — distinct directed 3-cycles: closed 3-walks over
  distinct vertices / 3 (each cycle counted once per rotation).
* tailed_triangles — (triangle, pendant-edge) pairs:
  ``Σ_v tri(v) · (deg_und(v) − 2)``.

All three shuffle Σdeg² wedge rows at worst — the same bound as the
triangle kernel; hub skew is handled by the same map-side partial
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph

__all__ = [
    "rectangles",
    "cyclic_triangles",
    "tailed_triangles",
    "directed_triangle_census",
]


def rectangles(graph: Graph) -> DataFrame:
    """One row ``(n)`` — the number of distinct 4-cycles."""
    und = graph.to_undirected(dedup=True)
    e = und.edges.select("src", "dst")
    pairs = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.src") == F.col("y.src"))
        .filter(F.col("x.dst") < F.col("y.dst"))
        .select(F.col("x.dst").alias("u"), F.col("y.dst").alias("w"))
    )
    lam = pairs.groupBy("u", "w").agg(F.count(F.lit(1)).alias("lam"))
    # Σ λ(λ−1) is exactly 4·#C4 — stay in integer arithmetic end-to-end
    out = lam.agg(
        F.floor(F.sum(F.col("lam") * (F.col("lam") - 1)) / 4)
        .cast("long")
        .alias("n")
    )
    und.unpersist()
    return out


def cyclic_triangles(graph: Graph) -> DataFrame:
    """One row ``(n)`` — the number of distinct directed 3-cycles."""
    e = graph.edges.select("src", "dst")
    walks = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
        .join(
            e.alias("e3"),
            (F.col("e2.dst") == F.col("e3.src"))
            & (F.col("e3.dst") == F.col("e1.src")),
        )
    )
    return walks.agg(F.floor(F.count(F.lit(1)) / 3).cast("long").alias("n"))


def directed_triangle_census(graph: Graph) -> DataFrame:
    """One row ``(acyclic, in_tri, out_tri, cycle_plus)`` — the reference's
    four directed-triangle apps, each a set-intersection sum the headers
    define, here as wedge equijoins:

    * acyclic  (acyclic-triangle.h):  Σ_{(u,v)∈E} |out(u) ∩ out(v)| —
      transitive triangles u→v, u→x, v→x, counted per edge (reciprocal
      edges count both orders, as the header does).
    * in_tri   (in-triangle.h):       Σ over mutual pairs {u,v} (oriented
      once): |out(u) ∩ out(v)| — the common target x has two in-edges.
    * out_tri  (out-triangle.h):      Σ over mutual pairs {u,v}:
      |in(u) ∩ in(v)| — the common source x has two out-edges.
    * cycle_plus (cycle-plus-triangle.h): Σ over ORDERED mutual edges
      (s,d): |in(s) ∩ out(d)| — a directed 3-cycle d→x→s→d riding on the
      reciprocal edge d→s.

    The headers orient mutual pairs by (degree, id) priority; the
    intersection is symmetric in the pair, so the totals are orientation-
    independent — we orient by id. All joins shuffle at most Σdeg² wedge
    rows, the triangle-kernel bound.
    """
    e = graph.edges.select("src", "dst").distinct()
    acyclic = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e2.src") == F.col("e1.src"))
        .join(
            e.alias("e3"),
            (F.col("e3.src") == F.col("e1.dst"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("acyclic"))
    )
    mutual = (
        e.alias("a")
        .join(
            e.alias("b"),
            (F.col("b.src") == F.col("a.dst")) & (F.col("b.dst") == F.col("a.src")),
        )
        .select(F.col("a.src").alias("u"), F.col("a.dst").alias("v"))
    )
    pairs = mutual.filter(F.col("u") > F.col("v"))
    in_tri = (
        pairs.join(e.alias("e2"), F.col("e2.src") == F.col("u"))
        .join(
            e.alias("e3"),
            (F.col("e3.src") == F.col("v"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("in_tri"))
    )
    out_tri = (
        pairs.join(e.alias("e2"), F.col("e2.dst") == F.col("u"))
        .join(
            e.alias("e3"),
            (F.col("e3.dst") == F.col("v"))
            & (F.col("e3.src") == F.col("e2.src")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("out_tri"))
    )
    cycle_plus = (
        mutual.join(e.alias("e2"), F.col("e2.dst") == F.col("u"))  # x→s
        .join(
            e.alias("e3"),
            (F.col("e3.src") == F.col("v"))
            & (F.col("e3.dst") == F.col("e2.src")),  # d→x
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cycle_plus"))
    )
    return acyclic.crossJoin(in_tri).crossJoin(out_tri).crossJoin(cycle_plus)


def tailed_triangles(graph: Graph) -> DataFrame:
    """One row ``(n)`` — (triangle, pendant edge) pairs."""
    from graphscope_spark.algorithms.triangles import triangles

    tri = triangles(graph)
    und = graph.to_undirected(dedup=True)
    deg = und.edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    out = (
        tri.join(deg, "id", "left")
        .select(
            (
                F.col("triangles")
                * F.greatest(F.coalesce("deg", F.lit(0)) - 2, F.lit(0))
            ).alias("t")
        )
        .agg(F.sum("t").cast("long").alias("n"))
    )
    und.unpersist()
    return out
