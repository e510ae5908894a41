"""Worst-case-optimal-style expand-intersect.

Reference: the GIE ``ExpandIntersect`` operator
(interactive_engine/executor/ir/runtime/src/process/operator/map/
expand_intersect.rs) used by the ``ExtendIntersectRule`` CBO plan: when a
pattern binds a NEW vertex adjacent to SEVERAL already-bound vertices, a
binary-join plan first materializes the full extension of one edge and then
filters — growth can exceed the output bound. The WCO form intersects the
adjacency LISTS of all bound endpoints first and explodes only the
intersection, keeping intermediates within the certificate size
(Ngo et al., "Worst-case Optimal Join Algorithms", PODS'12 — public).

Spark rendering: adjacency grouped once per direction into sorted arrays;
per bound tag one equijoin attaches its neighbor array; ``array_intersect``
chains JVM-side; one ``explode`` binds the new tag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["adjacency_lists", "expand_intersect"]


def adjacency_lists(edges: DataFrame, direction: str = "out") -> DataFrame:
    """(id, nbrs: sorted array<long>) for the requested direction."""
    e = edges.select("src", "dst")
    if direction == "in":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "both":
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    elif direction != "out":
        raise ValueError(f"direction must be out/in/both, got {direction!r}")
    return e.groupBy(F.col("src").alias("id")).agg(
        F.sort_array(F.collect_set("dst")).alias("nbrs")
    )


def expand_intersect(
    bindings: DataFrame,
    adj: DataFrame | list[DataFrame],
    bound_tags: list[str],
    new_tag: str,
) -> DataFrame:
    """Extend every binding row with ``new_tag`` = each vertex adjacent to
    ALL of ``bound_tags`` (adjacency from :func:`adjacency_lists`; pass a
    list to use a different direction's adjacency per tag).

    One equijoin per bound tag + chained ``array_intersect`` + one explode —
    no per-edge intermediate larger than the output."""
    if not bound_tags:
        raise ValueError("need at least one bound tag")
    adjs = adj if isinstance(adj, list) else [adj] * len(bound_tags)
    if len(adjs) != len(bound_tags):
        raise ValueError("one adjacency per bound tag")
    out = bindings
    cur = None
    for i, (t, a) in enumerate(zip(bound_tags, adjs)):
        nb = f"_nbrs{i}"
        out = out.join(
            a.select(F.col("id").alias(t), F.col("nbrs").alias(nb)), t
        )
        cur = F.col(nb) if cur is None else F.array_intersect(cur, F.col(nb))
    keep = [c for c in bindings.columns]
    return out.select(*keep, F.explode(cur).alias(new_tag))
