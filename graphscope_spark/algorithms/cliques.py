"""k-clique enumeration (apps/flash/subgraph/k-clique.h analog).

Degree-then-id orientation (the same O(√m)-out-degree trick as
triangles.py) turns every clique into exactly one rank-ordered tuple, so the
enumeration is an iterative oriented-edge extension: a (j-1)-clique extends
by a candidate that the LAST member points to, validated against the other
members with semi-joins. No worst-case-optimal intersect operator, but the
orientation bounds the extension fan-out the same way it bounds the wedge
join — the standard distributed clique-listing plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph.graph import Graph
from graphscope_spark.engine.tuning import tuned_loop

__all__ = ["k_cliques", "count_k_cliques"]


@tuned_loop
def k_cliques(graph: Graph, k: int) -> DataFrame:
    """DataFrame with one row per k-clique: ``vs`` = array<long> of the k
    members in orientation (degree, id) rank order. k ≥ 2."""
    if k < 2:
        raise ValueError("k must be ≥ 2")
    from graphscope_spark.algorithms.triangles import _oriented

    oriented, _ = _oriented(graph)
    oriented = oriented.persist(StorageLevel.MEMORY_AND_DISK)
    cur = oriented.select(
        F.array("src", "dst").alias("vs"), F.col("dst").alias("last")
    )
    for size in range(3, k + 1):
        ext = cur.join(
            oriented.select(
                F.col("src").alias("last"), F.col("dst").alias("cand")
            ),
            "last",
        )
        # candidate must be oriented-adjacent to every earlier member too
        for i in range(size - 2):
            probe = oriented.select(
                F.col("src").alias(f"_a{i}"), F.col("dst").alias(f"_b{i}")
            )
            ext = ext.join(
                probe,
                (F.element_at("vs", i + 1) == F.col(f"_a{i}"))
                & (F.col("cand") == F.col(f"_b{i}")),
                "left_semi",
            )
        cur = ext.select(
            F.concat("vs", F.array("cand")).alias("vs"),
            F.col("cand").alias("last"),
        )
    out = cur.select("vs")
    return out


def count_k_cliques(graph: Graph, k: int) -> int:
    return k_cliques(graph, k).count()
