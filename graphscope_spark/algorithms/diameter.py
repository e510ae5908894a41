"""Approximate diameter — deterministic double sweep.

Reference: ``apps/flash/measurement/diameter-approx*.h`` (SURVEY §2.2 FLASH
suite). Two BFS sweeps on the undirected graph: from a start vertex to its
farthest vertex u (ties broken by min id), then from u; the eccentricity of
u is a lower bound on the diameter that is exact on trees and within a small
factor in practice. 2 × diameter supersteps total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph
from graphscope_spark.engine.tuning import tuned_loop

__all__ = ["diameter_approx"]


@tuned_loop
def diameter_approx(graph: Graph, start: int | None = None) -> DataFrame:
    """One row ``(start, far, diameter_lb)``: far = farthest vertex from
    ``start`` (min id on ties), diameter_lb = eccentricity of ``far``.
    Sweeps run in ``start``'s component only."""
    from graphscope_spark.engine.multisource import multi_source_bfs

    und = graph.to_undirected(dedup=True)
    if start is None:
        start = graph.vertices.agg(F.min("id")).collect()[0][0]
    b1 = multi_source_bfs(und, [int(start)])
    far_row = (
        b1.orderBy(F.col("depth").desc(), F.col("id").asc()).limit(1).collect()[0]
    )
    far = int(far_row["id"])
    b2 = multi_source_bfs(und, [far])
    ecc = b2.agg(F.max("depth")).collect()[0][0] or 0
    und.unpersist()
    return graph.spark.createDataFrame(
        [(int(start), far, int(ecc))], "start long, far long, diameter_lb long"
    )
