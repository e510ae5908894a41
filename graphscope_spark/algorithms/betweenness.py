"""Betweenness centrality — batched Brandes over composite state.

Reference: ``apps/centrality/betweenness/*.h`` (SURVEY §2.2 — "Brandes via
per-source BFS fan-out; expensive"). Exact betweenness is O(V·E) *work* by
any algorithm, but it need not be O(V·diameter) *Spark jobs*: the whole
source batch runs as ONE composite-state forward BFS carrying σ per
(source, id) and ONE per-depth-level backward δ sweep
(engine/multisource.py::multi_source_brandes) — ≈ 2·diameter jobs total,
independent of |sources|.

``sources=None`` (exact) is allowed only on small graphs; at scale pass a
seeded sample (the standard Brandes approximation — scores scale by
n/|sources|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph
from graphscope_spark.engine.tuning import tuned_loop

__all__ = ["betweenness_centrality"]


@tuned_loop
def betweenness_centrality(
    graph: Graph,
    sources: list[int] | DataFrame | None = None,
    normalized: bool = True,
    max_depth: int = 10_000,
    max_all_vertices: int = 16_384,
) -> DataFrame:
    """(id, centrality). Directed Brandes; when sampling, scores are scaled
    by n/|sources|."""
    n = graph.num_vertices
    if sources is None:
        if n > max_all_vertices:
            raise ValueError(
                f"exact betweenness over all {n} vertices is O(V*E); pass an "
                "explicit sources sample at this scale"
            )
        sources = graph.vertices.select(F.col("id").alias("source"))
        n_sources = n
    elif isinstance(sources, DataFrame):
        n_sources = sources.count()
    else:
        n_sources = len(sources)

    from graphscope_spark.engine.multisource import multi_source_brandes

    acc = multi_source_brandes(graph, sources, max_depth=max_depth)

    scale = 1.0
    if n_sources < n:
        scale *= n / n_sources
    if normalized and n > 2:
        scale /= (n - 1) * (n - 2)
    return (
        graph.vertices.select("id")
        .join(acc, "id", "left")
        .select(
            "id",
            (F.coalesce("score", F.lit(0.0)) * F.lit(scale)).alias("centrality"),
        )
    )
