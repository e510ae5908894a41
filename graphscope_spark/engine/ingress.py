"""Ingress-style incremental recomputation for monotone kernels.

Reference: ``docs/analytical_engine/ingress.md`` — GraphScope's Ingress
engine re-runs an iterative app on a *delta* of the input instead of from
scratch, exploiting that for monotone kernels (wcc / sssp / bfs under edge
ADDITION) the converged state remains a valid lower/upper bound: adding
edges can only merge components, shorten distances, or shallow depths, so
resuming the fixpoint with the new edges' endpoints as the frontier reaches
exactly the full-recompute answer in rounds proportional to how far the
delta's effect propagates.

Each function takes the BASE graph, the new edge rows, and the converged
base output (the kernel's own result schema) and returns the same schema
the full kernel would produce on ``graph.add_edges(new_edges)`` —
bit-for-bit (see tests/test_ingress.py).

Deletions are NOT monotone (a removed edge can invalidate arbitrarily much
of the converged state). For sssp/bfs/pagerank the reference handles that
case with full recomputation, and so do we — callers should re-run the
kernel on the mutated graph. For WCC, deletion-delta IS tractable without
monotonicity: an edge deletion can only affect the component(s) its
endpoints belong to, so :func:`wcc_delta_delete` recomputes ONLY those
components' induced subgraphs and keeps every other label untouched —
bit-for-bit equal to a full recompute because both label a component by
its minimum vertex id. Worst case (delta touches the giant component)
degrades gracefully to ~full recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph

__all__ = [
    "wcc_delta",
    "wcc_delta_delete",
    "sssp_delta",
    "bfs_delta",
    "pagerank_delta",
]


def _endpoints(new_edges: DataFrame, side: str | None = None) -> DataFrame:
    if side == "src":
        e = new_edges.select(F.col("src").cast("long").alias("id"))
    else:
        e = new_edges.select(F.col("src").cast("long").alias("id")).unionByName(
            new_edges.select(F.col("dst").cast("long").alias("id"))
        )
    return e.distinct().withColumn("_touched", F.lit(True))


def wcc_delta(
    graph: Graph,
    new_edges: DataFrame,
    prev_components: DataFrame,
    max_iter: int = 200,
    mode: str = "dataframe",
) -> DataFrame:
    """``(id, component)`` over ``graph.add_edges(new_edges)``, resumed from
    the converged base labeling ``prev_components`` (id, component).

    Seeds: every delta-edge endpoint (labels may merge across the new edge)
    plus vertices the delta introduced (labeled with their own id)."""
    from graphscope_spark.algorithms.wcc import wcc

    g2 = graph.add_edges(new_edges)
    prev = prev_components.select(
        "id", F.col("component").cast("long").alias("label")
    )
    state = (
        g2.vertices.select("id")
        .join(prev, "id", "left")
        .join(_endpoints(new_edges), "id", "left")
        .select(
            "id",
            F.coalesce("label", F.col("id")).alias("label"),
            (F.col("_touched").isNotNull() | F.col("label").isNull()).alias(
                "changed"
            ),
        )
    )
    return wcc(g2, max_iter=max_iter, mode=mode, warm_start=state)


def wcc_delta_delete(
    graph: Graph,
    del_edges: DataFrame,
    prev_components: DataFrame,
    max_iter: int = 200,
    mode: str = "dataframe",
) -> DataFrame:
    """``(id, component)`` over ``graph.remove_edges(del_edges)`` — the
    deletion side of Ingress WCC maintenance (reference:
    docs/analytical_engine/ingress.md; the reference recomputes in full).

    A deleted edge can only SPLIT the component that contained it, never
    affect any other, so: (1) mark the components touched by any deleted
    edge's endpoint, (2) re-run WCC on just their induced subgraph (every
    surviving edge stays inside its original component, so filtering edges
    by the src endpoint's old label is exact), (3) keep every untouched
    vertex's label as-is. Labels are the component-minimum vertex id in
    both the full and the induced run, so the union is bit-for-bit the
    full-recompute answer.

    Scale shape: two broadcast-size semi-joins against the (usually tiny)
    affected-component list + one WCC over the affected subgraph; cost is
    proportional to the affected components, not the graph.
    """
    from graphscope_spark.algorithms.wcc import wcc

    g2 = graph.remove_edges(del_edges)
    prev = prev_components.select(
        "id", F.col("component").cast("long").alias("component")
    )
    touched = (
        _endpoints(del_edges)
        .join(prev, "id")
        .select("component")
        .distinct()
    )
    kept = prev.join(touched, "component", "left_anti").select(
        "id", "component"
    )
    sub_vertices = prev.join(touched, "component", "left_semi").select("id")
    src_comp = prev.withColumnRenamed("id", "src")
    sub_edges = (
        g2.edges.select("src", "dst")
        .join(src_comp, "src")
        .join(touched, "component", "left_semi")
        .select("src", "dst")
    )
    sub = Graph(
        sub_edges,
        vertices=sub_vertices,
        num_partitions=graph.num_partitions,
        directed=graph.directed,
    )
    redone = wcc(sub, max_iter=max_iter, mode=mode)
    return kept.unionByName(redone.select("id", "component"))


def sssp_delta(
    graph: Graph,
    new_edges: DataFrame,
    prev_distances: DataFrame,
    source: int,
    weight_col: str | None = "weight",
    max_iter: int = 10_000,
) -> DataFrame:
    """``(id, distance)`` over the edge-augmented graph, resumed from the
    converged base distances (id, distance; null = unreachable).

    Only a delta edge's SOURCE endpoint can start an improvement (relaxation
    flows src→dst), so those are the frontier; anything they improve joins
    the frontier through the normal superstep loop."""
    from graphscope_spark.algorithms.traversal import sssp

    g2 = graph.add_edges(new_edges)
    prev = prev_distances.select(
        "id", F.col("distance").cast("double").alias("pdist")
    )
    state = (
        g2.vertices.select("id")
        .join(prev, "id", "left")
        .join(_endpoints(new_edges, side="src"), "id", "left")
        .select(
            "id",
            F.coalesce(
                "pdist",
                F.when(F.col("id") == source, 0.0).otherwise(float("inf")),
            ).alias("dist"),
            F.col("_touched").isNotNull().alias("changed"),
        )
    )
    return sssp(
        g2, source, weight_col=weight_col, max_iter=max_iter, warm_start=state
    )


def bfs_delta(
    graph: Graph,
    new_edges: DataFrame,
    prev_depths: DataFrame,
    source: int,
    max_depth: int = 10_000,
) -> DataFrame:
    """``(id, depth)`` over the edge-augmented graph, resumed from the
    converged base depths (id, depth; -1 = unreachable)."""
    from graphscope_spark.algorithms.traversal import bfs

    g2 = graph.add_edges(new_edges)
    prev = prev_depths.select("id", F.col("depth").cast("int").alias("pdepth"))
    state = (
        g2.vertices.select("id")
        .join(prev, "id", "left")
        .join(_endpoints(new_edges, side="src"), "id", "left")
        .select(
            "id",
            F.coalesce(
                "pdepth",
                F.when(F.col("id") == source, 0).otherwise(-1),
            )
            .cast("int")
            .alias("depth"),
            (
                F.col("_touched").isNotNull()
                & (F.coalesce("pdepth", F.lit(-1)) >= 0)
            ).alias("changed"),
        )
    )
    return bfs(g2, source, max_depth=max_depth, warm_start=state)


def pagerank_delta(
    graph: Graph,
    new_edges: DataFrame,
    prev_scores: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> DataFrame:
    """``(id, pagerank)`` over ``graph.add_edges(new_edges)``, warm-started
    from the converged base scores ``prev_scores`` (id, pagerank).

    PageRank is Ingress's *accumulative* category, not monotone: an added
    edge redistributes mass, so the converged vector is not a bound — but
    the teleport fixpoint is a contraction with a unique solution, so
    restarting the power iteration FROM the old vector (new vertices at
    1/n, renormalized) converges to the full-recompute answer in rounds
    proportional to how far the delta moved the fixpoint, not to the cold
    mixing time. Deletions work through the same call (pass the already
    mutated graph a no-op delta) since the start vector never affects the
    fixpoint, only the round count."""
    from graphscope_spark.algorithms.pagerank import pagerank

    g2 = graph.add_edges(new_edges)
    return pagerank(
        g2, alpha=alpha, tol=tol, max_iter=max_iter, init_ranks=prev_scores
    )
