"""Path utilities: VoteRank, APSP-lengths, simple-path checks.

Reference: ``apps/voterank/voterank.h`` (run_app.h:477-485),
``apps/apsp/all_pairs_shortest_path_length.h``, ``apps/simple_path/*.h`` —
SURVEY.md §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph
from graphscope_spark.engine.tuning import tuned_loop

__all__ = ["voterank", "all_pairs_shortest_path_length", "is_simple_path",
           "all_simple_paths", "average_shortest_path_length"]


@tuned_loop
def voterank(graph: Graph, num_seeds: int) -> list[int]:
    """Top influencers by iterative voting (voterank.h): each round every
    vertex votes its voting ability to in-... (undirected here) neighbors;
    the max-score vertex is elected, its voters' ability decays by 1/<k>.

    All arithmetic is EXACT integer, scaled by m (und edge rows): ability₀ =
    m, decay = n, floor at 0 — argmax-equivalent to the 1.0/(1/<k>) float
    formulation but immune to summation-order ulp noise, which was measured
    to flip mathematically-tied elections between engines/runs.

    Driver loop with one aggregation per elected seed — num_seeds is small
    by construction (it selects a handful of influencers).
    """
    und = graph.to_undirected(dedup=True)
    edges = und.edges
    n = graph.num_vertices
    m = edges.count()

    ability = graph.vertices.select("id", F.lit(m).cast("long").alias("ability"))
    elected: list[int] = []
    excluded = None
    for _ in range(num_seeds):
        votes = (
            edges.join(ability.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("ability").alias("score"))
        )
        if excluded is not None:
            votes = votes.join(excluded, "id", "left_anti")
        top = votes.orderBy(F.col("score").desc(), F.col("id").asc()).limit(1).collect()
        if not top:
            break
        winner = int(top[0]["id"])
        elected.append(winner)
        wdf = graph.spark.createDataFrame([(winner,)], "id long")
        excluded = wdf if excluded is None else excluded.unionAll(wdf)
        # decay the voting ability of the winner's neighbors; winner -> 0
        nbrs = (
            edges.join(wdf.withColumnRenamed("id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .withColumn("_dec", F.lit(n).cast("long"))
        )
        ability = (
            ability.join(nbrs, "id", "left")
            .select(
                "id",
                F.when(F.col("id") == winner, F.lit(0).cast("long"))
                .otherwise(
                    F.greatest(
                        F.col("ability") - F.coalesce(F.col("_dec"), F.lit(0)),
                        F.lit(0).cast("long"),
                    )
                )
                .alias("ability"),
            )
            .localCheckpoint(eager=True)
        )
    und.unpersist()
    return elected


def all_pairs_shortest_path_length(
    graph: Graph,
    sources: list[int] | DataFrame | None = None,
    max_all_vertices: int = 16_384,
) -> DataFrame:
    """(source, id, distance) for reachable pairs — ONE composite-state
    multi-source BFS for the whole batch (engine/multisource.py), diameter
    rounds total regardless of |sources|. Unreachable pairs are absent
    (at scale the full V² matrix must stay sparse).

    ``sources=None`` = true APSP, refused above ``max_all_vertices``
    (output is O(V²) pairs by definition — sample at scale)."""
    from graphscope_spark.engine.multisource import multi_source_bfs

    if sources is None:
        n = graph.num_vertices
        if n > max_all_vertices:
            raise ValueError(
                f"APSP over all {n} vertices materializes O(V^2) pairs; pass "
                "an explicit sources list/DataFrame at this scale"
            )
        sources = graph.vertices.select(F.col("id").alias("source"))
    return multi_source_bfs(graph, sources).select(
        "source", "id", F.col("depth").cast("int").alias("distance")
    )


def average_shortest_path_length(
    graph: Graph, sources: list[int] | DataFrame | None = None
) -> DataFrame:
    """One-row (avg_dist): a = Σ_{s≠t reachable} d(s,t) / (|S|·(n−1)) —
    the reference client app (python/graphscope/analytical/app/
    average_shortest_path_length.py; unreachable pairs contribute 0, the
    grape convention, so disconnected graphs don't raise like NetworkX).

    ``sources=None`` = the exact all-pairs definition (|S| = n), subject to
    all_pairs_shortest_path_length's O(V²) refusal gate; a deterministic
    source sample is the scale estimator (one composite-state BFS batch
    either way)."""
    d = all_pairs_shortest_path_length(graph, sources=sources)
    n = graph.num_vertices
    n_src = (
        n if sources is None
        else (sources.count() if isinstance(sources, DataFrame) else len(sources))
    )
    return (
        d.filter(F.col("source") != F.col("id"))
        .agg(
            F.round(
                F.sum("distance") / F.lit(float(n_src * (n - 1))), 6
            ).alias("avg_dist")
        )
    )


def is_simple_path(graph: Graph, path: list[int]) -> bool:
    """True iff ``path`` is a sequence of adjacent vertices with no repeats
    (apps/simple_path/is_simple_path.h)."""
    if len(path) == 0:
        return False
    if len(set(path)) != len(path):
        return False
    if len(path) == 1:
        return graph.vertices.filter(F.col("id") == path[0]).limit(1).count() == 1
    hops = graph.spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(path, path[1:])], "src long, dst long"
    )
    found = hops.join(graph.edges.select("src", "dst"), ["src", "dst"], "left_semi")
    return found.count() == len(path) - 1


@tuned_loop
def all_simple_paths(
    graph: Graph, source: int, target: int, cutoff: int
) -> DataFrame:
    """All simple paths source→target with ≤ cutoff hops: iterative
    path-extension joins with a visited-set filter (apps/simple_path/
    all_simple_paths.h). Returns (hops, path)."""
    from graphscope_spark.operators.relational import path_expand

    start = graph.spark.createDataFrame([(int(source),)], "v long")
    paths = path_expand(start, graph.edges, 1, cutoff, semantics="simple")
    return paths.filter(F.col("end") == target).select("hops", "path")
