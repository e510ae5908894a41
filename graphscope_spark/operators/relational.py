"""The GIE relational/traversal operator surface (SURVEY.md §2.4).

GraphScope's interactive engine lowers Gremlin/Cypher to a dataflow algebra
(interactive_engine/executor/ir/proto/algebra.proto); every operator there
has a direct DataFrame equivalent. This module provides the traversal
operators that are NOT plain one-liners (`Project`→select, `Select`→filter,
`Join`→join, `GroupBy`→groupBy().agg, `Dedup`→dropDuplicates,
`OrderBy+Limit`→orderBy().limit, `Unfold`→explode are used directly), namely:

* edge_expand  — EdgeExpand (algebra.proto:285-313, flatmap/edge_expand.rs:32)
* get_v        — GetV endpoint extraction (:257-279)
* expand_degree— the DegreeFusionRule form: expand-to-DEGREE without
                 materializing edges (compiler fusion in the reference;
                 here a groupBy.count by construction)
* path_expand  — PathExpand with hop range + ARBITRARY/SIMPLE/TRAIL
                 semantics (:314-358): iterative join accumulating an array
                 path column; SIMPLE = no repeated vertex, TRAIL = no
                 repeated edge
* sample       — Coin/Sample (:428-450): seeded fraction + reservoir top-k
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["edge_expand", "get_v", "expand_degree", "path_expand", "sample_n",
           "shortest_path_expand"]


def edge_expand(
    frontier: DataFrame,
    edges: DataFrame,
    direction: str = "out",
    v_col: str = "v",
    out: str = "w",
) -> DataFrame:
    """One-hop expansion: rows of ``frontier`` (column ``v_col``) × matching
    edges → frontier columns + ``out`` = neighbor. direction ∈ out|in|both."""
    if direction == "out":
        e = edges.select(F.col("src").alias("_f"), F.col("dst").alias("_t"))
    elif direction == "in":
        e = edges.select(F.col("dst").alias("_f"), F.col("src").alias("_t"))
    else:
        e = edges.select(F.col("src").alias("_f"), F.col("dst").alias("_t")).unionAll(
            edges.select(F.col("dst").alias("_f"), F.col("src").alias("_t"))
        )
    return (
        frontier.join(e, frontier[v_col] == e["_f"])
        .drop("_f")
        .withColumnRenamed("_t", out)
    )


def get_v(expanded: DataFrame, vertices: DataFrame, v_col: str, props: list[str] | None = None) -> DataFrame:
    """GetV: attach vertex properties for column ``v_col`` (ExpandGetV
    fusion is the default — only call when properties are needed)."""
    cols = ["id"] + (props or [c for c in vertices.columns if c != "id"])
    right = vertices.select(*cols)
    renamed = right.select(
        F.col("id").alias(v_col),
        *[F.col(c).alias(f"{v_col}_{c}") for c in cols if c != "id"],
    )
    return expanded.join(renamed, v_col, "left")


def expand_degree(frontier: DataFrame, edges: DataFrame, direction: str = "out",
                  v_col: str = "v", out: str = "degree") -> DataFrame:
    """Expand-to-DEGREE (DegreeFusionRule): count neighbors without
    materializing them."""
    if direction == "out":
        deg = edges.groupBy(F.col("src").alias(v_col)).agg(F.count(F.lit(1)).alias(out))
    elif direction == "in":
        deg = edges.groupBy(F.col("dst").alias(v_col)).agg(F.count(F.lit(1)).alias(out))
    else:
        both = edges.select(F.col("src").alias(v_col)).unionAll(
            edges.select(F.col("dst").alias(v_col))
        )
        deg = both.groupBy(v_col).agg(F.count(F.lit(1)).alias(out))
    return frontier.join(deg, v_col, "left").fillna({out: 0})


def path_expand(
    start: DataFrame,
    edges: DataFrame,
    min_hops: int,
    max_hops: int,
    semantics: str = "arbitrary",
    v_col: str = "v",
) -> DataFrame:
    """Variable-length expansion: returns (start, end, hops, path:array<long>).

    semantics: arbitrary (any walk) | simple (no repeated vertex) |
    trail (no repeated edge). Driver loop of k joins — the DataFrame
    rendering of PathExpand's iteration scope.
    """
    e = edges.select(F.col("src").alias("_f"), F.col("dst").alias("_t"))
    cur = start.select(
        F.col(v_col).alias("start"),
        F.col(v_col).alias("end"),
        F.lit(0).alias("hops"),
        F.array(F.col(v_col)).alias("path"),
    )
    results = [cur] if min_hops == 0 else []
    for k in range(1, max_hops + 1):
        nxt = cur.join(e, cur.end == e._f).select(
            "start",
            F.col("_t").alias("end"),
            F.lit(k).alias("hops"),
            F.concat("path", F.array(F.col("_t"))).alias("path"),
        )
        if semantics == "simple":
            nxt = nxt.filter(
                ~F.array_contains(F.slice("path", 1, k), F.col("end"))
            )
        elif semantics == "trail":
            pairs = F.transform(
                F.sequence(F.lit(1), F.lit(k)),
                lambda i: F.concat_ws(
                    "->",
                    F.element_at(F.col("path"), i).cast("string"),
                    F.element_at(F.col("path"), i + 1).cast("string"),
                ),
            )
            nxt = nxt.filter(F.size(F.array_distinct(pairs)) == k)
        cur = nxt
        if k >= min_hops:
            results.append(cur)
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def sample_n(df: DataFrame, n: int, seed: int = 42, by: str | None = None) -> DataFrame:
    """Deterministic reservoir-style top-n sample: rank rows by a seeded hash
    (optionally per group ``by``) — stable across partitionings, unlike
    ``df.sample`` whose output depends on the split layout."""
    key = F.xxhash64(*[F.col(c) for c in df.columns if not c.startswith("_")], F.lit(seed))
    if by is None:
        return (
            df.withColumn("_rk", key)
            .orderBy("_rk")
            .limit(n)
            .drop("_rk")
        )
    w = Window.partitionBy(by).orderBy(key)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n).drop("_rn")


def shortest_path_expand(
    graph,
    pairs: DataFrame,
    max_depth: int = 10_000,
) -> DataFrame:
    """ShortestPathExpand (algebra.proto PathExpand with path_opt=SHORTEST;
    runtime ir/core's shortest-path variant): for each (a, b) row of
    ``pairs`` return ``(a, b, hops, path)`` — ONE shortest path, vertices
    inclusive, with a deterministic tie-break (each vertex's BFS parent is
    its minimum predecessor). Unreachable pairs are dropped (GIE emits no
    binding for them).

    Plan: one composite-state parent-tracked BFS batched over the DISTINCT
    sources (diameter rounds total, engine/multisource.py), then the path
    is reassembled backwards with one join per hop — ``diameter`` more
    rounds, all distributed; no driver-side walk."""
    from pyspark.sql import functions as F

    from graphscope_spark.engine.multisource import multi_source_bfs_parents

    pr = pairs.select(
        F.col(pairs.columns[0]).cast("long").alias("a"),
        F.col(pairs.columns[1]).cast("long").alias("b"),
    ).distinct()
    sources = pr.select(F.col("a").alias("source")).distinct()
    forest = multi_source_bfs_parents(graph, sources, max_depth=max_depth).persist()
    try:
        hit = pr.join(
            forest.select(
                F.col("source").alias("a"),
                F.col("id").alias("b"),
                "depth",
            ),
            ["a", "b"],
        )
        # walk parents from b back to a, one join per hop (bounded by the
        # deepest matched pair, not max_depth)
        max_hops_row = hit.agg(F.max("depth")).collect()[0][0]
        max_hops = int(max_hops_row or 0)
        cur = hit.select(
            "a", "b", F.col("depth").alias("hops"),
            F.col("b").alias("cursor"), F.array("b").alias("path"),
        ).localCheckpoint(eager=True)
        for _ in range(max_hops):
            done = cur.filter(F.col("cursor") == F.col("a"))
            todo = cur.filter(F.col("cursor") != F.col("a"))
            step = todo.join(
                forest.select(
                    F.col("source").alias("a"),
                    F.col("id").alias("cursor"),
                    "parent",
                ),
                ["a", "cursor"],
            ).select(
                "a", "b", "hops",
                F.col("parent").alias("cursor"),
                F.concat(F.array("parent"), "path").alias("path"),
            )
            cur = done.unionByName(step).localCheckpoint(eager=True)
        return cur.filter(F.col("cursor") == F.col("a")).select(
            "a", "b", "hops", "path"
        )
    finally:
        forest.unpersist()


def all_shortest_paths_expand(
    graph,
    pairs: DataFrame,
    max_depth: int = 10_000,
) -> DataFrame:
    """ALL SHORTEST variant of :func:`shortest_path_expand`
    (supported_cypher.md Path Modifier "ALL SHORTEST" /
    algebra.proto ALL SHORTESTPATH): for each (a, b) pair return ONE ROW
    PER minimal-hop path. Unreachable pairs drop.

    Plan: the same parent-tracked multi-source BFS gives per-(source, id)
    depths; reconstruction walks backwards one join per hop against the
    EDGE table filtered to depth-(d-1) predecessors — every predecessor at
    the minimal depth continues a path, so the join multiplies exactly
    over the shortest-path DAG (the enumeration is output-bound: rows =
    number of shortest paths, the semantics' intrinsic size)."""
    from pyspark.sql import functions as F

    from graphscope_spark.engine.multisource import multi_source_bfs_parents

    pr = pairs.select(
        F.col(pairs.columns[0]).cast("long").alias("a"),
        F.col(pairs.columns[1]).cast("long").alias("b"),
    ).distinct()
    sources = pr.select(F.col("a").alias("source")).distinct()
    forest = multi_source_bfs_parents(graph, sources, max_depth=max_depth).persist()
    edges = graph.edges.select(
        F.col("src").alias("pred"), F.col("dst").alias("cursor")
    )
    try:
        hit = pr.join(
            forest.select(
                F.col("source").alias("a"), F.col("id").alias("b"), "depth"
            ),
            ["a", "b"],
        )
        max_hops = int(hit.agg(F.max("depth")).collect()[0][0] or 0)
        depths = forest.select(
            F.col("source").alias("a"),
            F.col("id").alias("pred"),
            F.col("depth").alias("pdepth"),
        )
        cur = hit.select(
            "a", "b", F.col("depth").alias("hops"),
            F.col("b").alias("cursor"), F.col("depth").alias("cdepth"),
            F.array("b").alias("path"),
        ).localCheckpoint(eager=True)
        for _ in range(max_hops):
            done = cur.filter(F.col("cursor") == F.col("a"))
            todo = cur.filter(F.col("cursor") != F.col("a"))
            step = (
                todo.join(edges, "cursor")
                .join(depths, ["a", "pred"])
                .filter(F.col("pdepth") == F.col("cdepth") - 1)
                .select(
                    "a", "b", "hops",
                    F.col("pred").alias("cursor"),
                    F.col("pdepth").alias("cdepth"),
                    F.concat(F.array("pred"), "path").alias("path"),
                )
            )
            cur = done.unionByName(step).localCheckpoint(eager=True)
        return cur.filter(F.col("cursor") == F.col("a")).select(
            "a", "b", "hops", "path"
        )
    finally:
        forest.unpersist()
