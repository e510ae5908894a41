"""Declarative pattern matching: MATCH sentences → a join DAG.

Reference: the GIE ``Pattern`` operator
(interactive_engine/executor/ir/proto/algebra.proto:407-427) whose compiler
lowers Cypher MATCH sentences into an extend/intersect plan
(``ExtendIntersectRule``, compiler/.../planner/rules/ExtendIntersectRule.java).
This is the minimal Spark rendering: each sentence ``(src_tag, direction,
dst_tag)`` is an edge-table reference; the plan greedily EXTENDS from bound
tags (one-bound sentence → inner join) and turns fully-bound sentences into
existence checks (two-bound sentence → left-semi join, the binary-join
flavor of the intersect step). Catalyst handles the physical join strategy;
the greedy closing-first order keeps intermediate growth minimal, which is
what the CBO rule buys in the reference.

Semantics: homomorphic bindings (tags may repeat vertices) like the
reference's default; ``distinct_vertices=True`` adds pairwise ≠ filters
(isomorphic matching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph

__all__ = ["match"]


def _edge_for(graph: Graph, direction: str) -> DataFrame:
    e = graph.edges.select("src", "dst")
    if direction == "out":
        return e
    if direction == "in":
        return e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    if direction == "both":
        return e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    raise ValueError(f"direction must be out/in/both, got {direction!r}")


_INV = {"out": "in", "in": "out", "both": "both"}


def match(
    graph: Graph,
    pattern: list[tuple[str, str, str]],
    distinct_vertices: bool = False,
    wco: bool = False,
) -> DataFrame:
    """Match a list of sentences ``(src_tag, direction, dst_tag)`` against
    the graph; returns one column per tag with the bound vertex ids.

    ``wco=True`` enables the worst-case-optimal step: when ≥2 remaining
    sentences introduce the SAME unbound tag from bound endpoints, the new
    tag is bound by intersecting the endpoints' adjacency lists
    (operators/wco.expand_intersect — the ExtendIntersectRule plan shape)
    instead of extend-then-filter; intermediates stay within the output
    bound on clique-like patterns.

    Example — directed triangle::

        match(g, [("a", "out", "b"), ("b", "out", "c"), ("a", "out", "c")])
    """
    if not pattern:
        raise ValueError("empty pattern")
    remaining = list(pattern)
    bound: set[str] = set()
    out: DataFrame | None = None

    adj_cache: dict[str, DataFrame] = {}

    def adj_for(direction: str) -> DataFrame:
        if direction not in adj_cache:
            from graphscope_spark.operators.wco import adjacency_lists

            adj_cache[direction] = adjacency_lists(graph.edges, direction)
        return adj_cache[direction]

    def try_wco() -> bool:
        """Bind one tag by multi-way adjacency intersection if ≥2 remaining
        sentences introduce it from bound endpoints. Returns True if bound."""
        nonlocal out
        from collections import defaultdict

        from graphscope_spark.operators.wco import expand_intersect

        cand: dict[str, list] = defaultdict(list)
        for s in remaining:
            a, d, b = s
            if a in bound and b not in bound:
                cand[b].append((s, a, d))  # new tag is a d-neighbor of a
            elif b in bound and a not in bound:
                cand[a].append((s, b, _INV[d]))
        multi = {t: ss for t, ss in cand.items() if len(ss) >= 2}
        if not multi:
            return False
        tag = max(multi, key=lambda t: len(multi[t]))
        sents = multi[tag]
        tags = [bt for _, bt, _ in sents]
        adjs = [adj_for(d) for _, _, d in sents]
        out = expand_intersect(out, adjs, tags, tag)
        bound.add(tag)
        for s, _, _ in sents:
            remaining.remove(s)
        return True

    def pick() -> tuple[str, str, str]:
        # closing edges first (both tags bound -> cheap semi-join), then
        # extensions (one bound), cross products last
        best, best_score = None, -1
        for s in remaining:
            score = (s[0] in bound) + (s[2] in bound)
            if score > best_score:
                best, best_score = s, score
        remaining.remove(best)
        return best

    while remaining:
        if wco and out is not None and try_wco():
            continue
        a, direction, b = pick()
        e = _edge_for(graph, direction)
        if out is None:
            out = e.select(F.col("src").alias(a), F.col("dst").alias(b))
            bound.update((a, b))
            continue
        a_bound, b_bound = a in bound, b in bound
        if a_bound and b_bound:
            # existence check: keep bindings where the closing edge exists
            out = out.join(
                e.select(F.col("src").alias(a), F.col("dst").alias(b)),
                [a, b],
                "left_semi",
            )
        elif a_bound:
            out = out.join(
                e.select(F.col("src").alias(a), F.col("dst").alias(b)), a
            )
            bound.add(b)
        elif b_bound:
            out = out.join(
                e.select(F.col("src").alias(a), F.col("dst").alias(b)), b
            )
            bound.add(a)
        else:
            out = out.crossJoin(
                e.select(F.col("src").alias(a), F.col("dst").alias(b))
            )
            bound.update((a, b))

    if distinct_vertices:
        tags = sorted(bound)
        for i in range(len(tags)):
            for j in range(i + 1, len(tags)):
                out = out.filter(F.col(tags[i]) != F.col(tags[j]))
    return out.select(*sorted(bound))
