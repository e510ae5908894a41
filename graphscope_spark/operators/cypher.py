"""Minimal Cypher-subset MATCH parser → the Pattern join DAG.

Reference path: GIE parses Cypher with ``CypherAntlr4Parser.java`` and plans
MATCH through ``GraphPlanner`` → Pattern/ExtendIntersect
(interactive_engine/compiler/src/main/java/com/alibaba/graphscope/common/ir/
planner/GraphPlanner.java); this is that path reduced to the pattern+return
subset our simple graph supports:

    MATCH (a)-[]->(b), (b)-[]->(c), (a)-[]->(c) RETURN a, b, c
    MATCH (a)-->(b)<--(c) RETURN count(*) AS n

Grammar: comma-separated path patterns of ``(tag)`` nodes joined by
``-[]->`` / ``<-[]-`` / ``-[]-`` (or the ``-->`` / ``<--`` / ``--``
shorthands; relationship brackets may carry a variable, which is ignored —
edge labels/properties are not part of the simple-graph surface and raise).
RETURN takes a tag list or ``count(*)`` (optional ``AS`` alias, optional
``DISTINCT``). Lowering reuses :func:`graphscope_spark.operators.match.match`
(sentences → closing-first join DAG, optional WCO step).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph
from graphscope_spark.operators.match import match

__all__ = ["parse_match", "cypher"]

_NODE = re.compile(r"\(\s*([A-Za-z_][A-Za-z_0-9]*)\s*\)")
_EDGE = re.compile(
    r"(<-|-)\s*(?:\[\s*([A-Za-z_][A-Za-z_0-9]*)?\s*\]\s*)?(->|-)"
)
_RETURN_ITEM = re.compile(
    r"^(?:(count)\s*\(\s*\*\s*\)|([A-Za-z_][A-Za-z_0-9]*))"
    r"(?:\s+AS\s+([A-Za-z_][A-Za-z_0-9]*))?$",
    re.IGNORECASE,
)


def parse_match(query: str) -> tuple[list[tuple[str, str, str]], dict]:
    """Parse the MATCH/RETURN subset; returns (sentences, return_spec).

    return_spec: {"distinct": bool, "items": [(kind, name, alias)]} where
    kind ∈ {"tag", "count"}.
    """
    q = query.strip().rstrip(";")
    m = re.match(r"(?is)^\s*MATCH\s+(.*?)\s+RETURN\s+(.+)$", q)
    if not m:
        raise ValueError("expected 'MATCH <patterns> RETURN <items>'")
    pattern_part, return_part = m.group(1), m.group(2)
    if re.search(r"(?i)\[\s*:", pattern_part):
        raise ValueError(
            "edge labels are not supported on the simple-graph surface "
            "(project the PropertyGraph label first)"
        )
    if re.search(r"\(\s*\w*\s*:", pattern_part):
        raise ValueError("vertex labels are not supported on the simple graph")

    sentences: list[tuple[str, str, str]] = []
    for path in _split_paths(pattern_part):
        pos = 0
        node = _NODE.match(path, pos)
        if not node:
            raise ValueError(f"expected a node pattern at: {path[pos:]!r}")
        cur = node.group(1)
        pos = node.end()
        while pos < len(path):
            em = _EDGE.match(path, pos)
            if not em:
                raise ValueError(f"expected an edge pattern at: {path[pos:]!r}")
            left, _var, right = em.group(1), em.group(2), em.group(3)
            pos = em.end()
            node = _NODE.match(path, pos)
            if not node:
                raise ValueError(f"expected a node pattern at: {path[pos:]!r}")
            nxt = node.group(1)
            pos = node.end()
            if left == "-" and right == "->":
                sentences.append((cur, "out", nxt))
            elif left == "<-" and right == "-":
                sentences.append((nxt, "out", cur))
            elif left == "-" and right == "-":
                sentences.append((cur, "both", nxt))
            else:
                raise ValueError(f"unsupported edge direction {left}…{right}")
            cur = nxt

    rp = return_part.strip()
    distinct = False
    dm = re.match(r"(?i)^DISTINCT\s+(.*)$", rp)
    if dm:
        distinct = True
        rp = dm.group(1)
    items = []
    for raw in (x.strip() for x in rp.split(",")):
        im = _RETURN_ITEM.match(raw)
        if not im:
            raise ValueError(f"unsupported RETURN item: {raw!r}")
        if im.group(1):
            items.append(("count", "*", im.group(3) or "count"))
        else:
            items.append(("tag", im.group(2), im.group(3) or im.group(2)))
    if not items:
        raise ValueError("empty RETURN")
    tags = {t for s in sentences for t in (s[0], s[2])}
    for kind, name, _alias in items:
        if kind == "tag" and name not in tags:
            raise ValueError(f"RETURN references unbound tag {name!r}")
    return sentences, {"distinct": distinct, "items": items}


def _split_paths(s: str) -> list[str]:
    """Split on commas that sit between patterns (no nesting in subset)."""
    return [p.strip() for p in s.split(",") if p.strip()]


def cypher(
    graph: Graph,
    query: str,
    distinct_vertices: bool = False,
    wco: bool = False,
) -> DataFrame:
    """Run a MATCH/RETURN query string; returns a DataFrame with the RETURN
    columns (tags → bound vertex ids; count(*) → one BIGINT row)."""
    sentences, ret = parse_match(query)
    bound = match(
        graph, sentences, distinct_vertices=distinct_vertices, wco=wco
    )
    if any(kind == "count" for kind, _n, _a in ret["items"]):
        if len(ret["items"]) != 1:
            raise ValueError("count(*) cannot be mixed with tags in this subset")
        alias = ret["items"][0][2]
        return bound.agg(F.count(F.lit(1)).cast("bigint").alias(alias))
    cols = [F.col(name).alias(alias) for _k, name, alias in ret["items"]]
    out = bound.select(*cols)
    return out.distinct() if ret["distinct"] else out
