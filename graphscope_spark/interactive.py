"""Interactive-query facade — the reference's session entry point.

Reference: ``graphscope.interactive(graph)`` returns an ``InteractiveQuery``
whose ``execute(query, lang="gremlin"|"cypher")`` / ``submit(...)`` dispatch
traversal strings to GIE (python/graphscope/client/session.py:1172,
python/graphscope/interactive/query.py:103-141). Here the same surface
fronts the local frontends: Gremlin chains run through
:mod:`graphscope_spark.operators.gremlin` and Cypher statements through
:mod:`graphscope_spark.operators.cypher` — both return DataFrames instead
of gremlin-driver/neo4j result cursors (collect them like any Spark query).

    iq = interactive(graph)                     # Graph or PropertyGraph
    iq.execute("g.V().out().count()")           # lang inferred
    iq.execute("MATCH (a)-->(b) RETURN a, b", lang="cypher")
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from graphscope_spark.graph.graph import Graph
from graphscope_spark.graph.property_graph import PropertyGraph

__all__ = ["interactive", "InteractiveQuery"]


class InteractiveQuery:
    """Dispatches gremlin/cypher strings against a bound graph."""

    def __init__(self, graph: Graph | PropertyGraph):
        self._graph = graph

    @property
    def graph(self) -> Graph | PropertyGraph:
        return self._graph

    def execute(self, query: str, lang: str | None = None, **kwargs) -> DataFrame:
        """Compatibility wrapper around :meth:`submit` (query.py:103)."""
        return self.submit(query, lang=lang, **kwargs)

    def submit(self, query: str, lang: str | None = None, **kwargs) -> DataFrame:
        """Run a Gremlin or Cypher query string; returns a DataFrame.

        ``lang`` ∈ {"gremlin", "cypher"}; when omitted it is inferred from
        the statement head (``g.`` → gremlin, ``MATCH`` → cypher) — the
        reference requires it to be explicit, we accept both.
        """
        if lang is None:
            head = query.lstrip()
            if head.startswith("g."):
                lang = "gremlin"
            elif head[:5].upper() == "MATCH" or head[:4].upper() == "CALL":
                lang = "cypher"
            else:
                raise ValueError(
                    "cannot infer query language — pass lang='gremlin' or "
                    "'cypher'"
                )
        if lang == "gremlin":
            from graphscope_spark.operators.gremlin import gremlin

            return gremlin(self._graph, query)
        if lang == "cypher":
            if isinstance(self._graph, PropertyGraph):
                from graphscope_spark.operators.cypher import cypher_property

                return cypher_property(self._graph, query, **kwargs)
            from graphscope_spark.operators.cypher import cypher

            return cypher(self._graph, query, **kwargs)
        raise ValueError(
            f"Unsupported query language: {lang} other than gremlin and cypher"
        )


def interactive(graph: Graph | PropertyGraph) -> InteractiveQuery:
    """The reference's ``graphscope.interactive(graph)`` entry
    (session.py:1632)."""
    return InteractiveQuery(graph)
