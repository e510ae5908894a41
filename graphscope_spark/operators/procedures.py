"""ProcedureCall — the stored-procedure surface.

Reference: GIE's ProcedureCall op invokes precompiled stored procedures by
name with positional/named arguments (interactive_engine compiler `CALL
proc(...)` path; Flex's stored_procedure registry). The Spark rendering is a
driver-side registry mapping a procedure name to a Python callable
``fn(spark, *args, **kwargs) -> DataFrame``; ``call_procedure`` resolves and
invokes it. Every builtin algorithm is pre-registered under its public name,
so ``CALL``-style dispatch covers the same surface the reference ships.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

__all__ = ["register_procedure", "call_procedure", "list_procedures"]

_REGISTRY: dict[str, Callable[..., DataFrame]] = {}


def register_procedure(name: str, fn: Callable[..., DataFrame]) -> None:
    """Register (or replace) a stored procedure under ``name``."""
    if not callable(fn):
        raise TypeError("procedure must be callable")
    _REGISTRY[name.lower()] = fn


def call_procedure(name: str, *args, **kwargs) -> DataFrame:
    """Invoke a registered procedure; raises KeyError with the known names
    when unknown (the reference's PROCEDURE_NOT_FOUND error path)."""
    key = name.lower()
    if key not in _REGISTRY:
        raise KeyError(
            f"unknown procedure {name!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[key](*args, **kwargs)


def list_procedures() -> list[str]:
    return sorted(_REGISTRY)


def _register_builtins() -> None:
    from graphscope_spark.algorithms.cdlp import cdlp
    from graphscope_spark.algorithms.centrality import (
        closeness_centrality,
        degree_centrality,
        eigenvector_centrality,
        harmonic_centrality,
        katz_centrality,
    )
    from graphscope_spark.algorithms.kcore import k_core
    from graphscope_spark.algorithms.matching import (
        maximal_independent_set,
        maximal_matching,
        min_cover_greedy,
        min_dominating_set,
    )
    from graphscope_spark.algorithms.pagerank import (
        pagerank,
        pagerank_ldbc,
        pagerank_push,
    )
    from graphscope_spark.algorithms.ranking import articlerank, ppr
    from graphscope_spark.algorithms.scc import scc
    from graphscope_spark.algorithms.traversal import bfs, sssp
    from graphscope_spark.algorithms.triangles import lcc, triangles
    from graphscope_spark.algorithms.wcc import wcc

    for fn in (
        pagerank, pagerank_ldbc, pagerank_push, ppr, articlerank, wcc, scc,
        cdlp, triangles, lcc, bfs, sssp, k_core, degree_centrality,
        closeness_centrality, harmonic_centrality, eigenvector_centrality,
        katz_centrality, maximal_independent_set, maximal_matching,
        min_cover_greedy, min_dominating_set,
    ):
        register_procedure(fn.__name__, fn)


_register_builtins()
