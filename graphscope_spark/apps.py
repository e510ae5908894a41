"""Client-app facade — the reference's flat ``graphscope.<app>(g)`` names.

The reference exports its analytical apps as top-level functions
(python/graphscope/analytical/app/__init__.py). This module mirrors that
surface name for name, so a reference user's call sites port by swapping
the import. Alternate-implementation names (``wcc_auto``/``wcc_opt``/
``wcc_projected``, ``pagerank_push_opt``) alias the one engine — picking
the physical strategy is Catalyst's job here, not the caller's.

``JavaApp`` is the one omission (Java PIE/Giraph compat, declared out of
scope in SURVEY.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from graphscope_spark.graph.graph import Graph

from graphscope_spark.algorithms.assortativity import (
    attribute_assortativity as attribute_assortativity_coefficient,
)
from graphscope_spark.algorithms.assortativity import average_degree_connectivity
from graphscope_spark.algorithms.assortativity import (
    degree_assortativity as degree_assortativity_coefficient,
)
from graphscope_spark.algorithms.assortativity import (
    numeric_assortativity as numeric_assortativity_coefficient,
)
from graphscope_spark.algorithms.cdlp import cdlp
from graphscope_spark.algorithms.centrality import (
    degree_centrality,
    eigenvector_centrality,
    katz_centrality,
)
from graphscope_spark.algorithms.hits import hits
from graphscope_spark.algorithms.kcore import k_core, k_shell
from graphscope_spark.algorithms.louvain import louvain
from graphscope_spark.algorithms.lpa_u2i import lpa_u2i
from graphscope_spark.algorithms.pagerank import (
    pagerank as pagerank_nx,
)
from graphscope_spark.algorithms.pagerank import pagerank_ldbc as pagerank
from graphscope_spark.algorithms.pagerank import pagerank_push
from graphscope_spark.algorithms.paths import (
    average_shortest_path_length,
    is_simple_path,
)
from graphscope_spark.algorithms.traversal import bfs, sssp
from graphscope_spark.algorithms.triangles import avg_clustering
from graphscope_spark.algorithms.triangles import lcc
from graphscope_spark.algorithms.triangles import lcc as clustering
from graphscope_spark.algorithms.triangles import triangles
from graphscope_spark.algorithms.paths import voterank
from graphscope_spark.algorithms.wcc import wcc

# the reference's LPA app name for CDLP
lpa = cdlp

# alternate-implementation names: one engine, Catalyst picks the strategy
wcc_auto = wcc_opt = wcc_projected = wcc
pagerank_push_opt = pagerank_push


def custom_analytical_algorithm(
    graph: Graph, algorithm: str, *args, **kwargs
) -> DataFrame:
    """Dispatch a predefined algorithm by name (the reference's debugging
    entry, custom.py) — routed through the ProcedureCall registry, raising
    the PROCEDURE_NOT_FOUND error path on unknown names."""
    from graphscope_spark.operators.procedures import call_procedure

    kwargs.pop("context", None)  # vertex_data is the only context here
    return call_procedure(algorithm, graph, *args, **kwargs)


__all__ = sorted(
    n
    for n in dir()
    if not n.startswith("_")
    and n not in {"annotations", "DataFrame", "Graph"}
)
