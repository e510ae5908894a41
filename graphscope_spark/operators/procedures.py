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
    from graphscope_spark.algorithms.betweenness import betweenness_centrality
    from graphscope_spark.algorithms.diameter import diameter_approx
    from graphscope_spark.algorithms.flash_extras import (
        degeneracy_ordering,
        densest_subgraph_2approx,
        graph_coloring,
        k_center,
        onion_layer_ordering,
    )
    from graphscope_spark.algorithms.fluid import fluid_communities
    from graphscope_spark.algorithms.hits import hits
    from graphscope_spark.algorithms.kcore import core_numbers, k_core_search, k_shell
    from graphscope_spark.algorithms.louvain import louvain
    from graphscope_spark.algorithms.lpa_color import lpa_by_color
    from graphscope_spark.algorithms.matching import min_edge_cover
    from graphscope_spark.algorithms.msf import minimum_spanning_forest
    from graphscope_spark.algorithms.paths import (
        average_shortest_path_length,
        voterank,
    )
    from graphscope_spark.algorithms.ranking import articlerank, ppr
    from graphscope_spark.algorithms.sampling import (
        edge_sample,
        neighbor_sample,
        negative_sample,
        random_walks,
        sampling_path,
        topk_neighbor_sample,
        weighted_neighbor_sample,
    )
    from graphscope_spark.engine.ingress import (
        bfs_delta,
        bfs_delta_delete,
        pagerank_delta,
        sssp_delta,
        sssp_delta_delete,
        wcc_delta,
        wcc_delta_delete,
    )
    from graphscope_spark.algorithms.scc import scc
    from graphscope_spark.algorithms.traversal import (
        bfs,
        random_multi_bfs,
        sssp,
        sssp_delta_stepping,
    )
    from graphscope_spark.algorithms.triangles import lcc, triangles
    from graphscope_spark.algorithms.wcc import wcc

    for fn in (
        pagerank, pagerank_ldbc, pagerank_push, ppr, articlerank, wcc, scc,
        cdlp, triangles, lcc, bfs, sssp, k_core, degree_centrality,
        closeness_centrality, harmonic_centrality, eigenvector_centrality,
        katz_centrality, maximal_independent_set, maximal_matching,
        min_cover_greedy, min_dominating_set,
        # r4: the rest of the implemented suite, so CALL / Cypher CALL /
        # custom_analytical_algorithm can dispatch every engine by name
        betweenness_centrality, hits, louvain, voterank,
        average_shortest_path_length, diameter_approx, k_center,
        graph_coloring, densest_subgraph_2approx, degeneracy_ordering,
        onion_layer_ordering, fluid_communities, lpa_by_color,
        min_edge_cover, minimum_spanning_forest, core_numbers, k_shell,
        k_core_search, sampling_path, neighbor_sample, random_multi_bfs,
        sssp_delta_stepping,
        # r5: the GLE sampler family + the Ingress delta kernels
        random_walks, negative_sample, edge_sample, topk_neighbor_sample,
        weighted_neighbor_sample, wcc_delta, wcc_delta_delete, sssp_delta,
        sssp_delta_delete, bfs_delta, bfs_delta_delete, pagerank_delta,
    ):
        register_procedure(fn.__name__, fn)


def meta_schema(graph) -> DataFrame:
    """FLEX-shaped schema JSON (reference: `CALL gs.procedure.meta.schema()`,
    docs/interactive_engine/neo4j/supported_cypher.md procedure table): one
    row, one `schema` string column. PropertyGraph: per-label vertex/edge
    types with property name+type; simple Graph: a single `_default` type
    pair."""
    import json

    from graphscope_spark.graph.property_graph import PropertyGraph

    def props(df, skip=()):
        return [
            {"property_name": f.name, "property_type": f.dataType.simpleString()}
            for f in df.schema.fields
            if f.name not in skip
        ]

    if isinstance(graph, PropertyGraph):
        spark = next(iter(graph.vertices.values())).sparkSession
        sch = {
            "vertex_types": [
                {"type_name": lab, "properties": props(df)}
                for lab, df in sorted(graph.vertices.items())
            ],
            "edge_types": [
                {
                    "type_name": el,
                    "vertex_type_pair_relations": [
                        {"source_vertex": sl, "destination_vertex": dl}
                    ],
                    "properties": props(df, skip=("src", "dst")),
                }
                for (el, sl, dl), df in sorted(graph.edges.items())
            ],
        }
    else:
        spark = graph.edges.sparkSession
        sch = {
            "vertex_types": [
                {"type_name": "_default", "properties": props(graph.vertices)}
            ],
            "edge_types": [
                {
                    "type_name": "_default",
                    "vertex_type_pair_relations": [
                        {
                            "source_vertex": "_default",
                            "destination_vertex": "_default",
                        }
                    ],
                    "properties": props(graph.edges, skip=("src", "dst")),
                }
            ],
        }
    return spark.createDataFrame(
        [(json.dumps(sch, sort_keys=True),)], "schema string"
    )


def meta_statistics(graph) -> DataFrame:
    """FLEX-shaped statistics JSON (reference: `CALL
    gs.procedure.meta.statistics()`): total + per-type vertex/edge counts."""
    import json

    from graphscope_spark.graph.property_graph import PropertyGraph

    if isinstance(graph, PropertyGraph):
        spark = next(iter(graph.vertices.values())).sparkSession
        vt = {lab: df.count() for lab, df in sorted(graph.vertices.items())}
        et = {
            f"{el}({sl}->{dl})": df.count()
            for (el, sl, dl), df in sorted(graph.edges.items())
        }
    else:
        spark = graph.edges.sparkSession
        vt = {"_default": graph.vertices.count()}
        et = {"_default": graph.edges.count()}
    stats = {
        "total_vertex_count": sum(vt.values()),
        "total_edge_count": sum(et.values()),
        "vertex_type_statistics": vt,
        "edge_type_statistics": et,
    }
    return spark.createDataFrame(
        [(json.dumps(stats, sort_keys=True),)], "statistics string"
    )


register_procedure("meta.schema", meta_schema)
register_procedure("meta.statistics", meta_statistics)

_register_builtins()
