"""NetworkX-style API façade (SURVEY §3.3).

The reference ships 52 NetworkX-compatible wrappers over the same builtins
(python/graphscope/nx/algorithms/builtin.py). This façade gives the familiar
names over :class:`Graph` — thin aliases, same engines underneath.
"""

from __future__ import annotations

from graphscope_spark.algorithms import (
    avg_clustering as average_clustering,
)
from graphscope_spark.algorithms import (
    bfs,
    betweenness_centrality,
    cdlp,
    closeness_centrality,
    degree_centrality,
    eigenvector_centrality,
    hits,
    k_core,
    k_shell,
    katz_centrality,
    lcc as clustering,
    louvain as louvain_communities,
    pagerank,
    sssp,
    transitivity,
    triangles,
    voterank,
    wcc as connected_components,
)
from graphscope_spark.algorithms.paths import (
    all_pairs_shortest_path_length,
    all_simple_paths,
    average_shortest_path_length,
    is_simple_path,
)
from graphscope_spark.algorithms.scc import scc as strongly_connected_components
from graphscope_spark.algorithms.traversal import (
    bfs as bfs_tree_depths,
)
from graphscope_spark.algorithms.traversal import (
    sssp as single_source_dijkstra_path_length,
)
from graphscope_spark.algorithms.assortativity import (
    attribute_assortativity as attribute_assortativity_coefficient,
    degree_assortativity as degree_assortativity_coefficient,
    average_degree_connectivity,
    edge_boundary,
    node_boundary,
)

from graphscope_spark.algorithms.biconnectivity import (
    articulation_points,
    bcc_edges as biconnected_components,
    bridges,
)
from graphscope_spark.algorithms.cliques import k_cliques as enumerate_k_cliques
from graphscope_spark.algorithms.diameter import diameter_approx as diameter
from graphscope_spark.algorithms.dfs import dfs as dfs_preorder_nodes
from graphscope_spark.algorithms.pagerank import pagerank_push

from graphscope_spark.algorithms.centrality import harmonic_centrality
from graphscope_spark.algorithms.flash_extras import (
    graph_coloring as greedy_color,
)
from graphscope_spark.algorithms.matching import (
    maximal_independent_set as maximal_independent_set,
)
from graphscope_spark.algorithms.matching import (
    maximal_matching,
    min_cover_greedy,
    min_dominating_set,
)
from graphscope_spark.algorithms.msf import (
    minimum_spanning_forest as minimum_spanning_tree,
)
from graphscope_spark.algorithms.ranking import articlerank, ppr
from graphscope_spark.algorithms.fluid import fluid_communities as asyn_fluidc
from graphscope_spark.algorithms.lpa_color import (
    lpa_by_color as asyn_lpa_communities,
)
from graphscope_spark.algorithms.flash_extras import onion_layer_ordering
from graphscope_spark.algorithms.kcore import core_numbers as core_number
from graphscope_spark.algorithms.matching import min_edge_cover

label_propagation_communities = cdlp
shortest_path_length = single_source_dijkstra_path_length
personalized_pagerank = ppr
onion_layers = onion_layer_ordering
dominating_set = min_dominating_set

__all__ = [
    "articulation_points", "biconnected_components", "bridges",
    "enumerate_k_cliques", "diameter", "dfs_preorder_nodes", "pagerank_push",
    "pagerank", "connected_components", "strongly_connected_components",
    "label_propagation_communities", "louvain_communities", "triangles",
    "clustering", "average_clustering", "transitivity", "bfs",
    "bfs_tree_depths", "sssp", "single_source_dijkstra_path_length",
    "shortest_path_length", "k_core", "k_shell", "hits", "degree_centrality",
    "eigenvector_centrality", "katz_centrality", "closeness_centrality",
    "betweenness_centrality", "voterank", "all_pairs_shortest_path_length",
    "all_simple_paths", "is_simple_path", "average_shortest_path_length",
    "attribute_assortativity_coefficient",
    "degree_assortativity_coefficient", "average_degree_connectivity",
    "edge_boundary", "node_boundary", "harmonic_centrality", "greedy_color",
    "maximal_independent_set", "maximal_matching", "min_cover_greedy",
    "min_dominating_set", "minimum_spanning_tree", "articlerank", "ppr",
    "personalized_pagerank", "asyn_fluidc", "asyn_lpa_communities",
    "onion_layers", "core_number", "min_edge_cover", "dominating_set",
]
