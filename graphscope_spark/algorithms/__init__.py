from graphscope_spark.algorithms.assortativity import (
    attribute_assortativity,
    average_degree_connectivity,
    degree_assortativity,
    edge_boundary,
    node_boundary,
)
from graphscope_spark.algorithms.betweenness import betweenness_centrality
from graphscope_spark.algorithms.cdlp import cdlp, lpa
from graphscope_spark.algorithms.louvain import louvain, modularity
from graphscope_spark.algorithms.lpa_u2i import lpa_u2i
from graphscope_spark.algorithms.paths import (
    all_pairs_shortest_path_length,
    all_simple_paths,
    is_simple_path,
    voterank,
)
from graphscope_spark.algorithms.centrality import (
    closeness_centrality,
    degree_centrality,
    eigenvector_centrality,
    katz_centrality,
)
from graphscope_spark.algorithms.hits import hits
from graphscope_spark.algorithms.kcore import k_core, k_shell
from graphscope_spark.algorithms.pagerank import pagerank, pagerank_ldbc
from graphscope_spark.algorithms.traversal import bfs, random_multi_bfs, sssp
from graphscope_spark.algorithms.triangles import (
    avg_clustering,
    lcc,
    transitivity,
    triangles,
)
from graphscope_spark.algorithms.wcc import wcc

__all__ = [
    "pagerank", "pagerank_ldbc", "wcc", "cdlp", "lpa", "triangles", "lcc",
    "transitivity", "avg_clustering", "sssp", "bfs", "random_multi_bfs",
    "k_core", "k_shell",
    "hits", "degree_centrality", "eigenvector_centrality", "katz_centrality",
    "closeness_centrality", "betweenness_centrality", "louvain", "modularity",
    "lpa_u2i", "voterank", "all_pairs_shortest_path_length", "is_simple_path",
    "all_simple_paths", "degree_assortativity", "attribute_assortativity",
    "average_degree_connectivity", "node_boundary", "edge_boundary",
]
