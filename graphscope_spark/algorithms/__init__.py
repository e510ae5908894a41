from graphscope_spark.algorithms.cdlp import cdlp, lpa
from graphscope_spark.algorithms.centrality import (
    closeness_centrality,
    degree_centrality,
    eigenvector_centrality,
    katz_centrality,
)
from graphscope_spark.algorithms.hits import hits
from graphscope_spark.algorithms.kcore import k_core, k_shell
from graphscope_spark.algorithms.pagerank import pagerank, pagerank_ldbc
from graphscope_spark.algorithms.traversal import bfs, sssp
from graphscope_spark.algorithms.triangles import (
    avg_clustering,
    lcc,
    transitivity,
    triangles,
)
from graphscope_spark.algorithms.wcc import wcc

__all__ = [
    "pagerank", "pagerank_ldbc", "wcc", "cdlp", "lpa", "triangles", "lcc",
    "transitivity", "avg_clustering", "sssp", "bfs", "k_core", "k_shell",
    "hits", "degree_centrality", "eigenvector_centrality", "katz_centrality",
    "closeness_centrality",
]
