from graphscope_spark.algorithms.pagerank import pagerank, pagerank_ldbc

__all__ = ["pagerank", "pagerank_ldbc"]
