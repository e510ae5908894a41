from graphscope_spark.graph.graph import Graph

__all__ = ["Graph"]
