"""graphscope_spark — a PySpark-native link-graph analytics engine.

A from-scratch reimplementation of the analytical capabilities of
alibaba/GraphScope (the GRAPE/libgrape-lite core: PageRank, WCC, CDLP/LPA,
triangle counting, SSSP, BFS, k-core, HITS, centralities) expressed as
iterative DataFrame jobs on Apache Spark, plus the training-data-pipeline
operators a 100 TB corpus needs (dedup, similarity search, text analysis).

Design (see SURVEY.md for the reference mapping):

* Graphs are two DataFrames — ``vertices(id, ...)`` and
  ``edges(src, dst[, weight])`` — hash-partitioned by vertex id, the Spark
  rendering of GraphScope's edge-cut fragments
  (reference: analytical_engine/core/fragment/arrow_projected_fragment.h).
* Algorithms are supersteps driven by a driver loop: a message-producing
  join/gather, a skew-aware aggregation by destination, a vectorized state
  update, and a scalar all-reduce for convergence — the Spark rendering of
  grape's PEval/IncEval worker loop
  (reference: analytical_engine/core/worker/default_worker.h:88-135).
* State lineage is truncated and checkpointed every k supersteps to an
  Iceberg-layout parquet table with per-partition metrics, so any run
  resumes mid-iteration.
"""

from graphscope_spark.graph.graph import Graph
from graphscope_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["Graph", "get_spark", "__version__"]


def __getattr__(name: str):
    """Reference call-shape compat (PEP 562, lazy so package import stays
    light): ``graphscope.pagerank(g)`` → ``graphscope_spark.pagerank(g)``.
    Resolution order = flat client apps (apps.py), then the FLASH suite
    (flash.py) — the same namespace layering as the reference's
    ``graphscope`` package (analytical/app/__init__.py re-exports both)."""
    import importlib

    for mod in ("apps", "flash"):
        m = importlib.import_module(f"graphscope_spark.{mod}")
        if hasattr(m, name):
            return getattr(m, name)
    raise AttributeError(f"module 'graphscope_spark' has no attribute {name!r}")
