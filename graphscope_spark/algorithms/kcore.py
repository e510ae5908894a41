"""k-core and k-shell — iterative peeling.

Reference: ``apps/kcore/kcore.h`` (run_app.h:359-367) removes vertices with
undirected degree < k until fixpoint; the k-core is the surviving induced
subgraph. ``apps/kshell/kshell.h`` assigns each vertex the largest k for
which it survives. Peeling is a driver loop over anti-joins — degrees are
recomputed on the shrinking edge set, so each round's work decreases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph.graph import Graph

__all__ = ["k_core", "k_shell"]


def _peel(edges: DataFrame, k: int, max_iter: int) -> DataFrame:
    """Peel until fixpoint (or max_iter); returns surviving edges."""
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    prev = edges.count()
    for _ in range(max_iter):
        deg = edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        keep = deg.filter(F.col("deg") >= k).select("id")
        nxt = (
            edges.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n = nxt.count()
        edges.unpersist()
        edges = nxt.persist(StorageLevel.MEMORY_AND_DISK)
        if n == prev:
            break
        prev = n
    return edges


def k_core(graph: Graph, k: int, max_iter: int = 10_000) -> DataFrame:
    """(id, in_core: boolean) — membership of the undirected k-core."""
    und = graph.to_undirected(dedup=True)
    surviving = _peel(und.edges.select("src", "dst"), k, max_iter)
    members = surviving.select(F.col("src").alias("id")).distinct()
    out = graph.vertices.select("id").join(
        members.withColumn("in_core", F.lit(True)), "id", "left"
    ).select("id", F.coalesce("in_core", F.lit(False)).alias("in_core"))
    und.unpersist()
    return out


def k_shell(graph: Graph, max_k: int | None = None, max_iter: int = 10_000) -> DataFrame:
    """(id, shell) — largest k such that the vertex is in the k-core."""
    und = graph.to_undirected(dedup=True)
    edges = und.edges.select("src", "dst")
    shell = graph.vertices.select("id", F.lit(0).alias("shell"))
    shell = shell.persist(StorageLevel.MEMORY_AND_DISK)
    k = 1
    while True:
        edges = _peel(edges, k, max_iter)
        if edges.isEmpty():
            break
        members = edges.select(F.col("src").alias("id")).distinct()
        new_shell = (
            shell.join(members.withColumn("_m", F.lit(True)), "id", "left")
            .select(
                "id",
                F.when(F.col("_m").isNotNull(), k).otherwise(F.col("shell")).alias("shell"),
            )
            .localCheckpoint(eager=True)
        )
        shell.unpersist()
        shell = new_shell.persist(StorageLevel.MEMORY_AND_DISK)
        k += 1
        if max_k is not None and k > max_k:
            break
    und.unpersist()
    return shell.select("id", "shell")
