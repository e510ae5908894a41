"""Streaming graph maintenance: an edge-addition stream drives incremental
fixpoint recomputation (Structured Streaming ``foreachBatch`` × the Ingress
delta kernels in :mod:`graphscope_spark.engine.ingress`).

Reference analogue: GraphScope incrementalizes analytical apps over graph
deltas (``docs/analytical_engine/ingress.md``) and ingests live updates
through the groot streaming store (``interactive_engine/groot-module``).
The Spark-first shape of that pair: the edge stream is an ordinary
``readStream`` (file drops, Kafka, rate source — anything), each
micro-batch is a delta applied through ``wcc_delta`` / ``pagerank_delta``,
so per-batch work scales with the delta's propagation reach, not with the
accumulated graph; the maintained state is ``localCheckpoint``-ed per batch
so plan lineage never grows across batches.

At cluster scale the maintained state (components / scores) is a normal
partitioned DataFrame: each batch's delta join shuffles only the touched
frontier, and the stream's own checkpoint dir gives exactly-once batch
replay on restart (foreachBatch re-runs an uncommitted batch; the delta
kernels are idempotent for re-applied edges — re-adding an edge leaves the
fixpoint unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from graphscope_spark.graph.graph import Graph

__all__ = ["StreamingWCC", "StreamingPageRank"]


class StreamingWCC:
    """Maintain weakly-connected components over streamed edge updates.

    ``components`` always holds the converged ``(id, component)`` labeling
    of everything ingested so far; each micro-batch advances it through
    :func:`graphscope_spark.engine.ingress.wcc_delta` (monotone kernel —
    adding edges only merges components, so the previous fixpoint resumes
    instead of recomputing).

    Batches may carry an optional ``op`` column (``'add'`` / ``'del'``;
    absent = all adds): adds apply first through ``wcc_delta``, then
    deletions through ``wcc_delta_delete`` (recomputes only the touched
    components). Both kernels are idempotent for replayed rows — re-adding
    an existing edge or re-deleting a missing one leaves the fixpoint
    unchanged — so foreachBatch's re-run-on-restart stays exactly-once.
    """

    def __init__(self, graph: Graph):
        from graphscope_spark.algorithms.wcc import wcc

        self.graph = graph
        self.components: DataFrame = wcc(graph).localCheckpoint()
        self.batches_applied = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from graphscope_spark.engine.ingress import wcc_delta, wcc_delta_delete

        if not batch_df.take(1):
            return
        if "op" in batch_df.columns:
            bad = batch_df.filter(
                F.col("op").isNull() | ~F.col("op").isin("add", "del")
            )
            sample = bad.take(1)
            if sample:
                raise ValueError(
                    "graph_stream: batch contains rows with unexpected op "
                    f"value {sample[0]['op']!r} (expected 'add'/'del') — "
                    "refusing to silently drop edges"
                )
            adds = batch_df.filter(F.col("op") == "add").select("src", "dst")
            dels = batch_df.filter(F.col("op") == "del").select("src", "dst")
        else:
            adds, dels = batch_df.select("src", "dst"), None
        if adds.take(1):
            adds = adds.localCheckpoint()
            self.components = wcc_delta(
                self.graph, adds, self.components
            ).localCheckpoint()
            self.graph = self.graph.add_edges(adds)
        if dels is not None and dels.take(1):
            dels = dels.localCheckpoint()
            self.components = wcc_delta_delete(
                self.graph, dels, self.components
            ).localCheckpoint()
            self.graph = self.graph.remove_edges(dels)
        self.batches_applied += 1

    def start(self, stream_edges: DataFrame, checkpoint_dir: str,
              available_now: bool = True):
        """Attach to a streaming edge DataFrame (columns src, dst) and
        return the started query. ``available_now`` drains what's there and
        stops (batch-test mode); pass False for a continuous query."""
        w = stream_edges.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()


class StreamingPageRank:
    """Maintain PageRank scores over streamed edge additions: each batch
    warm-starts the power iteration from the previous converged vector
    (:func:`graphscope_spark.engine.ingress.pagerank_delta` — rounds scale
    with how far the delta moved the fixpoint, not the cold mixing time)."""

    def __init__(self, graph: Graph, alpha: float = 0.85, tol: float = 1e-6):
        from graphscope_spark.algorithms.pagerank import pagerank

        self.graph = graph
        self.alpha, self.tol = alpha, tol
        self.scores: DataFrame = pagerank(
            graph, alpha=alpha, tol=tol
        ).localCheckpoint()
        self.batches_applied = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from graphscope_spark.engine.ingress import pagerank_delta

        if not batch_df.take(1):
            return
        batch_df = batch_df.select("src", "dst").localCheckpoint()
        self.scores = pagerank_delta(
            self.graph, batch_df, self.scores, alpha=self.alpha, tol=self.tol
        ).localCheckpoint()
        self.graph = self.graph.add_edges(batch_df)
        self.batches_applied += 1

    def start(self, stream_edges: DataFrame, checkpoint_dir: str,
              available_now: bool = True):
        w = stream_edges.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()
