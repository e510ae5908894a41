"""Vectorized Pregel surface — the UDF-app API of the reference (SURVEY §2.3).

GraphScope exposes ``@pregel(vd_type, md_type)`` classes with
``Init/Compute/Combine`` staticmethods compiled server-side
(python/graphscope/analytical/udf/decorators.py:51-209,
core/app/pregel/i_vertex_program.h:45-76). The Spark rendering replaces
per-vertex callbacks with whole-column callbacks — the same contract,
vectorized:

* ``init(vertices) -> state``          (Init; state must carry ``id``)
* ``message(edges_with_state) -> DF``  (Compute's send: the frame is
  edges joined with the source's state columns; return (dst, msg))
* ``combine(inbox_groupBy) -> agg``    (Combine: an aggregate Column over
  the per-dst message group)
* ``update(state, inbox) -> plan``     (Compute's update: join is done for
  you; return the new state plan with an ``active`` boolean column for
  vote-to-halt)

Termination: all vertices halted (``active`` false everywhere) or
``max_iter``. Built on the same superstep loop as the builtin algorithms,
so checkpoint/resume and lineage truncation come for free.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.engine.superstep import SuperstepResult, run_supersteps
from graphscope_spark.graph.graph import Graph

__all__ = ["run_pregel"]


def run_pregel(
    graph: Graph,
    init: Callable[[DataFrame], DataFrame],
    message: Callable[[DataFrame], DataFrame],
    combine: Callable[[], Column],
    update: Callable[[DataFrame, DataFrame], DataFrame],
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> SuperstepResult:
    """Run a Pregel program; returns the SuperstepResult (state has ``id`` +
    user columns + ``active``)."""
    P = graph.num_partitions
    edges = graph.edges.persist(StorageLevel.MEMORY_AND_DISK)

    def _init() -> DataFrame:
        st = init(graph.vertices)
        if "active" not in st.columns:
            st = st.withColumn("active", F.lit(True))
        return st.repartition(P, "id")

    def body(state: DataFrame, rnd: int):
        # joined frame: every edge with its source vertex's state columns
        src_state = state.filter("active").hint("shuffle_hash")
        joined = edges.join(src_state, edges.src == src_state.id)
        msgs = message(joined)
        inbox = msgs.groupBy("dst").agg(combine().alias("msg"))
        plan = update(state, inbox.hint("shuffle_hash"))
        if "active" not in plan.columns:
            plan = plan.withColumn("active", F.lit(True))

        def finalize(st: DataFrame) -> dict:
            active = st.filter("active").count()
            return {"converged": active == 0, "active": active}

        return plan, finalize

    try:
        return run_supersteps(
            _init, body, max_rounds=max_iter,
            checkpoint_dir=checkpoint_dir, resume=resume,
        )
    finally:
        edges.unpersist()
