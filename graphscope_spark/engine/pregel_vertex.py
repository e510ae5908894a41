"""Per-vertex Pregel authoring surface — the GraphScope UDF-app compat shim.

Reference: ``@pregel(vd_type=..., md_type=...)`` class decorators with
``Init(v, context)`` / ``Compute(messages, v, context)`` / optional
``Combine(messages)`` staticmethods
(python/graphscope/analytical/udf/decorators.py:51-209,
core/app/pregel/i_vertex_program.h:45-76). The reference Cython-compiles
these server-side; here the per-vertex callbacks run inside
``applyInPandas`` over partition blocks — a genuine per-vertex Python
surface for porting GraphScope UDF apps unchanged in shape.

This is the COMPAT path: per-vertex Python is the slow path by design
(SURVEY §2.3 maps the fast path to the vectorized whole-column contract in
engine/pregel.py / engine/superstep.py). Scale behavior is still sound:
state and messages stay distributed, one shuffle per superstep, partitions
processed in parallel; only the inner loop is Python.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph

__all__ = ["pregel", "PregelContext", "PregelVertex", "run_pregel_vertex"]


def pregel(vd_type: str = "double", md_type: str = "double"):
    """Class decorator marking a per-vertex Pregel program (API-compatible
    with the reference's ``@pregel``). The class must define staticmethods
    ``Init(v, context)`` and ``Compute(messages, v, context)``; optional
    ``Combine(messages) -> value``."""

    def wrap(cls):
        cls._pregel_types = (vd_type, md_type)
        if not hasattr(cls, "Init") or not hasattr(cls, "Compute"):
            raise TypeError("@pregel class needs Init and Compute staticmethods")
        return cls

    return wrap


class PregelContext:
    def __init__(self, n_vertices: int, superstep: int):
        self._n = n_vertices
        self._superstep = superstep

    def get_total_num_vertices(self) -> int:
        return self._n

    def superstep(self) -> int:
        return self._superstep


class PregelVertex:
    """The ``v`` handed to Init/Compute: value get/set, outgoing edges,
    message sending, vote_to_halt — the reference's vertex facade."""

    __slots__ = ("id", "_value", "_halted", "_out", "_outbox")

    def __init__(self, vid, value, out_edges):
        self.id = vid
        self._value = value
        self._halted = False
        self._out = out_edges
        self._outbox: list[tuple[int, float]] = []

    def value(self):
        return self._value

    def set_value(self, v):
        self._value = v

    def out_edges(self):
        """list of (dst, weight) pairs."""
        return self._out

    def send(self, dst, value):
        self._outbox.append((int(dst), value))

    def send_to_neighbors(self, value):
        for dst, _w in self._out:
            self._outbox.append((int(dst), value))

    def vote_to_halt(self):
        self._halted = True


_OUT_SCHEMA = (
    "kind int, id long, value double, halted boolean, dst long, mval double"
)


def _aslist(x) -> list:
    """Arrow hands null arrays as None and lists as numpy arrays (whose
    truthiness raises) — normalize to a plain list."""
    if x is None:
        return []
    if isinstance(x, float):  # NaN placeholder
        return []
    return list(x)


def run_pregel_vertex(
    graph: Graph,
    program,
    max_iter: int = 50,
    weight_col: str | None = "weight",
) -> DataFrame:
    """Execute a ``@pregel`` per-vertex program; returns (id, value).

    Per superstep: ONE shuffle groups (state ⟂ inbox ⟂ out-edges) blocks by
    partition, ``applyInPandas`` runs the per-vertex Compute loop and emits
    updated state rows (kind=0) plus message rows (kind=1); messages are
    combined (``Combine`` → driver-side reduction inside the next round's
    block, or pre-combined with collect_list). Vote-to-halt terminates when
    every vertex is halted and no messages flow (default_worker.h:88-135
    ToTerminate analog).
    """
    spark = graph.spark
    P = graph.num_partitions
    n = graph.num_vertices
    combine: Callable | None = getattr(program, "Combine", None)
    # Combiner pushdown (ADVICE r2): a Python Combine applied after
    # collect_list gives no shuffle reduction and a hub vertex's whole inbox
    # lands in one array. When the program declares its Combine as a known
    # reduction (class attr ``combine_op`` ∈ min/max/sum — mirroring the
    # reference's kMin/kMax/kSum combinator registration), the reduction
    # runs as the Spark aggregate itself: map-side partial combine, O(1)
    # inbox per vertex. Otherwise we keep collect_list; hub fan-in is then
    # bounded by executor memory (documented limit of the compat path).
    combine_op = getattr(program, "combine_op", None)
    _AGG = {"min": F.min, "max": F.max, "sum": F.sum}
    if combine_op is not None and combine_op not in _AGG:
        raise ValueError(f"combine_op must be one of {sorted(_AGG)}")

    w = (
        F.col(weight_col).cast("double")
        if weight_col and weight_col in graph.edges.columns
        else F.lit(1.0)
    )
    # adjacency grouped + PERSISTED once: it is static and referenced every
    # round — left lazy, each superstep would re-run the edges groupBy
    adj = (
        graph.edges.select("src", "dst", w.alias("w"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.collect_list(F.struct("dst", "w")).alias("nbrs"))
        .persist()
    )
    part = F.pmod(F.xxhash64("id"), F.lit(P))

    # ---- Init (superstep 0, runs per-vertex too) ---------------------------
    def init_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ctx = PregelContext(n, 0)
        rows = []
        for r in pdf.itertuples(index=False):
            nbrs = [(e["dst"], e["w"]) for e in _aslist(r.nbrs)]
            v = PregelVertex(r.id, None, nbrs)
            program.Init(v, ctx)
            rows.append((0, v.id, v._value, v._halted, None, None))
            rows.extend((1, v.id, None, None, d, m) for d, m in v._outbox)
        return pd.DataFrame(
            rows, columns=["kind", "id", "value", "halted", "dst", "mval"]
        )

    base = (
        graph.vertices.select("id")
        .join(adj, "id", "left")
        .withColumn("_part", part)
    )
    out0 = base.groupBy("_part").applyInPandas(
        init_block, _OUT_SCHEMA
    ).localCheckpoint(eager=True)
    state = out0.filter("kind = 0").select("id", "value", "halted")
    msgs = out0.filter("kind = 1").select("dst", "mval")

    for superstep in range(1, max_iter + 1):
        if combine_op is not None:
            inbox = msgs.groupBy(F.col("dst").alias("id")).agg(
                F.array(_AGG[combine_op]("mval")).alias("inbox")
            )
        else:
            inbox = msgs.groupBy(F.col("dst").alias("id")).agg(
                F.collect_list("mval").alias("inbox")
            )
        blk = (
            state.join(inbox, "id", "left")
            .join(adj, "id", "left")
            .withColumn("_part", part)
        )

        def make_compute(_step):
            def compute_block(pdf: pd.DataFrame) -> pd.DataFrame:
                return _compute(pdf, _step)

            return compute_block

        def _compute(pdf: pd.DataFrame, _step: int) -> pd.DataFrame:
            ctx = PregelContext(n, _step)
            rows = []
            for r in pdf.itertuples(index=False):
                incoming = _aslist(r.inbox)
                if combine is not None and incoming:
                    incoming = [combine(incoming)]
                halted = bool(r.halted) and not incoming
                v = PregelVertex(
                    r.id, r.value,
                    [(e["dst"], e["w"]) for e in _aslist(r.nbrs)],
                )
                if halted:
                    rows.append((0, v.id, v._value, True, None, None))
                    continue
                program.Compute(incoming, v, ctx)
                rows.append((0, v.id, v._value, v._halted, None, None))
                rows.extend((1, v.id, None, None, d, m) for d, m in v._outbox)
            return pd.DataFrame(
                rows, columns=["kind", "id", "value", "halted", "dst", "mval"]
            )

        out = blk.groupBy("_part").applyInPandas(
            make_compute(superstep), _OUT_SCHEMA
        ).localCheckpoint(eager=True)
        state = out.filter("kind = 0").select("id", "value", "halted")
        msgs = out.filter("kind = 1").select("dst", "mval")
        status = state.agg(
            F.count(F.when(~F.col("halted"), 1)).alias("active")
        ).collect()[0]
        n_msgs = msgs.limit(1).count()
        if status["active"] == 0 and n_msgs == 0:
            break

    adj.unpersist()
    return state.select("id", "value")
