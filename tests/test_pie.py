"""@pie decorator surface — a reference-tutorial-shaped PIE SSSP.

The app below is the reference's ``SSSP_PIE``
(python/graphscope/tests/unittest/test_udf_app.py:570-618) with only the
Cython-isms removed (``graphscope.declare`` handle, byte-string config);
every loop, method name and call shape is the tutorial's.
"""

from __future__ import annotations

import random

from tests.conftest import make_graph
from tests.oracles import sssp_oracle

from graphscope_spark.engine.pie import (
    MessageStrategy,
    PIEAggregateType,
    pie,
    run_pie,
)


def test_pie_decorator_validates():
    import pytest

    with pytest.raises(ValueError):

        @pie()
        class Broken:
            @staticmethod
            def Init(frag, context):
                pass


def test_pie_sssp_matches_dijkstra(spark):
    @pie(vd_type="double", md_type="double")
    class SSSP_PIE:
        @staticmethod
        def Init(frag, context):
            v_label_num = frag.vertex_label_num()
            for v_label_id in range(v_label_num):
                nodes = frag.nodes(v_label_id)
                context.init_value(
                    nodes, v_label_id, 1000000000.0, PIEAggregateType.kMinAggregate
                )
                context.register_sync_buffer(v_label_id, MessageStrategy.kSyncOnOuterVertex)

        @staticmethod
        def PEval(frag, context):
            src = context.get_config(b"src")
            source = None
            v_label_num = frag.vertex_label_num()
            for v_label_id in range(v_label_num):
                source = frag.get_inner_node(v_label_id, src)
                if source is not None:
                    break
            if source is None:
                return
            context.set_node_value(source, 0)
            e_label_num = frag.edge_label_num()
            for e_label_id in range(e_label_num):
                edges = frag.get_outgoing_edges(source, e_label_id)
                for e in edges:
                    dst = e.neighbor()
                    distv = e.get_int(2)
                    if context.get_node_value(dst) > distv:
                        context.set_node_value(dst, distv)

        @staticmethod
        def IncEval(frag, context):
            v_label_num = frag.vertex_label_num()
            e_label_num = frag.edge_label_num()
            for v_label_id in range(v_label_num):
                iv = frag.inner_nodes(v_label_id)
                for v in iv:
                    v_dist = context.get_node_value(v)
                    for e_label_id in range(e_label_num):
                        es = frag.get_outgoing_edges(v, e_label_id)
                        for e in es:
                            u = e.neighbor()
                            u_dist = v_dist + e.get_int(2)
                            if context.get_node_value(u) > u_dist:
                                context.set_node_value(u, u_dist)

    random.seed(11)
    n = 40
    edges = set()
    for _ in range(120):
        a, b = random.randrange(n), random.randrange(n)
        if a != b:
            edges.add((a, b, 1 + (a * 7 + b * 13) % 5))
    edges = sorted(edges)
    vertices = list(range(n))
    g = make_graph(spark, edges, vertices=vertices, weights=True)

    out = run_pie(g, SSSP_PIE, config={"src": 1})
    got = {r["id"]: r["value"] for r in out.collect()}

    want = sssp_oracle(vertices, edges, 1)
    for v in vertices:
        exp = want[v] if want[v] != float("inf") else 1000000000.0
        assert got[v] == exp, (v, got[v], exp)
