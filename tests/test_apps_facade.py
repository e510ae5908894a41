"""Client-app facade: the reference's flat graphscope.<app>() names resolve
(python/graphscope/analytical/app/__init__.py parity; JavaApp = declared
out of scope)."""

from __future__ import annotations

import re

import pytest

from tests.conftest import make_graph

import graphscope_spark.apps as apps

REF_INIT = "/root/reference/python/graphscope/analytical/app/__init__.py"


def test_every_reference_app_name_exists():
    try:
        src = open(REF_INIT).read()
    except OSError:
        pytest.skip("reference tree unavailable")
    flat = sorted({m for m in re.findall(r"import\s+(?:\\\s*)?(\w+)", src)}
                  - {"flash", "graphscope"})
    missing = [n for n in flat if n != "JavaApp" and not hasattr(apps, n)]
    assert missing == []


def test_custom_dispatch_and_numeric_assortativity(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    g = make_graph(spark, edges, vertices=[1, 2, 3, 4])
    assert apps.custom_analytical_algorithm(g, "wcc").count() == 4
    with pytest.raises(KeyError, match="unknown procedure"):
        apps.custom_analytical_algorithm(g, "nope")

    # numeric assortativity: attribute == id gives the same coefficient as
    # Pearson over endpoint ids
    from pyspark.sql import functions as F

    g2 = make_graph(spark, edges, vertices=[1, 2, 3, 4])
    g2.vertices.createOrReplaceTempView("_v")
    gv = g2.with_vertices(g2.vertices.withColumn("x", F.col("id") * 2.0)) \
        if hasattr(g2, "with_vertices") else None
    if gv is None:
        from graphscope_spark.graph.graph import Graph

        gv = Graph(
            g2.edges, vertices=g2.vertices.withColumn("x", F.col("id") * 2.0)
        )
    r = apps.numeric_assortativity_coefficient(gv, "x")
    import numpy as np

    sx = [1.0, 2, 3, 3]
    sy = [2.0, 3, 1, 4]
    expected = float(np.corrcoef([v * 2 for v in sx], [v * 2 for v in sy])[0, 1])
    assert abs(r - expected) < 1e-9
    g.unpersist()


def test_top_level_lazy_names():
    import graphscope_spark as gs

    assert callable(gs.pagerank) and callable(gs.wcc)        # apps.py
    assert callable(gs.cc_log) and callable(gs.k_center)     # flash.py
    with pytest.raises(AttributeError):
        gs.definitely_not_an_app


def test_neighbor_sample_determinism_and_fanout(spark):
    """GNN node-wise sampling: fanout caps hold, draws are deterministic,
    node-wise = a vertex samples the same neighbors for every root."""
    from graphscope_spark.algorithms.sampling import neighbor_sample

    edges = [(0, i) for i in range(1, 8)] + [(1, i) for i in range(2, 6)] + [(9, 0)]
    g = make_graph(spark, edges, vertices=list(range(10)))
    a = neighbor_sample(g, seeds=[0, 9], fanouts=[3, 2]).collect()
    b = neighbor_sample(g, seeds=[0, 9], fanouts=[3, 2]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    rows = [tuple(r) for r in a]
    # hop-1 fanout: each (root, hop=1, src) has ≤3 rows
    from collections import Counter

    c = Counter((r[0], r[1], r[2]) for r in rows)
    assert all(v <= 3 for k, v in c.items() if k[1] == 1)
    assert all(v <= 2 for k, v in c.items() if k[1] == 2)
    # node-wise: vertex 0 appears as hop-1 src for root 0 and hop-2 src for
    # root 9 — the dst draw must be identical
    d_r0 = {r[3] for r in rows if r[0] == 0 and r[2] == 0}
    d_r9 = {r[3] for r in rows if r[0] == 9 and r[2] == 0}
    assert d_r9 <= d_r0 and len(d_r0) == 3 and len(d_r9) == 2
    g.unpersist()
