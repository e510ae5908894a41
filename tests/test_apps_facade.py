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
