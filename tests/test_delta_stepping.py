"""Δ-stepping SSSP (sssp-dlt-step.h): same fixpoint, bounded re-relaxation."""

from __future__ import annotations

import random

from tests.conftest import make_graph

from graphscope_spark.algorithms.traversal import sssp, sssp_delta_stepping


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _rand_weighted(spark, n=35, m=90, seed=13):
    random.seed(seed)
    edges = {}
    while len(edges) < m:
        a, b = random.randrange(n), random.randrange(n)
        if a != b:
            edges[(a, b)] = round(0.5 + random.random() * 4, 2)
    return make_graph(
        spark,
        [(a, b, w) for (a, b), w in sorted(edges.items())],
        vertices=list(range(n)),
        weights=True,
    )


def test_delta_stepping_equals_sssp(spark):
    g = _rand_weighted(spark)
    assert _rows(sssp_delta_stepping(g, 0)) == _rows(sssp(g, 0))


def test_delta_stepping_delta_invariance(spark):
    """The fixpoint must not depend on the bucket width."""
    g = _rand_weighted(spark, seed=29)
    want = _rows(sssp(g, 0))
    for delta in (0.7, 2.0, 50.0):
        assert _rows(sssp_delta_stepping(g, 0, delta=delta)) == want


def test_delta_stepping_unreachable_and_unweighted(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (5, 6)], vertices=[0, 1, 2, 5, 6])
    got = dict(
        (r["id"], r["distance"])
        for r in sssp_delta_stepping(g, 0, weight_col=None).collect()
    )
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 5: None, 6: None}


def test_delta_stepping_bounds_rerelaxation(spark):
    """The design point: on a fixture where Bellman-Ford re-improves hub
    distances many times (each improvement re-ships the hub's out-edges),
    Δ-stepping settles buckets in order, so the total changed-vertex volume
    across rounds (the shuffle-volume proxy) is smaller."""
    n = 30
    edges = []
    # direct heavy edges 0→i (weight i) that the light chain undercuts hop
    # by hop: vertex i's distance improves every Bellman-Ford round until
    # round ~i, re-shipping its out-edges each time
    for i in range(1, n):
        edges.append((0, i, float(i)))
    for i in range(1, n - 1):
        edges.append((i, i + 1, 0.5))
    g = make_graph(spark, edges, vertices=list(range(n)), weights=True)
    bf = sssp(g, 0, return_result=True)
    ds = sssp_delta_stepping(g, 0, delta=1.0, return_result=True)
    assert _rows(
        bf.state.select("id", "dist")
    ) == _rows(ds.state.select("id", "dist"))
    bf_volume = sum(h.get("active", 0) for h in bf.history)
    ds_volume = sum(h.get("active", 0) for h in ds.history)
    assert ds_volume < bf_volume
