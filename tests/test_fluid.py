"""Fluid communities (fluid-community.h / fluid-by-color.h)."""

from __future__ import annotations

import pytest

from tests.conftest import make_graph

from graphscope_spark.algorithms.fluid import fluid_communities


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def _two_cliques(spark):
    # cliques {0..3} and {10..13} joined by one bridge 3-10
    edges = []
    for base in (0, 10):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    edges.append((3, 10))
    return make_graph(spark, edges, vertices=[0, 1, 2, 3, 10, 11, 12, 13])


def test_fluid_two_cliques(spark):
    g = _two_cliques(spark)
    lab = _labels(fluid_communities(g, seeds=[0, 10]))
    assert {lab[i] for i in (0, 1, 2, 3)} == {0}
    assert {lab[i] for i in (10, 11, 12, 13)} == {1}


def test_fluid_deterministic(spark):
    g = _two_cliques(spark)
    a = _labels(fluid_communities(g, seeds=[0, 10]))
    b = _labels(fluid_communities(g, seeds=[0, 10]))
    assert a == b


def test_fluid_unreached_stays_unlabeled(spark):
    # isolated pair 20-21 is disconnected from every seed
    g = make_graph(
        spark, [(0, 1), (1, 2), (20, 21)], vertices=[0, 1, 2, 20, 21]
    )
    lab = _labels(fluid_communities(g, seeds=[0]))
    assert lab[0] == lab[1] == lab[2] == 0
    assert lab[20] == lab[21] == -1


def test_fluid_single_community_floods_component(spark):
    g = make_graph(spark, [(i, i + 1) for i in range(6)], vertices=list(range(7)))
    lab = _labels(fluid_communities(g, seeds=[3]))
    assert set(lab.values()) == {0}


def test_fluid_density_prefers_smaller_community(spark):
    """A contested vertex with one neighbor in each community joins the
    denser (smaller) one — the 1/cnt weighting that distinguishes fluid
    from plain LPA."""
    edges = []
    # big community seeded at 0: star 0-1..5 (6 members)
    for i in range(1, 6):
        edges.append((0, i))
    # small community seeded at 10: pair 10-11 (2 members)
    edges.append((10, 11))
    # contested vertex 20: one edge into each community
    edges += [(1, 20), (11, 20)]
    g = make_graph(
        spark, edges, vertices=[0, 1, 2, 3, 4, 5, 10, 11, 20]
    )
    lab = _labels(fluid_communities(g, seeds=[0, 10]))
    # at decision time 20 sees d[0] = 1/6 vs d[1] = 1/2 → joins community 1
    assert lab[20] == 1


def test_fluid_requires_seeds(spark):
    g = _two_cliques(spark)
    with pytest.raises(ValueError):
        fluid_communities(g, seeds=[])
