from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import ALL_FIXTURES, make_graph, p2p_mid
from tests.oracles import sssp_oracle


def test_pregel_sssp(spark):
    """SSSP written as a user Pregel program (the reference's sssp_pregel.h
    demo) must match the Dijkstra oracle."""
    from graphscope_spark.engine.pregel import run_pregel

    vertices, edges = p2p_mid(n=120, m=500)
    wedges = [(s, d, 1.0 + (s + d) % 4) for s, d in edges]
    g = make_graph(spark, wedges, vertices, weights=True)
    INF = float("inf")

    res = run_pregel(
        g,
        init=lambda v: v.select(
            "id",
            F.when(F.col("id") == 1, 0.0).otherwise(INF).alias("dist"),
            (F.col("id") == 1).alias("active"),
        ),
        message=lambda j: j.select(
            "dst", (F.col("dist") + F.col("weight")).alias("msg")
        ),
        combine=lambda: F.min("msg"),
        update=lambda state, inbox: state.join(
            inbox, state.id == inbox.dst, "left"
        ).select(
            state.id.alias("id"),
            F.least(F.col("dist"), F.coalesce(F.col("msg"), F.lit(INF))).alias("dist"),
            (F.coalesce(F.col("msg"), F.lit(INF)) < F.col("dist")).alias("active"),
        ),
        max_iter=200,
    )
    assert res.converged
    got = {r["id"]: r["dist"] for r in res.state.select("id", "dist").collect()}
    want = sssp_oracle(vertices, wedges, 1)
    for v in vertices:
        if math.isinf(want[v]):
            assert math.isinf(got[v])
        else:
            assert abs(got[v] - want[v]) < 1e-9
    g.unpersist()


def test_voterank(spark):
    from graphscope_spark.algorithms.paths import voterank

    # star hub: hub must be elected first
    vertices, edges = ALL_FIXTURES["star_hub"]
    g = make_graph(spark, edges, vertices)
    seeds = voterank(g, 3)
    assert seeds[0] == 0 and len(seeds) == 3 and len(set(seeds)) == 3
    g.unpersist()


def test_apsp_and_simple_paths(spark):
    from graphscope_spark.algorithms.paths import (
        all_pairs_shortest_path_length,
        all_simple_paths,
        is_simple_path,
    )

    vertices, edges = ALL_FIXTURES["diamond"]  # 1->2,1->3,2->4,3->4
    g = make_graph(spark, edges, vertices)
    d = {
        (r["source"], r["id"]): r["distance"]
        for r in all_pairs_shortest_path_length(g, [1, 2]).collect()
    }
    # unreachable pairs are absent (sparse contract): 2 cannot reach 3
    assert d[(1, 4)] == 2 and d[(1, 2)] == 1 and (2, 3) not in d
    assert is_simple_path(g, [1, 2, 4])
    assert not is_simple_path(g, [1, 4])
    assert not is_simple_path(g, [1, 2, 1])
    paths = {tuple(r["path"]) for r in all_simple_paths(g, 1, 4, 3).collect()}
    assert paths == {(1, 2, 4), (1, 3, 4)}
    g.unpersist()


def test_average_shortest_path_length(spark):
    """Reference client app: a = Σ d(s,t) / (|S|·(n−1)); unreachable pairs
    contribute 0 (grape convention, no NetworkX disconnected raise)."""
    from graphscope_spark.algorithms.paths import average_shortest_path_length

    vertices, edges = ALL_FIXTURES["diamond"]  # 1->2,1->3,2->4,3->4; n=4
    g = make_graph(spark, edges, vertices)
    # all-pairs: from 1: d=1,1,2; from 2: d(4)=1; from 3: d(4)=1 → Σ=6
    full = average_shortest_path_length(g).collect()[0]["avg_dist"]
    assert full == round(6 / (4 * 3), 6)
    # sampled: sources [1, 2] → Σ = 4 + 1 = 5 over 2·3 ordered pairs
    samp = average_shortest_path_length(g, sources=[1, 2]).collect()[0]["avg_dist"]
    assert samp == round(5 / (2 * 3), 6)
    g.unpersist()


def test_assortativity_and_boundary(spark):
    from graphscope_spark.algorithms.assortativity import (
        attribute_assortativity,
        average_degree_connectivity,
        degree_assortativity,
        edge_boundary,
        node_boundary,
    )
    from graphscope_spark.graph.graph import Graph

    # perfectly assortative by attribute: two cliques
    edges = [(1, 2), (2, 1), (3, 4), (4, 3)]
    vdf = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "id long, grp string"
    )
    g = Graph(spark.createDataFrame(edges, "src long, dst long"), vertices=vdf,
              num_partitions=4)
    assert abs(attribute_assortativity(g, "grp") - 1.0) < 1e-12

    r = degree_assortativity(g)
    assert math.isnan(r) or abs(r) < 1e-9 or r == 0.0  # all degrees equal -> undefined/0

    adc = {r["degree"]: r["avg_nbr_degree"] for r in average_degree_connectivity(g).collect()}
    assert adc == {1: 1.0}

    s = spark.createDataFrame([(1,), (2,)], "id long")
    vertices2, edges2 = ALL_FIXTURES["diamond"]
    g2 = make_graph(spark, edges2, vertices2)
    nb = {r["id"] for r in node_boundary(g2, s).collect()}
    assert nb == {3, 4}
    eb = {(r["src"], r["dst"]) for r in edge_boundary(g2, s).collect()}
    assert eb == {(1, 3), (2, 4)}
    g.unpersist()
    g2.unpersist()
