from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from tests.conftest import make_graph


def _clique_edges(nodes):
    return [(a, b) for a, b in itertools.combinations(nodes, 2)]


def test_louvain_two_cliques_with_bridge(spark):
    from graphscope_spark.algorithms.louvain import louvain

    c1 = list(range(1, 7))
    c2 = list(range(11, 17))
    edges = _clique_edges(c1) + _clique_edges(c2) + [(6, 11)]
    g = make_graph(spark, edges, c1 + c2)
    got = {r["id"]: r["community"] for r in louvain(g).collect()}
    assert len({got[v] for v in c1}) == 1
    assert len({got[v] for v in c2}) == 1
    assert got[1] != got[11]
    g.unpersist()


def test_louvain_improves_modularity_on_planted_partition(spark):
    from graphscope_spark.algorithms.louvain import louvain, modularity, _sym

    rng = random.Random(7)
    blocks = [list(range(b * 20, b * 20 + 20)) for b in range(4)]
    edges = set()
    for blk in blocks:
        for a, b in itertools.combinations(blk, 2):
            if rng.random() < 0.45:
                edges.add((a, b))
    allv = [v for blk in blocks for v in blk]
    for _ in range(40):  # sparse inter-block noise
        a, b = rng.sample(allv, 2)
        edges.add((min(a, b), max(a, b)))
    g = make_graph(spark, sorted(edges), allv)
    out = louvain(g)
    assign = out.select("id", F.col("community").alias("c"))
    sym = _sym(g.edges, None)
    q = modularity(sym, assign)
    # singleton partition has Q ~ 0; planted partition should reach well above
    assert q > 0.4, q
    # and the planted blocks should be mostly recovered
    got = {r["id"]: r["c"] for r in assign.collect()}
    for blk in blocks:
        from collections import Counter

        top = Counter(got[v] for v in blk).most_common(1)[0][1]
        assert top >= 14, f"block fractured: {Counter(got[v] for v in blk)}"
    g.unpersist()
