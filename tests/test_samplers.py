"""GLE-shaped samplers: node2vec random walks + negative sampling
(learning_engine/graph-learn/graphlearn/src/core/operator/sampler/ —
random_walk.cc, negative_sampler.cc; SURVEY declares the learning engine
out of engine scope, these are the data-pipeline renderings)."""

from __future__ import annotations

from conftest import make_graph

from graphscope_spark.algorithms.sampling import negative_sample, random_walks

# 2-cycle with escapes: every vertex can either return to prev or move on
CYCLE_EDGES = [
    (0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (3, 0), (0, 3),
    (0, 2), (2, 0),
]


def _paths(df):
    return {r["walker"]: r["path"] for r in df.collect()}


def test_random_walks_shape_and_edges(spark):
    g = make_graph(spark, CYCLE_EDGES)
    out = random_walks(
        g, sources=[0, 1, 2], walk_length=3, walks_per_source=2, seed=7
    ).collect()
    assert len(out) == 6  # one row per walk
    eset = set(CYCLE_EDGES)
    for r in out:
        hops = [int(x) for x in r["path"].split("->")]
        assert hops[0] == r["source"]
        assert r["hops"] == len(hops) - 1 <= 3
        for a, b in zip(hops, hops[1:]):
            assert (a, b) in eset  # every step walks a real edge


def test_random_walks_deterministic_and_seeded(spark):
    g = make_graph(spark, CYCLE_EDGES, num_partitions=2)
    a = _paths(random_walks(g, [0, 1], walk_length=4, seed=11))
    g2 = make_graph(spark, CYCLE_EDGES, num_partitions=7)
    b = _paths(random_walks(g2, [0, 1], walk_length=4, seed=11))
    assert a == b  # partition-count invariant
    c = _paths(random_walks(g, [0, 1], walk_length=4, seed=12))
    assert a != c  # the seed actually steers the walk


def test_random_walks_return_bias_tiers(spark):
    """On a chord-free bidirectional ring the non-return candidate is
    always far-tier, so the p/q tiers decide deterministically: a huge
    return penalty (p=2²⁸ ⇒ f_return=2³⁰ vs f_far=4) never backtracks; a
    huge far penalty (q=2²⁸, f_return=1) always backtracks."""
    ring = [(i, (i + 1) % 5) for i in range(5)]
    ring += [(b, a) for a, b in ring]
    g = make_graph(spark, ring)
    never_return = random_walks(
        g, [0, 1, 2, 3], walk_length=4, p=2.0**28, q=1.0, seed=3
    )
    for r in never_return.collect():
        hops = [int(x) for x in r["path"].split("->")]
        for i in range(2, len(hops)):
            assert hops[i] != hops[i - 2], f"returned to prev: {hops}"
    always_return = random_walks(
        g, [0, 1, 2, 3], walk_length=4, p=2.0**-20, q=2.0**28, seed=3
    )
    for r in always_return.collect():
        hops = [int(x) for x in r["path"].split("->")]
        for i in range(2, len(hops)):
            assert hops[i] == hops[i - 2], f"did not backtrack: {hops}"


def test_random_walks_walks_per_source_diverge(spark):
    g = make_graph(spark, CYCLE_EDGES)
    out = random_walks(g, [0], walk_length=4, walks_per_source=4, seed=5)
    paths = set(_paths(out).values())
    assert len(paths) >= 2  # same source, different walk ids -> diverge


def test_negative_sample_excludes_neighbors_and_self(spark):
    g = make_graph(spark, CYCLE_EDGES)
    out = negative_sample(g, sources=[0, 1, 2, 3], k=8, seed=9).collect()
    nbrs = {}
    for s, d in CYCLE_EDGES:
        nbrs.setdefault(s, set()).add(d)
    assert out  # something survives the filter on this graph
    for r in out:
        assert r["neg"] != r["src"]
        assert r["neg"] not in nbrs[r["src"]]


def test_negative_sample_degree_weighted_and_invariant(spark):
    # vertex 9 has in-degree 6, vertices 8/0 in-degree 1 — sources 5..7
    # have no true edge to 9, so 9 must dominate their negative draws
    edges = [(i, 9) for i in range(4)] + [(9, 8), (8, 0), (0, 8), (4, 9), (3, 9)]
    g = make_graph(spark, edges, num_partitions=3)
    rows = negative_sample(g, sources=[5, 6, 7], k=8, seed=1).collect()
    hits = [r["neg"] for r in rows]
    assert hits.count(9) > max(hits.count(8), hits.count(0))
    g2 = make_graph(spark, edges, num_partitions=8)
    rows2 = negative_sample(g2, sources=[5, 6, 7], k=8, seed=1).collect()
    key = lambda r: (r["src"], r["draw"], r["neg"])  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, rows2))


def test_negative_sample_k_bound(spark):
    g = make_graph(spark, CYCLE_EDGES)
    rows = negative_sample(g, sources=[0, 1], k=5, seed=2).collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r["src"], []).append(r["draw"])
    for src, draws in per_src.items():
        assert len(draws) <= 5
        assert len(set(draws)) == len(draws)


def test_edge_sample_shape_determinism_and_uniform_replay(spark):
    from graphscope_spark.algorithms.sampling import edge_sample

    g = make_graph(spark, CYCLE_EDGES)
    out = edge_sample(g, k=4, seed=3).collect()
    assert len(out) == 4
    eset = set(CYCLE_EDGES)
    assert all((r["src"], r["dst"]) in eset for r in out)
    # deterministic across partition counts, sensitive to seed
    g2 = make_graph(spark, CYCLE_EDGES, num_partitions=7)
    out2 = edge_sample(g2, k=4, seed=3).collect()
    key = lambda r: (r["src"], r["dst"])  # noqa: E731
    assert sorted(map(key, out)) == sorted(map(key, out2))
    out3 = edge_sample(g, k=4, seed=4).collect()
    assert sorted(map(key, out)) != sorted(map(key, out3))
    # k >= |E| degrades to the full edge set
    assert len(edge_sample(g, k=100, seed=3).collect()) == len(CYCLE_EDGES)


# ---------------------------------------------------------------------------
# topk_neighbor_sample (GLE topk_sampler.cc parity)
# ---------------------------------------------------------------------------

TOPK_EDGES = [
    # (src, dst, weight): vertex 0 has 5 out-edges with one weight tie
    (0, 1, 5.0), (0, 2, 3.0), (0, 3, 5.0), (0, 4, 1.0), (0, 5, 3.0),
    (1, 2, 2.0), (1, 3, 4.0),
    (2, 0, 7.0),
]


def test_topk_neighbor_sample_exact_and_ties(spark):
    from graphscope_spark.algorithms.sampling import topk_neighbor_sample

    g = make_graph(spark, TOPK_EDGES, weights=True)
    rows = {
        (r["src"], r["rk"]): (r["dst"], r["w"])
        for r in topk_neighbor_sample(g, k=3, salt=4).collect()
    }
    # vertex 0: weights 5,5,3,3,1 — ties break on dst ascending
    assert rows[(0, 1)] == (1, 5.0)
    assert rows[(0, 2)] == (3, 5.0)
    assert rows[(0, 3)] == (2, 3.0)
    # vertex 1 has only 2 out-edges: both kept, no padding
    assert rows[(1, 1)] == (3, 4.0)
    assert rows[(1, 2)] == (2, 2.0)
    assert (1, 3) not in rows
    # vertex 2: single edge
    assert rows[(2, 1)] == (0, 7.0)


def test_topk_neighbor_sample_salt_invariant(spark):
    from graphscope_spark.algorithms.sampling import topk_neighbor_sample

    g = make_graph(spark, TOPK_EDGES, weights=True, num_partitions=3)
    a = sorted(map(tuple, topk_neighbor_sample(g, k=2, salt=1).collect()))
    b = sorted(map(tuple, topk_neighbor_sample(g, k=2, salt=16).collect()))
    assert a == b  # hub-splitting salt never changes the result


# ---------------------------------------------------------------------------
# weighted_neighbor_sample (GLE edge_weight_sampler.cc parity)
# ---------------------------------------------------------------------------


def test_weighted_neighbor_sample_shape_and_validity(spark):
    from graphscope_spark.algorithms.sampling import weighted_neighbor_sample

    g = make_graph(spark, TOPK_EDGES, weights=True)
    rows = weighted_neighbor_sample(g, k=5, seed=3).collect()
    srcs = {s for s, _, _ in TOPK_EDGES}
    eset = {(s, d) for s, d, _ in TOPK_EDGES}
    # exactly one dst per (src, draw), k draws per src with out-edges
    assert len(rows) == len(srcs) * 5
    assert len({(r["src"], r["draw"]) for r in rows}) == len(rows)
    for r in rows:
        assert (r["src"], r["dst"]) in eset  # every draw is a real neighbor


def test_weighted_neighbor_sample_weight_dominance(spark):
    from graphscope_spark.algorithms.sampling import weighted_neighbor_sample

    # vertex 0: one 1000x-heavier neighbor must dominate the draws
    g = make_graph(
        spark, [(0, 1, 1000.0), (0, 2, 1.0)], weights=True
    )
    rows = weighted_neighbor_sample(g, k=40, seed=9).collect()
    picks = [r["dst"] for r in rows]
    assert len(picks) == 40
    assert picks.count(1) > 35  # ~1/1001 chance per draw of dst=2


def test_weighted_neighbor_sample_partition_invariant(spark):
    from graphscope_spark.algorithms.sampling import weighted_neighbor_sample

    g2 = make_graph(spark, TOPK_EDGES, weights=True, num_partitions=2)
    g8 = make_graph(spark, TOPK_EDGES, weights=True, num_partitions=8)
    a = sorted(map(tuple, weighted_neighbor_sample(g2, k=4).collect()))
    b = sorted(map(tuple, weighted_neighbor_sample(g8, k=4).collect()))
    assert a == b
