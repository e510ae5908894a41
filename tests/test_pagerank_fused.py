from __future__ import annotations

import numpy as np

from tests.conftest import ALL_FIXTURES, make_graph, p2p_mid
from tests.oracles import pagerank_oracle


def test_fused_equals_unfused_with_dangling(spark):
    from graphscope_spark.algorithms.pagerank import pagerank_ldbc

    vertices, edges = ALL_FIXTURES["dangling_chain"]
    g = make_graph(spark, edges, vertices)
    a = {r["id"]: r["pagerank"] for r in pagerank_ldbc(g, rounds=7).collect()}
    b = {r["id"]: r["pagerank"] for r in pagerank_ldbc(g, rounds=7, fuse_rounds=3).collect()}
    want = pagerank_oracle(vertices, edges, fixed_rounds=7)
    ids = sorted(want)
    np.testing.assert_allclose([a[i] for i in ids], [want[i] for i in ids], atol=1e-12)
    np.testing.assert_allclose([b[i] for i in ids], [want[i] for i in ids], atol=1e-12)
    g.unpersist()


def test_fused_p2p(spark):
    from graphscope_spark.algorithms.pagerank import pagerank_ldbc

    vertices, edges = p2p_mid(n=200, m=1500)
    g = make_graph(spark, edges, vertices)
    b = {r["id"]: r["pagerank"] for r in pagerank_ldbc(g, rounds=10, fuse_rounds=5).collect()}
    want = pagerank_oracle(vertices, edges, fixed_rounds=10)
    ids = sorted(want)
    np.testing.assert_allclose([b[i] for i in ids], [want[i] for i in ids], atol=1e-12)
    g.unpersist()
