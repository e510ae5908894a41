"""FIXTURES.md §F5: checkpoint_resume and parallelism_invariance.

Mirrors the reference's guarantee that results are identical under any
fragment count (every reference test runs under mpirun -n 4) and our north
rule's mid-iteration resume requirement.
"""

from __future__ import annotations

import numpy as np

from tests.conftest import make_graph, p2p_mid
from tests.oracles import pagerank_oracle


def test_pagerank_resume_equals_uninterrupted(spark, tmp_path):
    from graphscope_spark.algorithms.pagerank import pagerank

    vertices, edges = p2p_mid(n=200, m=1600)
    g = make_graph(spark, edges, vertices)

    # Uninterrupted run.
    full = {r["id"]: r["pagerank"] for r in pagerank(g, tol=1e-9, max_iter=30).collect()}

    # Interrupted: stop after round 4 (checkpoint_every=2 → snapshot at 4).
    ck = str(tmp_path / "pr_ck")
    partial = pagerank(
        g, tol=1e-9, max_iter=4, checkpoint_dir=ck, checkpoint_every=2,
        return_result=True,
    )
    assert partial.rounds == 4 and not partial.converged

    # Resume to completion from the snapshot.
    resumed = pagerank(
        g, tol=1e-9, max_iter=30, checkpoint_dir=ck, checkpoint_every=2,
        return_result=True,
    )
    assert resumed.resumed_from == 4
    got = {
        r["id"]: r["rank"] for r in resumed.state.select("id", "rank").collect()
    }
    ids = sorted(full)
    np.testing.assert_allclose([got[i] for i in ids], [full[i] for i in ids], atol=1e-12)
    g.unpersist()


def test_checkpoint_manifest_lineage(spark, tmp_path):
    from graphscope_spark.algorithms.pagerank import pagerank
    from graphscope_spark.engine.checkpoint import CheckpointManager

    vertices, edges = p2p_mid(n=100, m=600)
    g = make_graph(spark, edges, vertices)
    ck = str(tmp_path / "pr_ck2")
    pagerank(g, tol=1e-9, max_iter=6, checkpoint_dir=ck, checkpoint_every=3,
             return_result=True)
    mgr = CheckpointManager(ck, spark)
    hist = mgr.history()
    assert [m["round"] for m in hist] == [3, 6]
    for m in hist:
        assert m["total_rows"] == len(vertices)
        assert all(p["rows"] >= 0 and p["bytes"] > 0 for p in m["partitions"])
        assert "eps" in m["metrics"] and "dangling_sum" in m["metrics"]
    g.unpersist()


def test_wcc_resume(spark, tmp_path):
    from graphscope_spark.algorithms.wcc import wcc

    vertices, edges = p2p_mid(n=300, m=320)
    g = make_graph(spark, edges, vertices)
    full = {r["id"]: r["component"] for r in wcc(g).collect()}
    ck = str(tmp_path / "wcc_ck")
    wcc(g, max_iter=2, checkpoint_dir=ck, checkpoint_every=2, return_result=True)
    resumed = wcc(g, checkpoint_dir=ck, checkpoint_every=2, return_result=True)
    assert resumed.resumed_from == 2
    got = {r["id"]: r["label"] for r in resumed.state.select("id", "label").collect()}
    assert got == full
    g.unpersist()


def test_parallelism_invariance(spark):
    """Same result under different partition counts (fnum analog)."""
    from graphscope_spark.algorithms.cdlp import cdlp
    from graphscope_spark.algorithms.pagerank import pagerank
    from graphscope_spark.algorithms.wcc import wcc

    vertices, edges = p2p_mid(n=150, m=900)
    outs = []
    for parts in (4, 32):
        g = make_graph(spark, edges, vertices, num_partitions=parts)
        pr = {r["id"]: r["pagerank"] for r in pagerank(g).collect()}
        cc = {r["id"]: r["component"] for r in wcc(g).collect()}
        lb = {r["id"]: r["label"] for r in cdlp(g, max_iter=5).collect()}
        outs.append((pr, cc, lb))
        g.unpersist()
    (pr1, cc1, lb1), (pr2, cc2, lb2) = outs
    ids = sorted(pr1)
    np.testing.assert_allclose([pr1[i] for i in ids], [pr2[i] for i in ids], atol=1e-9)
    assert cc1 == cc2 and lb1 == lb2
    want = pagerank_oracle(vertices, edges)
    np.testing.assert_allclose([pr1[i] for i in ids], [want[i] for i in ids], atol=1e-6)
