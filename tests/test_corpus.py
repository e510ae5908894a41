from __future__ import annotations

import hashlib

import pytest

from graphscope_spark.corpus.extractor import (
    extract_file_deps,
    repo_link_edges,
    repo_vertices,
    with_file_id,
    with_sha256,
)
from graphscope_spark.corpus.generator import file_row, intended_imports, synth_corpus


@pytest.fixture(scope="module")
def tiny(spark):
    df = synth_corpus(spark, n_files=24, n_repos=6, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def small(spark):
    df = synth_corpus(spark, n_files=500, n_repos=40, seed=42).cache()
    df.count()
    return df


def test_generator_deterministic(spark, tiny):
    again = synth_corpus(spark, n_files=24, n_repos=6, seed=42, num_partitions=3)
    a = sorted(tiny.collect())
    b = sorted(again.collect())
    assert a == b


def test_sha256_row_for_row(tiny):
    """The BASELINE input_hint invariant: engine sha256 == plain-Python oracle."""
    rows = with_sha256(tiny).select("repo", "path", "content", "sha256").collect()
    assert len(rows) == 24
    for r in rows:
        want = hashlib.sha256(r["content"].encode("utf-8")).hexdigest()
        assert r["sha256"] == want


def test_schema_matches_input_hint(tiny):
    assert [f.name for f in tiny.schema.fields] == [
        "repo", "path", "commit", "lang", "content",
    ]
    assert all(f.dataType.typeName() == "string" for f in tiny.schema.fields)
    assert tiny.select("commit").first()["commit"].__len__() == 40


def _oracle_edges(n_files, n_repos, seed):
    """Ground-truth (src_id_hashless) edges on raw file indices."""
    edges = set()
    for i in range(n_files):
        for j in intended_imports(i, n_files, seed):
            edges.add((i, j))
    return edges


def test_extract_file_deps_exact(spark, small):
    """Extractor recovers exactly the generator's intended import edges."""
    deps = extract_file_deps(small)
    fid = with_file_id(small)
    # map hash file_id back to the raw index via the path symbol f<i>
    import pyspark.sql.functions as F

    m = {
        r["file_id"]: int(r["sym"][1:])
        for r in fid.select(
            "file_id", F.regexp_extract("path", r"(f\d+)\.", 1).alias("sym")
        ).collect()
    }
    got = {(m[r["src"]], m[r["dst"]]) for r in deps.collect()}
    assert got == _oracle_edges(500, 40, 42)


def test_pandas_extraction_matches_builtin(spark, small):
    a = extract_file_deps(small, use_pandas=False)
    b = extract_file_deps(small, use_pandas=True)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_repo_link_graph_runs_pagerank(spark, small):
    from graphscope_spark.algorithms.pagerank import pagerank
    from graphscope_spark.graph.graph import Graph

    deps = extract_file_deps(small)
    edges = repo_link_edges(small, deps)
    verts = repo_vertices(small)
    assert edges.filter("src = dst").count() == 0
    g = Graph(edges, vertices=verts.select("id"), num_partitions=8)
    pr = pagerank(g, weight_col="weight", max_iter=50)
    rows = pr.collect()
    assert len(rows) == verts.count()
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-6
    g.unpersist()


def test_hub_skew_exists(small):
    """Zipf-ish repo sizes: the largest repo dominates (skew-path fixture)."""
    sizes = sorted(
        (r["cnt"] for r in small.groupBy("repo").count().withColumnRenamed("count", "cnt").collect()),
        reverse=True,
    )
    assert sizes[0] >= 10 * sizes[len(sizes) // 2]
