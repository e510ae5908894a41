"""Skew-path regression tests (north rule: explicit hub-vertex splitting).

* salted exact-dedup: a 50k-fan-in duplicate group (one sha256 hub key)
  through the two-level salted combine must equal the single-level result.
  collect_list is holistic — partial aggregation ships one element per row —
  so the salt is what bounds a single reduce task's fan-in at scale.
* n-gram Jaccard document-frequency cap: a boilerplate shingle shared by
  3000 docs would alone create ~4.5M candidate pairs (and >10⁷ at 5k docs);
  the df cap drops it before the self-join while true near-dup pairs (whose
  overlap is made of rare shingles) survive.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_exact_dedup_hub_equals_unsalted(spark):
    from graphscope_spark.operators.dedup import exact_duplicates

    hub = spark.range(50_000).select(
        F.col("id").alias("doc_id"), F.lit("same text hub").alias("text")
    )
    rest = spark.range(50_000, 50_500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique "), F.col("id").cast("string")).alias("text"),
    )
    docs = hub.unionByName(rest)

    def norm(df):
        return sorted(
            (r["sha256"], r["n_docs"], r["canonical_id"], tuple(r["doc_ids"]))
            for r in df.collect()
        )

    plain = norm(exact_duplicates(docs))
    salted = norm(exact_duplicates(docs, salt_buckets=32))
    assert salted == plain
    hub_groups = [g for g in salted if g[1] == 50_000]
    assert len(hub_groups) == 1 and hub_groups[0][2] == 0


def test_ngram_df_cap_drops_boilerplate_keeps_near_dups(spark):
    from graphscope_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "aaa bbb ccc"
    rows = [(i, f"{boiler} t{i} u{i} v{i} w{i}") for i in range(3000)]
    # two genuine near-dups whose shared shingles are rare
    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    rows += [(3000, dup), (3001, dup)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=100)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert (3000, 3001) in got
    # identical docs, no boilerplate shingle in common text -> jaccard 1.0
    assert abs(got[(3000, 3001)] - 1.0) < 1e-9
    # no pair glued together only by the boilerplate shingle survives
    assert all(a >= 3000 for a, _ in got)


def test_ngram_cap_disabled_matches_capped_when_df_small(spark):
    from graphscope_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(i, f"w{i} x{i} y{i} z{i} common tail here") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        map(tuple, ngram_jaccard_pairs(docs, threshold=0.1, max_shingle_df=None)
            .collect())
    )
    b = sorted(
        map(tuple, ngram_jaccard_pairs(docs, threshold=0.1, max_shingle_df=1000)
            .collect())
    )
    assert a == b and len(a) > 0
