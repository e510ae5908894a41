from __future__ import annotations

import hashlib
import itertools

import pytest
from pyspark.sql import functions as F

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup
    (3, "completely different text about spark dataframes and shuffle partitions here"),
    (4, "der hund und die katze sind nicht das problem und der rest auch nicht"),
    (5, "le chat et le chien et les oiseaux des villes et la mer"),
    (6, "THE QUICK  brown fox jumps over the lazy dog near the river bank today"),  # case/ws variant of 0
    (7, "el gato y el perro por las calles una y otra vez los dias"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def _py_shingles(text, n=3):
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_exact_duplicates(docs):
    from graphscope_spark.operators.dedup import exact_duplicates

    rows = {r["sha256"]: r for r in exact_duplicates(docs).collect()}
    want_hash = hashlib.sha256(DOCS[0][1].encode()).hexdigest()
    grp = rows[want_hash]
    assert grp["n_docs"] == 2 and grp["canonical_id"] == 0 and grp["doc_ids"] == [0, 1]


def test_fingerprint_normalizes_case_and_ws(spark, docs):
    from graphscope_spark.operators.text import with_fingerprint

    fp = {r["doc_id"]: r["fingerprint"] for r in with_fingerprint(docs).collect()}
    assert fp[0] == fp[1] == fp[6]
    assert fp[0] != fp[2]


def test_shingles_match_python(docs):
    from graphscope_spark.operators.dedup import with_shingles

    rows = with_shingles(docs, n=3).select("doc_id", "shingles").collect()
    for r in rows:
        want = _py_shingles(DOCS[r["doc_id"]][1])
        assert set(r["shingles"]) == want, r["doc_id"]


def test_ngram_jaccard_pairs(docs):
    from graphscope_spark.operators.dedup import ngram_jaccard_pairs

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    # oracle: all-pairs python jaccard
    want = {}
    sh = {i: _py_shingles(t) for i, t in DOCS}
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if inter:
            j = inter / len(sh[a] | sh[b])
            if j >= 0.5:
                want[(a, b)] = j
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_minhash_lsh_finds_near_dups(docs):
    from graphscope_spark.operators.dedup import minhash_lsh_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    # the exact-dup pair and the near-dup pairs must be found
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs or (1, 2) in pairs
    # unrelated docs must not pair
    assert all(not (a == 3 or b == 3) for a, b in pairs)


def test_near_dup_clusters_transitive(docs):
    from graphscope_spark.operators.dedup import (
        minhash_lsh_pairs,
        near_dup_clusters,
    )

    clusters = {
        r["doc_id"]: r["cluster"]
        for r in near_dup_clusters(docs, threshold=0.5).collect()
    }
    # every doc appears exactly once (singletons included)
    assert sorted(clusters) == [d[0] for d in DOCS]
    # the exact/near-dup family 0,1,2,6 collapses to one cluster = min id
    assert clusters[0] == clusters[1] == clusters[6] == 0
    assert clusters[2] == 0  # transitive: 2 pairs with 0/1 via shingles
    # unrelated docs stay singletons labeled by their own id
    for d in (3, 4, 5, 7):
        assert clusters[d] == d
    # cluster labels agree with the pair graph: any pair shares a cluster
    for r in minhash_lsh_pairs(docs, threshold=0.5).collect():
        assert clusters[r["id_a"]] == clusters[r["id_b"]]


def test_minhash_deterministic(docs):
    from graphscope_spark.operators.dedup import with_minhash

    a = with_minhash(docs.select("doc_id", "text")).select("doc_id", "minhash").collect()
    b = with_minhash(docs.select("doc_id", "text")).select("doc_id", "minhash").collect()
    assert sorted(map(tuple, ((r["doc_id"], tuple(r["minhash"])) for r in a))) == \
           sorted(map(tuple, ((r["doc_id"], tuple(r["minhash"])) for r in b)))


def test_simhash_pairs(docs):
    from graphscope_spark.operators.dedup import simhash_pairs, with_simhash

    fps = {r["doc_id"]: r["simhash"] for r in with_simhash(docs).collect()}
    assert fps[0] == fps[1] == fps[6]  # identical token sets
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert got[(0, 1)] == 0
    # completeness: the 16-bit-chunk pigeonhole guarantees every pair with
    # hamming <= 3 shares a chunk, so ALL such pairs must be found
    want = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want


def test_lang_id(spark, docs):
    from graphscope_spark.operators.text import with_lang_id

    got = {r["doc_id"]: r["lang_pred"] for r in with_lang_id(docs).collect()}
    assert got[0] == "en" and got[4] == "de" and got[5] == "fr" and got[7] == "es"


def test_token_counts_and_quality(docs):
    from graphscope_spark.operators.text import (
        with_bpe_token_estimate,
        with_quality_score,
        with_token_count,
    )

    rows = with_token_count(with_bpe_token_estimate(with_quality_score(docs))).collect()
    for r in rows:
        assert r["n_tokens"] == len(DOCS[r["doc_id"]][1].split())
        assert r["n_bpe_tokens"] >= r["n_tokens"]
        assert 0.0 <= r["quality"] <= 1.0


def test_stratified_sample(spark):
    from graphscope_spark.operators.text import stratified_sample

    rows = [(i, f"t{i}", ["en", "de", "fr"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    s = stratified_sample(df, "lang", 5, hash_fn="portable")
    got = s.groupBy("lang").count().collect()
    assert {r["lang"]: r["count"] for r in got} == {"en": 5, "de": 5, "fr": 5}
    # deterministic across runs
    a = sorted(r["doc_id"] for r in s.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(df, "lang", 5, hash_fn="portable").collect()
    )
    assert a == b
    # over-ask returns every row of the stratum, no duplicates
    allr = stratified_sample(df, "lang", 1000, hash_fn="portable").collect()
    assert sorted(r["doc_id"] for r in allr) == list(range(90))
    # shortfall repair: a threshold that keeps ~nothing must still produce
    # the exact same sample as a generous one
    tight = sorted(
        r["doc_id"]
        for r in stratified_sample(
            df, "lang", 5, hash_fn="portable", oversample=0.01
        ).collect()
    )
    assert tight == a
    # xxhash64 fast path: same counts, deterministic
    x = stratified_sample(df, "lang", 5)
    assert x.count() == 15


def test_scrub_pii_masks_and_counts(spark):
    from graphscope_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [
            (0, "reach me at jo.doe+x@corp.example.org or 555-0199 thanks"),
            (1, "no pii here at all"),
            (2, "two mails a@b.io c@d.co and 555 1234"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert rows[0]["n_emails"] == 1 and rows[0]["n_phones"] == 1
    assert "<EMAIL>" in rows[0]["clean"] and "<PHONE>" in rows[0]["clean"]
    assert "jo.doe" not in rows[0]["clean"] and "0199" not in rows[0]["clean"]
    assert rows[1]["n_emails"] == 0 and rows[1]["clean"] == "no pii here at all"
    assert rows[2]["n_emails"] == 2 and rows[2]["n_phones"] == 1


def test_extract_url_domains(spark):
    from graphscope_spark.operators.text import extract_url_domains

    df = spark.createDataFrame(
        [
            (0, "see https://a.org/x and http://b.net plain"),
            (1, "again https://a.org/deep/path here"),
            (2, "none"),
        ],
        "doc_id long, text string",
    )
    got = {(r["domain"], r["n"]) for r in extract_url_domains(df).collect()}
    assert got == {("a.org", 2), ("b.net", 1)}


def test_type_token_ratio(spark):
    from graphscope_spark.operators.text import with_type_token_ratio

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "x y z"), (2, "w w w w")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["ttr"] for r in with_type_token_ratio(df).collect()}
    assert got == {0: 0.5, 1: 1.0, 2: 0.25}
