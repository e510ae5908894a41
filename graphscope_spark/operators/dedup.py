"""Deduplication operators over document tables.

Five tiers, cheapest first (driver brief; each is a ``queries()`` entry or
pytest-verified):

* exact            — sha256 hash groupBy (one shuffle)
* fingerprint      — normalized xxhash64 (whitespace/case-insensitive exact)
* n-gram Jaccard   — word-shingle overlap above a threshold (exact set
                     similarity; quadratic within shingle-sharing candidates)
* MinHash + LSH    — shingle → K minhashes → B bands; band-bucket join gives
                     candidates in one equijoin, verified by signature
                     similarity (the 100 TB path: no pairwise cross product)
* SimHash          — 64-bit weighted-bit fingerprint; near-dups = small
                     Hamming distance, bucketed by 16-bit chunks
                     (Charikar'02 via block-permutation candidates)

All hashing is ``xxhash64``/``md5`` built-ins — deterministic across runs
and cluster sizes; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "exact_duplicates",
    "with_shingles",
    "ngram_jaccard_pairs",
    "with_minhash",
    "minhash_lsh_pairs",
    "with_simhash",
    "simhash_pairs",
    "near_dup_clusters",
]

# 2^31 - 1 (Mersenne prime): keeps h·a+b < 2^62, no int64 overflow under ANSI
_P = 2_147_483_647


def portable_str_hash(col, seed: int = 7):
    """Engine-portable string hash: first 60 bits of ``md5(seed ':' s)``
    mod 2³¹−1. Bit-identical in Spark
    (``conv(substring(md5(.),1,15),16,10)``, md5 is JVM-intrinsic — a
    per-character fold was measured ~4× slower) and DuckDB
    (``('0x' || substr(md5(.),1,15))::BIGINT``), so pipelines built on it
    are fully oracle-checkable — the xxhash64 default stays the fastest
    path; this is the verification path with identical plan shape.
    DuckDB twin::

        ('0x' || substr(md5(SEED || ':' || s), 1, 15))::BIGINT % 2147483647
    """
    if isinstance(col, str):
        col = F.col(col)
    hx = F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15)
    return F.conv(hx, 16, 10).cast("long") % F.lit(_P)


def _shingle_hash(hash_fn: str):
    if hash_fn == "portable":
        return lambda s: portable_str_hash(s)
    return lambda s: F.abs(F.xxhash64(s)) % F.lit(_P)


def exact_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt_buckets: int = 0,
) -> DataFrame:
    """(sha256, n_docs, canonical_id, doc_ids) — groups with n_docs > 1 are
    exact duplicate sets; canonical = min id.

    ``collect_list`` is a HOLISTIC aggregate: map-side partial aggregation
    still ships one element per row, so a viral duplicate (one sha256 shared
    by millions of docs) funnels its whole group through a single reduce
    task. ``salt_buckets > 0`` enables the explicit two-level combine of
    engine/aggregate.py — partial lists per (sha256, salt), flattened in a
    second exact shuffle — bounding any single task's fan-in to group/buckets
    (north-rule skew splitting; regression test on a 50k-fan-in hub fixture
    in tests/test_skew.py)."""
    hashed = df.select(
        F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("sha256")
    )
    if salt_buckets > 0:
        from graphscope_spark.engine.aggregate import salted_agg

        return salted_agg(
            hashed,
            key="sha256",
            partial_aggs=[
                F.count(F.lit(1)).alias("_n"),
                F.min("id").alias("_min"),
                F.collect_list("id").alias("_ids"),
            ],
            final_aggs=[
                F.sum("_n").alias("n_docs"),
                F.min("_min").alias("canonical_id"),
                F.sort_array(F.flatten(F.collect_list("_ids"))).alias("doc_ids"),
            ],
            salt_from="id",
            buckets=salt_buckets,
        )
    return (
        hashed.groupBy("sha256")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("id").alias("canonical_id"),
            F.sort_array(F.collect_list("id")).alias("doc_ids"),
        )
    )


def with_shingles(
    df: DataFrame, text_col: str = "text", n: int = 3, out: str = "shingles"
) -> DataFrame:
    """Distinct word n-gram shingles as an array column (built-in transform
    over a token sequence — no UDF)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    # guard: Spark sequence(1, k) DESCENDS for k < 1, so short docs need an
    # explicit empty-array branch
    return df.withColumn(
        out,
        F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>")
        ),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 10_000,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs sharing ≥1 shingle with exact word
    n-gram Jaccard ≥ threshold. The shingle equijoin prunes the cross
    product; ``max_shingle_df`` drops shingles whose document frequency
    exceeds the ceiling BEFORE the self-join — without it one boilerplate
    shingle shared by 1M docs creates ~5·10¹¹ candidate pairs. Dropping a
    df>C shingle only removes candidate pairs glued together by text that
    C+ documents share (boilerplate, not near-duplication), so the
    threshold regime is preserved; Jaccard for surviving pairs still uses
    the FULL shingle-set sizes (a dropped shared shingle can only lower the
    estimate). See minhash_lsh_pairs for the fully sublinear path."""
    from pyspark.storagelevel import StorageLevel

    sh = with_shingles(df.select(F.col(id_col).alias("id"), text_col), text_col, n)
    # the exploded shingle table feeds BOTH self-join sides (+ the df cap);
    # Spark does not dedupe repeated subtrees, so without a persist the
    # shingle expressions are evaluated 3-4x
    ex = sh.select("id", F.explode("shingles").alias("sh")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # FULL shingle-set sizes (see note below): shingles are array_distinct,
    # so |set| = the doc's row count in the exploded table — reuses the
    # persisted explode instead of re-tokenizing every document once per
    # self-join side (docs with zero shingles can't appear in `pairs`, so
    # dropping them from `sizes` is harmless for the inner joins).
    sizes = ex.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_shingle_df is not None:
        rare = (
            ex.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("sh")
        )
        # persist the capped table: both self-join sides reference it, and
        # without materialization each side re-runs the document-frequency
        # aggregation (it appeared twice in the physical plan).
        ex = ex.join(rare, "sh", "left_semi").persist(
            StorageLevel.MEMORY_AND_DISK
        )
    pairs = (
        ex.alias("a")
        .join(ex.alias("b"), "sh")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        pairs.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    out: str = "minhash",
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash signature (array<long> of length num_hashes) over word
    n-gram shingles: h_i(s) = (a_i·h(s) + b_i) mod p, min over s; h =
    xxhash64 (fast path) or :func:`portable_str_hash` (oracle path)."""
    sh = with_shingles(df, text_col, n, out="_sh")
    # materialize the per-shingle base hash into its own column first: all
    # num_hashes signature lanes reference it, and inlined into the array()
    # expression the (md5-based, expensive) hash would be evaluated once
    # per lane instead of once per shingle.
    hashed = sh.withColumn(
        "_hb", F.transform(F.col("_sh"), _shingle_hash(hash_fn))
    )
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("_hb"),
                    lambda h: (
                        h * F.lit(2 * (seed + i) + 1) + F.lit(7919 * (i + 1))
                    ) % F.lit(_P),
                )
            )
            for i in range(num_hashes)
        ]
    )
    return hashed.withColumn(out, sig).drop("_sh", "_hb")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id_a, id_b, est_jaccard) near-dup pairs: band-bucket collisions →
    signature-estimated Jaccard ≥ threshold.

    rows/band = num_hashes/bands; collision prob ≈ 1-(1-j^r)^b — with 64/16
    the S-curve knees near j≈0.5. The bucket join is the only pair-producing
    operator: at 100 TB this is a single shuffle on (band, bucket-hash)."""
    r = num_hashes // bands
    mh = with_minhash(
        df.select(F.col(id_col).alias("id"), text_col), text_col, n, num_hashes,
        seed=seed, hash_fn=hash_fn,
    )

    def _bucket(b):
        key = F.concat_ws(",", *[F.col("minhash")[b * r + j] for j in range(r)])
        # fast path re-hashes the band key to a long; portable path keeps the
        # raw string key (identically joinable in DuckDB)
        return key if hash_fn == "portable" else F.xxhash64(key)

    bucket_rows = mh.select(
        "id",
        "minhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), _bucket(b).alias("bucket")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "minhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    from pyspark.storagelevel import StorageLevel

    # both self-join sides reference the 64-hash signature computation —
    # persist so it is evaluated once
    bucket_rows = bucket_rows.persist(StorageLevel.MEMORY_AND_DISK)
    cand = (
        bucket_rows.alias("a")
        .join(bucket_rows.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.minhash").alias("ma"),
            F.col("b.minhash").alias("mb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with(F.col("ma"), F.col("mb"), lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(float(num_hashes))
    return cand.select("id_a", "id_b", est.alias("est_jaccard")).filter(
        F.col("est_jaccard") >= threshold
    )


def with_simhash(
    df: DataFrame, text_col: str = "text", out: str = "simhash",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash over word tokens: bit k of the fingerprint is the sign of
    Σ_tokens (±1 per token's hash bit k). Built-in-only: per-bit sums via
    aggregate over the token hash array.

    ``hash_fn="xxhash64"`` → 64-bit fingerprint (bit 63 = sign bit);
    ``hash_fn="portable"`` → 60-bit fingerprint from two 31-bit portable
    hashes (bits 0-29 from seed 7, bits 30-59 from seed 13), bit-identical
    in DuckDB for the oracle path."""
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))

    def _votes(hashes, bit):
        # factory keeps the merge lambda strictly 2-arg (PySpark resolves
        # higher-order-function arity from the signature)
        def merge(acc, h):
            return acc + F.when(
                F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return F.aggregate(hashes, F.lit(0), merge)

    # hoist the token-hash arrays into their own columns: every one of the
    # 30/64 bit-expressions references them, and inlined they would be
    # re-evaluated once per bit instead of once per token (the md5-based
    # portable hash made this the dominant cost of the whole operator).
    bit_exprs = []
    if hash_fn == "portable":
        base = df.withColumn(
            "_h1", F.transform(toks, lambda t: portable_str_hash(t, 7))
        ).withColumn(
            "_h2", F.transform(toks, lambda t: portable_str_hash(t, 13))
        )
        specs = [(F.col("_h1"), k) for k in range(30)] + [
            (F.col("_h2"), k) for k in range(30)
        ]
        for k, (hashes, src_bit) in enumerate(specs):
            bit_exprs.append(
                F.when(_votes(hashes, src_bit) > 0, F.lit(1 << k).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            )
        drop_cols = ["_h1", "_h2"]
    else:
        base = df.withColumn("_h", F.transform(toks, lambda t: F.xxhash64(t)))
        for k in range(64):
            bit_val = (1 << k) if k < 63 else -(1 << 63)  # bit 63 = sign bit
            bit_exprs.append(
                F.when(_votes(F.col("_h"), k) > 0, F.lit(bit_val).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            )
        drop_cols = ["_h"]
    fp = bit_exprs[0]
    for e in bit_exprs[1:]:
        fp = fp + e
    return base.withColumn(out, fp).drop(*drop_cols)


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(simhash) ≤ max_hamming.

    Candidates via the block-permutation trick: split the fingerprint into 4
    chunks (16 bits for the 64-bit fast path, 15 for the 60-bit portable
    path); any pair within distance ≤3 shares at least one exact chunk, so
    a 4-way chunk equijoin finds all of them without a cross product."""
    sh = with_simhash(
        df.select(F.col(id_col).alias("id"), text_col), text_col,
        hash_fn=hash_fn,
    )
    cw = 15 if hash_fn == "portable" else 16
    mask = (1 << cw) - 1
    chunks = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * cw)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("id", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val"))
    from pyspark.storagelevel import StorageLevel

    chunks = chunks.persist(StorageLevel.MEMORY_AND_DISK)
    cand = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["chunk", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def near_dup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    hash_fn: str = "xxhash64",
    **minhash_kwargs,
) -> DataFrame:
    """(id, cluster) — near-duplicate CLUSTERS: the MinHash+LSH pair graph's
    connected components, cluster = min doc id in the component (documents
    with no near-dup form singletons).

    The real-pipeline shape of dedup at corpus scale: pairs alone double-
    count transitive duplicates (A≈B≈C yields 2-3 pairs); keep-one-per-
    cluster needs the component structure. Pairs come from
    :func:`minhash_lsh_pairs` (banded bucket equijoin — no all-pairs) and
    the components from the wcc kernel (min-label frontier propagation);
    near-dup components are shallow, so wcc converges in a handful of
    rounds. Reference analogue: dedup pipelines over
    apps/flash/connectivity + the GIE pattern ops; clustering convention as
    in SURVEY §2 (component = min member id, exact-match comparable).
    """
    from graphscope_spark.algorithms.wcc import wcc
    from graphscope_spark.graph.graph import Graph

    pairs = minhash_lsh_pairs(
        df,
        id_col=id_col,
        text_col=text_col,
        threshold=threshold,
        hash_fn=hash_fn,
        **minhash_kwargs,
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    g = Graph(edges, vertices=df.select(F.col(id_col).cast("long").alias("id")))
    out = wcc(g).select(
        F.col("id").alias(id_col), F.col("component").alias("cluster")
    )
    g.unpersist()
    return out
