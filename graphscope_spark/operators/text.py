"""Text analysis over document tables — all JVM-side built-ins.

The training-data-pipeline operators a 100 TB corpus needs (driver brief):
language-ID (stopword-marker heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting. Every expression is a built-in ``pyspark.sql.functions``
composition: whole-stage codegen, predicate-pushdown friendly, no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_token_count",
    "with_bpe_token_estimate",
    "with_lang_id",
    "with_quality_score",
    "with_fingerprint",
    "with_type_token_ratio",
    "scrub_pii",
    "extract_url_domains",
    "stratified_sample",
    "LANG_MARKERS",
]

# PII patterns kept to the Java-regex ∩ RE2 common subset (no lookarounds)
# so the DuckDB oracle can run the literal same patterns.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[- ]\d{4}\b"
URL_RE = r"https?://[^ ]+"
URL_DOMAIN_RE = r"https?://([^/ ]+)"

# marker stopwords per language (tiny, deterministic heuristic)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "las", "una", "por"],
    "zh": ["的", "是", "了", "在", "我"],
}


def with_token_count(df: DataFrame, col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace token count."""
    return df.withColumn(
        out, F.size(F.split(F.trim(F.col(col)), r"\s+")).cast("long")
    )


def with_bpe_token_estimate(
    df: DataFrame, col: str = "text", out: str = "n_bpe_tokens"
) -> DataFrame:
    """BPE-ish token estimate: word pieces of ≤4 chars + digits + punctuation
    each count as one token (a deterministic regex proxy for a real BPE)."""
    pieces = F.regexp_extract_all(
        F.col(col), F.lit(r"[A-Za-z]{1,4}|[0-9]|[^\sA-Za-z0-9]"), F.lit(0)
    )
    return df.withColumn(out, F.size(pieces).cast("long"))


def _marker_count(col: str, words: list[str]):
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(F.col(col)), F.lit(pat), F.lit(0)))


def with_lang_id(df: DataFrame, col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Predicted language = argmax marker-stopword count (ties → greater
    language code, via struct ordering — deterministic); 'und' when no
    marker hits."""
    pairs = [
        F.struct(
            _marker_count(col, words).alias("hits"),
            F.lit(code).alias("code"),
        )
        for code, words in sorted(LANG_MARKERS.items(), reverse=True)
    ]
    best = F.greatest(*pairs)
    return df.withColumn(
        out,
        F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und")),
    )


def with_quality_score(df: DataFrame, col: str = "text", out: str = "quality") -> DataFrame:
    """[0,1] quality: blend of length band, alpha ratio, stopword presence,
    and mean word length band — the classic cheap pre-filter heuristics."""
    txt = F.col(col)
    n_chars = F.length(txt)
    n_tokens = F.size(F.split(F.trim(txt), r"\s+"))
    alpha = F.length(F.regexp_replace(txt, r"[^A-Za-z ]", ""))
    alpha_ratio = alpha / F.greatest(n_chars, F.lit(1))
    mean_word = n_chars / F.greatest(n_tokens, F.lit(1))
    any_stop = _marker_count(col, LANG_MARKERS["en"]) > 0
    len_score = F.when((n_chars >= 100) & (n_chars <= 20000), 1.0).otherwise(0.5)
    word_score = F.when((mean_word >= 3) & (mean_word <= 12), 1.0).otherwise(0.5)
    stop_score = F.when(any_stop, 1.0).otherwise(0.6)
    return df.withColumn(
        out,
        F.round(
            (len_score + word_score + stop_score + alpha_ratio) / 4.0, 6
        ).cast("double"),
    )


def with_fingerprint(
    df: DataFrame, col: str = "text", out: str = "fingerprint",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Content fingerprint of the whitespace-normalized, lowercased text:
    xxhash64 (fast path) or the portable rolling hash (oracle path,
    bit-identical in DuckDB)."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))
    if hash_fn == "portable":
        from graphscope_spark.operators.dedup import portable_str_hash

        return df.withColumn(out, portable_str_hash(normalized))
    return df.withColumn(out, F.xxhash64(normalized))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 42,
    hash_fn: str = "xxhash64",
    oversample: float = 2.0,
) -> DataFrame:
    """Deterministic per-stratum sample: rank each stratum's rows by a
    seeded hash of the id (a reproducible pseudo-random order, ties on id)
    and keep the first ``n_per_stratum``. Same rows on every engine/run.

    Scale path (100 TB): a naive ``row_number() OVER (PARTITION BY
    stratum)`` ships EVERY row of a stratum through one task — a viral
    stratum (lang='en' at corpus scale) is a straggler. Instead:

    1. per-stratum counts (map-side combined, tiny),
    2. broadcast a per-stratum hash threshold ≈ oversample·n/count of the
       hash range — the scan keeps ~oversample·n rows per stratum and the
       filter runs JVM-side on the full scan, no shuffle,
    3. exact top-n window over the ~n·oversample survivors (small),
    4. shortfall repair: any stratum whose survivor count came up short of
       min(n, count) (hash fluctuation) is re-ranked over its full rows —
       exactness is never sacrificed, the repair set is just rare.

    hash_fn="portable" uses the md5-fold (bit-identical in DuckDB) so the
    sample is oracle-checkable; "xxhash64" is the fast production path.
    """
    from pyspark.sql import Window

    from graphscope_spark.operators.dedup import _P, portable_str_hash

    if hash_fn == "portable":
        key = portable_str_hash(F.col(id_col).cast("string"), seed)
        key_range = _P
    else:
        key = F.xxhash64(F.col(id_col), F.lit(seed))
        key_range = None  # full int64 range, handled below

    keyed = df.withColumn("_sk", key)
    if key_range is None:
        # map xxhash64's signed 64-bit output onto [0, 2^63) for the
        # threshold arithmetic (shift by abs of min-long via bitwise)
        keyed = keyed.withColumn(
            "_sk", F.shiftrightunsigned(F.col("_sk"), 1)
        )
        key_range = (1 << 63) - 1  # int64 max: _sk ∈ [0, 2^63)

    counts = keyed.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_cnt"))
    thr = counts.select(
        strata_col,
        "_cnt",
        # clamp in DOUBLE space BEFORE the cast: a stratum smaller than
        # oversample·n would otherwise push the product past int64 and
        # CAST_OVERFLOW under ANSI (hit by fanout-3 sampling of degree-1
        # vertices). The clamp itself must be a double that casts back into
        # int64 range — float(2⁶³−1) rounds UP to exactly 2⁶³, so back off
        # one double ULP (2048 at this magnitude); a threshold ≥ max key
        # keeps every row either way.
        F.least(
            F.lit(float(min(key_range, (1 << 63) - 2048))),
            F.lit(float(key_range))
            * F.lit(oversample)
            * F.lit(n_per_stratum)
            / F.col("_cnt"),
        )
        .cast("long")
        .alias("_thr"),
    )
    cand = keyed.join(F.broadcast(thr), strata_col).filter(
        F.col("_sk") <= F.col("_thr")
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.col("_sk").asc(), F.col(id_col).asc()
    )
    ranked = cand.withColumn("_rk", F.row_number().over(w))
    picked = ranked.filter(F.col("_rk") <= n_per_stratum)

    # shortfall repair (exactness guard): strata where the threshold kept
    # fewer than min(n, cnt) rows re-rank over their full row set
    got = picked.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_got"))
    short = (
        thr.join(got, strata_col, "left")
        .filter(
            F.coalesce(F.col("_got"), F.lit(0))
            < F.least(F.lit(n_per_stratum), F.col("_cnt"))
        )
        .select(strata_col)
    )
    repaired = (
        keyed.join(F.broadcast(short), strata_col, "left_semi")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
    )
    ok = picked.join(F.broadcast(short), strata_col, "left_anti")
    cols = df.columns
    return ok.select(*cols).unionByName(repaired.select(*cols))


def with_type_token_ratio(
    df: DataFrame, col: str = "text", out: str = "ttr"
) -> DataFrame:
    """Type-token ratio: distinct whitespace tokens / total tokens — a
    standard lexical-diversity quality signal (low TTR ⇒ repetitive,
    boilerplate-heavy documents a training pipeline down-weights).
    Pure array built-ins: one codegen'd projection, no shuffle."""
    toks = F.split(F.col(col), " ")
    return df.withColumn(
        out,
        F.round(
            F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)),
            6,
        ),
    )


def scrub_pii(
    df: DataFrame, col: str = "text", out: str = "clean"
) -> DataFrame:
    """Mask emails/phones (C4/RefinedWeb-style PII scrub) and count what was
    masked. Patterns live in the Java-regex ∩ RE2 subset so the same literal
    strings drive the DuckDB oracle. regexp_replace is JVM-side and global;
    the counts come from regexp_extract_all sizes (same single pass shape)."""
    c = F.col(col)
    return (
        df.withColumn(
            "n_emails", F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0)))
        )
        .withColumn(
            "n_phones", F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0)))
        )
        .withColumn(
            out,
            F.regexp_replace(
                F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
            ),
        )
    )


def extract_url_domains(df: DataFrame, col: str = "text") -> DataFrame:
    """(domain, n): URLs pulled with regexp_extract_all, exploded, reduced to
    the host part — the link-census step of a crawl-cleaning pipeline.
    One narrow extract + one hash aggregation; the explode stays proportional
    to the number of matches, not document length."""
    urls = F.explode(
        F.regexp_extract_all(F.col(col), F.lit(URL_RE), F.lit(0))
    ).alias("url")
    return (
        df.select(urls)
        .select(F.regexp_extract("url", URL_DOMAIN_RE, 1).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"))
    )
