"""Vectorized extraction: corpus table → content hashes → dependency edges.

The axes-A pipeline (north rule): file-dependency edges are extracted from
``content`` with per-language import/include regexes, aggregated to
repo-link edges. Two execution paths, tested equal:

* default — Spark built-ins (``sha2``, ``regexp_extract_all``): JVM-side,
  whole-stage-codegen, the fast path (UDFs are the slow path — SURVEY.md §4.1);
* ``use_pandas=True`` — Arrow-batched ``mapInPandas`` with
  ``pandas.Series.str`` vectorized ops (no per-row Python), for environments
  where extraction needs Python libraries (real parsers, tree-sitter, …).

Reference parity: GraphScope's loader builds edge tables from external files
(core/loader/arrow_fragment_loader.h); the extraction itself is our
corpus-specific DATA_SOURCE stage.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_sha256",
    "file_symbols",
    "extract_import_refs",
    "extract_file_deps",
    "repo_link_edges",
    "repo_vertices",
]

# per-language import patterns; group 1 = referenced module symbol
IMPORT_PATTERNS = {
    "python": r"import pkg_(f\d+)",
    "java": r"import corpus\.pkg\.(f\d+);",
    "cpp": r"#include \"(f\d+)\.h\"",
    "go": r"import \"corpus/pkg/(f\d+)\"",
    "js": r"require\('\./(f\d+)'\)",
}


def with_sha256(df: DataFrame, col: str = "content") -> DataFrame:
    """Row-for-row invariant column vs the reference extraction (BASELINE
    input_hint): lowercase hex sha256 of the raw content bytes."""
    return df.withColumn("sha256", F.sha2(F.col(col), 256))


def with_file_id(df: DataFrame) -> DataFrame:
    """Stable 64-bit file id from (repo, path).

    At 10^12 files a 64-bit hash collides (birthday bound ≈ 10^5 pairs);
    production layout would widen to 128-bit (two xxhash64 seeds) — the
    analytics below only require ids to be stable longs.
    """
    return df.withColumn("file_id", F.xxhash64("repo", "path"))


def file_symbols(files: DataFrame) -> DataFrame:
    """(file_id, repo, symbol) — the symbol table import refs resolve
    against; symbol = path basename without extension."""
    return with_file_id(files).select(
        "file_id",
        "repo",
        F.regexp_extract("path", r"([A-Za-z0-9_]+)\.[a-z]+$", 1).alias("symbol"),
    )


def extract_import_refs(files: DataFrame, use_pandas: bool = False) -> DataFrame:
    """(file_id, ref) — one row per import statement found in content."""
    files = with_file_id(files)
    if not use_pandas:
        pat = None
        for lang, p in IMPORT_PATTERNS.items():
            branch = F.regexp_extract_all("content", F.lit(p), F.lit(1))
            pat = (
                F.when(F.col("lang") == lang, branch)
                if pat is None
                else pat.when(F.col("lang") == lang, branch)
            )
        refs = files.select(
            "file_id", F.explode(pat.otherwise(F.array())).alias("ref")
        )
        return refs

    def scan(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_fid, out_ref = [], []
            for lang, p in IMPORT_PATTERNS.items():
                sub = pdf[pdf["lang"] == lang]
                if len(sub) == 0:
                    continue
                # vectorized: one extractall over the whole Arrow batch
                hits = sub["content"].str.extractall(p)
                if len(hits) == 0:
                    continue
                idx = hits.index.get_level_values(0)
                out_fid.append(sub["file_id"].loc[idx].to_numpy())
                out_ref.append(hits[0].to_numpy())
            if out_fid:
                import numpy as np

                yield pd.DataFrame(
                    {"file_id": np.concatenate(out_fid), "ref": np.concatenate(out_ref)}
                )
            else:
                yield pd.DataFrame({"file_id": pd.Series(dtype="int64"),
                                    "ref": pd.Series(dtype="object")})

    return files.select("file_id", "lang", "content").mapInPandas(
        scan, "file_id long, ref string"
    )


def extract_file_deps(files: DataFrame, use_pandas: bool = False) -> DataFrame:
    """(src, dst) file-dependency edges: refs resolved against the symbol
    table. The symbol table is the small side at repo granularity but huge at
    corpus scale — a plain shuffle hash join on ``ref == symbol``; AQE picks
    broadcast when it fits."""
    refs = extract_import_refs(files, use_pandas=use_pandas)
    syms = file_symbols(files).select(
        F.col("symbol").alias("ref"), F.col("file_id").alias("dst")
    )
    return (
        refs.join(syms, "ref")
        .select(F.col("file_id").alias("src"), "dst")
        .dropDuplicates(["src", "dst"])
    )


def repo_vertices(files: DataFrame) -> DataFrame:
    """(id, name) — one vertex per distinct repo, id = xxhash64(name)."""
    return (
        files.select(F.col("repo").alias("name"))
        .distinct()
        .select(F.xxhash64("name").alias("id"), "name")
    )


def repo_link_edges(files: DataFrame, file_deps: DataFrame) -> DataFrame:
    """(src, dst, weight) repo-level aggregation of file dependencies,
    self-links dropped, weight = file-dependency count."""
    f2r = with_file_id(files).select("file_id", F.xxhash64("repo").alias("repo_id"))
    e = (
        file_deps.join(f2r.withColumnRenamed("file_id", "src"), "src")
        .withColumnRenamed("repo_id", "src_repo")
        .join(
            f2r.select(F.col("file_id").alias("dst"), F.col("repo_id").alias("dst_repo")),
            "dst",
        )
        .filter(F.col("src_repo") != F.col("dst_repo"))
        .groupBy(F.col("src_repo").alias("src"), F.col("dst_repo").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    return e
