"""Deterministic synthetic source-code-repository corpus.

The engine's input table per BASELINE.json ``input_hint``:
``(repo string, path string, commit string, lang string, content string)``
— one row per file. At production scale this is an Iceberg table of 10^12
files; here we synthesize it distributed (``spark.range`` → ``mapInPandas``),
so generation itself scales: every column is a pure function of the file id,
independent of partitioning (FIXTURES.md §F1).

Properties engineered in:

* **hub skew** — repo sizes follow a power law (``repo = R·u³``), so the
  derived repo-link graph has hub vertices that exercise the skew path.
* **ground-truth edges** — each file's content embeds lang-correct
  import/include statements referencing other files' module symbols
  (``f<id>``); the extractor must recover exactly these.
* **determinism** — seeded mixing via splitmix-style integer hashing; the
  same (n_files, n_repos, seed) always yields byte-identical content, which
  is what makes the sha256 row-for-row invariant testable.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = ["synth_corpus", "LANGS", "file_row", "intended_imports"]

LANGS = ["python", "java", "cpp", "go", "js"]
_EXT = {"python": "py", "java": "java", "cpp": "cc", "go": "go", "js": "js"}

_MASK = (1 << 64) - 1


def _mix(x: int) -> int:
    """splitmix64 finalizer — a public-domain integer mixing constant set."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def repo_of(i: int, n_files: int, n_repos: int, seed: int) -> int:
    u = _mix(i * 2 + seed) / 2**64
    return min(int(n_repos * u**3), n_repos - 1)


def intended_imports(i: int, n_files: int, seed: int) -> list[int]:
    """Ground-truth out-edges of file i (what the extractor must recover)."""
    k = _mix(i * 3 + 1 + seed) % 5  # 0..4 imports
    out = []
    for t in range(k):
        j = _mix(i * 5 + t * 7 + 2 + seed) % n_files
        if j != i:
            out.append(j)
    return sorted(set(out))


_IMPORT_FMT = {
    "python": "import pkg_f{j}",
    "java": "import corpus.pkg.f{j};",
    "cpp": '#include "f{j}.h"',
    "go": '\timport "corpus/pkg/f{j}"',
    "js": "const f{j} = require('./f{j}');",
}

_BODY_FMT = {
    "python": "def fn_{i}():\n    return {v}\n",
    "java": "class F{i} {{ int v() {{ return {v}; }} }}\n",
    "cpp": "int fn_{i}() {{ return {v}; }}\n",
    "go": "func Fn{i}() int {{ return {v} }}\n",
    "js": "function fn_{i}() {{ return {v}; }}\n",
}


def file_row(i: int, n_files: int, n_repos: int, seed: int) -> dict:
    """The full row for file id i — pure function, partition-independent."""
    r = repo_of(i, n_files, n_repos, seed)
    lang = LANGS[_mix(i * 7 + 3 + seed) % len(LANGS)]
    path = f"src/f{i}.{_EXT[lang]}"
    commit = f"{_mix(i + 11 + seed):016x}{_mix(r + 13 + seed):016x}{_mix(seed):08x}"
    imports = intended_imports(i, n_files, seed)
    lines = [f"// file f{i} in org{r // 10}/repo{r} lang={lang}"]
    if lang == "python":
        lines[0] = f"# file f{i} in org{r // 10}/repo{r} lang={lang}"
    for j in imports:
        lines.append(_IMPORT_FMT[lang].format(j=j))
    v = _mix(i * 13 + 17 + seed) % 10_000
    lines.append(_BODY_FMT[lang].format(i=i, v=v))
    return {
        "repo": f"org{r // 10}/repo{r}",
        "path": path,
        "commit": commit[:40],
        "lang": lang,
        "content": "\n".join(lines),
    }


def synth_corpus(
    spark: SparkSession,
    n_files: int,
    n_repos: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed generation: no driver-side materialization."""
    nf, nr, sd = int(n_files), int(n_repos), int(seed)

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [file_row(int(i), nf, nr, sd) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    rng = spark.range(0, nf, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(
        gen, "repo string, path string, commit string, lang string, content string"
    )
