"""Deployment-path test: the engine must run via spark-submit --py-files
(north rule launch mode). Packages the library into a zip, submits a
pagerank job in a fresh JVM, and checks the JSON metrics line."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_zip(tmp_path) -> str:
    zpath = str(tmp_path / "graphscope_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "graphscope_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.slow
def test_spark_submit_pagerank(spark, tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    assert os.path.exists(spark_submit), "spark-submit not found"

    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    spark.createDataFrame(edges, "src long, dst long").write.parquet(
        str(tmp_path / "edges")
    )
    zpath = _make_zip(tmp_path)
    runner = tmp_path / "run.py"
    runner.write_text(
        "from graphscope_spark.__main__ import main\nimport sys\nsys.exit(main())\n"
    )
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath,
            str(runner), "pagerank",
            "--edges", str(tmp_path / "edges"),
            "--output", str(tmp_path / "out"),
            "--max-iter", "50",
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    metrics = None
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            metrics = json.loads(line)
    assert metrics and metrics["rows"] == 4 and metrics["algo"] == "pagerank"


@pytest.mark.slow
def test_cli_corpus_pipeline(tmp_path):
    """algo=corpus runs the whole north-star pipeline in one job: synth
    corpus -> sha256 (hashlib-verified sample) -> import extraction ->
    repo-link graph -> wcc -> parquet + one JSON metrics line."""
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            sys.executable, "-m", "graphscope_spark", "corpus",
            "--n-files", "3000", "--n-repos", "100",
            "--corpus-algo", "wcc",
            "--output", str(tmp_path / "out"),
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    m = json.loads(line)
    assert m["algo"] == "corpus+wcc"
    assert m["files"] == 3000
    assert m["link_edges"] > 0
    assert m["rows"] == 100  # one component row per repo vertex
    assert m["sha256_sample_verified"] is True
