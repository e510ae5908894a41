"""spark-submit entry point (north rule: ``spark-submit --py-files``).

Usage:
  spark-submit [--master ...] --py-files graphscope_spark.zip \\
      -m graphscope_spark <algo> --edges <parquet> [--vertices <parquet>]
      [--output <dir>] [--source N] [--max-iter N] [--tol F] [--weight-col C]
      [--checkpoint-dir D]

or locally: ``python -m graphscope_spark pagerank --edges edges.parquet``.
Reads an edge parquet (src, dst[, weight]), runs the algorithm, writes the
result parquet (or prints the first rows), and emits one JSON metrics line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="graphscope_spark")
    p.add_argument("algo", choices=[
        "pagerank", "pagerank_ldbc", "wcc", "scc", "cdlp", "triangles", "lcc",
        "sssp", "bfs", "kcore", "hits", "degree_centrality", "louvain",
        "closeness", "betweenness", "apsp",
        "bcc", "bridges", "articulation", "diameter", "kclique", "dfs",
        "corpus",
    ])
    p.add_argument("--edges")
    p.add_argument("--vertices")
    p.add_argument("--output")
    p.add_argument("--source", type=int, default=0)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--rounds", type=int, default=10)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--alpha", type=float, default=0.85)
    p.add_argument("--weight-col")
    p.add_argument("--checkpoint-dir")
    p.add_argument("--num-partitions", type=int)
    p.add_argument("--sources", help="comma-separated source ids for "
                   "closeness/betweenness/apsp (default: 0-4)")
    p.add_argument("--corpus", help="corpus parquet "
                   "(repo, path, commit, lang, content) for algo=corpus; "
                   "omitted: synthesize --n-files/--n-repos deterministically")
    p.add_argument("--n-files", type=int, default=100_000)
    p.add_argument("--n-repos", type=int, default=2_000)
    p.add_argument("--corpus-algo", default="pagerank",
                   choices=["pagerank", "wcc", "cdlp", "triangles"])
    args = p.parse_args(argv)

    if args.algo == "corpus":
        return _corpus_pipeline(args)
    if not args.edges:
        p.error("--edges is required (except for algo=corpus)")

    from pyspark.sql import SparkSession

    from graphscope_spark.graph.graph import Graph

    spark = SparkSession.builder.appName(f"graphscope_spark_{args.algo}").getOrCreate()
    e = spark.read.parquet(args.edges)
    v = spark.read.parquet(args.vertices) if args.vertices else None
    g = Graph(e, vertices=v, num_partitions=args.num_partitions)

    import graphscope_spark.algorithms as A

    t0 = time.time()
    if args.algo == "pagerank":
        out = A.pagerank(g, alpha=args.alpha, max_iter=args.max_iter, tol=args.tol,
                         weight_col=args.weight_col,
                         checkpoint_dir=args.checkpoint_dir)
    elif args.algo == "pagerank_ldbc":
        out = A.pagerank_ldbc(g, damping=args.alpha, rounds=args.rounds,
                              weight_col=args.weight_col)
    elif args.algo == "wcc":
        out = A.wcc(g, checkpoint_dir=args.checkpoint_dir)
    elif args.algo == "scc":
        from graphscope_spark.algorithms.scc import scc
        out = scc(g)
    elif args.algo == "cdlp":
        out = A.cdlp(g, max_iter=args.rounds, checkpoint_dir=args.checkpoint_dir)
    elif args.algo == "triangles":
        out = A.triangles(g)
    elif args.algo == "lcc":
        out = A.lcc(g)
    elif args.algo == "sssp":
        out = A.sssp(g, source=args.source, weight_col=args.weight_col or "weight",
                     checkpoint_dir=args.checkpoint_dir)
    elif args.algo == "bfs":
        out = A.bfs(g, source=args.source)
    elif args.algo == "kcore":
        out = A.k_core(g, k=args.k)
    elif args.algo == "hits":
        out = A.hits(g, max_round=args.max_iter)
    elif args.algo == "degree_centrality":
        out = A.degree_centrality(g)
    elif args.algo in ("closeness", "betweenness", "apsp"):
        try:
            srcs = [int(s) for s in (args.sources or "0,1,2,3,4").split(",")]
        except ValueError:
            p.error(f"--sources must be comma-separated integers, got: {args.sources}")
        if args.algo == "closeness":
            from graphscope_spark.algorithms.centrality import closeness_centrality
            out = closeness_centrality(g, sources=srcs)
        elif args.algo == "betweenness":
            from graphscope_spark.algorithms.betweenness import betweenness_centrality
            out = betweenness_centrality(g, sources=srcs)
        else:
            from graphscope_spark.algorithms.paths import (
                all_pairs_shortest_path_length,
            )
            out = all_pairs_shortest_path_length(g, sources=srcs)
    elif args.algo == "louvain":
        out = A.louvain(g, weight_col=args.weight_col)
    elif args.algo == "bcc":
        from graphscope_spark.algorithms.biconnectivity import bcc_edges
        out = bcc_edges(g)
    elif args.algo == "bridges":
        from graphscope_spark.algorithms.biconnectivity import bridges
        out = bridges(g)
    elif args.algo == "articulation":
        from graphscope_spark.algorithms.biconnectivity import articulation_points
        out = articulation_points(g)
    elif args.algo == "diameter":
        from graphscope_spark.algorithms.diameter import diameter_approx
        out = diameter_approx(g)
    elif args.algo == "kclique":
        from graphscope_spark.algorithms.cliques import k_cliques
        out = k_cliques(g, k=args.k)
    elif args.algo == "dfs":
        from graphscope_spark.algorithms.dfs import dfs
        out = dfs(g, source=args.source)
    else:  # pragma: no cover
        raise SystemExit(f"unknown algo {args.algo}")

    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = out.count()
        out.show(10, truncate=False)
    wall = time.time() - t0
    print(json.dumps({
        "algo": args.algo,
        "rows": n,
        "edges": g.num_edges,
        "vertices": g.num_vertices,
        "sec": round(wall, 3),
        "teps": round(g.num_edges * max(args.rounds, 1) / wall, 1),
    }))
    return 0


def _corpus_pipeline(args) -> int:
    """The north-star pipeline end-to-end in one job: corpus table
    (repo, path, commit, lang, content) → per-row sha256 (verified against
    a driver-side hashlib sample) → vectorized import extraction →
    repo-link edge table → iterative link-graph algorithm → one JSON
    metrics line. ``--corpus`` reads an existing parquet of exactly the
    BASELINE input_hint shape; without it a deterministic synthetic corpus
    of --n-files/--n-repos stands in (TESTDATA rule: no external data)."""
    import hashlib

    from pyspark.sql import SparkSession

    import graphscope_spark.algorithms as A
    from graphscope_spark.corpus.extractor import (
        extract_file_deps,
        repo_link_edges,
        repo_vertices,
        with_sha256,
    )
    from graphscope_spark.corpus.generator import synth_corpus
    from graphscope_spark.graph.graph import Graph

    spark = SparkSession.builder.appName("graphscope_spark_corpus").getOrCreate()
    if args.corpus:
        files = spark.read.parquet(args.corpus)
    else:
        files = synth_corpus(spark, args.n_files, args.n_repos)
    files = with_sha256(files).persist()
    n_files = files.count()

    # row-for-row invariant spot check (north rule): the engine-computed
    # sha256 must equal a reference hashlib digest of the same content
    sample = files.select("content", "sha256").limit(100).collect()
    for row in sample:
        want = hashlib.sha256(row["content"].encode("utf-8")).hexdigest()
        if want != row["sha256"]:
            raise SystemExit(f"sha256 mismatch vs hashlib for a sampled row")

    t0 = time.time()
    deps = extract_file_deps(files)
    links = repo_link_edges(files, deps).persist()
    n_links = links.count()
    extract_sec = time.time() - t0

    g = Graph(
        links.selectExpr("src", "dst"),
        vertices=repo_vertices(files).select("id"),
        num_partitions=args.num_partitions,
    )
    t0 = time.time()
    if args.corpus_algo == "pagerank":
        out = A.pagerank(g, alpha=args.alpha, max_iter=args.max_iter,
                         tol=args.tol, checkpoint_dir=args.checkpoint_dir)
    elif args.corpus_algo == "wcc":
        out = A.wcc(g, checkpoint_dir=args.checkpoint_dir)
    elif args.corpus_algo == "cdlp":
        out = A.cdlp(g, max_iter=args.rounds,
                     checkpoint_dir=args.checkpoint_dir)
    else:
        out = A.triangles(g)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = out.count()
        out.show(10, truncate=False)
    algo_sec = time.time() - t0
    files.unpersist()
    print(json.dumps({
        "algo": f"corpus+{args.corpus_algo}",
        "files": n_files,
        "link_edges": n_links,
        "extract_sec": round(extract_sec, 3),
        "files_per_sec": round(n_files / extract_sec, 1),
        "rows": n,
        "sec": round(algo_sec, 3),
        "sha256_sample_verified": True,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
