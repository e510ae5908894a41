#!/usr/bin/env python
"""Receipt for the r5 deletion-delta claim: wcc_delta_delete's cost is
proportional to the components a deletion touches, not the graph.

Builds a fragmented graph (K islands of a power-law graph each — deletion
damage stays inside one island), converges WCC once, then times (a) a full
recompute after deleting a few edges vs (b) wcc_delta_delete on the same
deletion. Run in a QUIET host phase; writes BENCH/delta_delete_receipt.json.

Usage: python BENCH/delta_delete_receipt.py [n_edges_total] [islands]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    islands = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from pyspark.sql import functions as F

    from graphscope_spark.algorithms.wcc import wcc
    from graphscope_spark.engine.ingress import wcc_delta_delete
    from graphscope_spark.graph.graph import Graph
    from graphscope_spark.session import get_spark
    from graphscope_spark.sources.synthetic import power_law_edges

    spark = get_spark(app_name="delta_receipt", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # K islands: island i holds vertex ids [i*V, (i+1)*V) — a deletion in
    # one island can only touch that island's components
    v_per = (n_edges // 10) // islands
    base = power_law_edges(spark, n_edges // islands, v_per)
    shards = [
        base.select(
            (F.col("src") + i * v_per).alias("src"),
            (F.col("dst") + i * v_per).alias("dst"),
        )
        for i in range(islands)
    ]
    edges = shards[0]
    for s in shards[1:]:
        edges = edges.unionByName(s)
    edges = edges.repartition(32, "src").persist()
    ne = edges.count()
    g = Graph(edges, num_partitions=32)

    prev = wcc(g).localCheckpoint()
    prev.count()

    # delete 20 edges from island 0 only
    dels = (
        edges.where(F.col("src") < v_per)
        .orderBy(F.xxhash64("src", "dst"))
        .limit(20)
        .localCheckpoint()
    )

    t0 = time.time()
    full = wcc(g.remove_edges(dels))
    n_full = full.count()
    t_full = time.time() - t0

    t0 = time.time()
    delta = wcc_delta_delete(g, dels, prev)
    n_delta = delta.count()
    t_delta = time.time() - t0
    assert n_full == n_delta

    out = {
        "date": time.strftime("%Y-%m-%d"),
        "edges": ne,
        "islands": islands,
        "deleted_edges": 20,
        "full_recompute_sec": round(t_full, 2),
        "delta_delete_sec": round(t_delta, 2),
        "speedup": round(t_full / t_delta, 2),
    }
    with open(os.path.join(REPO, "BENCH", "delta_delete_receipt.json"),
              "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
