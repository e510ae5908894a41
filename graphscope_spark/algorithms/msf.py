"""Minimum spanning forest — Borůvka rounds (FLASH msf analog, SURVEY §2.2).

Each round every component selects its minimum-weight outgoing edge
(deterministic: lexicographic (w, a, b) min), the selected edges join the
forest, and touched components merge (a WCC over the tiny component-contact
graph). O(log V) rounds; per round one shuffle to label edges with component
ids and one aggregation for the minima — the textbook distributed MSF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graphscope_spark.graph.graph import Graph
from graphscope_spark.engine.tuning import tuned_loop

__all__ = ["minimum_spanning_forest"]


@tuned_loop
def minimum_spanning_forest(
    graph: Graph, weight_col: str = "weight", max_rounds: int = 64
) -> DataFrame:
    """(src, dst, weight) forest edges, src < dst; on weight ties the
    lexicographically smallest (weight, src, dst) edge wins, making the
    result deterministic even with duplicate weights."""
    w = (
        F.col(weight_col).cast("double")
        if weight_col in graph.edges.columns
        else F.lit(1.0)
    )
    pairs = (
        graph.edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            w.alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    comp = graph.vertices.select("id", F.col("id").alias("c")).localCheckpoint(
        eager=True
    )
    forest: DataFrame | None = None

    for _ in range(max_rounds):
        lab = (
            pairs.join(
                comp.select(F.col("id").alias("a"), F.col("c").alias("ca")), "a"
            )
            .join(comp.select(F.col("id").alias("b"), F.col("c").alias("cb")), "b")
            .filter(F.col("ca") != F.col("cb"))
            .localCheckpoint(eager=True)
        )
        if lab.isEmpty():
            break
        sides = lab.select(F.col("ca").alias("comp"), "w", "a", "b").unionByName(
            lab.select(F.col("cb").alias("comp"), "w", "a", "b")
        )
        chosen = (
            sides.groupBy("comp")
            .agg(F.min(F.struct("w", "a", "b")).alias("m"))
            .select(
                F.col("m.a").alias("a"), F.col("m.b").alias("b"),
                F.col("m.w").alias("w"),
            )
            .dropDuplicates(["a", "b"])
            .localCheckpoint(eager=True)
        )
        forest = chosen if forest is None else forest.unionByName(chosen)
        forest = forest.dropDuplicates(["a", "b"]).localCheckpoint(eager=True)
        # merge components over the component-contact graph. The contact
        # graph has one node per component (shrinks geometrically); below
        # the gate a driver union-find replaces a full distributed WCC run
        # (saving ~10 barriers/round at test scale), above it the WCC path
        # keeps the 100TB story intact.
        cedges = (
            chosen.join(
                comp.select(F.col("id").alias("a"), F.col("c").alias("ca")), "a"
            )
            .join(comp.select(F.col("id").alias("b"), F.col("c").alias("cb")), "b")
            .select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
            .localCheckpoint(eager=True)
        )
        n_contact = cedges.count()
        if n_contact <= 200_000:
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:
                    parent[x], x = r, parent[x]
                return r

            for row in cedges.collect():
                ra, rb = find(int(row["src"])), find(int(row["dst"]))
                if ra != rb:
                    # min label wins, matching wcc()'s min-id convention
                    lo, hi = min(ra, rb), max(ra, rb)
                    parent[hi] = lo
            mapping = [(x, find(x)) for x in list(parent)]
            relabel = graph.spark.createDataFrame(
                mapping, "c long, component long"
            )
            comp = (
                comp.join(F.broadcast(relabel), "c", "left")
                .select("id", F.coalesce("component", F.col("c")).alias("c"))
                .localCheckpoint(eager=True)
            )
        else:
            from graphscope_spark.algorithms.wcc import wcc

            cg = Graph(cedges, num_partitions=graph.num_partitions)
            relabel = wcc(cg)  # (id=old comp, component=new comp label)
            cg.unpersist()
            comp = (
                comp.join(relabel.withColumnRenamed("id", "c"), "c", "left")
                .select("id", F.coalesce("component", F.col("c")).alias("c"))
                .localCheckpoint(eager=True)
            )

    pairs.unpersist()
    if forest is None:
        return graph.spark.createDataFrame([], "src long, dst long, weight double")
    return forest.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), F.col("w").alias("weight")
    )
