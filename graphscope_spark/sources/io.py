"""Graph loading — the Loader surface (SURVEY §2.1).

The reference's client Loader accepts file:// CSV, oss/hdfs/s3 URLs, pandas
DataFrames, numpy COO arrays, and GraphAr archives
(python/graphscope/framework/loader.py:94-211). Spark rendering:
``spark.read.{csv,parquet,orc}`` reach all URL schemes the cluster's Hadoop
conf knows; pandas/numpy enter via ``spark.createDataFrame``. This module
adds the v/e-file convention used by the reference's tests
(``--vfile p2p-31.v --efile p2p-31.e``, app_tests.sh:403) and dense-id
assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphscope_spark.graph.graph import Graph

__all__ = ["load_graph_vefiles", "load_graph_parquet", "from_pandas",
           "from_numpy_coo", "dense_ids"]


def load_graph_vefiles(
    spark: SparkSession,
    vfile: str,
    efile: str,
    delimiter: str = " ",
    weighted: bool = False,
    **kw,
) -> Graph:
    """p2p-31-style whitespace edge lists: vfile = one id per line,
    efile = ``src dst [weight]`` per line."""
    v = spark.read.csv(vfile, sep=delimiter, schema="id long")
    eschema = "src long, dst long" + (", weight double" if weighted else "")
    e = spark.read.csv(efile, sep=delimiter, schema=eschema)
    return Graph(e, vertices=v, **kw)


def load_graph_parquet(spark: SparkSession, base: str, **kw) -> Graph:
    return Graph.from_parquet(spark, f"{base}/edges", f"{base}/vertices", **kw)


def from_pandas(spark: SparkSession, edges_pdf, vertices_pdf=None, **kw) -> Graph:
    e = spark.createDataFrame(edges_pdf)
    v = spark.createDataFrame(vertices_pdf) if vertices_pdf is not None else None
    return Graph(e, vertices=v, **kw)


def from_numpy_coo(spark: SparkSession, src, dst, weight=None, **kw) -> Graph:
    import pandas as pd

    data = {"src": src, "dst": dst}
    if weight is not None:
        data["weight"] = weight
    return from_pandas(spark, pd.DataFrame(data), **kw)


def dense_ids(
    df: DataFrame, col: str, out: str = "id", num_partitions: int | None = None
) -> DataFrame:
    """Assign dense contiguous long ids (0..n-1) to the distinct values of
    ``col`` — the Spark rendering of the reference's GID assignment
    (fid ‖ per-fragment offset, docs/frag_intro.md): per-partition local
    row numbers + an exchanged offset table, no global sort of the data.

    Returns (out, col) mapping table. Deterministic: values are first
    hash-partitioned then ordered within partitions, and offsets are by
    partition id.
    """
    P = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "64")
    )
    distinct = df.select(F.col(col).alias("_v")).distinct()
    parted = distinct.repartition(P, "_v").withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy("_v")
    local = parted.withColumn("_local", F.row_number().over(w) - 1)
    counts = (
        local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    )
    offsets = counts.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_cnt").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("_pid", "_offset")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .select((F.col("_local") + F.col("_offset")).alias(out), F.col("_v").alias(col))
    )
