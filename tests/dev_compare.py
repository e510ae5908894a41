"""Dev harness: compare one queries() entry against its oracle_sql() twin
the way the driver does (sorted columns, 6dp rounding, value multiset).

Usage: python tests/dev_compare.py <name> [<name> ...]   (sf0.01)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    rc = 0
    for name in sys.argv[1:]:
        import time

        t0 = time.time()
        sdf = E.queries()[name](spark, SF_DIR)
        srows = sdf.collect()
        scols = sdf.columns
        t_spark = time.time() - t0
        oracle = E.oracle_sql().get(name)
        if oracle is None:
            print(f"{name}: NO ORACLE ({len(srows)} spark rows, {t_spark:.1f}s)")
            continue
        t0 = time.time()
        res = con.execute(oracle)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        t_duck = time.time() - t0
        if sorted(scols) != sorted(dcols):
            print(f"{name}: FAIL cols spark={sorted(scols)} duck={sorted(dcols)}")
            rc = 1
            continue
        sidx = [scols.index(c) for c in sorted(scols)]
        didx = [dcols.index(c) for c in sorted(dcols)]
        sset = sorted(tuple(_norm(r[i]) for i in sidx) for r in srows)
        dset = sorted(tuple(_norm(r[i]) for i in didx) for r in drows)
        if len(sset) != len(dset):
            print(f"{name}: FAIL rows spark={len(sset)} duck={len(dset)}")
            print("  spark sample:", sset[:3])
            print("  duck  sample:", dset[:3])
            rc = 1
        elif sset != dset:
            diff = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
            print(f"{name}: FAIL values ({len(sset)} rows); first diffs:")
            for a, b in diff:
                print("  spark:", a)
                print("  duck :", b)
            rc = 1
        else:
            print(
                f"{name}: OK ({len(sset)} rows, spark {t_spark:.1f}s, "
                f"duck {t_duck:.1f}s)"
            )
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
