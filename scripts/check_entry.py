"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare
row counts, column names, and order-insensitive values (floats rounded
upstream by the queries themselves).

Usage: python scripts/check_entry.py [sf_dir] [name ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as E

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(None if pd.isna(v) else v for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # the media oracles (image_hash_pairs, audio_features) embed a
    # driver-side fixture path for the sf the ORACLE runs at; pin it to the
    # sf we compare at, or a sf0.001 check would read sf0.01 reference rows
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows={len(sdf):6d} [rows-only, no oracle] "
                  f"spark={t_spark:.1f}s")
            if len(sdf) == 0:
                print(f"  !! EMPTY result")
            continue
        t0 = time.time()
        odf = con.sql(oracles[name]).df()
        t_duck = time.time() - t0
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_rows = len(sdf) == len(odf)
        ok_vals = ok_cols and ok_rows and normalize(sdf) == normalize(odf)
        status = "OK" if (ok_cols and ok_rows and ok_vals) else "MISMATCH"
        print(
            f"{name:24s} rows={len(sdf):6d}/{len(odf):6d} cols={ok_cols} "
            f"vals={ok_vals} [{status}] spark={t_spark:.1f}s duck={t_duck:.1f}s"
        )
        if status != "OK":
            failures += 1
            if not ok_cols:
                print(f"  spark cols: {sorted(sdf.columns)}")
                print(f"  duck  cols: {sorted(odf.columns)}")
            elif not ok_vals or not ok_rows:
                a, b = normalize(sdf), normalize(odf)
                sa, sb = set(map(tuple, a)), set(map(tuple, b))
                extra = list(sa - sb)[:5]
                missing = list(sb - sa)[:5]
                print(f"  spark-only: {extra}")
                print(f"  duck-only : {missing}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
