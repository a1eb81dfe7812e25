#!/usr/bin/env python
"""Type sweep: report every oracle result column whose DuckDB type is not in
the driver-safe set {BIGINT, DOUBLE, BOOLEAN, VARCHAR}, and every Spark-side
column whose dtype is not in {bigint, double, boolean, string}.

DuckDB types are taken from `DESCRIBE <oracle sql>` (no execution); Spark
dtypes from the lazy DataFrame schema (no job runs).
"""

from __future__ import annotations

import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
DUCK_OK = {"BIGINT", "DOUBLE", "BOOLEAN", "VARCHAR"}
SPARK_OK = {"bigint", "double", "boolean", "string"}


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .appName("type-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [(c, ty) for c, ty, *_ in rows if ty not in DUCK_OK]
        if bad:
            n_bad += 1
            print(f"DUCK  {name}: {bad}")
    for name, fn in sorted(qs.items()):
        try:
            sdf = fn(spark, SF_DIR)
        except Exception as ex:
            print(f"ERR   {name}: {type(ex).__name__}: {str(ex)[:120]}")
            n_bad += 1
            continue
        bad = [(c, ty) for c, ty in sdf.dtypes if ty not in SPARK_OK]
        if bad:
            n_bad += 1
            print(f"SPARK {name}: {bad}")
    print(f"\n{n_bad} offending queries")


if __name__ == "__main__":
    main()
