"""Comparator-fidelity regression for tools/driver_sim.py (VERDICT r09 #3).

Round 9's replay artifacts reported 156/156 green while the driver was
48/50: ``fetchall()`` coerces DuckDB HUGEINT to Python int, so a pure
value comparison is blind to the result-type representation the driver's
hasher rejects.  The sim now asserts DECLARED result types before
comparing values; these fixtures prove it is red on exactly the shape the
driver caught (an uncast ``SUM(BIGINT)``) and green on the repaired one.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from tools.driver_sim import oracle_type_violations, spark_type_violations


def test_sim_flags_the_uncast_sum_that_the_driver_caught():
    con = duckdb.connect()
    # the literal round-9 red shape: SUM(BIGINT) // COUNT(*) types HUGEINT
    bad = oracle_type_violations(
        con,
        "SELECT SUM(CAST(v AS BIGINT)) // COUNT(*) AS avg_v "
        "FROM (SELECT 1 AS v UNION ALL SELECT 2) GROUP BY ALL",
    )
    assert bad == [("avg_v", "HUGEINT")]


def test_sim_green_on_the_repaired_cast():
    con = duckdb.connect()
    assert (
        oracle_type_violations(
            con,
            "SELECT CAST(SUM(CAST(v AS BIGINT)) // COUNT(*) AS BIGINT) AS avg_v "
            "FROM (SELECT 1 AS v UNION ALL SELECT 2) GROUP BY ALL",
        )
        == []
    )


def test_sim_flags_integer_columns_too():
    """INTEGER passes today's driver hasher but is the same latent class one
    library bump away from red — the sim holds the stricter 64-bit line."""
    con = duckdb.connect()
    assert oracle_type_violations(con, "SELECT CAST(1 AS INTEGER) AS k") == [
        ("k", "INTEGER")
    ]


def test_sim_flags_spark_int32(spark):
    from pyspark.sql import functions as F

    df = spark.range(3).select(F.col("id").cast("int").alias("k"))
    assert spark_type_violations(df) == [("k", "int")]
    df64 = spark.range(3).select(F.col("id").alias("k"))
    assert spark_type_violations(df64) == []
