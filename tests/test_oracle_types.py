"""Oracle/Spark result-type contract (round-10, VERDICT r09 #2).

The driver's value-hasher is type-representation-sensitive: a DuckDB
HUGEINT output column (``SUM(BIGINT)`` untyped) hash-mismatches a Spark
LONG even when every value is bit-identical — the sole cause of the two
round-9 driver reds (``text_unigram_nll`` / ``text_bigram_nll``).  This
module pins the contract that makes the whole class impossible:

* every DuckDB oracle result column types to BIGINT, DOUBLE, BOOLEAN or
  VARCHAR (``DESCRIBE <sql>`` — no execution needed);
* every Spark result column types to bigint, double, boolean or string
  (lazy schema — no job runs).

INTEGER/INT32 columns are excluded on purpose: they pass today's hasher,
but they are the same latent class one driver-library bump away from red
(VERDICT r09 "What's missing" #3), so round 10 normalized all 13 of them
to 64-bit on both sides.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from flink_net_spark.tables import TABLE_NAMES, table_path

from tests.conftest import SF_DIR

DUCK_OK = {"BIGINT", "DOUBLE", "BOOLEAN", "VARCHAR"}
SPARK_OK = {"bigint", "double", "boolean", "string"}


@pytest.fixture(scope="module")
def duck_views():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()


def test_every_oracle_column_is_driver_safe_typed(duck_views):
    bad = {}
    for name, sql in entry.oracle_sql().items():
        rows = duck_views.execute(f"DESCRIBE {sql}").fetchall()
        offending = [(col, ty) for col, ty, *_ in rows if ty not in DUCK_OK]
        if offending:
            bad[name] = offending
    assert not bad, f"oracle columns outside {sorted(DUCK_OK)}: {bad}"


def test_every_spark_column_is_driver_safe_typed(spark):
    bad = {}
    for name, fn in entry.queries().items():
        df = fn(spark, SF_DIR)  # lazy — schema only, no job runs
        offending = [(c, t) for c, t in df.dtypes if t not in SPARK_OK]
        if offending:
            bad[name] = offending
    assert not bad, f"Spark columns outside {sorted(SPARK_OK)}: {bad}"


def test_describe_catches_the_round9_hugeint_class(duck_views):
    """Regression guard for the guard: an uncast SUM(BIGINT) must DESCRIBE
    as HUGEINT (i.e. land outside DUCK_OK) — if a DuckDB upgrade ever
    changes that typing rule, this test documents the assumption the
    contract rests on."""
    rows = duck_views.execute(
        "DESCRIBE SELECT SUM(CAST(1 AS BIGINT)) AS s FROM range(3)"
    ).fetchall()
    assert rows[0][1] == "HUGEINT"
    assert rows[0][1] not in DUCK_OK
