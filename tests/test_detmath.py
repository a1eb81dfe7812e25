"""functions/detmath.py — the deterministic ``ln`` both engines share.

The contract under test: for any positive BIGINT count, the DuckDB
rendering, the Spark rendering, and the Python mirror produce the SAME
64-bit double (bit-identical — this is what makes NLL/BM25 oracle hashes
representation-independent), and that double is within 1e-12 of true ln.
DuckDB vs mirror is exhaustive-ish here; Spark vs mirror is covered by the
oracle-gated query tests (any bit flip fails their value hash).
"""

from __future__ import annotations

import math
import random
import struct

import duckdb
import pyarrow as pa

from flink_net_spark.functions import detmath as DM


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def _counts() -> list[int]:
    random.seed(41)
    return (
        list(range(1, 3000))
        + [1 << k for k in range(63)]
        + [(1 << k) - 1 for k in range(2, 63)]
        + [(1 << k) + 1 for k in range(1, 62)]
        + [random.randrange(1, 1 << 62) for _ in range(3000)]
    )


def test_duckdb_matches_python_mirror_bitwise_and_is_accurate():
    counts = _counts()
    con = duckdb.connect()
    con.register("src", pa.table({"c": pa.array(counts, type=pa.int64())}))
    rows = con.sql(
        f"SELECT c, {DM.duckdb_det_ln_select('c', 'q')} FROM src"
    ).fetchall()
    assert len(rows) == len(counts)
    for r in rows:
        c, ln_sql = r[0], r[-1]
        assert _bits(ln_sql) == _bits(DM.py_det_ln(c)), c
        assert abs(ln_sql - math.log(c)) < 1e-12, (c, ln_sql)


def test_null_propagates():
    # left-join paths feed NULL counts through the chain (unseen bigrams)
    con = duckdb.connect()
    row = con.sql(
        f"SELECT {DM.duckdb_det_ln_select('c', 'q')} "
        "FROM (SELECT CAST(NULL AS BIGINT) AS c)"
    ).fetchone()
    assert row[-1] is None


def test_spark_and_duckdb_render_identical_op_order():
    # the two dialects must differ ONLY in the power-of-two array lookup
    sp = dict(DM.spark_det_ln_cols("c", "p"))
    dk = dict(DM.duckdb_det_ln_cols("c", "p"))
    assert sp.keys() == dk.keys()
    for k in sp:
        if k == "p_m":
            continue  # array-indexing syntax differs; literals are shared
        assert sp[k] == dk[k], k
    assert sp["p_m"].startswith("(CAST(c AS DOUBLE) / ")
    assert dk["p_m"].startswith("(CAST(c AS DOUBLE) / ")
