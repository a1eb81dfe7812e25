"""Every registered query with an oracle must hash-match DuckDB — this
mirrors the driver's CORRECTNESS gate (one parametrized test per query).

Queries without an oracle (sketches, stateful streaming) get a smoke run:
they must execute and return a stable schema.
"""

from __future__ import annotations

import pytest

from flink_net_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle

WITH_ORACLE = sorted(n for n in QUERIES if n in ORACLES)
WITHOUT_ORACLE = sorted(n for n in QUERIES if n not in ORACLES)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, QUERIES[name], ORACLES[name], name)


@pytest.mark.parametrize("name", WITHOUT_ORACLE)
def test_query_smoke(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0
