"""Property-based cross-engine equivalence for the paired Spark/DuckDB
expression builders in flink_net_spark.functions.hashing.

These builders are the foundation of the oracle design: every hash-based
operator (MinHash, SimHash, shingles, token hashes) is only oracle-checkable
because the two engines compute IDENTICAL values.  Hypothesis hammers that
contract with adversarial strings (unicode, quotes, repeats, empties)
instead of trusting the fixed test corpus.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_net_spark.functions import hashing as H

# Spark SQL string literals are the delivery vehicle, so avoid characters
# that need escaping in a literal; everything else (unicode letters, CJK,
# punctuation-free oddities) is fair game.
texts = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="'\\\"\x00",
        exclude_categories=("Cs", "Cc"),
    ),
    max_size=120,
)


def _spark_eval(spark, expr: str):
    return spark.sql(f"SELECT {expr} AS v").first()["v"]


def _duck_eval(expr: str):
    return duckdb.sql(f"SELECT {expr} AS v").fetchone()[0]


@pytest.mark.parametrize(
    "spark_builder,duck_builder",
    [
        (H.spark_token_hashes, H.duckdb_token_hashes),
        (H.spark_word_shingles, H.duckdb_word_shingles),
    ],
    ids=["token_hashes", "word_shingles"],
)
def test_builders_agree_on_adversarial_text(spark, spark_builder, duck_builder):
    @settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
    @given(texts)
    def inner(t):
        lit = f"'{t}'"
        assert _spark_eval(spark, spark_builder(lit)) == _duck_eval(duck_builder(lit))

    inner()


def test_minhash_pipeline_agrees_end_to_end(spark):
    @settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
    @given(texts)
    def inner(t):
        lit = f"'{t}'"
        s_expr = H.spark_minhash_sig(H.spark_hashed_shingles(H.spark_token_hashes(lit)), 8)
        d_expr = H.duckdb_minhash_sig(H.duckdb_hashed_shingles(H.duckdb_token_hashes(lit)), 8)
        assert _spark_eval(spark, s_expr) == _duck_eval(d_expr)

    inner()
