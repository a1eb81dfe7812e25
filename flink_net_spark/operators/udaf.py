"""Custom UDAF harness — SURVEY.md §2.11 IAggregateOperator on applyInPandas.

The reference's accumulator contract (CreateAccumulator / Add / GetResult /
Merge — FlinkDotNet/FlinkDotNet.Core.Abstractions/Operators/IAggregateOperator.cs:18-51)
maps two ways on Spark:
  - built-in aggs: partial aggregation + Merge happen automatically (always
    prefer these — JVM-side, codegen, map-side combine);
  - genuinely custom aggregates (holistic statistics a fold can't express):
    ``applyInPandas`` over the keyed group — one Arrow batch per key-group,
    full-pane access, Python only where the semantics demand it.

Scale: applyInPandas shuffles the whole group to one task — fine for
bounded per-key cardinality (the holistic-aggregate contract anyway);
unbounded keys should pre-aggregate or sample first.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame


def apply_udaf(
    df: DataFrame,
    key_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: str,
) -> DataFrame:
    """Run ``fn`` (full key-group in, one aggregate row out) per group —
    the UDAF harness ≙ IAggregateOperator.GetResult over a buffered pane."""
    from flink_net_spark.session import ship_package_to_executors

    ship_package_to_executors(df.sparkSession)
    return df.groupBy(*key_cols).applyInPandas(fn, output_schema)


def median_abs_deviation(value_col: str, key_col: str) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """MAD — a holistic statistic no accumulator fold expresses (needs two
    passes over the pane: median, then median of |x − median|)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf[value_col].median()
        mad = (pdf[value_col] - med).abs().median()
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [len(pdf)],
                "median_value": [round(float(med), 4)],
                "mad": [round(float(mad), 4)],
            }
        )

    return fn
