"""DataStream-flavored fluent facade over DataFrames — SURVEY.md §2.3/§2.4.

Mirrors the reference's user API surface:
  - ``StreamExecutionEnvironment`` (FlinkDotNet/FlinkDotNet.Core.Api/
    StreamExecutionEnvironment.cs) — here a thin wrapper owning the
    SparkSession; ``execute`` is implicit (lazy plans, actions trigger).
  - ``DataStream.Map/FlatMap/Filter/KeyBy/Union/AddSink``
    (Core.Api/Streaming/DataStream.cs:28-210) — each combinator returns a
    new immutable DataStream wrapping a transformed DataFrame; Catalyst is
    the Transformation DAG (DataStream.cs:232-321), whole-stage codegen is
    operator chaining (StreamExecutionEnvironment.cs:203-246).
  - ``KeyedDataStream`` (Streaming/KeyedDataStream.cs:8) → groupBy carrier
    with reduce/aggregate/window/stateful-process.
  - ``WindowedStream`` (Streaming/WindowedStream.cs:27) → window() groupBy
    with Reduce/Aggregate/Process (WindowedStream.cs:65-87).

Map/Filter take Column expressions (the fast path — stays JVM-side); a
Python callable is accepted only via the explicit ``map_in_pandas`` escape
hatch (≙ the reference's arbitrary C# lambdas, which were its ONLY path —
our default is strictly faster).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession

import pyspark.sql.functions as F

from flink_net_spark.session import get_spark


class StreamExecutionEnvironment:
    """≙ StreamExecutionEnvironment.GetExecutionEnvironment."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()

    @classmethod
    def get_execution_environment(cls, spark: SparkSession | None = None) -> "StreamExecutionEnvironment":
        return cls(spark)

    def from_source(self, source: Any) -> "DataStream":
        """≙ env.AddSource(ISourceFunction) — accepts the factories from
        flink_net_spark.sources (anything with .load(spark))."""
        return DataStream(source.load(self.spark), self)

    def from_dataframe(self, df: DataFrame) -> "DataStream":
        return DataStream(df, self)

    def from_elements(self, rows: list, schema: str) -> "DataStream":
        """≙ env.FromCollection — driver-local test helper only."""
        return DataStream(self.spark.createDataFrame(rows, schema), self)


class DataStream:
    """≙ DataStream<T> (Core.Api/Streaming/DataStream.cs:10-19)."""

    def __init__(self, df: DataFrame, env: StreamExecutionEnvironment):
        self.df = df
        self.env = env

    def _wrap(self, df: DataFrame) -> "DataStream":
        return DataStream(df, self.env)

    # -- §2.3 per-record transforms ---------------------------------------
    def map(self, **cols: Column) -> "DataStream":
        """1→1 transform ≙ IMapOperator.Map: named Column expressions
        (``ds.map(out=F.upper("x"), ...)``).  Unmentioned columns drop —
        Map defines the full output record, like the reference."""
        return self._wrap(self.df.select(*[c.alias(n) for n, c in cols.items()]))

    def with_column(self, name: str, col: Column) -> "DataStream":
        """Additive map (keeps existing columns)."""
        return self._wrap(self.df.withColumn(name, col))

    def flat_map(self, name: str, array_col: Column) -> "DataStream":
        """1→N ≙ IFlatMapOperator.FlatMap: explode an array expression."""
        return self._wrap(self.df.withColumn(name, F.explode(array_col)))

    def filter(self, cond: Column) -> "DataStream":  # noqa: A003
        """≙ IFilterOperator.Filter."""
        return self._wrap(self.df.filter(cond))

    def map_in_pandas(self, fn, schema: str) -> "DataStream":
        """Escape hatch for opaque record logic (≙ arbitrary C# map
        operator) — Arrow-batched, never row-at-a-time."""
        from flink_net_spark.session import ship_package_to_executors

        ship_package_to_executors(self.df.sparkSession)
        return self._wrap(self.df.mapInPandas(fn, schema))

    # -- §2.4 keying / §2.13 multi-stream ---------------------------------
    def key_by(self, *cols: str | Column) -> "KeyedDataStream":
        """≙ DataStream.KeyBy (all 4 overloads collapse to column exprs)."""
        return KeyedDataStream(self.df, list(cols), self.env)

    def assign_timestamps_and_watermarks(
        self, ts_col: str, out_of_orderness: str | None = None
    ) -> "DataStream":
        """≙ the WatermarkStrategy factories (WatermarkManager.cs:210-275):
        ``out_of_orderness=None`` is ForMonotonousTimestamps, a duration
        string is BoundedOutOfOrderness.  Punctuated generation has no
        declarative equivalent — key the stream and use
        ``streaming.stateful.punctuated_window_aggregate``."""
        from flink_net_spark.streaming import (
            for_monotonous_timestamps,
            with_bounded_out_of_orderness,
        )

        if out_of_orderness is None:
            return self._wrap(for_monotonous_timestamps(self.df, ts_col))
        return self._wrap(with_bounded_out_of_orderness(self.df, ts_col, out_of_orderness))

    def union(self, other: "DataStream") -> "DataStream":
        return self._wrap(self.df.unionByName(other.df))

    # -- §2.4 explicit redistribution ≙ ShuffleMode (ShuffleMode.cs:4-10) ----
    def rescale(self, n: int) -> "DataStream":
        """≙ ShuffleMode.Rescale: redistribute to ``n`` partitions in either
        direction.  Shrinking uses a narrow coalesce (no shuffle — each
        downstream task reads a local subset of upstream partitions, like
        the reference's subset round-robin); growing needs data movement on
        Spark, so it falls back to a round-robin repartition (coalesce can
        only reduce and would silently no-op)."""
        if not self.df.isStreaming and n > self.df.rdd.getNumPartitions():
            return self._wrap(self.df.repartition(n))
        return self._wrap(self.df.coalesce(n))

    def rebalance(self, n: int | None = None) -> "DataStream":
        """Round-robin full redistribution (Flink's rebalance; the
        even-spread counterpart of ShuffleMode.Hash without a key) — one
        shuffle, evens out skew before a parallel stage.  ``n=None``
        rebalances to the session's ``spark.sql.shuffle.partitions``
        (DataFrame.repartition has no no-arg form)."""
        if n is None:
            n = int(self.df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        return self._wrap(self.df.repartition(n))

    def partition_by(self, n: int, *cols: str | Column) -> "DataStream":
        """≙ ShuffleMode.Hash with an explicit key + parallelism
        (KeyGenStage.NumberOfPartitions, GatewayAndKeyGenStages.cs:217-446):
        hash-partition so equal keys co-locate for downstream stages."""
        return self._wrap(self.df.repartition(n, *cols))

    # -- §2.2 sinks ---------------------------------------------------------
    def add_sink(self, sink_factory: Callable[[DataFrame], Any]):
        """≙ DataStream.AddSink: pass a factory from flink_net_spark.sinks
        (e.g. ``lambda df: memory_sink(df, "out")``).  Returns whatever the
        factory builds (a DataStreamWriter for streams; call .start())."""
        return sink_factory(self.df)

    def print(self):  # noqa: A003
        """≙ ConsoleSinkFunction convenience."""
        from flink_net_spark.sinks import console_sink

        return console_sink(self.df)

    # -- misc ----------------------------------------------------------------
    def to_table(self, name: str) -> DataFrame:
        """≙ TableEnvironment.FromDataStream."""
        self.df.createOrReplaceTempView(name)
        return self.df


class KeyedDataStream:
    """≙ KeyedDataStream<TKey, T> (Streaming/KeyedDataStream.cs:8)."""

    def __init__(self, df: DataFrame, keys: list, env: StreamExecutionEnvironment):
        self.df = df
        self.keys = keys
        self.env = env

    def reduce(self, **aggs: Column) -> DataStream:
        """≙ IReduceOperator on the whole keyed stream (global window):
        ``ks.reduce(total=F.sum("x"))``."""
        return DataStream(self.df.groupBy(*self.keys).agg(*[c.alias(n) for n, c in aggs.items()]), self.env)

    aggregate = reduce  # ≙ IAggregateOperator — built-in aggs carry Merge

    def window(self, window_col: Column) -> "WindowedStream":
        """≙ KeyedDataStream.Window(assigner) — pass a column from
        flink_net_spark.streaming (tumbling/sliding/session)."""
        return WindowedStream(self.df, self.keys, window_col, self.env)

    def process(self, fn, output_schema: str, timeout: str = "none") -> DataStream:
        """≙ KeyedProcessFunction with state + timers — see
        streaming.stateful.map_groups_with_state."""
        from flink_net_spark.streaming.stateful import map_groups_with_state

        key_names = [k if isinstance(k, str) else str(k) for k in self.keys]
        return DataStream(
            map_groups_with_state(self.df, key_names, fn, output_schema, timeout=timeout),
            self.env,
        )


class WindowedStream:
    """≙ WindowedStream<T, W> (Streaming/WindowedStream.cs:27)."""

    def __init__(self, df: DataFrame, keys: list, window_col: Column, env: StreamExecutionEnvironment):
        self.df = df
        self.keys = keys
        self.window_col = window_col
        self.env = env

    def reduce(self, **aggs: Column) -> DataStream:
        """≙ WindowedStream.Reduce/Aggregate (WindowedStream.cs:65-79)."""
        return DataStream(
            self.df.groupBy(self.window_col, *self.keys).agg(
                *[c.alias(n) for n, c in aggs.items()]
            ),
            self.env,
        )

    aggregate = reduce

    def process(self, fn, output_schema: str, evictor=None) -> DataStream:
        """≙ WindowedStream.Process(IProcessWindowFunction) — full-pane
        access (batch DataFrames; streaming panes via the stateful
        harness)."""
        from flink_net_spark.streaming.stateful import process_window

        key_names = [k if isinstance(k, str) else str(k) for k in self.keys]
        return DataStream(
            process_window(self.df, key_names, self.window_col, fn, output_schema, evictor=evictor),
            self.env,
        )
