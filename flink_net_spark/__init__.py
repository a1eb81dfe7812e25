"""flink_net_spark — a PySpark-native analytics/streaming engine with the
declared capability surface of devstress/FLINK.NET, re-expressed Spark-first.

The reference (read-only at /root/reference) is a C# re-implementation of
Apache Flink's streaming model (DataStream / keyed state / event-time windows /
checkpointing).  This package provides the same surface on top of the PySpark
DataFrame + Structured Streaming APIs, plus the relational/batch superset the
reference declares but never executes (SQL, joins, sorts — see SURVEY.md §2).

Layout (every module listed here exists and imports):
    session     — tuned SparkSession builder (AQE, shuffle partitions, UTC)
                  + ship_package_to_executors for pandas-UDF closures
    tables      — loaders for the driver's TPC-H-ish parquet testdata
    datastream  — DataStream/KeyedDataStream/WindowedStream fluent facade
    operators/  — rich lifecycle, salted-skew, UDAF, multimodal, async-egress harnesses
    functions/  — deterministic hashing/shingling column expressions
    sources/    — unified batch/streaming source factories (file/rate/kafka)
    sinks       — console/memory/parquet/kafka/foreach sinks + transactional
                  (exactly-once) foreachBatch patterns
    streaming/  — window assigners, watermarks; stateful: keyed state,
                  timers, triggers on applyInPandasWithState
    queries/    — the §2-inventory query registry (Spark fn + DuckDB oracle)
    sql         — TableEnvironment-style facade over spark.sql
    jobs        — StreamingQuery job control + metrics listener
"""

from flink_net_spark.session import get_spark, ship_package_to_executors
from flink_net_spark.tables import TABLE_NAMES, load_tables, register_views

__all__ = [
    "get_spark",
    "ship_package_to_executors",
    "load_tables",
    "register_views",
    "TABLE_NAMES",
]

__version__ = "0.1.0"
