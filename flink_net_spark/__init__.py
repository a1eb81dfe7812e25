"""flink_net_spark — a PySpark-native analytics/streaming engine with the
declared capability surface of devstress/FLINK.NET, re-expressed Spark-first.

The reference (read-only at /root/reference) is a C# re-implementation of
Apache Flink's streaming model (DataStream / keyed state / event-time windows /
checkpointing).  This package provides the same surface on top of the PySpark
DataFrame + Structured Streaming APIs, plus the relational/batch superset the
reference declares but never executes (SQL, joins, sorts — see SURVEY.md §2).

Layout:
    session     — tuned SparkSession builder (AQE, shuffle partitions, UTC)
    tables      — loaders for the driver's TPC-H-ish parquet testdata
    datastream  — DataStream-flavored fluent facade over DataFrames
    operators/  — dedup, similarity, text analysis, multimodal plumbing
    functions/  — deterministic hashing/shingling column expressions
    sources/    — batch + streaming source factories (file/rate/kafka)
    sinks       — sink factories incl. transactional foreachBatch patterns
    streaming/  — window assigners, watermarks, stateful processing harness
    queries     — the §2-inventory query registry (Spark fn + DuckDB oracle)
    sql         — TableEnvironment-style facade over spark.sql
"""

from flink_net_spark.session import get_spark
from flink_net_spark.tables import TABLE_NAMES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLE_NAMES"]

__version__ = "0.1.0"
