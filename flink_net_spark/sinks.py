"""Sink factories — SURVEY.md §2.2 on ``writeStream`` / ``foreachBatch``.

Reference contracts:
  - ``ISinkFunction<T>.Invoke(record, ctx)`` per-record sink
    (FlinkDotNet/FlinkDotNet.Core.Abstractions/Sinks/ISinkFunction.cs:12)
    → ``ForeachSinkAdapter`` (writeStream.foreach) with the same
    open/invoke/close lifecycle (≙ IOperatorLifecycle.cs:9).
  - ``ConsoleSinkFunction`` (Connectors.Sinks.Console/ConsoleSinkFunction.cs:7-30)
    → ``console_sink``.
  - ``KafkaSinkFunction`` incl. transactional producer
    (Connectors.Sources.Kafka/KafkaSinkFunction.cs:13-90) → ``kafka_sink``.
  - ``ITransactionalSinkFunction`` 2-phase-commit
    (Sinks/ITransactionalSinkFunction.cs:8) → ``TransactionalParquetSink``:
    Spark's micro-batch commit log plays the coordinator; the sink makes the
    batch write atomic+idempotent (stage to temp, rename, skip committed
    batchIds), which under checkpointed replay yields exactly-once output —
    the same guarantee the reference builds from barriers + 2PC
    (docs/wiki/Core-Concepts-Exactly-Once-Semantics.md).
  - ``RedisIncrementSinkFunction`` counter sink
    (FlinkDotNetAspire/FlinkJobSimulator/RedisIncrementSinkFunction.cs:1)
    → ``CounterSink``: idempotent per-batchId counter increments, used by
    the exactly-once stress tests exactly like the reference's Redis
    global-sequence verification (stress_test_passed_output.txt:85-104).

Scale: every sink is executor-side (foreachBatch receives a distributed
DataFrame); the only driver-side state is the tiny batchId commit log.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery


def console_sink(df: DataFrame, mode: str = "append", truncate: bool = False) -> DataStreamWriter:
    """≙ ConsoleSinkFunction.cs:7-30 (prints records with task context)."""
    return df.writeStream.format("console").outputMode(mode).option("truncate", str(truncate).lower())


def memory_sink(df: DataFrame, table_name: str, mode: str = "append") -> DataStreamWriter:
    """In-session queryable sink (the test/debug sink; no reference analog —
    the reference uses Redis for the same observe-the-output role)."""
    return df.writeStream.format("memory").queryName(table_name).outputMode(mode)


def parquet_sink(df: DataFrame, path: str, checkpoint: str, mode: str = "append") -> DataStreamWriter:
    """File sink with Spark's own transactional file commit protocol."""
    return (
        df.writeStream.format("parquet")
        .outputMode(mode)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )


def kafka_sink_options(
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    producer_overrides: dict[str, str] | None = None,
) -> dict[str, str]:
    """The EXACT option map applied to the Kafka stream writer — pure
    function so the producer contract is testable without a broker
    (≙ KafkaSinkFunction.cs:13-90 config assembly).  ``kafka.*``-prefixed
    overrides reach the underlying producer config verbatim (the
    reference's ProducerConfig surface)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }
    for k, v in (producer_overrides or {}).items():
        opts[k if k.startswith("kafka.") else f"kafka.{k}"] = v
    return opts


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    producer_overrides: dict[str, str] | None = None,
) -> DataStreamWriter:
    """≙ KafkaSinkFunction.cs:13-90.  df must expose key/value columns.
    Exactly-once to Kafka = checkpointed offsets + idempotent producer
    (the reference's TransactionalId path maps to Kafka transactions which
    Spark's sink does not open; dedup-on-read or idempotent keys cover it)."""
    writer = df.writeStream.format("kafka")
    for k, v in kafka_sink_options(
        bootstrap_servers, topic, checkpoint, producer_overrides
    ).items():
        writer = writer.option(k, v)
    return writer


class ForeachSinkAdapter:
    """Adapter giving a Python object the ``ISinkFunction`` lifecycle:
    ``open(partition_id, epoch_id)`` / ``process(row)`` / ``close(error)``
    (≙ ISinkFunction.cs:12 + IOperatorLifecycle.cs:9).  Pass an instance to
    ``df.writeStream.foreach(...)``.  Row-at-a-time — prefer foreachBatch
    sinks for anything hot; this exists for API parity."""

    def __init__(self, invoke, on_open=None, on_close=None):
        self._invoke = invoke
        self._on_open = on_open
        self._on_close = on_close

    def open(self, partition_id: int, epoch_id: int) -> bool:  # noqa: A003
        if self._on_open:
            self._on_open(partition_id, epoch_id)
        return True

    def process(self, row) -> None:
        self._invoke(row)

    def close(self, error) -> None:
        if self._on_close:
            self._on_close(error)


@dataclass
class TransactionalParquetSink:
    """Exactly-once parquet sink as idempotent ``foreachBatch``.

    2PC mapping (≙ ITransactionalSinkFunction.cs:8 BeginTransaction/
    PreCommit/Commit/Abort):
      - BeginTransaction → write batch to ``<out>/.staging/<batchId>-<uuid>``
      - PreCommit        → staging write completes (any failure = auto-abort,
                           the orphaned staging dir is ignored)
      - Commit           → atomic rename to ``<out>/batch_id=<batchId>`` +
                           append to the commit log
      - replayed batch   → batchId already in commit log → skip (idempotent)

    Under checkpoint-restart Spark replays the last uncommitted batch with
    the SAME batchId, so output is exactly-once end-to-end.
    """

    out_dir: str

    def _log_path(self) -> str:
        return os.path.join(self.out_dir, "_commits.json")

    def committed_batches(self) -> set[int]:
        try:
            with open(self._log_path()) as fh:
                return set(json.load(fh))
        except (OSError, ValueError):
            return set()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        committed = self.committed_batches()
        if batch_id in committed:
            # Replay after restart — output already durable, so don't write.
            # The batch must still be CONSUMED in full: upstream stateful
            # operators only commit their state-store deltas when every
            # partition is processed, and Spark validates those commits per
            # batch.  A noop-format write drains all partitions without
            # touching the sink output (the "abort keeps the transaction
            # side-effect-free" half of the 2PC contract).
            batch_df.write.format("noop").mode("overwrite").save()
            return
        final = os.path.join(self.out_dir, f"batch_id={batch_id}")
        staging = os.path.join(self.out_dir, ".staging", f"{batch_id}-{uuid.uuid4().hex}")
        batch_df.write.mode("overwrite").parquet(staging)
        if os.path.exists(final):
            shutil.rmtree(final)  # half-renamed prior attempt
        os.makedirs(os.path.dirname(final), exist_ok=True)
        os.replace(staging, final)
        committed.add(batch_id)
        tmp_log = self._log_path() + ".tmp"
        with open(tmp_log, "w") as fh:
            json.dump(sorted(committed), fh)
        os.replace(tmp_log, self._log_path())

    def writer(self, df: DataFrame, checkpoint: str) -> DataStreamWriter:
        return df.writeStream.foreachBatch(self).option("checkpointLocation", checkpoint)


@dataclass
class CounterSink:
    """Idempotent counting sink ≙ RedisIncrementSinkFunction (201 LoC of
    Lua-batched INCRBY in the reference).  Persists one JSON file per
    batchId (atomic rename), so a replayed batch overwrites rather than
    double-counts; ``total()`` sums the per-batch counts — the reference's
    Redis global-sequence invariant check."""

    state_dir: str

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = os.path.join(self.state_dir, f".{batch_id}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"batch_id": batch_id, "count": n}, fh)
        os.replace(tmp, os.path.join(self.state_dir, f"batch-{batch_id}.json"))

    def total(self) -> int:
        total = 0
        for f in os.listdir(self.state_dir):
            if f.startswith("batch-"):
                with open(os.path.join(self.state_dir, f)) as fh:
                    total += json.load(fh)["count"]
        return total


def with_trigger(
    writer: DataStreamWriter,
    processing_time: str | None = None,
    available_now: bool = False,
) -> DataStreamWriter:
    """Trigger surface ≙ the reference's Trigger taxonomy
    (Core.Api/Windowing/DefaultTriggers.cs:7-52, Trigger.cs:8-80), mapped to
    Spark's micro-batch scheduling:

      - ``processing_time="10 seconds"`` ≙ ProcessingTimeTrigger — fire a
        micro-batch on a wall-clock cadence (DefaultTriggers.cs:31-44).
      - ``available_now=True`` — drain everything available then stop
        (the bounded-job trigger; how ``run_to_completion`` finishes).
      - neither — Spark's default as-fast-as-possible micro-batches ≙
        EventTimeTrigger: results for an event-time window emit when the
        watermark passes its end (DefaultTriggers.cs:7-29), which in Spark
        is watermark semantics on ANY trigger cadence.
      - NeverTrigger (GlobalWindows default, DefaultTriggers.cs:46-52) has
        no writer mapping: global-window firing is custom logic in the
        stateful harness (streaming.stateful.count_trigger_window etc.).
    """
    if processing_time is not None and available_now:
        raise ValueError("pick one trigger mode")
    if processing_time is not None:
        return writer.trigger(processingTime=processing_time)
    if available_now:
        return writer.trigger(availableNow=True)
    return writer


def run_to_completion(writer: DataStreamWriter) -> StreamingQuery:
    """Start a bounded streaming query, drain every available micro-batch,
    stop.  The Flink-analog of running a bounded DataStream job to finality."""
    q = writer.start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    return q


# -- batch table sinks: partitioned / bucketed layout ------------------------
# The reference has no batch storage layout surface (its sinks are
# per-record streams); these are the engine-native batch counterparts that
# make the 100 TB layout story concrete: partition pruning via directory
# layout, and bucketing so repeated big-big joins on the bucket key need NO
# exchange at read time (the shuffle is paid once, at write).


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet: one directory per partition value so
    any filter on a partition column prunes whole directories at plan time
    (PartitionFilters in the scan, zero I/O for pruned values).  Partition
    columns must be low-cardinality (date, region, event_type) — high-
    cardinality partitioning creates a small-file explosion at 100 TB."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table write: rows are hash-distributed into ``n_buckets``
    files per partition by ``bucket_cols`` and registered in the catalog.
    Two tables bucketed the same way join WITHOUT any Exchange — the
    shuffle is pre-paid at write time, which is the right trade for
    fact-to-fact joins that repeat every pipeline run (the co-located join
    the brief calls out).  ``sort_cols`` additionally pre-sorts within
    buckets so sort-merge join skips its sort."""
    w = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.option("path", path).mode(mode).format("parquet").saveAsTable(table_name)


@dataclass
class DeadLetterSink:
    """Dead-letter-queue pattern (≙ the JobManager's DLQ resubmit surface,
    FlinkDotNet/FlinkDotNet.JobManager/Controllers/JobManagerController.cs:35-352):
    a ``foreachBatch`` sink that splits every micro-batch on a validity
    predicate — valid rows land in the main output, rejects land in a DLQ
    directory with batch/reason metadata, and ``resubmit`` reads the DLQ
    back as a source so repaired records re-enter the pipeline.

    Exactly-once: both writes key their directory on batchId, so a replayed
    batch overwrites its own prior output instead of duplicating it.
    Executor-side throughout; the split predicate is a Column (codegen).
    """

    main_path: str
    dlq_path: str
    invalid_cond_sql: str  # SQL boolean expr; true → dead-letter
    reason: str = "validation_failed"

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        cond = F.expr(self.invalid_cond_sql)
        batch_df.filter(~cond).write.mode("overwrite").parquet(
            os.path.join(self.main_path, f"batch_id={batch_id}")
        )
        (
            batch_df.filter(cond)
            .withColumn("dlq_reason", F.lit(self.reason))
            .withColumn("dlq_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .parquet(os.path.join(self.dlq_path, f"batch_id={batch_id}"))
        )

    def writer(self, df: DataFrame, checkpoint: str) -> DataStreamWriter:
        return (
            df.writeStream.foreachBatch(self)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
        )

    def resubmit(self, spark) -> DataFrame:
        """Read dead-lettered records back (metadata stripped) for replay."""
        return spark.read.option("recursiveFileLookup", "false").parquet(
            os.path.join(self.dlq_path, "batch_id=*")
        ).drop("dlq_reason", "dlq_batch_id")


@dataclass
class UpsertSink:
    """Keyed CDC upsert sink — changelog-in, latest-state-out (≙ the
    reference's Redis keyed-state sink pattern, RedisIncrementSinkFunction.cs:1,
    generalized to arbitrary rows; Flink calls this an *upsert sink* on a
    retract stream).

    Each micro-batch is compacted to its newest row per key (max ``seq_col``),
    merged with the current snapshot (old rows for touched keys are
    replaced), and published as a new immutable snapshot version with an
    atomic pointer swap.  Replayed batchIds are skipped via the version log,
    so checkpoint-restart keeps the snapshot exactly-once.

    Scale: the merge is a key-partitioned anti-join + union — one shuffle on
    the key.  Rewriting the full snapshot per batch is the plain-parquet
    reality; on a real lake this maps 1:1 to ``MERGE INTO`` on a Delta/
    Iceberg table where only touched partitions/files rewrite.  The
    per-batch compaction (window argmax) bounds merge input to the batch's
    own keys first.
    """

    out_dir: str
    key_cols: tuple[str, ...]
    seq_col: str

    def _meta_path(self) -> str:
        return os.path.join(self.out_dir, "_upsert_meta.json")

    def _meta(self) -> dict:
        try:
            with open(self._meta_path()) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return {"version": -1, "batches": []}

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        meta = self._meta()
        if batch_id in meta["batches"]:
            return  # replay after restart — snapshot already reflects it
        keys = list(self.key_cols)
        w = Window.partitionBy(*keys).orderBy(F.col(self.seq_col).desc())
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        spark = batch_df.sparkSession
        if meta["version"] >= 0:
            cur = spark.read.parquet(os.path.join(self.out_dir, f"v{meta['version']}"))
            # argmax over snapshot ∪ batch, not "batch wins": an
            # out-of-order changelog may deliver an older row later.
            merged = (
                cur.unionByName(latest)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            merged = latest
        new_version = meta["version"] + 1
        staging = os.path.join(self.out_dir, ".staging", f"{new_version}-{uuid.uuid4().hex}")
        merged.write.mode("overwrite").parquet(staging)
        final = os.path.join(self.out_dir, f"v{new_version}")
        if os.path.exists(final):
            shutil.rmtree(final)  # half-published prior attempt
        os.makedirs(os.path.dirname(final), exist_ok=True)
        os.replace(staging, final)
        meta = {"version": new_version, "batches": sorted(meta["batches"] + [batch_id])}
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self._meta_path())

    def snapshot(self, spark) -> DataFrame:
        meta = self._meta()
        if meta["version"] < 0:
            raise FileNotFoundError(f"no snapshot published under {self.out_dir}")
        return spark.read.parquet(os.path.join(self.out_dir, f"v{meta['version']}"))

    def writer(self, df: DataFrame, checkpoint: str) -> DataStreamWriter:
        return df.writeStream.foreachBatch(self).option("checkpointLocation", checkpoint)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory so output files
    approach ``target_file_bytes`` (the operational chore every streaming
    sink and fine-grained partitioned write creates at 100 TB — thousands
    of KB-sized files per partition turn scans into metadata storms and
    NameNode/listing hot spots).

    Sizing uses the directory's actual on-disk bytes (compressed), so the
    output file count is ``ceil(disk_bytes / target)`` — one coalesce-style
    round-robin repartition, no key shuffle.  For partitioned layouts pass
    ``partition_cols`` to preserve the directory structure (files compact
    *within* partitions via a repartition on the partition key).

    Crash-safety contract (precise wording per ADVICE r5): the source is
    NEVER partially overwritten — at every instant a complete copy of the
    data exists on disk, either at ``path`` or parked at
    ``path._precompact`` between the two swap renames.  A crash in that
    window is healed on the next call (the backup is renamed back before
    compacting; proven by the kill-between-renames test).  A leftover
    backup NEXT TO a live ``path`` (crash after the swap, before cleanup)
    raises instead of silently discarding either copy — the operator
    verifies ``path`` and removes the backup.  The swap uses ``os.rename``
    of sibling directories, so staging/backup live on ``path``'s
    filesystem; a ``path`` that is itself a mount point would fail the
    rename (EXDEV) before anything is touched.  Returns the new file
    count."""
    import math
    import os
    import shutil

    staging = path.rstrip("/") + "._compacting"
    backup = path.rstrip("/") + "._precompact"
    if os.path.exists(backup):
        if os.path.exists(path):
            raise RuntimeError(
                f"both {path} and {backup} exist — a previous compaction "
                "crashed after its swap but before cleanup; verify the data "
                f"at {path} and delete the backup before re-running"
            )
        # crash landed between the two swap renames: the dataset is intact
        # at the backup location — restore it and proceed
        os.rename(backup, path)
    shutil.rmtree(staging, ignore_errors=True)

    disk = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _d, files in os.walk(path)
        for f in files
        if not f.startswith(("_", "."))
    )
    n_files = max(1, math.ceil(disk / target_file_bytes))
    df = spark.read.parquet(path)
    if partition_cols:
        (
            df.repartition(n_files, *partition_cols)
            .write.partitionBy(*partition_cols)
            .mode("overwrite")
            .parquet(staging)
        )
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(staging)
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
