"""Offline Kafka contract tests (≙ KafkaSourceFunction.cs:19-100,261,
FlinkKafkaConsumerGroup.cs:20-100, KafkaSinkFunction.cs:13-90).

No broker ships in this sandbox, so the contracts are pinned at the exact
surface Spark consumes: the option maps applied to the reader/writer
(``reader_options()`` / ``kafka_sink_options()`` are pure functions of the
builder state) and the checkpoint offset-log parse that implements
restore-from-checkpoint.  The offset-log reader's structural assumptions
are validated against a REAL checkpoint written by a live streaming query;
the Kafka offset JSON line itself follows Spark's documented
KafkaSourceOffset shape (``{"topic":{"partition":offset}}``).  Tests that
need a live broker skip with a reason.
"""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from flink_net_spark.sinks import kafka_sink_options
from flink_net_spark.sources import KafkaSource, starting_offsets_from_checkpoint

BROKER = os.environ.get("KAFKA_BOOTSTRAP_SERVERS")


def test_reader_options_unbounded_defaults():
    src = KafkaSource("broker1:9092,broker2:9092", "events,clicks")
    opts = src.reader_options()
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "events,clicks",
        "startingOffsets": "earliest",
    }


def test_reader_options_bounded_and_group_prefix():
    src = KafkaSource(
        "b:9092",
        "events",
        starting_offsets='{"events":{"0":42}}',
        ending_offsets='{"events":{"0":99}}',
        group_id_prefix="flinkdotnet-consumer-group",
        bounded=True,
    )
    opts = src.reader_options()
    assert opts["startingOffsets"] == '{"events":{"0":42}}'
    assert opts["endingOffsets"] == '{"events":{"0":99}}'
    assert opts["groupIdPrefix"] == "flinkdotnet-consumer-group"
    # bounded with no explicit end reads to latest (the reference's bounded
    # consumption mode)
    assert (
        KafkaSource("b:9092", "t", bounded=True).reader_options()["endingOffsets"]
        == "latest"
    )
    # unbounded must NOT carry endingOffsets (stream readers reject it)
    assert "endingOffsets" not in KafkaSource("b:9092", "t").reader_options()


def test_reader_options_kafka_passthrough_preserved():
    """kafka.*-prefixed options reach the consumer config verbatim — the
    reference's ConsumerConfig surface (security, isolation level, fetch
    sizing) maps through this passthrough."""
    src = KafkaSource(
        "b:9092",
        "t",
        options={
            "kafka.isolation.level": "read_committed",
            "kafka.security.protocol": "SASL_SSL",
            "maxOffsetsPerTrigger": "100000",
            "failOnDataLoss": "false",
        },
    )
    opts = src.reader_options()
    assert opts["kafka.isolation.level"] == "read_committed"
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["maxOffsetsPerTrigger"] == "100000"
    assert opts["failOnDataLoss"] == "false"


def _write_offset_log(ckpt: str, batch_id: int, offset_json: str, extra_lines=()):
    os.makedirs(os.path.join(ckpt, "offsets"), exist_ok=True)
    with open(os.path.join(ckpt, "offsets", str(batch_id)), "w") as f:
        f.write("v1\n")
        f.write(
            json.dumps(
                {
                    "batchWatermarkMs": 0,
                    "batchTimestampMs": 1700000000000,
                    "conf": {"spark.sql.shuffle.partitions": "8"},
                }
            )
            + "\n"
        )
        for ln in extra_lines:
            f.write(ln + "\n")
        f.write(offset_json + "\n")


def test_restore_from_checkpoint_latest_batch_wins():
    with tempfile.TemporaryDirectory() as ckpt:
        _write_offset_log(ckpt, 0, '{"events":{"0":10,"1":20}}')
        _write_offset_log(ckpt, 2, '{"events":{"0":150,"1":207}}')
        # batch 10 sorts after batch 2 numerically, not lexically
        _write_offset_log(ckpt, 10, '{"events":{"0":1500,"1":2070}}')
        offs = starting_offsets_from_checkpoint(ckpt)
        assert json.loads(offs) == {"events": {"0": 1500, "1": 2070}}

        src = KafkaSource.from_checkpoint(ckpt, "b:9092", "events")
        assert src.reader_options()["startingOffsets"] == offs


def test_restore_skips_placeholder_and_metadata_lines():
    with tempfile.TemporaryDirectory() as ckpt:
        # multi-source query: first source has no offset yet ("-")
        _write_offset_log(ckpt, 0, '{"clicks":{"0":7}}', extra_lines=["-"])
        assert json.loads(starting_offsets_from_checkpoint(ckpt)) == {"clicks": {"0": 7}}


def test_restore_raises_on_empty_log():
    with tempfile.TemporaryDirectory() as ckpt:
        os.makedirs(os.path.join(ckpt, "offsets"))
        with pytest.raises(FileNotFoundError):
            starting_offsets_from_checkpoint(ckpt)


def test_offset_log_structure_matches_real_spark_checkpoint(spark, tmp_path):
    """Our parser's structural assumptions (offsets/<batchId> digit files,
    ``v1`` header, metadata JSON line, one offset line per source) must hold
    against a checkpoint Spark actually wrote — guard against format drift."""
    src_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    q = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .groupBy()
        .count()
        .writeStream.format("memory")
        .queryName("kafka_contract_fmt_probe")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    offsets_dir = os.path.join(ckpt, "offsets")
    batches = [f for f in os.listdir(offsets_dir) if f.isdigit()]
    assert batches, "real checkpoint wrote no offset log entries"
    with open(os.path.join(offsets_dir, max(batches, key=int))) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    assert lines[0].startswith("v"), lines[0]
    meta = json.loads(lines[1])
    assert "batchWatermarkMs" in meta  # the metadata line our parser skips
    # the file source's offset line parses as JSON (kafka's would be the
    # {"topic":{"partition":offset}} dict our parser returns)
    json.loads(lines[2])


def test_sink_options_and_producer_passthrough():
    opts = kafka_sink_options(
        "b:9092",
        "out-topic",
        "/tmp/ckpt",
        producer_overrides={
            "compression.type": "lz4",
            "kafka.enable.idempotence": "true",
        },
    )
    assert opts == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "out-topic",
        "checkpointLocation": "/tmp/ckpt",
        "kafka.compression.type": "lz4",  # auto-prefixed to reach the producer
        "kafka.enable.idempotence": "true",
    }


@pytest.mark.skipif(
    BROKER is None,
    reason="live Kafka broker required (set KAFKA_BOOTSTRAP_SERVERS); "
    "sandbox ships no broker or spark-sql-kafka package",
)
def test_kafka_live_roundtrip(spark, tmp_path):  # pragma: no cover - needs broker
    """Produce via kafka_sink, consume bounded via KafkaSource, count."""
    from flink_net_spark.sinks import kafka_sink

    import pyspark.sql.functions as F

    topic = "fns_contract_roundtrip"
    df = (
        spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        .select(
            F.col("value").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
        )
    )
    q = kafka_sink(df, BROKER, topic, str(tmp_path / "ckpt")).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = KafkaSource(BROKER, topic, bounded=True).load(spark)
    assert got.count() > 0
