"""Subprocess runner for the cross-process restart test.

Each invocation is a FRESH JVM + driver process (≙ a JobManager restarting a
job on new TaskManager processes, JobManagerController.cs:35-352): it builds
the same stateful keyed-count job over whatever chunk files currently exist
in the stage directory and drains it from the shared checkpoint through the
idempotent 2PC sink.  Run twice with more files (and a different
parallelism) the second time, the final complete-mode emission must equal
the batch truth — state and offsets survived the process boundary or the
counts come out wrong.

Usage: python tests/process_restart_runner.py STAGE_DIR OUT_DIR CKPT_DIR SHUFFLE_PARTITIONS
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    stage, out_dir, ckpt, parts = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]

    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from flink_net_spark.jobs import JobManager, JobSpec
    from flink_net_spark.sinks import TransactionalParquetSink

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.ui.enabled", "false")
        .appName(f"restart-runner-{parts}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    schema = spark.read.parquet(stage).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    counts = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    sink = TransactionalParquetSink(out_dir)
    spec = JobSpec(
        name="xproc_job",
        checkpoint=ckpt,
        build=lambda s: counts.writeStream.outputMode("complete").foreachBatch(sink),
    )
    job = JobManager(spark).submit(spec)
    job.query.processAllAvailable()
    job.stop()
    job.await_termination(30)
    spark.stop()
    print("RUNNER_OK")


if __name__ == "__main__":
    main()
