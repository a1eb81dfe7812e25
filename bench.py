#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints EXACTLY ONE JSON line to stdout:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1,
     "rows_per_sec": N}

Everything else (progress, Spark logs) goes to stderr.  The driver records
the JSON as BENCH_r{N}.json; BASELINE.md's stress target (~1.15M rec/s on a
1M-record pipeline) is compared against ``rows_per_sec`` — total source rows
scanned across all benched queries divided by total wall time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship TPC-H shapes, the windowing/eventing surface,
# and one representative per LLM-pipeline family.  The O(n²) oracle-only
# shapes (dedup_embedding_cosine) are deliberately excluded — sim_ann_lsh
# and dedup_minhash_lsh are the scale paths and are benched instead.
HEADLINE = [
    "q1_pricing_summary",
    "q6_revenue_delta",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_self_window",
    "agg_distinct",
    "topk_per_group",
    "window_tumbling_hourly",
    "window_sliding",
    "window_session",
    "flatmap_explode_words",
    "text_quality_score",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_resolve_groups",
    "dedup_simhash_pairs",
    "dedup_embedding_ann",
    "sim_ann_lsh",
    "sim_ann_multiprobe",
    "udaf_value_mad",
    "mm_decode_stats",
    "sim_ann_ivf",
    "join_asof",
    "vocab_top_terms",
    "tfidf_doc_terms",
    "sample_stratified_hash",
    "text_pii_scrub",
    "q18_large_volume_customers",
    "q9_profit_by_nation",
    "stream_window_tumbling_hourly",
    "stream_stateful_running_count",
    "text_repetition_stats",
    "emb_kmeans_assign",
    "emb_kmeans_iterate",
    "sql_recursive_closure",
    "curation_decontaminate",
    "curation_pack_sequences",
    "curation_domain_mix",
    "curation_end_to_end",
    "window_count_per_key",
    "window_session_dynamic_gap",
    "pipeline_five_stage",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> int:
    from flink_net_spark.session import get_spark
    from flink_net_spark.tables import load_table
    import __spark_entry__ as entry_mod

    spark = get_spark("flink_net_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # Streaming-equivalent throughput probe: the reference's baseline is a
    # 1M-msg Kafka→map→keyed-count pipeline (BASELINE.md ~1.15M msg/s).  The
    # batch analog: scan events → per-record map → keyed count.
    import pyspark.sql.functions as F

    # ×10 replication ≈ the reference's 1M-message synthetic stress input;
    # without it the fixed per-job cost (~1s) dominates and understates rec/s.
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "rep", F.explode(F.sequence(F.lit(1), F.lit(10)))
    )
    n_events = ev.count()  # warm the scan
    pipe = (
        ev.withColumn("k", F.abs(F.hash("user_id", "event_type", "rep")) % 1024)
        .withColumn("payload_len", F.length("props") + F.length("event_type"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("payload_len").alias("bytes"))
    )
    # Sustained throughput, like the baseline: the reference's 1.15M msg/s is
    # measured on an already-running pipeline (cluster+codegen warm, 1M msgs
    # in 2.763s — stress_test_passed_output.txt:83); mirror that by warming
    # codegen/shuffle once, then timing repeat executions end-to-end.
    pipe.collect()  # warm: whole-stage codegen compile + shuffle stage setup
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        pipe.collect()
        runs.append(time.perf_counter() - t0)
    pipeline_dt = sorted(runs)[1]  # median of 3 full re-executions
    rows_per_sec = round(n_events / pipeline_dt) if pipeline_dt > 0 else None
    print(f"[bench] throughput pipeline: {n_events} events in {pipeline_dt:.3f}s"
          f" = {rows_per_sec} rec/s", file=sys.stderr)

    # TRUE Structured Streaming probe — the baseline's own semantics: a
    # running micro-batch pipeline (file source -> map -> keyed count ->
    # sink).  The reference measures an ALREADY-RUNNING pipeline (topic
    # pre-produced, cluster warm: 1M msgs in 2.763s,
    # stress_test_passed_output.txt:52-83), so we mirror that: stage 3M
    # events as 12 files, stream them as 1M-row micro-batches, and report
    # the steady-state rate from the engine's own per-batch trigger
    # timings, excluding batch 0 (query-start + codegen warm-up).
    import json as _json
    import shutil
    import tempfile

    stage = os.path.join(tempfile.gettempdir(), f"fns_bench_stream_{os.path.basename(SF_DIR)}")
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        ev3 = load_table(spark, SF_DIR, "events").withColumn(
            "rep", F.explode(F.sequence(F.lit(1), F.lit(30)))
        )
        ev3.repartition(12).write.mode("overwrite").parquet(stage)
    schema = spark.read.parquet(stage).schema
    # Small state (1024 keys) -> 8 state-store partitions; restore after.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(stage)
        .withColumn("k", F.abs(F.hash("user_id", "event_type", "rep")) % 1024)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )
    ckpt = tempfile.mkdtemp(prefix="fns_bench_ckpt_")
    q = (
        stream.writeStream.format("memory")
        .queryName("fns_bench_stream")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    t0 = time.perf_counter()
    q.processAllAvailable()
    stream_dt = time.perf_counter() - t0
    q.stop()
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    batches = [
        (p["batchId"], p["numInputRows"], p["durationMs"].get("triggerExecution", 0))
        for p in (_json.loads(pr.json) for pr in q.recentProgress)
        if p["numInputRows"] > 0
    ]
    steady = batches[1:] if len(batches) > 1 else batches
    steady_rows = sum(r for _, r, _ in steady)
    steady_ms = sum(d for _, _, d in steady)
    stream_rps = round(steady_rows / steady_ms * 1000) if steady_ms else None
    shutil.rmtree(ckpt, ignore_errors=True)
    for b, r, d in batches:
        print(f"[bench]   stream batch {b}: {r} rows in {d}ms", file=sys.stderr)
    print(f"[bench] streaming probe: steady-state {steady_rows} events in {steady_ms}ms"
          f" = {stream_rps} rec/s (micro-batched; {stream_dt:.3f}s total drain)",
          file=sys.stderr)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        # time fn()+collect as one unit: streaming queries and iterative
        # algorithms execute inside fn(), not at collect time
        fn(spark, SF_DIR).count()  # warm: scan caches, streaming staging dirs
        t0 = time.perf_counter()
        n = len(fn(spark, SF_DIR).collect())
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        print(f"[bench] {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline_queries_total_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "rows_per_sec": rows_per_sec,
        "throughput_pipeline_sec": round(pipeline_dt, 4),
        "throughput_events": n_events,
        "stream_rows_per_sec": stream_rps,
        "stream_pipeline_sec": round(stream_dt, 4),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
