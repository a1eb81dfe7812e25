#!/usr/bin/env python
"""Solo-first streaming throughput probes (VERDICT r14 #1).

The baseline-facing stream rates used to be measured inside the shared
bench session, which in driver rounds runs LATE on an aged JVM — the
round-14 adjudication (bench_out/STREAM_PROBE_ADJ.json) reproduced the
1M-key decline within one session and named the cause: state-store commit
pressure grows with JVM age (commitTimeMs/triggerExecution 0.94 -> 4.62
within a session; fresh-session solo 2.81M vs late-session 1.29-1.78M
rec/s at 1M keys).  This module removes the confound instead of sampling
it: bench.py spawns it as a FRESH SUBPROCESS before anything else touches
the box, so the recorded rate measures the engine on the JVM state the
baseline itself was measured on (BASELINE.md's 1.149M msg/s is a
fresh-pipeline stress number — stress_test_passed_output.txt:63,83).

Each probe now carries the telemetry the r14 verdict prescribed, so any
future decline is attributable from the sidecar alone:

- ``session_age_sec``  — SparkSession age when the probe started
- ``gc_count`` / ``gc_time_ms`` — cumulative JVM GC totals at probe start
- ``commit_frac_runs`` / ``commit_frac`` — per-run state-store
  commitTimeMs summed over steady batches divided by the same batches'
  triggerExecution (can exceed 1: commits are summed across the N state
  partitions that run inside one trigger)

Runnable standalone (``python tools/stream_probe_solo.py [sf_dir]``): it
builds the engine's own session, runs both probes, and prints one
marker-prefixed JSON line bench.py parses.  Importable: bench.py falls
back to ``run_probes(spark, sf_dir)`` in-session if the subprocess fails,
stamping the mode so a fallback reading is never mistaken for a solo one.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

MARKER = "STREAM_PROBE_JSON:"

_SESSION_T0 = time.perf_counter()


def _median(xs):
    s = sorted(xs)
    return s[len(s) // 2] if s else None


def jvm_telemetry(spark) -> dict:
    """Cumulative GC totals + JVM uptime from the driver JVM's management
    beans — the session-age signal the r14 adjudication keyed on."""
    try:
        mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
        beans = mf.getGarbageCollectorMXBeans()
        gc_count = sum(int(b.getCollectionCount()) for b in beans)
        gc_ms = sum(int(b.getCollectionTime()) for b in beans)
        up = int(mf.getRuntimeMXBean().getUptime())
        return {
            "gc_count": gc_count,
            "gc_time_ms": gc_ms,
            "jvm_uptime_sec": round(up / 1000.0, 1),
        }
    except Exception:  # pragma: no cover - telemetry is best-effort
        return {}


def stage_events(spark, sf_dir: str) -> tuple[str, "object"]:
    """Stage ~6M events as 12 parquet files (×60 replication -> ~2M-row
    micro-batches at maxFilesPerTrigger=4) — staging v2, unchanged since
    round 12; shared across sessions via the temp path, so the solo
    subprocess reuses bench's staging and vice versa."""
    import pyspark.sql.functions as F

    from flink_net_spark.tables import load_table

    stage = os.path.join(
        tempfile.gettempdir(), f"fns_bench_stream_v2_{os.path.basename(sf_dir)}"
    )
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        ev3 = load_table(spark, sf_dir, "events").withColumn(
            "rep", F.explode(F.sequence(F.lit(1), F.lit(60)))
        )
        ev3.repartition(12).write.mode("overwrite").parquet(stage)
    return stage, spark.read.parquet(stage).schema


def stream_probe_once(
    spark, stage: str, schema, n_keys: int, shuffle_parts: str
) -> tuple[int | None, float, dict, int, int]:
    """One probe run: file stream -> keyed count -> sink, steady-state rate
    from the engine's own per-batch trigger timings (batch 0 excluded).
    Returns (rps, drain_sec, state, commit_ms, trigger_ms)."""
    import pyspark.sql.functions as F

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", shuffle_parts)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(stage)
        .withColumn("k", F.abs(F.hash("user_id", "event_type", "rep")) % n_keys)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )
    ckpt = tempfile.mkdtemp(prefix="fns_bench_ckpt_")
    q = (
        stream.writeStream.format("noop" if n_keys > 10_000 else "memory")
        .queryName(f"fns_bench_stream_{n_keys}")
        .outputMode("complete" if n_keys <= 10_000 else "update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    t0 = time.perf_counter()
    q.processAllAvailable()
    dt = time.perf_counter() - t0
    progresses = [json.loads(pr.json) for pr in q.recentProgress]
    q.stop()
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    batches = []
    for p in progresses:
        if p["numInputRows"] <= 0:
            continue
        ops = p.get("stateOperators") or [{}]
        batches.append(
            (
                p["batchId"],
                p["numInputRows"],
                p["durationMs"].get("triggerExecution", 0),
                int(ops[0].get("commitTimeMs") or 0),
            )
        )
    # state-store accounting from the engine's own progress (round-5
    # verdict #5: name the variance source) — last batch's stateOperators
    state: dict = {}
    for p in reversed(progresses):
        ops = p.get("stateOperators") or []
        if ops:
            state = {
                k: ops[0].get(k)
                for k in ("numRowsTotal", "numRowsUpdated", "memoryUsedBytes")
            }
            break
    steady = batches[1:] if len(batches) > 1 else batches
    steady_rows = sum(r for _, r, _, _ in steady)
    steady_ms = sum(d for _, _, d, _ in steady)
    commit_ms = sum(c for _, _, _, c in steady)
    rps = round(steady_rows / steady_ms * 1000) if steady_ms else None
    shutil.rmtree(ckpt, ignore_errors=True)
    return rps, dt, state, commit_ms, steady_ms


def _settled_window(runs: list[int], width: int = 3) -> tuple[float, list[int]]:
    """The tightest ``width``-run cluster (by relative span around its
    median) among ``runs`` — the most REPRODUCIBLE reading, not the
    best one."""
    s = sorted(runs)
    best: tuple[float, list[int]] | None = None
    for i in range(len(s) - width + 1):
        win = s[i : i + width]
        med = win[width // 2]
        sp = (win[-1] - win[0]) / med if med else float("inf")
        if best is None or sp < best[0]:
            best = (sp, win)
    return best if best is not None else (float("inf"), s)


def stream_probe(
    spark,
    stage: str,
    schema,
    n_keys: int,
    shuffle_parts: str,
    reps: int = 3,
    warmups: int = 1,
    max_reps: int | None = None,
    settle_pct: float = 15.0,
    log=print,
) -> dict:
    """Settle-seeking streaming probe (round-11, VERDICT r10 #2).

    The metric is the baseline's own quantity: the STEADY-STATE rate of
    an already-running pipeline.  The probe runs ``warmups`` discarded
    runs, then keeps measuring — up to ``max_reps`` (reps+4 by default) —
    until the TIGHTEST 3-run cluster agrees within ``settle_pct``; it
    reports that cluster's median and spread as the settled rate.  Every
    raw run stays in the sidecar (``runs`` / ``spread_all_pct``) so the
    selection is auditable.  r15: each probe is stamped with session age
    and GC totals AT START and carries the per-run state-commit fraction
    (commitTimeMs/triggerExecution over steady batches) — the aged-JVM
    signal the r14 adjudication identified."""
    tel = jvm_telemetry(spark)
    age = round(time.perf_counter() - _SESSION_T0, 1)
    max_reps = max_reps or reps + 4
    for _ in range(warmups):  # warm: listing+codegen (discarded)
        stream_probe_once(spark, stage, schema, n_keys, shuffle_parts)
    runs, states, fracs, dt_last = [], [], [], 0.0
    while len(runs) < max_reps:
        rps, dt_last, state, commit_ms, trig_ms = stream_probe_once(
            spark, stage, schema, n_keys, shuffle_parts
        )
        if rps is not None:
            runs.append(rps)
            states.append(state)
            fracs.append(round(commit_ms / trig_ms, 3) if trig_ms else None)
        if len(runs) >= reps:
            sp, _win = _settled_window(runs)
            if sp * 100 <= settle_pct:
                break
    if not runs:
        return {"rps": None, "runs": [], "spread": None, "spread_pct": None,
                "state": {}, "drain_sec": round(dt_last, 3),
                "session_age_sec": age, **tel}
    sp, win = _settled_window(runs)
    med = win[len(win) // 2]
    all_med = _median(runs)
    cf = [f for f in fracs if f is not None]
    out = {
        "rps": med,
        "runs": runs,
        "spread": [win[0], win[-1]],
        "spread_pct": round(sp * 100, 1),
        "spread_all_pct": (
            round((max(runs) - min(runs)) / all_med * 100, 1) if all_med else None
        ),
        "settled": sp * 100 <= settle_pct,
        "state": states[-1] if states else {},
        "drain_sec": round(dt_last, 3),
        "session_age_sec": age,
        "commit_frac_runs": fracs,
        "commit_frac": _median(cf) if cf else None,
        **tel,
    }
    log(
        f"[probe] {n_keys} keys: settled {med} rec/s (runs {runs}, "
        f"commit_frac {out['commit_frac']}, session_age {age}s, "
        f"gc {tel.get('gc_count')}x/{tel.get('gc_time_ms')}ms)"
    )
    return out


def run_probes(spark, sf_dir: str, log=print) -> dict:
    """Both baseline-facing probes: 1,024 keys (the reference's counter
    cardinality) and 1M keys (state-store stress).  Partitioning, rep
    counts, and provider choice are unchanged from rounds 9-14 (see
    bench.py's probe history comments) — only WHEN the probes run moved."""
    stage, schema = stage_events(spark, sf_dir)
    probe_1k = stream_probe(spark, stage, schema, 1024, "8", log=log)
    probe_1m = stream_probe(
        spark, stage, schema, 1_000_000, "16", reps=5, warmups=2, log=log
    )
    return {"probe_1k": probe_1k, "probe_1m": probe_1m}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from flink_net_spark.session import get_spark

    spark = get_spark("flink_net_spark-stream-probe-solo")
    spark.sparkContext.setLogLevel("ERROR")
    bundle = run_probes(spark, sf_dir, log=lambda m: print(m, file=sys.stderr))
    bundle["probe_mode"] = "solo-subprocess"
    print(MARKER + json.dumps(bundle))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
