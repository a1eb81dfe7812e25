"""Task-metric accounting: measured shuffle/spill bytes per query.

The 100 TB design claims of the dedup/ANN family are of the form "the
shuffle moves (doc_id, band_key) pairs, never text" — plan audits
(tests/test_plans.py) prove the *shape*, this module measures the *volume*:
run a query under a Spark job group, then sum the task metrics of every
stage belonging to that group's jobs out of the driver's ``AppStatusStore``
(the same KV store that backs the Spark UI / REST API, available with the
UI disabled and on any cluster manager — nothing here is local-mode-only).

Reference parity: the reference surfaces per-operator ``RecordsIn/Out``
gauges through IFlinkMetrics (FlinkDotNet/FlinkDotNet.Core.Abstractions/
Metrics/IFlinkMetrics.cs); Spark's task metrics are the engine-native
superset (bytes, spill, shuffle read/write), so we read those instead of
re-counting.

Caveat (documented, conservative direction): broadcast-exchange builds run
on a separate thread pool; if a build's job misses the thread-local job
group, its *input* bytes are under-counted while shuffle bytes are
unaffected — so ``shuffle_write / input`` ratios can only over-state, never
hide, shuffle volume.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import SparkSession


@dataclass
class JobGroupMetrics:
    input_bytes: int = 0
    output_bytes: int = 0
    shuffle_write_bytes: int = 0
    shuffle_read_bytes: int = 0
    memory_spill_bytes: int = 0
    disk_spill_bytes: int = 0
    n_stages: int = 0

    @property
    def spill_bytes(self) -> int:
        return self.memory_spill_bytes + self.disk_spill_bytes

    def shuffle_ratio(self) -> float | None:
        """shuffle_write / input — the "what fraction of the data moved"
        number.  None when no input was attributed (shouldn't happen for
        batch scans)."""
        if not self.input_bytes:
            return None
        return self.shuffle_write_bytes / self.input_bytes

    def as_dict(self) -> dict:
        r = self.shuffle_ratio()
        return {
            "input": self.input_bytes,
            "shuffle_write": self.shuffle_write_bytes,
            "shuffle_read": self.shuffle_read_bytes,
            "spill": self.spill_bytes,
            "stages": self.n_stages,
            "shuffle_ratio": round(r, 4) if r is not None else None,
        }


def collect_group_metrics(spark: SparkSession, group: str) -> JobGroupMetrics:
    """Sum task metrics over every stage of every job tagged ``group``.

    SKIPPED stages (shuffle output reused from an earlier job in the same
    group, e.g. across AQE query stages) report zero metrics and cost
    nothing extra — which is correct: their bytes were counted when the
    producing attempt ran.
    """
    store = spark.sparkContext._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    stage_ids: set[int] = set()
    for i in range(jobs.size()):
        j = jobs.apply(i)
        grp = j.jobGroup()
        if grp.isDefined() and grp.get() == group:
            sids = j.stageIds()
            stage_ids |= {sids.apply(k) for k in range(sids.size())}

    # scala default-arg accessors: stageData(stageId, details=..., ...)
    defaults = [getattr(store, f"stageData$default${i}")() for i in (2, 3, 4, 5)]
    out = JobGroupMetrics()
    for sid in stage_ids:
        attempts = store.stageData(sid, *defaults)
        for a in range(attempts.size()):
            s = attempts.apply(a)
            out.input_bytes += s.inputBytes()
            out.output_bytes += s.outputBytes()
            out.shuffle_write_bytes += s.shuffleWriteBytes()
            out.shuffle_read_bytes += s.shuffleReadBytes()
            out.memory_spill_bytes += s.memoryBytesSpilled()
            out.disk_spill_bytes += s.diskBytesSpilled()
            out.n_stages += 1
    return out


_SEQ = [0]


def measure_job_metrics(
    spark: SparkSession, run: Callable[[], object], *, group: str | None = None
) -> tuple[JobGroupMetrics, object]:
    """Execute ``run()`` under a fresh job group; return (metrics, result)."""
    _SEQ[0] += 1
    group = group or f"fns_metrics_{_SEQ[0]}"
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        result = run()
    finally:
        sc.setJobGroup("", "")
    return collect_group_metrics(spark, group), result
