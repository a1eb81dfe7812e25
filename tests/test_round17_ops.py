"""Round-17 optimization-round contracts.

1. ``_PLAN_REFS`` refcounting is thread-safe (VERDICT r16 #5): the
   sim_ann_planted_recall legs build on a 4-thread pool, so concurrent
   scoped-persist acquire/release of the SAME semantic plan must never
   lose an increment (a lost increment unpersists a cache another live
   result still uses — silent recompute).
2. ``_stage_dir`` stale-sibling pruning respects an mtime grace window
   (VERDICT r16 #8 / r16 ADVICE): a *recent* sibling staging may belong to
   a concurrent process still draining its stream — only aged siblings are
   reclaimed.  Legacy pre-r16 ``fns_stage_<key>`` dirs (no fingerprint
   suffix) are swept by the same aging rule.
3. ``stream_incremental_minhash``'s state-shard count is derived from the
   staged band-row count (VERDICT r16 #6) and env-overridable — a constant
   128 was calibrated to sf0.1 and its per-shard blobs would grow with the
   corpus.
"""

from __future__ import annotations

import os
import threading
import time


def test_plan_refs_concurrent_acquire_release(spark):
    """Balanced acquire/release from 8 threads on one shared plan key must
    end with the refcount table empty for that key (no stale entry from a
    lost decrement, no premature eviction from a lost increment)."""
    from flink_net_spark.tables import (
        _PLAN_REFS,
        _plan_key,
        acquire_persisted,
        release_acquired,
    )

    df = spark.range(1000).selectExpr("id", "id * 2 AS v").persist()
    df.count()
    key = _plan_key(df)
    errs: list[Exception] = []

    def worker():
        try:
            for _ in range(300):
                keys = acquire_persisted(df)
                release_acquired(keys)
        except Exception as ex:  # pragma: no cover - failure path
            errs.append(ex)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, f"worker raised: {errs[:1]}"
    # balanced acquire/release: the entry must be gone (a lost decrement
    # leaves a stale positive refcount; a lost increment pops it early and
    # a later release would KeyError or double-unpersist)
    assert key not in _PLAN_REFS
    # the test's own persist was released by the final release_acquired;
    # re-persist state is irrelevant — just drop the handle
    df.unpersist()


def test_plan_refs_concurrent_holders_keep_cache(spark):
    """While any thread still holds an acquire, a concurrent release from
    another thread must NOT evict the entry."""
    from flink_net_spark.tables import (
        _PLAN_REFS,
        acquire_persisted,
        release_acquired,
    )

    df = spark.range(500).selectExpr("id").persist()
    df.count()
    hold = acquire_persisted(df)  # long-lived user

    def churn():
        for _ in range(200):
            release_acquired(acquire_persisted(df))

    threads = [threading.Thread(target=churn) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert hold[0] in _PLAN_REFS, "churning pairs evicted a held cache"
    assert _PLAN_REFS[hold[0]][0] == 1
    release_acquired(hold)
    assert hold[0] not in _PLAN_REFS


def test_stage_dir_prune_respects_mtime_grace(tmp_path):
    """A sibling staging dir younger than the grace window survives a
    _stage_dir call for the same (sf_dir, name); an aged one is pruned."""
    import hashlib
    import tempfile

    from flink_net_spark.queries.streaming_queries import (
        _STAGE_PRUNE_GRACE_SEC,
        _stage_dir,
    )

    sf_dir = str(tmp_path)
    # a real source so the fingerprint path is exercised
    with open(os.path.join(sf_dir, "events.parquet"), "wb") as f:
        f.write(b"x" * 64)
    base = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:events".encode()
    ).hexdigest()[:12]
    young = os.path.join(tempfile.gettempdir(), f"fns_stage_{base}_youngfp00000")
    aged = os.path.join(tempfile.gettempdir(), f"fns_stage_{base}_agedfp000000")
    os.makedirs(young, exist_ok=True)
    os.makedirs(aged, exist_ok=True)
    old = time.time() - _STAGE_PRUNE_GRACE_SEC - 60
    os.utime(aged, (old, old))

    path = _stage_dir(sf_dir, "events")
    assert os.path.isdir(young), "recent sibling pruned inside grace window"
    assert not os.path.exists(aged), "aged sibling not reclaimed"
    assert path not in (young, aged)
    os.rmdir(young)


def test_stage_dir_sweeps_aged_legacy_dirs(tmp_path):
    """Pre-r16 single-key staging dirs (no fingerprint suffix) are swept
    once aged — they never match the sibling glob and used to strand /tmp."""
    import hashlib
    import tempfile

    from flink_net_spark.queries.streaming_queries import (
        _STAGE_PRUNE_GRACE_SEC,
        _stage_dir,
    )

    sf_dir = str(tmp_path)
    with open(os.path.join(sf_dir, "events.parquet"), "wb") as f:
        f.write(b"x" * 64)
    legacy_key = hashlib.md5(b"legacy-demo").hexdigest()[:12]
    legacy = os.path.join(tempfile.gettempdir(), f"fns_stage_{legacy_key}")
    os.makedirs(legacy, exist_ok=True)
    old = time.time() - _STAGE_PRUNE_GRACE_SEC - 60
    os.utime(legacy, (old, old))

    _stage_dir(sf_dir, "events")
    assert not os.path.exists(legacy), "aged legacy staging dir not swept"


def test_derived_shuffle_partitions(tmp_path, monkeypatch):
    """Input-byte derivation: floor at 4 for tiny corpora, grows with bytes
    (128 MB/partition), sums directory-backed tables, env override wins."""
    from flink_net_spark.tables import derived_shuffle_partitions

    # single-file table
    with open(tmp_path / "lineitem.parquet", "wb") as f:
        f.write(b"x" * 1024)
    assert derived_shuffle_partitions(str(tmp_path), ["lineitem"]) == 4
    # directory-backed table: bytes are the SUM of the files, not the dirent
    # (sparse files: st_size without the disk)
    d = tmp_path / "orders.parquet"
    d.mkdir()
    for i in range(7):
        with open(d / f"part-{i}.parquet", "wb") as f:
            f.truncate(100 * 1024 * 1024)
    # 700 MB / 128 MB -> ceil = 6 (> the floor of 4, so the sum is visible)
    assert derived_shuffle_partitions(str(tmp_path), ["orders"]) == 6
    monkeypatch.setenv("SPARK_GRAFT_ITER_SHUFFLE_PARTITIONS", "11")
    assert derived_shuffle_partitions(str(tmp_path), ["orders"]) == 11


def test_inc_state_shards_derivation_and_override(monkeypatch):
    """Derived shard count scales with the band-row estimate (bounded both
    ends) and the env override wins."""
    from flink_net_spark.queries.streaming_queries import _inc_state_shards

    # derivation: rows / target-per-shard, clamped
    assert _inc_state_shards(0) == 32  # floor
    assert _inc_state_shards(40_000) == 128  # ~sf0.1 shape, matches r16
    assert _inc_state_shards(10_000_000) == 4096  # ceiling
    lo = _inc_state_shards(40_000)
    hi = _inc_state_shards(400_000)
    assert hi > lo, "shard count must grow with the corpus"
    monkeypatch.setenv("SPARK_GRAFT_INC_STATE_SHARDS", "7")
    assert _inc_state_shards(40_000) == 7
