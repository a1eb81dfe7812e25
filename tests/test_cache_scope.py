"""Cache-lifetime contract: persisted intermediates ride the result handle.

r8 ADVICE minor: query builders that persist() a shared intermediate (or
localCheckpoint() inside an iterative loop) used to leak the cache for the
whole session.  scoped_persist / checkpoint_tracked tie every such cache to
the returned DataFrame via a weakref finalizer (superseded loop rounds are
released inside the loop): collect + drop the handle → nothing new remains
in the RDD cache registry.

Runs in its own module: a module-scoped fixture elsewhere that holds live
handles over the same query plans would alias cache entries (Spark's
CacheManager dedupes by canonicalized plan) and confound the delta check.
"""

from __future__ import annotations

import gc
import os


def test_scoped_persist_releases_cache_on_handle_drop(spark):
    """Result-scoped caches vanish with the handle; the session-scoped
    shared LM tables (round-10: text.shared_lm_tables) are the ONE
    deliberate exception — they may appear once, must never GROW across
    queries, and must vanish on release_shared_lm()."""
    from flink_net_spark.queries import QUERIES
    from flink_net_spark.queries.text import release_shared_lm
    from flink_net_spark.tables import _persistent_rdd_ids

    sf = "/root/testdata/sf0.001"
    release_shared_lm(spark)
    gc.collect()  # flush finalizers pending from earlier modules
    baseline = _persistent_rdd_ids(spark)
    shared: set[int] = set()
    for name in ("text_backoff_nll", "text_bigram_nll", "dedup_minhash_lsh",
                 "dedup_simhash_pairs", "dedup_substring_pairs",
                 "dedup_substring_stats", "dedup_resolve_groups", "sim_semdedup",
                 # r10 ADVICE: sim_rrf_hybrid persisted its (doc_id, term)
                 # inverted index scoped to ITSELF (finalizer could never
                 # fire); pinned here now that it scopes to the result —
                 # and its r11 ANN-leg variant + the phash index too
                 "sim_rrf_hybrid", "sim_rrf_hybrid_ann", "mm_phash_dedup",
                 "dedup_incremental_minhash", "dedup_span_novelty",
                 # r13 ADVICE: connected components' per-round LAZY
                 # localCheckpoints (7 label frames) were untracked — now
                 # checkpoint_tracked_lazy + release_rdds_with_result
                 "graph_connected_components",
                 # r14: the pruned MaxSim leg persists its (doc, qtok)
                 # max-dot frame, scoped to the result
                 "sim_maxsim_pruned"):
        df = QUERIES[name](spark, sf)
        df.collect()
        del df
        gc.collect()
        leaked = _persistent_rdd_ids(spark) - baseline - shared
        if name == "text_backoff_nll":
            # first LM-family query materializes the shared build (bounded:
            # toks + count tables + score tables); remember, don't flag
            shared = leaked
            continue
        assert not leaked, (name, leaked)
    # the shared set is released explicitly, not by handle lifetime
    release_shared_lm(spark)
    assert _persistent_rdd_ids(spark) - baseline == set()


def test_purge_dead_lm_entries_unpersists_through_handles(spark):
    """Round-11 ADVICE: when a shared-LM entry's creating session is gone
    but the SparkContext still lives (the newSession case), purging must
    release the JVM caches THROUGH the stored DataFrame handles before
    dropping the dict entry — not leak them.  And the token fallback must
    never be id()-based (aliasing after GC reuse)."""
    import weakref

    from flink_net_spark.queries import text as T

    df = spark.range(10).persist()
    df.count()
    assert df.storageLevel.useMemory

    class Ephemeral:
        pass

    ghost = Ephemeral()
    key = ("test-app", -1, "test-dir")
    T._LM_SHARED[key] = {"toks": df, "_session_ref": weakref.ref(ghost)}
    del ghost  # CPython refcount: the weakref is dead immediately
    T._purge_dead_lm_entries()
    assert key not in T._LM_SHARED
    assert not df.storageLevel.useMemory  # unpersisted, not leaked


def test_keep_best_forwards_deterministic_release(spark):
    """r13 ADVICE: dedup_keep_best pinned its upstream resolve-groups
    result only via _fns_upstream (GC-only — release_persisted(out) was a
    no-op).  It must now forward a deterministic handle: after collect +
    release_persisted(out), the upstream's checkpointed label RDDs are
    gone WITHOUT waiting for the collector."""
    from flink_net_spark.queries import QUERIES
    from flink_net_spark.tables import _persistent_rdd_ids, release_persisted

    sf = "/root/testdata/sf0.001"
    gc.collect()
    baseline = _persistent_rdd_ids(spark)
    out = QUERIES["dedup_keep_best"](spark, sf)
    out.collect()
    assert _persistent_rdd_ids(spark) - baseline, "expected live upstream caches"
    release_persisted(out)  # deterministic: NO gc.collect() here
    assert _persistent_rdd_ids(spark) - baseline == set()
    del out
    gc.collect()  # the GC backstop must stay idempotent after the fact


def test_release_rdds_with_result_composes_with_scoped_persist(spark):
    """release_rdds_with_result must chain onto an existing _fns_release
    (graph_connected_components stacks it on scoped_persist): one
    release_persisted() call frees BOTH the persisted frames and the
    tracked checkpoint RDDs."""
    from flink_net_spark.tables import (
        _persistent_rdd_ids,
        checkpoint_tracked_lazy,
        release_persisted,
        release_rdds_with_result,
        scoped_persist,
    )

    gc.collect()
    baseline = _persistent_rdd_ids(spark)
    cached = spark.range(100).persist()
    ids: list[int] = []
    lc = checkpoint_tracked_lazy(spark.range(50), ids)
    out = release_rdds_with_result(
        scoped_persist(lc.crossJoin(cached.limit(1)), cached), spark, ids
    )
    out.collect()
    assert ids and _persistent_rdd_ids(spark) - baseline
    release_persisted(out)
    assert _persistent_rdd_ids(spark) - baseline == set()


def test_release_attach_composes_in_either_nesting_order(spark):
    """Round-14 review: scoped_persist used to OVERWRITE _fns_release, so
    scoped_persist(release_rdds_with_result(...)) — the reverse of the
    graph.py order — silently dropped the checkpoint release.  attach_release
    must compose regardless of nesting order."""
    from flink_net_spark.tables import (
        _persistent_rdd_ids,
        checkpoint_tracked_lazy,
        release_persisted,
        release_rdds_with_result,
        scoped_persist,
    )

    gc.collect()
    baseline = _persistent_rdd_ids(spark)
    cached = spark.range(64).persist()
    ids: list[int] = []
    lc = checkpoint_tracked_lazy(spark.range(32), ids)
    # REVERSE order: rdds first, then scoped_persist on top
    out = scoped_persist(
        release_rdds_with_result(lc.crossJoin(cached.limit(1)), spark, ids),
        cached,
    )
    out.collect()
    assert ids and _persistent_rdd_ids(spark) - baseline
    release_persisted(out)
    assert _persistent_rdd_ids(spark) - baseline == set()


def test_msf_ckpt_dir_cleaned_on_handle_drop(spark):
    """r15 VERDICT #1a: graph_msf_boruvka's parquet-checkpoint temp dir
    must not strand /tmp when the caller DROPS the handle without calling
    release_persisted — the rmtree is now a weakref.finalize on the
    result, so GC is a sufficient backstop (and the explicit path stays
    idempotent)."""
    import glob
    import tempfile

    from flink_net_spark.queries import QUERIES

    patt = os.path.join(tempfile.gettempdir(), "fns_msf_*")
    before = set(glob.glob(patt))
    df = QUERIES["graph_msf_boruvka"](spark, "/root/testdata/sf0.001")
    df.collect()
    created = set(glob.glob(patt)) - before
    assert created, "expected a fresh fns_msf_ checkpoint dir"
    del df
    gc.collect()
    after = set(glob.glob(patt)) - before
    assert not after, f"ckpt dir(s) leaked after handle drop: {after}"
