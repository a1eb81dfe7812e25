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


def test_scoped_persist_releases_cache_on_handle_drop(spark):
    from flink_net_spark.queries import QUERIES
    from flink_net_spark.tables import _persistent_rdd_ids

    sf = "/root/testdata/sf0.001"
    gc.collect()  # flush finalizers pending from earlier modules
    baseline = _persistent_rdd_ids(spark)
    for name in ("text_backoff_nll", "text_bigram_nll", "dedup_minhash_lsh",
                 "dedup_simhash_pairs", "dedup_substring_pairs",
                 "dedup_substring_stats", "dedup_resolve_groups", "sim_semdedup"):
        df = QUERIES[name](spark, sf)
        df.collect()
        del df
        gc.collect()
        leaked = _persistent_rdd_ids(spark) - baseline
        assert not leaked, (name, leaked)
