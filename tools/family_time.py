#!/usr/bin/env python
"""Quick family timing probe: median-of-3 warm timings for the given
queries at sf0.1 on the bench session shape, mirroring bench.time_queries
(warm collect, hold handles, targeted release between queries)."""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

NAMES = sys.argv[1:] or [
    "text_backoff_nll",
    "text_trigram_backoff_nll",
    "text_kn_bigram_nll",
    "curation_perplexity_gate",
    "curation_dsir_importance",
    "text_unigram_nll",
    "text_bigram_nll",
]


def main():
    from flink_net_spark.session import get_spark
    from flink_net_spark.tables import release_persisted
    import __spark_entry__ as e

    spark = get_spark("family-time")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    sf = "/root/testdata/sf0.1"
    total = 0.0
    for name in NAMES:
        fn = qs[name]
        handles = [fn(spark, sf)]
        handles[0].collect()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf)
            df.collect()
            runs.append(time.perf_counter() - t0)
            handles.append(df)
        med = statistics.median(runs)
        total += med
        print(f"{name}: {med:.3f}s  (min {min(runs):.3f} max {max(runs):.3f})")
        for h in handles:
            release_persisted(h)
        del handles
    print(f"TOTAL: {total:.3f}s")


if __name__ == "__main__":
    main()
