#!/usr/bin/env python
"""r17 experiment: per-trigger state-store fixed cost of the bounded stream
drains (VERDICT r16 #4).

Every stream_* bench query drains a bounded replay in 2 micro-batches with
tiny state (≤ tens of thousands of keys) but pays RocksDB provider
init + per-partition commit per trigger.  This measures the SAME queries
under the RocksDB provider (session default) vs the HDFS-backed in-memory
provider, set around fn() (the provider conf is captured per streaming
query at .start()), interleaved ordering, fingerprints asserted identical.

Usage: python tools/exp_stream_state.py q1 [q2 ...] [--reps N]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
KEY = "spark.sql.streaming.stateStore.providerClass"


def fingerprint(rows) -> str:
    return hashlib.md5(
        "\n".join(sorted(repr(tuple(r)) for r in rows)).encode()
    ).hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--reps" and i + 1 < len(argv):
            reps = int(argv[i + 1])
            args.remove(argv[i + 1])

    from flink_net_spark.session import get_spark
    from flink_net_spark.tables import release_persisted

    import __spark_entry__ as entry_mod

    spark = get_spark("fns-exp-stream-state")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    out: dict[str, dict] = {}
    for name in args:
        fn = queries[name]
        rec: dict[str, list] = {"rocksdb": [], "hdfs": []}
        fps = set()
        for prov in ("rocksdb", "hdfs") * reps:
            spark.catalog.clearCache()
            spark.conf.set(KEY, ROCKS if prov == "rocksdb" else HDFS)
            spark.sparkContext.setJobDescription(f"exp-state:{name}:{prov}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            b = time.perf_counter() - t0
            t0 = time.perf_counter()
            rows = df.collect()
            c = time.perf_counter() - t0
            fps.add(fingerprint(rows))
            release_persisted(df)
            del df
            rec[prov].append(round(b + c, 3))
            print(f"[exp] {name} {prov}: build {b:.3f} collect {c:.3f}",
                  file=sys.stderr)
        spark.conf.set(KEY, ROCKS)
        med = {p: sorted(v)[len(v) // 2] for p, v in rec.items()}
        out[name] = {"medians": med, "runs": rec,
                     "fingerprints_agree": len(fps) == 1}
        print(f"[exp] {name}: medians {med} fp_agree={len(fps) == 1}",
              file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
