#!/usr/bin/env python
"""r16 experiment: iterative graph ops — AQE-on (status quo) vs AQE-off
during the round-building loop.

Hypothesis (guide §7.3 + measured build_frac ≈ 0.9): with AQE on, each
round's lazy localCheckpoint compiles an AdaptiveSparkPlan whose
execution materializes every shuffle stage as its own driver-scheduled
job — the per-round fixed cost dominates at bench SF.  With AQE off the
lazy checkpoints defer execution entirely; the final collect runs the
whole round chain as one pipelined job DAG with static (=cores) shuffle
partitions.

Usage: python tools/exp_graph_aqe.py q1 [q2 ...] [--reps N]
Prints per-query: mode=aqe_on/aqe_off, build/collect/total per rep, and
row-count + md5 of the sorted collected rows so result equality is
checked in the same breath.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def fingerprint(rows) -> str:
    return hashlib.md5(
        "\n".join(sorted(repr(tuple(r)) for r in rows)).encode()
    ).hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        # bounds-checked (r16 ADVICE: a trailing bare --reps raised IndexError)
        if a == "--reps" and i + 1 < len(argv):
            reps = int(argv[i + 1])
            args.remove(argv[i + 1])

    from flink_net_spark.session import get_spark
    from flink_net_spark.tables import release_persisted

    import __spark_entry__ as entry_mod

    spark = get_spark("fns-exp-graph-aqe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    sc = spark.sparkContext

    out: dict[str, dict] = {}
    for name in args:
        fn = queries[name]
        rec: dict[str, list] = {"aqe_on": [], "aqe_off": []}
        fps = set()
        for mode in ("aqe_on", "aqe_off", "aqe_on", "aqe_off"):
            for r in range(reps):
                spark.catalog.clearCache()
                spark.conf.set(
                    "spark.sql.adaptive.enabled",
                    "true" if mode == "aqe_on" else "false",
                )
                sc.setJobDescription(f"exp:{name}:{mode}:{r}")
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                b = time.perf_counter() - t0
                t0 = time.perf_counter()
                rows = df.collect()
                c = time.perf_counter() - t0
                fps.add(fingerprint(rows))
                release_persisted(df)
                del df
                rec[mode].append(
                    {"build": round(b, 3), "collect": round(c, 3),
                     "total": round(b + c, 3)}
                )
                print(f"[exp] {name} {mode} rep{r}: build {b:.3f} collect {c:.3f}",
                      file=sys.stderr)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        med_on = sorted(x["total"] for x in rec["aqe_on"])[len(rec["aqe_on"]) // 2]
        med_off = sorted(x["total"] for x in rec["aqe_off"])[len(rec["aqe_off"]) // 2]
        out[name] = {
            "aqe_on": rec["aqe_on"], "aqe_off": rec["aqe_off"],
            "med_on": med_on, "med_off": med_off,
            "fingerprints_agree": len(fps) == 1, "n_fingerprints": len(fps),
        }
        print(f"[exp] {name}: median on {med_on:.3f}  off {med_off:.3f}  "
              f"fp_agree={len(fps) == 1}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
