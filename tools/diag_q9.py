#!/usr/bin/env python
"""One-off diagnostic for q9_profit_by_nation plan instability (VERDICT r4 #2).

Runs q9 N times at sf0.1, capturing per-run wall time AND the AQE *final*
plan (explain after collect shows isFinalPlan=true), then diffs the join
strategies across runs.
"""
import contextlib
import io
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from flink_net_spark.session import get_spark
    from flink_net_spark.queries import QUERIES

    spark = get_spark("diag-q9")
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES["q9_profit_by_nation"]

    # warm
    fn(spark, SF_DIR).count()

    for i in range(6):
        df = fn(spark, SF_DIR)
        t0 = time.perf_counter()
        df.collect()
        dt = time.perf_counter() - t0
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)[^\n]*", plan)
        final = "isFinalPlan=true" in plan
        print(f"run {i}: {dt:.3f}s final={final}")
        for j in joins:
            print(f"    {j[:110]}")
    spark.stop()


if __name__ == "__main__":
    main()
