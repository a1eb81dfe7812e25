#!/usr/bin/env python
"""Ad-hoc @mf shuffle-ratio probe: measure one (or more) queries' own
shuffle_write/disk-input ratio against the 32-file staged layout, exactly
as bench.py's MULTIFILE_AUDIT pass does (warm run, then measured run).

Usage: python tools/mf_probe.py <query> [query ...]  [--sf SF_DIR]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import bench
from bench import MULTIFILE_AUDIT, _disk_bytes, stage_multifile


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    from flink_net_spark.session import get_spark
    from flink_net_spark.metrics import measure_job_metrics
    import __spark_entry__ as e

    spark = get_spark("mf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = e.queries()
    mf_dir = stage_multifile(spark, sf_dir)
    for name in args:
        tables, bound = MULTIFILE_AUDIT.get(name, (["documents"], None))
        fn = queries[name]
        warm = fn(spark, mf_dir)
        warm.collect()
        m, _ = measure_job_metrics(
            spark, lambda: fn(spark, mf_dir).collect(), group=f"probe_{name}"
        )
        del warm
        disk = _disk_bytes(mf_dir, tables)
        print(
            f"{name}: shuffle_write={m.shuffle_write_bytes} disk={disk} "
            f"ratio={m.shuffle_write_bytes / disk:.3f} bound={bound} "
            f"spill={m.disk_spill_bytes}"
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
