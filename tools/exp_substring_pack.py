#!/usr/bin/env python
"""Experiment: packed-bucket df build for dedup_substring_stats.

Variant A (current): bare-gram repartition -> groupBy(gram) count.
Variant B (packed): map-side collect_list by gram-hash bucket (the exchange
carries 4 B/gram packed int arrays instead of one 16 B UnsafeRow per gram),
then explode + groupBy(bkt, gram) which needs NO second exchange because
hashpartitioning(bkt) satisfies ClusteredDistribution([bkt, gram]).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from bench import _disk_bytes, stage_multifile
from flink_net_spark.functions import hashing as H
from flink_net_spark.metrics import measure_job_metrics
from flink_net_spark.queries.dedup import SUBSTR_WINDOW, _FP32
from flink_net_spark.session import get_spark
from flink_net_spark.tables import load_table, spread_small_scan


def build(spark, sf_dir, variant: str, nbuck: int = 256):
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    base = (
        d.withColumn("th", F.expr(H.spark_token_hashes("text")))
        .select(
            "doc_id",
            F.expr(H.spark_hashed_shingles("th", SUBSTR_WINDOW)).alias("sh"),
        )
        .persist()
    )
    gr = base.select("doc_id", F.explode("sh").alias("g")).select(
        "doc_id", F.expr(_FP32.format(x="g")).alias("gram")
    )
    if variant == "A":
        dup = (
            gr.select("gram")
            .repartition(F.col("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") >= 2)
            .select("gram")
        )
    else:
        packed = (
            gr.select("gram")
            .withColumn("bkt", F.pmod(F.col("gram"), F.lit(nbuck)))
            .groupBy("bkt")
            .agg(F.collect_list("gram").alias("gs"))
        )
        dup = (
            packed.select("bkt", F.explode("gs").alias("gram"))
            .groupBy("bkt", "gram")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") >= 2)
            .select("gram")
        )
    nd = gr.join(dup, "gram").groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dup"))
    nw = base.select("doc_id", F.size("sh").cast("long").alias("n_windows"))
    n_dup = F.coalesce("n_dup", F.lit(0).cast("long"))
    out = (
        nw.join(nd, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            n_dup.alias("n_dup_windows"),
            F.round(
                F.when(F.col("n_windows") == 0, F.lit(0.0)).otherwise(
                    n_dup * F.lit(1.0) / F.col("n_windows")
                ),
                4,
            ).alias("dup_ratio"),
        )
        .orderBy("doc_id")
    )
    return out, base


def main():
    spark = get_spark("exp-substring-pack")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"
    mf = stage_multifile(spark, sf_dir)
    disk = _disk_bytes(mf, ["documents"])

    # window count for the floor accounting
    d = load_table(spark, mf, "documents")
    w = (
        d.withColumn("th", F.expr(H.spark_token_hashes("text")))
        .select(F.size(F.expr(H.spark_hashed_shingles("th", SUBSTR_WINDOW))).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    print(f"total windows W={w}, disk={disk}, 4B-floor ratio={4 * w / disk:.3f}")

    results = {}
    for tag, variant, nbuck in [
        ("A", "A", 0),
        ("B128", "B", 128),
        ("B512", "B", 512),
        ("B2048", "B", 2048),
    ]:
        out, cache = build(spark, mf, variant, nbuck)
        rows = out.collect()  # warm
        t0 = time.perf_counter()
        m, _ = measure_job_metrics(
            spark, lambda: build(spark, mf, variant, nbuck)[0].collect(), group=f"exp_{tag}"
        )
        dt = time.perf_counter() - t0
        results[tag] = sorted((r["doc_id"], r["n_dup_windows"]) for r in rows)
        print(
            f"{tag}: shuffle={m.shuffle_write_bytes} ratio={m.shuffle_write_bytes / disk:.3f} "
            f"spill={m.disk_spill_bytes} wall={dt:.2f}s rows={len(rows)}"
        )
        spark.catalog.clearCache()
    ok = all(results[t] == results["A"] for t in results)
    print("results identical across variants:", ok)


if __name__ == "__main__":
    main()
