#!/usr/bin/env python
"""Decompose: isolated df-build shuffle bytes per variant."""
import sys
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from bench import _disk_bytes, stage_multifile
from flink_net_spark.functions import hashing as H
from flink_net_spark.metrics import measure_job_metrics
from flink_net_spark.queries.dedup import SUBSTR_WINDOW, _FP32
from flink_net_spark.session import get_spark
from flink_net_spark.tables import load_table, spread_small_scan

out = open("/tmp/exp2.log", "w")
def log(s):
    out.write(s + "\n"); out.flush()

spark = get_spark("exp2")
spark.sparkContext.setLogLevel("ERROR")
sf = stage_multifile(spark, "/root/testdata/sf0.1")
disk = _disk_bytes(sf, ["documents"])

def gr_df():
    d = spread_small_scan(load_table(spark, sf, "documents"))
    base = d.withColumn("th", F.expr(H.spark_token_hashes("text"))).select(
        "doc_id", F.expr(H.spark_hashed_shingles("th", SUBSTR_WINDOW)).alias("sh"))
    return base.select("doc_id", F.explode("sh").alias("g")).select(
        "doc_id", F.expr(_FP32.format(x="g")).alias("gram"))

def dup_variant(tag, nbuck=None, thresh=None):
    gr = gr_df()
    if tag == "A":
        dup = (gr.select("gram").repartition(F.col("gram"))
               .groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
               .filter(F.col("df") >= 2).select("gram"))
    else:
        packed = (gr.select("gram")
                  .withColumn("bkt", F.pmod(F.col("gram"), F.lit(nbuck)))
                  .groupBy("bkt").agg(F.collect_list("gram").alias("gs")))
        dup = (packed.select("bkt", F.explode("gs").alias("gram"))
               .groupBy("bkt", "gram").agg(F.count(F.lit(1)).alias("df"))
               .filter(F.col("df") >= 2).select("gram"))
    return dup

prev = spark.conf.get("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", None)
for tag, nbuck, thr in [("A", None, None), ("B32", 32, None), ("B64", 64, None),
                        ("B128", 128, None), ("B512", 512, None),
                        ("B512h", 512, "4096"), ("B2048h", 2048, "4096")]:
    if thr:
        spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
    dup = dup_variant("A" if tag == "A" else "B", nbuck)
    n = dup.count()  # warm
    m, _ = measure_job_metrics(spark, lambda: dup_variant("A" if tag == "A" else "B", nbuck).count(), group=f"e_{tag}")
    log(f"{tag}: dup_grams={n} shuffle={m.shuffle_write_bytes} ratio={m.shuffle_write_bytes/disk:.3f} spill={m.disk_spill_bytes}")
    if thr and prev is not None:
        spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", prev)
log("done")
