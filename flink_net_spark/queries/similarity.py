"""Similarity search over the embedding column (SURVEY.md §7 phase 6).

Two paths:
  - ``sim_cosine_topk``: brute-force cosine top-k — the correctness
    baseline.  Query side is tiny and broadcast; the scan side computes
    dot products in column expressions (zip_with + aggregate, JVM-side).
  - ``sim_ann_lsh``: random-hyperplane LSH bucketing — the 100 TB path.
    Vectors hash to a bucket id (8 signed projections); candidates are an
    EQUI-join on bucket, so the shuffle moves ids + buckets, not a
    cartesian.  Hyperplanes use deterministic integer weights so the
    DuckDB oracle reproduces buckets bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from flink_net_spark.queries import query
from flink_net_spark.tables import load_table

TOPK = 10
N_QUERIES = 5  # vec_id 0..4 serve as the query set
N_PLANES = 8
DIM = 64


def _emb_with_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
        F.expr(
            "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            "0.0D, (acc, x) -> acc + x))"
        ).alias("nrm"),
    )


_DOT = "aggregate(zip_with(qv, nv, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"


@query(
    "sim_cosine_topk",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding])) AS nrm
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               list_sum([q.v[i] * n.v[i] for i in range(1, {DIM + 1})]) / (q.nrm * n.nrm) AS cosine
        FROM e q JOIN e n ON n.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, rank, ROUND(cosine, 4) AS cosine
    FROM (
        SELECT query_id, neighbor_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    )
    WHERE rank <= {TOPK}
    ORDER BY query_id, rank
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for a broadcast query set: ANN ground truth."""
    e = _emb_with_norm(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    n = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"), F.col("nrm").alias("nn"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        F.broadcast(q)
        .join(n, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.expr(_DOT) / (F.col("qn") * F.col("nn")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 4).alias("cosine"))
        .orderBy("query_id", "rank")
    )


def _plane_weight(j: int, d: int) -> int:
    """Deterministic integer hyperplane weight — identical constant on both
    engines (computed in Python, emitted as literals)."""
    return ((j * DIM + d) * 2654435761) % 1000003 - 500001


def _spark_bucket_expr() -> str:
    dots = []
    for j in range(N_PLANES):
        terms = " + ".join(f"v[{d}] * {_plane_weight(j, d)}.0D" for d in range(DIM))
        dots.append(f"CASE WHEN ({terms}) > 0 THEN {1 << j}L ELSE 0L END")
    return " + ".join(dots)


def _duckdb_bucket_expr() -> str:
    dots = []
    for j in range(N_PLANES):
        terms = " + ".join(f"v[{d + 1}] * {_plane_weight(j, d)}" for d in range(DIM))
        dots.append(f"CASE WHEN ({terms}) > 0 THEN {1 << j} ELSE 0 END")
    return " + ".join(dots)


@query(
    "sim_ann_lsh",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding])) AS nrm
        FROM embeddings
    ),
    bucketed AS (
        SELECT vec_id, v, nrm, {_duckdb_bucket_expr()} AS bucket FROM e
    ),
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               list_sum([q.v[i] * n.v[i] for i in range(1, {DIM + 1})]) / (q.nrm * n.nrm) AS cosine
        FROM bucketed q JOIN bucketed n
          ON q.bucket = n.bucket AND n.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, rank, ROUND(cosine, 4) AS cosine
    FROM (
        SELECT query_id, neighbor_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    )
    WHERE rank <= {TOPK}
    ORDER BY query_id, rank
    """,
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: bucket = 8 projection signs; exact
    cosine re-rank within the query's bucket only.  Equi-join on bucket id =
    the scalable shuffle shape."""
    e = _emb_with_norm(spark, sf_dir).withColumn("bucket", F.expr(_spark_bucket_expr()))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("bucket").alias("qb"),
    )
    n = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("nrm").alias("nn"),
        F.col("bucket").alias("nb"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        q.join(n, (F.col("qb") == F.col("nb")) & (F.col("neighbor_id") != F.col("query_id")))
        .withColumn("cosine", F.expr(_DOT) / (F.col("qn") * F.col("nn")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 4).alias("cosine"))
        .orderBy("query_id", "rank")
    )
