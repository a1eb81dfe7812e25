"""Operator-harness queries: rich lifecycle + skew-aware keying, oracle-gated.

Exercises (with DuckDB correctness oracles) the two harnesses the rest of
the registry doesn't reach:
  - ``operators.rich.rich_map_in_pandas`` — open/close per-task lifecycle
    ≙ IRichMapOperator (SURVEY.md §2.3 rich variants)
  - ``operators.skew.salted_aggregate`` / ``salted_join`` — load-aware key
    spreading ≙ KeyGenStage load-awareness (SURVEY.md §2.4)

The salted results are bit-identical to their unsalted equivalents, so the
plain GROUP BY / JOIN is the oracle — the gate proves the rewrite is a
no-op semantically while changing the shuffle shape.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_net_spark.operators.rich import RichFunction, RuntimeContext, rich_map_in_pandas
from flink_net_spark.operators.skew import salted_aggregate, salted_join
from flink_net_spark.queries import query
from flink_net_spark.tables import load_table


@query(
    "agg_salted_hot_keys",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           CAST(COUNT(l_quantity) AS BIGINT) AS cnt,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over a genuinely hot key: lineitem has
    only 3 distinct l_returnflag values, so an unsalted groupBy lands the
    whole table on 3 reducers.  The salt spreads each key over 16 partials
    first (SURVEY.md §2.4 ≙ KeyGenStage load-awareness,
    GatewayAndKeyGenStages.cs:217-446)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        li,
        keys=["l_returnflag"],
        aggs={
            "sum_qty": ("sum", "l_quantity"),
            "cnt": ("count", "l_quantity"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
        },
        n_salts=16,
        salt_on="l_orderkey",
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("long").alias("sum_qty"),
        F.col("cnt").cast("long").alias("cnt"),
        F.round("min_price", 2).alias("min_price"),
        F.round("max_price", 2).alias("max_price"),
    ).orderBy("l_returnflag")


@query(
    "join_skew_salted",
    oracle="""
    SELECT c_custkey, n_name, ROUND(c_acctbal, 2) AS acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    ORDER BY c_custkey
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join: every customer key hashes to one of 8 salt
    sub-keys; nation (the build side) replicates ×8.  Result is identical
    to the plain equi-join — the oracle proves it — while one hot
    nationkey now spreads over 8 reducers instead of one."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("n_nationkey"), "c_acctbal"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        salted_join(cust, nat, on="n_nationkey", n_salts=8)
        .select("c_custkey", "n_name", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy("c_custkey")
    )


_LANG_NAMES = {
    "en": "ENGLISH",
    "de": "GERMAN",
    "es": "SPANISH",
    "fr": "FRENCH",
    "zh": "CHINESE",
}


class _LangAnnotator(RichFunction):
    """Loads a lookup resource in open() (≙ the reference's Open-time
    connection/dictionary setup), annotates each Arrow batch in process(),
    releases in close().  The lookup is deterministic so the DuckDB CASE
    oracle reproduces it."""

    def open(self, ctx: RuntimeContext) -> None:  # noqa: A003
        self.lang_names = dict(_LANG_NAMES)  # stand-in for an external resource
        self.partition_id = ctx.partition_id

    def process(self, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang_name": pdf["lang"].map(self.lang_names).fillna("UNKNOWN"),
                "n_chars": pdf["n_chars"],
            }
        )

    def close(self) -> None:
        self.lang_names = None


@query(
    "rich_map_lang_annotate",
    oracle="""
    SELECT doc_id,
           CASE lang WHEN 'en' THEN 'ENGLISH' WHEN 'de' THEN 'GERMAN'
                     WHEN 'es' THEN 'SPANISH' WHEN 'fr' THEN 'FRENCH'
                     WHEN 'zh' THEN 'CHINESE' ELSE 'UNKNOWN' END AS lang_name,
           n_chars
    FROM documents
    ORDER BY doc_id
    """,
)
def rich_map_lang_annotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich map with open/close lifecycle over the documents table
    (SURVEY.md §2.3 ≙ IRichMapOperator.cs:11 + IOperatorLifecycle.cs:9).
    A Column-expression CASE would beat this in production — the point of
    the query is gating the lifecycle harness itself."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = rich_map_in_pandas(
        docs, _LangAnnotator, "doc_id BIGINT, lang_name STRING, n_chars BIGINT"
    )
    return out.orderBy("doc_id")


@query(
    "udtf_sentence_split",
    oracle="""
    SELECT doc_id,
           CAST(t.i - 1 AS BIGINT) AS sentence_idx,
           trim(t.s)                AS sentence,
           CAST(len(trim(t.s)) AS BIGINT) AS n_chars
    FROM (
        SELECT doc_id, UNNEST(string_split(text, '.'), recursive := false) AS s,
               UNNEST(generate_series(1, len(string_split(text, '.')))) AS i
        FROM documents
        WHERE doc_id < 100
    ) t
    WHERE trim(t.s) <> ''
    ORDER BY doc_id, sentence_idx
    """,
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (pyspark 4 ``@udtf``) — the table-function surface
    beyond explode (SURVEY.md §2.11 ≙ the reference's planned UDTF slot in
    its Table API): one input row yields N output rows with per-row Python
    logic (sentence split + index + length).  Production text splitting
    stays in column expressions (cf. flatmap_explode_words); this query
    gates the UDTF harness itself — registration, lateral join, schema
    contract — against a value oracle.

    Scale: UDTFs run per-partition like any row mapper — no shuffle; the
    lateral join is local.  (Row-at-a-time Python: keep OFF the 100 TB hot
    path; the Arrow-batched operators in operators/ are the fast lane.)
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_idx bigint, sentence string, n_chars bigint")
    class SentenceSplit:
        def eval(self, text: str):  # noqa: A002
            idx = 0
            for raw in (text or "").split("."):
                s = raw.strip()
                if s:
                    yield idx, s, len(s)
                idx += 1

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    docs.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("sentence_split", SentenceSplit)
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_chars
        FROM udtf_docs_in d, LATERAL sentence_split(d.text) s
        ORDER BY d.doc_id, s.sentence_idx
        """
    )


@query(
    "cogroup_customer_orders",
    oracle="""
    SELECT COALESCE(c.c_custkey, o.k) AS custkey,
           CAST(COALESCE(o.n_orders, 0) AS BIGINT)      AS n_orders,
           CAST(COALESCE(o.tp, 0) AS BIGINT)            AS total_price_c,
           CAST(CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS n_customer_rows
    FROM customer c
    FULL JOIN (
        SELECT o_custkey AS k, COUNT(*) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS tp
        FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.k
    ORDER BY custkey
    """,
)
def cogroup_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-input keyed co-processing ≙ Flink's connect/coGroup (listed
    ABSENT in the reference — IJoinFunction.cs:18-28 is interface-only with
    no two-input vertex): Spark's ``groupby.cogroup(...).applyInArrow``
    hands BOTH sides' rows for a key to one Python function, the general
    form every CoProcessFunction reduces to.  Here: customers cogrouped
    with their orders → per-key order count, exact integer price cents,
    and a customer-presence flag; keys existing on either side must
    appear (cogroup's outer semantics), which the full-join oracle checks.

    Scale: one hash shuffle per side on the key — identical movement to a
    shuffle join.  The per-key combiner is Arrow-NATIVE (``applyInArrow``,
    round-7): skipping the per-group pandas conversion cut the 15k-key
    sf0.1 run from ~35s to ~3s — per-key Python overhead, not data volume,
    dominates this shape, so minimize what each call materializes.  The
    rounding is Arrow/numpy half-to-even on both the old and new path, so
    the integer-cents contract is unchanged.  Use built-in joins when the
    combiner is relational (this op gates the harness, not a
    recommendation)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from flink_net_spark.tables import load_table as _lt

    cust = _lt(spark, sf_dir, "customer").select("c_custkey")
    orders = _lt(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")

    def merge(key, left: pa.Table, right: pa.Table) -> pa.Table:
        tp = 0
        if left.num_rows:
            tp = int(
                pc.sum(
                    pc.round(pc.multiply(left["o_totalprice"], pa.scalar(100.0)))
                ).as_py()
                or 0
            )
        k = key[0].as_py() if isinstance(key[0], pa.Scalar) else key[0]
        return pa.table(
            {
                "custkey": pa.array([int(k)], pa.int64()),
                "n_orders": pa.array([left.num_rows], pa.int64()),
                "total_price_c": pa.array([tp], pa.int64()),
                "n_customer_rows": pa.array([right.num_rows], pa.int64()),
            }
        )

    out = (
        orders.groupby("o_custkey")
        .cogroup(cust.groupby("c_custkey"))
        .applyInArrow(
            merge,
            "custkey bigint, n_orders bigint, total_price_c bigint, n_customer_rows bigint",
        )
    )
    return out.orderBy("custkey")
