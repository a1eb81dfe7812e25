"""Training-data pipeline operators: pattern behavior on crafted rows.

The corpus-level queries in pipeline_ops are oracle-gated in
test_queries_oracle; these tests prove the pieces whose behavior the
synthetic corpus can't exercise (it contains no PII) and the statistical
properties the oracle can't express (sampling rates).
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from flink_net_spark.queries.pipeline_ops import (
    _SAMPLE_THRESHOLDS,
    duckdb_match_count_expr,
    duckdb_scrub_expr,
    spark_match_count_expr,
    spark_scrub_expr,
)

CRAFTED = [
    ("reach me at jane.doe+spam@example.co.uk today", 1),
    ("call +1 (555) 123-4567 or 555 867 5309 now", 2),
    ("ssn-like 123456789 and account 98765432101234", 2),
    ("no pii here at all", 0),
    ("mixed: a@b.io then 0123456789", 2),
]


def test_pii_patterns_fire_spark(spark):
    df = spark.createDataFrame([(t,) for t, _ in CRAFTED], ["text"])
    got = df.select(
        F.expr(spark_match_count_expr("text")).alias("n"),
        F.expr(spark_scrub_expr("text")).alias("scrubbed"),
    ).collect()
    for (text, want), row in zip(CRAFTED, got):
        assert row.n == want, f"{text!r}: expected {want} matches, got {row.n}"
        if want:
            assert "[PII]" in row.scrubbed
        # nothing matchable survives the scrub
        assert "@" not in row.scrubbed


def test_pii_patterns_agree_with_duckdb():
    con = duckdb.connect()
    for text, want in CRAFTED:
        lit = text.replace("'", "''")
        n, scrubbed = con.execute(
            f"SELECT {duckdb_match_count_expr(f''''{lit}' ''')},"
            f" {duckdb_scrub_expr(f''''{lit}' ''')}"
        ).fetchone()
        assert n == want, f"{text!r}: duckdb found {n}, expected {want}"
    con.close()


def test_pii_scrub_cross_engine_identical(spark):
    """The scrubbed STRING must be byte-identical across engines, not just
    the counts — downstream content hashes depend on it."""
    con = duckdb.connect()
    df = spark.createDataFrame([(t,) for t, _ in CRAFTED], ["text"])
    spark_out = [
        r.s for r in df.select(F.expr(spark_scrub_expr("text")).alias("s")).collect()
    ]
    for text, got in zip([t for t, _ in CRAFTED], spark_out):
        lit = text.replace("'", "''")
        duck = con.execute(f"SELECT {duckdb_scrub_expr(f''''{lit}' ''')}").fetchone()[0]
        assert got == duck, f"{text!r}: spark={got!r} duck={duck!r}"
    con.close()


def test_stratified_sample_rates(spark):
    """Observed keep-rate per stratum ≈ threshold/65536 (md5 uniformity)."""
    from flink_net_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    kept = QUERIES["sample_stratified_hash"](spark, SF_DIR)
    kept_counts = {r.lang: r.c for r in kept.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    from flink_net_spark.tables import load_table

    totals = {
        r.lang: r.c
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for lang, thr in _SAMPLE_THRESHOLDS.items():
        expect = int(thr, 16) / 65536
        got = kept_counts.get(lang, 0) / totals[lang]
        # small strata (~70-200 docs at sf0.001) → generous tolerance
        assert abs(got - expect) < 0.2, f"{lang}: rate {got:.2f} vs expected {expect:.2f}"


def test_approx_count_distinct_within_bound(spark, duck):
    """agg_approx_distinct now emits its accuracy contract AS DATA
    (round-6): every row must carry within_bound=TRUE (|HLL − exact| ≤ 5%)
    and an exact_users matching agg_distinct's exact count."""
    from flink_net_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["agg_approx_distinct"](spark, SF_DIR).collect()
    assert rows, "no approx rows"
    assert all(r["within_bound"] for r in rows), rows
    exact = {
        r["event_type"]: r["distinct_users"]
        for r in QUERIES["agg_distinct"](spark, SF_DIR).collect()
    }
    for r in rows:
        assert r["exact_users"] == exact[r["event_type"]]


def test_approx_percentiles_within_bound(spark):
    """agg_approx_percentiles emits its t-digest accuracy contract as data
    (round-6): every per-group p50/p90/p99 within-2%-of-exact boolean must
    be TRUE, with n matching the exact twin agg_percentiles."""
    from flink_net_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    exact_n = {
        r["l_returnflag"]: r["n"]
        for r in QUERIES["agg_percentiles"](spark, SF_DIR).collect()
    }
    rows = QUERIES["agg_approx_percentiles"](spark, SF_DIR).collect()
    assert {r["l_returnflag"] for r in rows} == set(exact_n)
    for r in rows:
        assert r["p50_within"] and r["p90_within"] and r["p99_within"], r
        assert r["n"] == exact_n[r["l_returnflag"]]


def test_gopher_filters_flags_consistent(spark):
    """keep must equal the conjunction of the per-rule flags, and the gate
    must actually discriminate on the corpus (not all-pass / all-fail)."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_DIR

    df = __import__("__spark_entry__").queries()["text_gopher_filters"](spark, SF_DIR)
    rows = df.collect()
    assert rows, "empty gopher output"
    for r in rows:
        assert r.keep == (r.pass_words and r.pass_mwl and r.pass_stop and r.pass_rep)
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows), f"gate does not discriminate: {kept}/{len(rows)}"


def test_semdedup_contract(spark):
    """sim_semdedup: keep must be exactly (max_sim_to_earlier IS NULL), the
    gate must discriminate on the corpus (some kept, some dropped), every
    cluster must retain at least one member, and the lowest-id member of
    every cluster is always kept (it has no earlier neighbor)."""
    import pyspark.sql.functions as F

    from flink_net_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    df = QUERIES["sim_semdedup"](spark, SF_DIR)
    rows = df.collect()
    assert all((r["max_sim_to_earlier"] is None) == r["keep"] for r in rows)
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows), f"gate does not discriminate: {kept}/{len(rows)}"
    per_cluster = (
        df.groupBy("cluster_id")
        .agg(
            F.sum(F.col("keep").cast("int")).alias("n_kept"),
            F.min("vec_id").alias("min_vec"),
        )
        .collect()
    )
    assert all(r["n_kept"] >= 1 for r in per_cluster)
    first_by_cluster = {r["min_vec"] for r in per_cluster}
    assert all(r["keep"] for r in rows if r["vec_id"] in first_by_cluster)
