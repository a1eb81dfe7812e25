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
    """agg_approx_distinct has no value oracle (HLL sketches differ across
    engines by design); enforce the accuracy contract instead: every
    per-key estimate within 5% of the exact distinct count."""
    from flink_net_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    approx = {
        tuple(r[:-1]): r[-1]
        for r in QUERIES["agg_approx_distinct"](spark, SF_DIR).collect()
    }
    sdf = QUERIES["agg_distinct"](spark, SF_DIR)
    key_cols = [c for c in sdf.columns if not c.startswith("n_")]
    assert approx, "no approx rows"
    exact_rows = sdf.collect()
    exact = {tuple(r[c] for c in key_cols): r[sdf.columns[-1]] for r in exact_rows}
    for k, est in approx.items():
        if k in exact and exact[k] > 0:
            rel = abs(est - exact[k]) / exact[k]
            assert rel <= 0.05, f"{k}: approx {est} vs exact {exact[k]} ({rel:.1%})"


def test_approx_percentiles_within_bound(spark):
    """agg_approx_percentiles has no value oracle (t-digest internals are
    engine-specific); assert the sketch lands within a tight relative error
    of the exact interpolated percentile at accuracy=10000."""
    from flink_net_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    exact = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_percentiles"](spark, SF_DIR).collect()
    }
    approx = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_approx_percentiles"](spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        a = approx[flag]
        for col_e, col_a in (("p50_qty", "p50_qty"), ("p90_qty", "p90_qty"), ("p99_price", "p99_price")):
            rel = abs(a[col_a] - e[col_e]) / max(abs(e[col_e]), 1e-9)
            assert rel < 0.02, f"{flag}.{col_a}: approx {a[col_a]} vs exact {e[col_e]}"


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
