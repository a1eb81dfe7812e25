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


def test_temperature_thr16_exact_and_overflow_free_near_100tb(spark):
    """Round-8 verdict #3: the old ``5000 * n_total * sqrt_e6`` BIGINT
    product wrapped past 2^63 once ``n_total * sqrt(n_s)`` exceeded ~1.8e9
    (a single-source corpus of ~2M docs), silently dropping the source on
    Spark while DuckDB raised.  The round-9 contract is exact integer
    floor-division in DECIMAL(38,0)/HUGEINT: both engines must equal plain
    Python bignum math from 2 docs up to a 10^13-doc corpus — at, just
    below, and far beyond the old wrap point."""
    from flink_net_spark.queries.pipeline_ops import (
        TEMP_TARGET_E4,
        _TEMP_THR16_DUCKDB,
        _TEMP_THR16_SPARK,
    )
    import math as m

    # (per-source n values) scenarios; sqrt_e6/tot_e6/n_total derived below
    scenarios = [
        [1, 1],                      # minimal corpus
        [1_000, 999_999],            # mixed small
        [2_000_000],                 # the old single-source wrap point
        [2_000_000, 5],              # wrap point + tail source
        [10**9],                     # 1B docs, one source
        [10**9, 10**6, 10**3],       # skewed web-scale mix
        [4 * 10**12, 6 * 10**12],    # ~10^13 docs ≈ 100 TB-class corpus
    ]
    rows = []
    expected = {}
    for i, ns in enumerate(scenarios):
        sqrt_e6s = [m.isqrt(n * 10**12) for n in ns]  # floor(sqrt(n)*1e6) exact
        tot_e6, n_total = sum(sqrt_e6s), sum(ns)
        for j, (n, s6) in enumerate(zip(ns, sqrt_e6s)):
            src = f"s{i}_{j}"
            rows.append((src, n, s6, tot_e6, n_total))
            expected[src] = (65536 * TEMP_TARGET_E4 * n_total * s6) // (
                10000 * tot_e6 * n
            )

    sdf = spark.createDataFrame(
        rows, "source string, n bigint, sqrt_e6 bigint, tot_e6 bigint, n_total bigint"
    ).withColumn("thr16", F.expr(_TEMP_THR16_SPARK))
    got_spark = {r["source"]: r["thr16"] for r in sdf.collect()}

    con = duckdb.connect()
    vals = ",".join(f"('{r[0]}',{r[1]},{r[2]},{r[3]},{r[4]})" for r in rows)
    got_duck = dict(
        con.sql(
            f"SELECT source, {_TEMP_THR16_DUCKDB} AS thr16 FROM (VALUES {vals})"
            " v(source, n, sqrt_e6, tot_e6, n_total)"
        ).fetchall()
    )

    assert got_spark == expected
    assert got_duck == expected
    # confirm the scenarios genuinely cross the old wrap point: the retired
    # BIGINT numerator (target · n_total · sqrt_e6) overflows int64 here
    wrap = TEMP_TARGET_E4 * 2_000_000 * m.isqrt(2_000_000 * 10**12)
    assert wrap > 2**63


def test_sub_hash_exact_beyond_int64_wrap(spark):
    """Round-9 overflow-class sweep: the blocked-search sub-split hash
    ``(vec_id * 2654435761) % 2^32`` wrapped int64 once vec_id exceeded
    ~3.47e9 (a 100 TB embedding corpus holds ~4e11 vectors).  The widened
    contract must equal plain Python bignum math — and the OLD value —
    for small ids, and plain Python bignum math at and far beyond the old
    wrap point, identically on both engines."""
    from flink_net_spark.queries.similarity import _SUB_HASH_DUCKDB, _SUB_HASH_SPARK

    ids = [0, 1, 7, 2**31 - 1, 2**31, 3_470_000_000, 3_500_000_000,
           4 * 10**11, 2**62 - 1]
    n_sub = 7
    expected = {v: ((v * 2654435761) % 4294967296) % n_sub for v in ids}

    sdf = spark.createDataFrame(
        [(v, n_sub) for v in ids], "vec_id bigint, n_sub bigint"
    ).selectExpr("vec_id", f"{_SUB_HASH_SPARK} AS sub")
    got_spark = {r["vec_id"]: r["sub"] for r in sdf.collect()}

    vals = ",".join(f"({v},{n_sub})" for v in ids)
    got_duck = dict(
        duckdb.sql(
            f"SELECT vec_id, {_SUB_HASH_DUCKDB} AS sub"
            f" FROM (VALUES {vals}) t(vec_id, n_sub)"
        ).fetchall()
    )
    assert got_spark == expected
    assert got_duck == expected
    # the old plain-BIGINT product really wraps at the big ids
    assert any(v * 2654435761 > 2**63 - 1 for v in ids)


def test_bloom_decontaminate_contract(spark):
    """Bloom filters never miss: bloom_hits >= exact_hits on every doc
    (n_false_pos >= 0), and the filter must discriminate on the corpus
    (some docs hit, some don't)."""
    from flink_net_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["curation_bloom_decontaminate"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.bloom_hits >= r.exact_hits, r
        assert r.n_false_pos == r.bloom_hits - r.exact_hits
        assert 0 <= r.bloom_hits <= r.n_windows
    hit = sum(1 for r in rows if r.bloom_hits)
    assert 0 < hit < len(rows), f"filter does not discriminate: {hit}/{len(rows)}"


def test_cms_contract(spark):
    """Count-min sketch never underestimates: cms_count >= exact_count for
    every top-k term (slack >= 0), ranks are 1..20 with exact counts
    non-increasing."""
    from flink_net_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["vocab_topk_cms"](spark, SF_DIR).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == 20
    counts = [r.exact_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r.cms_count >= r.exact_count, r
        assert r.slack == r.cms_count - r.exact_count


def test_quality_logreg_tiers_nondegenerate_and_exact(spark):
    """All three tiers must be populated at sf0.001 (the thresholds are
    fixed, not data-dependent — degeneracy here means the decision
    surface drifted off the corpus), and a hand-recomputed logit over the
    collected docs must reproduce every per-(source, tier) sum."""
    from flink_net_spark.queries import QUERIES
    from flink_net_spark.queries.pipeline_ops import (
        QLR_BIAS, QLR_LEN_CAP, QLR_MWL_CENTER, QLR_T_HIGH, QLR_T_LOW,
        QLR_W_LEN, QLR_W_MWL, QLR_W_STOP, QLR_W_SYM, QLR_W_UNIQ,
    )
    from flink_net_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").select("source", "text").collect()
    exp: dict = {}
    for r in docs:
        t, src = r["text"], r["source"]
        toks = t.split(" ")
        nw = len(toks)
        mwl = ((len(t) - nw + 1) * 1000) // nw
        stop = (sum(1 for x in toks if x in ("the", "a")) * 1000) // nw
        uniq = (len(set(toks)) * 1000) // nw
        nonspace = len(t.replace(" ", "").replace("\t", "").replace("\n", "").replace("\r", ""))
        alnum = sum(1 for c in t if c.isascii() and c.isalnum())
        sym = ((nonspace - alnum) * 1000) // max(len(t), 1)
        logit = (
            QLR_W_STOP * stop + QLR_W_UNIQ * uniq + QLR_W_SYM * sym
            + QLR_W_LEN * min(nw, QLR_LEN_CAP)
            + QLR_W_MWL * abs(mwl - QLR_MWL_CENTER) + QLR_BIAS
        )
        tier = "high" if logit >= QLR_T_HIGH else "mid" if logit >= QLR_T_LOW else "low"
        c, s = exp.get((src, tier), (0, 0))
        exp[(src, tier)] = (c + 1, s + logit)

    rows = QUERIES["curation_quality_logreg"](spark, sf).collect()
    got = {(r["source"], r["tier"]): (r["n_docs"], r["sum_logit"]) for r in rows}
    assert got == exp
    tiers = {r["tier"] for r in rows}
    assert tiers == {"high", "mid", "low"}, tiers


def test_temporal_holdout_is_leak_free_by_construction(spark):
    """Every user contributes exactly one test event and (with >= 2
    events) one val event, and the test event's timestamp is >= every
    train/val timestamp of the same user — recomputed independently from
    the raw events."""
    from collections import defaultdict

    from flink_net_spark.queries import QUERIES
    from flink_net_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("event_id", "user_id", "ts").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"]))
    exp = {"train": [0, set()], "val": [0, set()], "test": [0, set()]}
    sum_ids = {"train": 0, "val": 0, "test": 0}
    for u, rows in by_user.items():
        rows.sort(reverse=True)
        for i, (_, eid) in enumerate(rows):
            split = "test" if i == 0 else "val" if i == 1 else "train"
            exp[split][0] += 1
            exp[split][1].add(u)
            sum_ids[split] += eid
    got = {r["split"]: r for r in QUERIES["sample_temporal_holdout"](spark, sf).collect()}
    for split in ("train", "val", "test"):
        assert got[split]["n_events"] == exp[split][0], split
        assert got[split]["n_users"] == len(exp[split][1]), split
        assert got[split]["sum_event_id"] == sum_ids[split], split
    assert got["test"]["n_events"] == len(by_user)  # exactly one per user


def test_mixture_entropy_matches_float_shannon(spark):
    """entropy_e6 / kl_uniform_e6 must sit within 2 micro-nats of the
    straight float Shannon entropy over the same counts (the det-ln chain
    is exact to ~1 ulp; the integer plumbing must not lose more), and the
    per-source contributions must integer-sum to entropy * N exactly."""
    import math

    from flink_net_spark.queries import QUERIES
    from flink_net_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").select("source", "text").collect()
    counts: dict = {}
    for r in docs:
        counts[r["source"]] = counts.get(r["source"], 0) + len(r["text"].split(" "))
    n = sum(counts.values())
    h_float = sum((c / n) * math.log(n / c) for c in counts.values())
    kl_float = math.log(len(counts)) - h_float

    rows = QUERIES["curation_mixture_entropy"](spark, sf).collect()
    assert {r["source"] for r in rows} == set(counts)
    ent = rows[0]["entropy_e6"]
    kl = rows[0]["kl_uniform_e6"]
    assert abs(ent - h_float * 1e6) <= 2, (ent, h_float * 1e6)
    assert abs(kl - kl_float * 1e6) <= 2, (kl, kl_float * 1e6)
    assert sum(r["contrib_e6"] for r in rows) // n == ent
