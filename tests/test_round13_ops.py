"""Behavior invariants for the round-13 operators.

The DuckDB oracle pins cross-engine value equality; these pin SEMANTICS —
properties that survive a consistently-wrong implementation of both sides
(the test_graph.py discipline applied to the round-13 additions).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_net_spark.queries import QUERIES
from tests.conftest import SF_DIR

SF_SMALL = "/root/testdata/sf0.001"


def test_quantile_sketch_contract_holds(spark):
    """Every estimate must sit within one bucket above its exact quantile
    (the mergeable-sketch error contract), the sketch must actually be
    SMALLER than the distinct-value domain, and all sources must merge."""
    from flink_net_spark.queries.relational import QSK_BW, QSK_PCTS
    from flink_net_spark.tables import load_table, release_persisted

    df = QUERIES["agg_quantile_sketch_merge"](spark, SF_DIR)
    rows = df.collect()
    release_persisted(df)
    assert [r["q_pct"] for r in rows] == list(QSK_PCTS)
    assert all(r["within_bound"] for r in rows)
    assert all(1 <= r["est_cents"] - r["exact_cents"] <= QSK_BW for r in rows)
    n_vals = (
        load_table(spark, SF_DIR, "lineitem")
        .select(F.expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"))
        .distinct()
        .count()
    )
    assert all(r["n_sources"] == 3 for r in rows)
    assert all(r["n_cells"] < n_vals for r in rows), "sketch must compress"


def test_interval_overlap_matches_bruteforce(spark):
    """The bucketed owner-dedup composition must equal a brute-force
    overlap count recomputed in Python at sf0.001 — catches double counts
    from pairs sharing several buckets."""
    from flink_net_spark.tables import load_table

    o = [
        (r["o_orderkey"], int(r["lo"]), int(r["lo"]) + 7 * 86400)
        for r in load_table(spark, SF_SMALL, "orders")
        .filter("o_orderdate >= TIMESTAMP '1996-03-01' AND o_orderdate < TIMESTAMP '1996-04-01'")
        .select("o_orderkey", F.unix_timestamp("o_orderdate").alias("lo"))
        .collect()
    ]
    li = [
        (int(r["lo"]), int(r["lo"]) + (1 + r["l_orderkey"] % 14) * 86400, r["l_quantity"])
        for r in load_table(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", F.unix_timestamp("l_shipdate").alias("lo"), "l_quantity")
        .collect()
    ]
    expected = {}
    for ok, lo_a, hi_a in o:
        n = q = 0
        for lo_b, hi_b, qty in li:
            if lo_a < hi_b and lo_b < hi_a:
                n += 1
                q += qty
        if n:
            expected[ok] = (n, int(q))
    got = {
        r["o_orderkey"]: (r["n_overlap"], r["sum_qty"])
        for r in QUERIES["join_interval_overlap"](spark, SF_SMALL).collect()
    }
    assert got == expected


def test_maxsim_dominates_single_token_and_ranks_contiguous(spark):
    """A MaxSim score sums per-token maxima, so it must be >= any single
    token's best match would contribute alone; ranks must be 1..k dense
    per query and scores non-increasing."""
    from flink_net_spark.queries.similarity import MAXSIM_NQ, MAXSIM_TOPK

    rows = QUERIES["sim_maxsim_late_interaction"](spark, SF_DIR).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(MAXSIM_NQ))
    for q, rs in by_q.items():
        assert [r["rank"] for r in rs] == list(range(1, min(MAXSIM_TOPK, len(rs)) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_token_budget_mix_cap_and_conservation(spark):
    """Capped sources must serve exactly CAP epochs (repeat_num ==
    CAP * repeat_den) with a positive shortfall; uncapped sources must
    serve exactly their target with zero shortfall."""
    from flink_net_spark.queries.pipeline_ops import (
        MIX_BUDGET_CHARS,
        MIX_REPEAT_CAP,
    )

    rows = QUERIES["curation_token_budget_mix"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r["capped"]:
            assert r["repeat_num"] == MIX_REPEAT_CAP * r["repeat_den"]
            assert r["shortfall_num"] > 0
        else:
            assert r["repeat_num"] == MIX_BUDGET_CHARS * r["weight"]
            assert r["shortfall_num"] == 0
        assert r["repeat_den"] == r["target_den_per_budget"] * r["avail_chars"]


def test_keep_best_keeps_longest_member(spark):
    """The keeper must be each group's longest member (ties to lower id),
    recomputed independently from the resolve-groups labels."""
    from flink_net_spark.queries.dedup import dedup_resolve_groups
    from flink_net_spark.tables import load_table, release_persisted

    base = dedup_resolve_groups(spark, SF_SMALL)
    labels = {r["doc_id"]: r["group_id"] for r in base.collect()}
    release_persisted(base)
    chars = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    expected: dict = {}
    for doc, grp in labels.items():
        cur = expected.get(grp)
        cand = (-chars[doc], doc)
        if cur is None or cand < cur:
            expected[grp] = cand
    df = QUERIES["dedup_keep_best"](spark, SF_SMALL)
    rows = df.collect()
    release_persisted(df)
    got = {r["group_id"]: r["keeper_doc_id"] for r in rows}
    assert got == {g: doc for g, (_, doc) in expected.items()}
    for r in rows:
        assert r["keeper_chars"] == chars[r["keeper_doc_id"]]
        members = [d for d, g in labels.items() if g == r["group_id"]]
        assert r["n_members"] == len(members)
        assert r["evicted_chars"] == sum(chars[d] for d in members) - r["keeper_chars"]


def test_gap_fill_interp_bounds_and_observed_identity(spark):
    """Observed hours carry (sum, 1); interior gap values must lie between
    their two neighbors (the defining property of linear interpolation),
    checked on the exact rationals."""
    rows = QUERIES["window_gap_fill_interp"](spark, SF_DIR).collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["event_type"], []).append(r)
    n_checked = 0
    for series in by_key.values():
        series.sort(key=lambda r: r["hour_ms"])
        for r in series:
            if not r["is_gap"]:
                assert r["interp_den"] == 1
        obs = [(i, r) for i, r in enumerate(series) if not r["is_gap"]]
        for (i0, a), (i1, b) in zip(obs, obs[1:]):
            lo, hi = sorted((a["interp_num"], b["interp_num"]))
            for g in series[i0 + 1 : i1]:
                # rational g.num/g.den must lie in [lo, hi]
                assert lo * g["interp_den"] <= g["interp_num"] <= hi * g["interp_den"]
                n_checked += 1
    assert n_checked > 0, "fixture must contain interior gaps"


def test_code_detect_flags_crafted_code(spark):
    """The rule battery must flag an obviously code-shaped text and pass an
    obviously prose-shaped one — run on a crafted frame through the same
    metric expressions the query uses."""
    from flink_net_spark.queries.text import (
        CODE_BRACE_MIN,
        CODE_KW_MIN,
        CODE_SYM_PM,
        _code_detect_sql,
    )

    code = (
        "def main():\n  import os\n  x = {1: 2};\n  return os.path.join(x);\n"
        "function f() { return (a = b); }\n  void g();\n"
    )
    prose = "The quick brown fox jumps over the lazy dog again and again today"
    m = _code_detect_sql("spark")
    df = spark.createDataFrame([(1, code), (2, prose)], "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.expr(m["sym_pm"]).alias("sym_pm"),
            F.expr(m["brace_semi"]).alias("brace_semi"),
            F.expr(m["kw_hits"]).alias("kw_hits"),
            F.expr(m["indent_lines"]).alias("indent_lines"),
        ).collect()
    }
    c, p = got[1], got[2]
    assert c["kw_hits"] >= CODE_KW_MIN or (
        c["sym_pm"] >= CODE_SYM_PM and c["brace_semi"] >= CODE_BRACE_MIN
    )
    assert p["brace_semi"] == 0 and p["kw_hits"] == 0 and p["indent_lines"] == 0
