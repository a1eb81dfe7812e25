"""Behavioral invariants for the round-12b analytics operators.

The DuckDB oracles pin cross-engine equality; these pin SEMANTICS against
independent Python implementations — properties a consistently-wrong
dual implementation would still fail.
"""

from __future__ import annotations

from fractions import Fraction

from flink_net_spark.queries import QUERIES
from flink_net_spark.tables import load_table
from tests.conftest import SF_DIR


def test_point_in_time_join_is_leak_free(spark):
    """Every purchase's matched version must start at-or-before the
    purchase AND be the LATEST such version — the feature-store
    leak-freedom contract, checked against a hand-built per-user version
    history."""
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "user_id", "event_type", "ts")
        .collect()
    )
    by_user: dict = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    versions: dict = {}
    for u, rows in by_user.items():
        vs, prev = [], None
        for r in rows:
            if prev is None or r["event_type"] != prev:
                vs.append((r["ts"], r["event_type"], len(vs) + 1))
            prev = r["event_type"]
        versions[u] = vs
    out = QUERIES["join_point_in_time"](spark, SF_DIR).collect()
    assert out, "no purchases at this SF"
    # look the TRUE event-time up by id — ts_ms is millisecond-truncated,
    # and the version opened by the purchase itself starts at the full-
    # microsecond instant
    true_ts = {r["event_id"]: r["ts"] for r in ev}

    for r in out:
        ts = true_ts[r["event_id"]]
        eligible = [v for v in versions[r["user_id"]] if v[0] <= ts]
        assert eligible, r
        want = eligible[-1]
        assert (r["status_at_purchase"], r["version_no"]) == (want[1], want[2]), (
            r,
            want,
        )


def test_regression_trend_matches_exact_rational(spark):
    """slope_e6 must equal floor(|num|/den * 1e6) with the sign applied —
    the long-division cascade checked against Fraction arithmetic, and
    num/den against sums recomputed independently."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "ts", "value"
    ).collect()
    groups: dict = {}
    for r in ev:
        groups.setdefault(r["event_type"], []).append(
            (int(r["ts"].timestamp()), int(round(r["value"] * 1000)))
        )
    expected = {}
    for t, rows in groups.items():
        t0 = min(x for x, _ in rows)
        pts = [((x - t0) // 3600, y) for x, y in rows]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        sign = -1 if num < 0 else 1
        slope = sign * int(Fraction(abs(num), den) * 1_000_000)
        expected[t] = (n, num, den, slope)
    got = {
        r["event_type"]: (r["n"], r["num"], r["den"], r["slope_e6"])
        for r in QUERIES["agg_regression_trend"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_gini_binned_matches_per_row_definition(spark):
    """gini_e6 must equal the classic per-individual rank formula
    computed directly (sorted rows, no binning) — proves the binned
    rank-sum algebra is exact, not an approximation."""
    ev = load_table(spark, SF_DIR, "events").select("event_type", "value").collect()
    groups: dict = {}
    for r in ev:
        groups.setdefault(r["event_type"], []).append(int(round(r["value"] * 1000)))
    expected = {}
    for t, ys in groups.items():
        ys.sort()
        n, tot = len(ys), sum(ys)
        srank = sum((i + 1) * y for i, y in enumerate(ys))
        num, den = 2 * srank - (n + 1) * tot, n * tot
        sign = -1 if num < 0 else 1
        expected[t] = sign * int(Fraction(abs(num), den) * 1_000_000)
    got = {
        r["event_type"]: r["gini_e6"]
        for r in QUERIES["agg_gini_binned"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_ab_srm_flag_equals_float_chi_square(spark):
    """The integer cross-multiplied SRM verdict must agree with the
    floating-point chi-square definition on every emitted cell (and the
    hand-recomputed arm counts must match)."""
    import hashlib

    ev = load_table(spark, SF_DIR, "events").select("event_type", "user_id").collect()
    counts: dict = {}
    for r in ev:
        arm = (
            ord(hashlib.md5(f"{r['user_id']}_expA".encode()).hexdigest()[0]) % 2
        )
        key = r["event_type"]
        counts.setdefault(key, [0, 0])[arm] += 1
    rows = QUERIES["sample_ab_assignment"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        n_a, n_b = counts[r["event_type"]]
        assert (r["n_a"], r["n_b"]) == (n_a, n_b)
        chi2 = (n_a - n_b) ** 2 / (n_a + n_b)
        assert r["srm_flag"] == (chi2 > 10.83), (r, chi2)


def test_weighted_quantiles_are_monotone(spark):
    rows = QUERIES["agg_weighted_quantiles"](spark, SF_DIR).collect()
    for r in rows:
        assert r["wp25_cents"] <= r["wp50_cents"] <= r["wp75_cents"], r
