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


# --------------------------------------------------------------------------
# Sub-µs timestamp-collision fixture (round-14, VERDICT r13 #2 + ADVICE).
# --------------------------------------------------------------------------
# events.parquet is TIMESTAMP µs today, but load_table carries a dormant
# TIMESTAMP(NANOS) branch (nanosAsLong → div 1000), and every oracle that
# orders/compares on ts now µs-truncates via CAST(ts AS TIMESTAMP) so a
# ns-precision regeneration of the corpus cannot make DuckDB order at ns
# while Spark orders at µs.  This fixture builds a ns-precision events
# table whose ONLY ties are sub-µs-distinct pairs placed exactly where
# they flip results — asof match vs no-match, count-window chunk sums,
# funnel conversion, SCD2 version order — then pins (a) Spark (through the
# dormant nanosAsLong branch) == the registered truncated oracle and
# (b) a Python emulation of raw-ns ordering actually diverges, proving the
# fixture exercises the hazard rather than skating past it.  (The sandbox
# DuckDB 1.0.0 truncates parquet NANOS to µs at read — it cannot represent
# sub-µs at all — so the divergence itself is emulated; a ≥1.1 DuckDB
# reading TIMESTAMP_NS natively is exactly what the oracle CASTs guard.)

_NS_BASE = 1_717_200_000 * 10**9  # 2024-06-01T00:00:00Z in epoch-ns


def _ns_collision_events_dir(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    us = lambda k: _NS_BASE + k * 1000  # k microseconds past base
    rows = [
        # user 1 — asof: view and click inside ONE µs, click ns-AFTER the
        # view (µs-equal ⇒ match; raw-ns ⇒ no match).
        (1, us(0) + 100, 1, "view", 1.0),
        (2, us(0) + 900, 1, "click", 1.0),
        # user 2 — count window: 6 clicks, the 5th/6th share µs 5 with the
        # LOWER event_id carrying the LATER ns part, so the raw-ns order
        # and the (µs ts, event_id) order disagree across the chunk edge.
        (10, us(1), 2, "click", 1.0),
        (11, us(2), 2, "click", 2.0),
        (12, us(3), 2, "click", 4.0),
        (13, us(4), 2, "click", 8.0),
        (14, us(5) + 900, 2, "click", 16.0),
        (15, us(5) + 100, 2, "click", 32.0),
        # user 3 — funnel: purchase ns-BEFORE its signup inside one µs
        # (µs-equal ⇒ converted; raw-ns ⇒ not converted).
        (20, us(10) + 800, 3, "signup", 1.0),
        (21, us(10) + 200, 3, "purchase", 1.0),
        # user 4 — SCD2: two DIFFERENT statuses inside one µs with event_id
        # order opposite to ns order (version sequence flips on raw ns).
        (30, us(20) + 900, 4, "error", 1.0),
        (31, us(20) + 100, 4, "view", 1.0),
        (32, us(30), 4, "purchase", 1.0),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    out = tmp_path / "ns_fixture"
    out.mkdir()
    pq.write_table(t, out / "events.parquet", store_schema=False)
    return str(out)


_NS_SENSITIVE = [
    "join_asof",
    "join_asof_nearest",
    "funnel_conversion",
    "window_count_per_key",
    "window_outlier_3sigma",
    "window_session",
    "cdc_scd2_versions",
    "join_point_in_time",
]


def test_ns_collision_fixture_matches_truncated_oracles(spark, tmp_path):
    import duckdb

    from flink_net_spark.queries import ORACLES
    from tests.conftest import _canon_rows

    d = _ns_collision_events_dir(tmp_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    # DuckDB 1.0.0 reads parquet NANOS as µs TIMESTAMP (a ≥1.1 DuckDB
    # yields TIMESTAMP_NS — either way the truncated oracles must agree)
    (ts_type,) = [
        r[1] for r in con.execute("DESCRIBE events").fetchall() if r[0] == "ts"
    ]
    assert ts_type in ("TIMESTAMP", "TIMESTAMP_NS"), ts_type
    for name in _NS_SENSITIVE:
        sdf = QUERIES[name](spark, d)
        scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        res = con.execute(ORACLES[name])
        dcols = [x[0] for x in res.description]
        drows = res.fetchall()
        assert sorted(scols) == sorted(dcols), (name, scols, dcols)
        assert _canon_rows(srows, scols) == _canon_rows(drows, dcols), name
    con.close()


def test_ns_collision_fixture_discriminates_raw_ns_ordering(spark, tmp_path):
    """The fixture must actually EXERCISE the hazard: an engine that
    orders/compares at raw ns (what an un-truncated oracle does on a
    TIMESTAMP_NS-reading DuckDB) must disagree with Spark's µs view on
    these rows.  Emulated in exact Python over the fixture definition —
    the sandbox DuckDB cannot represent sub-µs (see module comment)."""
    d = _ns_collision_events_dir(tmp_path)

    # --- join_asof: user 1's view↔click share a µs, click ns-AFTER -----
    asof = {r["event_id"]: r["asof_click_ms"]
            for r in QUERIES["join_asof"](spark, d).collect()}
    # Spark (µs): equal timestamps match → view 1 gets the click
    assert asof[1] is not None
    # raw ns: click(+900) > view(+100) → NO click at-or-before the view
    view_ns, click_ns = _NS_BASE + 100, _NS_BASE + 900
    assert not (click_ns <= view_ns), "fixture lost its sub-µs inversion"

    # --- window_count_per_key: chunk edge straddles the collision ------
    out = {r["user_id"]: r["sum_value"]
           for r in QUERIES["window_count_per_key"](spark, d).collect()}
    # Spark (µs ts, event_id): rows 10..14 fill chunk 0 → 1+2+4+8+16
    assert out[2] == 31.0, out
    # raw ns order puts event 15 (ns+100) before 14 (ns+900): chunk 0
    # would be rows 10..13 + 15 → 1+2+4+8+32 = 47 ≠ 31
    ns_order_sum = 1.0 + 2.0 + 4.0 + 8.0 + 32.0
    assert ns_order_sum != out[2]

    # --- funnel_conversion: purchase ns-BEFORE its same-µs signup ------
    row = QUERIES["funnel_conversion"](spark, d).collect()[0]
    # Spark (µs): purchase ts == signup ts → >= holds → converted
    assert (row["n_signup_users"], row["n_converted"]) == (1, 1)
    # raw ns: purchase(+200) < signup(+800) → would NOT convert
    assert _NS_BASE + 10_000 + 200 < _NS_BASE + 10_000 + 800

    # --- cdc_scd2_versions: same-µs status pair, event_id vs ns flip ---
    vers = [
        (r["version_no"], r["status"])
        for r in QUERIES["cdc_scd2_versions"](spark, d).collect()
        if r["user_id"] == 4
    ]
    # Spark (µs ts, event_id): event 30 'error' (id-first) then 31 'view'
    assert vers[:2] == [(1, "error"), (2, "view")], vers
    # raw ns (+100 before +900) would order 'view' first — flipped
    assert [(1, "view"), (2, "error")] != vers[:2]


def test_rolling_median_matches_handrolled(spark):
    """window_rolling_median's per-class rollup must equal a hand-rolled
    trailing-frame median over the same (ts, event_id)-sorted per-user
    sequences at sf0.001."""
    from collections import defaultdict

    from flink_net_spark.queries import QUERIES
    from flink_net_spark.queries.windows import ROLLMED_FRAME

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "value", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        cents = int(round(r["value"] * 100))
        by_user[r["user_id"]].append((r["ts"], r["event_id"], cents, r["event_type"]))
    exp: dict = {}
    for rows in by_user.values():
        rows.sort(key=lambda x: (x[0], x[1]))
        for i, (_, _, _, et) in enumerate(rows):
            frame = sorted(c for _, _, c, _ in rows[max(0, i - ROLLMED_FRAME): i + 1])
            med = frame[(len(frame) + 1) // 2 - 1]
            n, s, lo, hi = exp.get(et, (0, 0, 1 << 62, -(1 << 62)))
            exp[et] = (n + 1, s + med, min(lo, med), max(hi, med))
    got = {
        r["event_type"]: (r["n_rows"], r["sum_med_cents"], r["min_med_cents"], r["max_med_cents"])
        for r in QUERIES["window_rolling_median"](spark, SF_DIR).collect()
    }
    assert got == exp


def test_mode_exact_matches_counter(spark):
    """agg_mode_exact must equal a Counter-based mode with the (count
    DESC, cents ASC) tie-break, recomputed independently at sf0.001."""
    from collections import Counter

    ev = load_table(spark, SF_DIR, "events").select("event_type", "value").collect()
    groups: dict = {}
    for r in ev:
        groups.setdefault(r["event_type"], Counter())[int(round(r["value"] * 100))] += 1
    exp = {}
    for t, c in groups.items():
        cents, n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        exp[t] = (cents, n, len(c))
    got = {
        r["event_type"]: (r["mode_cents"], r["mode_count"], r["n_distinct"])
        for r in QUERIES["agg_mode_exact"](spark, SF_DIR).collect()
    }
    assert got == exp


def test_cusum_changepoint_matches_bruteforce(spark):
    """The per-user changepoint must equal a brute-force argmax of
    |n*prefix_k - k*total| over the independently sorted series, ties to
    the earliest k."""
    from collections import defaultdict

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
    ).collect()
    series = defaultdict(list)
    for r in ev:
        series[r["user_id"]].append(
            (r["ts"], r["event_id"], int(round(r["value"] * 100)))
        )
    exp = {}
    for u, rows in series.items():
        rows.sort(key=lambda x: (x[0], x[1]))
        vals = [v for _, _, v in rows]
        n, total = len(vals), sum(vals)
        prefix, best = 0, None
        for k, v in enumerate(vals, start=1):
            prefix += v
            stat = abs(n * prefix - k * total)
            if best is None or stat > best[0]:
                best = (stat, k)
        exp[u] = (n, best[1], best[0])
    got = {
        r["user_id"]: (r["n"], r["cp_k"], r["cusum_max"])
        for r in QUERIES["window_cusum_changepoint"](spark, SF_DIR).collect()
    }
    assert got == exp
