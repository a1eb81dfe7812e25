"""Unit tests for the noise-aware bench regression gate (no Spark needed).

The gate's contract (calibrated against two same-code runs, see the module
docstring): a wall-time move counts only when the min/max spread envelopes
are disjoint AND the session-factor-normalized ratio exceeds 1.5× AND the
absolute move exceeds 0.15 s; disjoint moves beyond 1.25× normalized are
reported as "suspect" without entering the verdict.  A shuffle-byte move
counts when the measured shuffle_write/on-disk ratio grew >25% relative
AND >0.05 absolute.  Everything else is sandbox noise and must NOT be
reported — round 3's false "+23.5% regression on unchanged code" is the
failure mode this tool exists to prevent.
"""

from __future__ import annotations

from tools.bench_compare import compare, compare_shuffle, to_markdown


def detail(queries, spreads=None, shuffle=None):
    d = {"queries": queries}
    if spreads:
        d["queries_spread"] = spreads
    if shuffle:
        d["shuffle_audit"] = shuffle
    return d


def test_overlapping_spreads_are_noise():
    old = detail({"q": 1.0}, {"q": [0.9, 1.3]})
    new = detail({"q": 1.25}, {"q": [1.1, 1.4]})  # +25% median but spreads overlap
    r = compare(old, new)
    assert r["rows"][0]["status"] == "within-noise"
    assert r["verdict"]["reg"] == 0


def test_disjoint_spreads_and_big_move_is_regression():
    old = detail({"q": 1.0}, {"q": [0.9, 1.1]})
    new = detail({"q": 2.0}, {"q": [1.8, 2.2]})
    r = compare(old, new)
    assert r["rows"][0]["status"] == "REGRESSION"
    assert r["verdict"]["regressions"] == ["q"]


def test_disjoint_but_small_move_is_noise():
    # disjoint intervals but a small normalized move: two tight samples
    # close together, not a structural change
    old = detail({"q": 1.00}, {"q": [0.99, 1.01]})
    new = detail({"q": 1.05}, {"q": [1.04, 1.06]})
    r = compare(old, new)
    assert r["rows"][0]["status"] == "within-noise"


def test_session_factor_absorbs_correlated_drift():
    # 9 queries, ALL ~1.4x slower: a session-wide factor (JIT/cache state),
    # not nine real regressions — the exact false-positive class measured
    # on two same-code runs in round 5
    old = detail(
        {f"q{i}": 1.0 for i in range(9)},
        {f"q{i}": [0.98, 1.02] for i in range(9)},
    )
    new = detail(
        {f"q{i}": 1.4 for i in range(9)},
        {f"q{i}": [1.37, 1.43] for i in range(9)},
    )
    r = compare(old, new)
    assert r["verdict"]["session_factor"] == 1.4
    assert r["verdict"]["reg"] == 0
    assert all(row["status"] == "within-noise" for row in r["rows"])


def test_one_real_regression_survives_normalization():
    # 8 stable queries + one 3x blowup: the factor stays ~1.0 and the
    # outlier is flagged
    old = detail(
        {**{f"q{i}": 1.0 for i in range(8)}, "bad": 1.0},
        {**{f"q{i}": [0.98, 1.02] for i in range(8)}, "bad": [0.98, 1.02]},
    )
    new = detail(
        {**{f"q{i}": 1.0 for i in range(8)}, "bad": 3.0},
        {**{f"q{i}": [0.98, 1.02] for i in range(8)}, "bad": [2.9, 3.1]},
    )
    r = compare(old, new)
    assert r["verdict"]["reg"] == 1
    assert r["verdict"]["regressions"] == ["bad"]


def test_disjoint_moderate_move_is_suspect_not_regression():
    old = detail({"q": 1.0}, {"q": [0.98, 1.02]})
    new = detail({"q": 1.35}, {"q": [1.32, 1.38]})  # 1.35x: above 1.25, below 1.5
    r = compare(old, new)
    assert r["rows"][0]["status"] == "suspect"
    assert r["verdict"]["reg"] == 0
    assert r["verdict"]["suspect"] == 1


def test_micro_query_abs_floor():
    # 0.05s -> 0.12s is a 2.4x ratio but only 0.07s — constant overhead on
    # a micro query, never a REGRESSION (may surface as suspect)
    old = detail({"q": 0.05}, {"q": [0.049, 0.051]})
    new = detail({"q": 0.12}, {"q": [0.118, 0.122]})
    r = compare(old, new)
    assert r["rows"][0]["status"] != "REGRESSION"
    assert r["verdict"]["reg"] == 0


def test_improvement_is_symmetric():
    old = detail({"q": 2.0}, {"q": [1.8, 2.2]})
    new = detail({"q": 1.0}, {"q": [0.9, 1.1]})
    r = compare(old, new)
    assert r["rows"][0]["status"] == "improvement"
    assert r["verdict"]["imp"] == 1


def test_missing_spread_falls_back_to_band():
    # old artifact predates spread capture: +-15% band stands in
    old = detail({"q": 1.0})
    new = detail({"q": 1.10}, {"q": [1.08, 1.12]})  # inside the 15% band
    assert compare(old, new)["rows"][0]["status"] == "within-noise"
    new2 = detail({"q": 1.60}, {"q": [1.55, 1.65]})
    assert compare(old, new2)["rows"][0]["status"] == "REGRESSION"


def test_new_query_listed_not_compared():
    r = compare(detail({"a": 1.0}), detail({"a": 1.0, "b": 2.0}))
    assert r["only_new"] == ["b"]
    assert [row["query"] for row in r["rows"]] == ["a"]


def test_shuffle_ratio_growth_flags_plan_change():
    old = detail({}, shuffle={"q": {"disk_ratio": 0.10}})
    new = detail({}, shuffle={"q": {"disk_ratio": 0.40}})
    rows = compare_shuffle(old, new)
    assert rows[0]["status"] == "SHUFFLE-REGRESSION"


def test_shuffle_near_zero_relative_growth_is_ok():
    # 0.003 -> 0.006 doubles relatively but is no plan change (abs < 0.05)
    old = detail({}, shuffle={"q": {"disk_ratio": 0.003}})
    new = detail({}, shuffle={"q": {"disk_ratio": 0.006}})
    assert compare_shuffle(old, new)[0]["status"] == "ok"


def test_shuffle_missing_old_datum():
    rows = compare_shuffle(detail({}), detail({}, shuffle={"q": {"disk_ratio": 0.2}}))
    assert rows[0]["status"] == "no-old-datum"


def test_markdown_renders_both_sections():
    old = detail({"q": 1.0}, {"q": [0.9, 1.1]}, {"q": {"disk_ratio": 0.1}})
    new = detail({"q": 2.0}, {"q": [1.8, 2.2]}, {"q": {"disk_ratio": 0.4}})
    md = to_markdown(compare(old, new))
    assert "REGRESSION" in md and "SHUFFLE-REGRESSION" in md
    assert "| q |" in md


def test_adjudication_verdict_protocol():
    """The self-adjudicating drift gate (VERDICT r10 #3): a solo re-measure
    that re-enters the old spread envelope, or whose session-normalized
    ratio falls back under the suspect threshold, is session noise; a solo
    median that stays outside both persists."""
    from bench import adjudication_verdict

    # solo back inside the old envelope -> noise
    assert adjudication_verdict(1.0, 1.2, 1.15, 1.0) == "session-noise"
    # solo above the envelope but normalized ratio <= 1.25 -> noise
    assert adjudication_verdict(1.0, 1.2, 1.3, 1.1) == "session-noise"
    # solo stays 1.6x normalized above: persists
    assert adjudication_verdict(1.0, 1.2, 1.6, 1.0) == "persists"


def test_adjudications_render_in_markdown():
    """bench_compare's markdown must carry the machine-generated solo-rep
    evidence rows (so BENCH_COMPARE_r*_r* needs zero hand-written
    adjudication), pulled from the NEW sidecar's compare section."""
    from tools.bench_compare import attach_adjudications

    old = detail({"q": 1.0}, {"q": [0.9, 1.1]})
    new = detail({"q": 1.4}, {"q": [1.3, 1.5]})
    new["compare"] = {
        "adjudications": [
            {
                "query": "q",
                "status": "suspect",
                "old": 1.0,
                "bench_median": 1.4,
                "solo_runs": [1.05, 1.1, 1.08],
                "solo_median": 1.08,
                "solo_norm": 1.08,
                "src_unchanged": True,
                "verdict": "session-noise",
            }
        ]
    }
    result = attach_adjudications(compare(old, new), new)
    md = to_markdown(result)
    assert "Drift adjudications" in md
    assert "session-noise" in md and "unchanged" in md
    assert "1.05, 1.10, 1.08" in md


def test_adjudication_micro_floor():
    """A sub-0.5s micro-query whose solo move stays under the calibrated
    absolute floor is session noise even when its normalized ratio sits
    above the suspect threshold — the same floor the compare gate applies
    (observed: a 56 ms drift on a 0.2 s window query read norm 1.26)."""
    from bench import adjudication_verdict

    assert adjudication_verdict(0.205, 0.21, 0.261, 1.0) == "session-noise"
    # a REAL move on a micro-query still persists once it clears the floor
    assert adjudication_verdict(0.205, 0.21, 0.60, 1.0) == "persists"


def test_stream_version_gate_refuses_cross_version_comparison():
    """Round-11 VERDICT #2/#4: stream-probe staging/protocol are part of
    the measurement — rows across different versions must read
    VERSION-BREAK, never as an engine move; same-version rows are
    like-for-like.  The one stamped-era-but-unstamped shape (round 11's
    settle-seeking probe dicts) is inferred from the dict shape."""
    from tools.bench_compare import _stream_version, compare_stream

    v2 = {"staging": "v2", "protocol": "settle-v1"}
    old_legacy = detail({"q": 1.0})
    old_legacy["stream_rows_per_sec"] = 1_000_000
    new = detail({"q": 1.0})
    new["stream_rows_per_sec"] = 4_000_000
    new["stream_probe_version"] = v2

    s = compare_stream(old_legacy, new)
    assert not s["comparable"]
    assert all(r["status"] == "VERSION-BREAK" for r in s["rows"])

    # r11 shape: no stamp, but settle-protocol probe dict => inferred v2
    old_r11 = detail({"q": 1.0})
    old_r11["stream_rows_per_sec"] = 2_000_000
    old_r11["stream_probe_1k"] = {"rps": 2_000_000, "settled": True}
    assert _stream_version(old_r11)["staging"] == "v2"
    s = compare_stream(old_r11, new)
    assert s["comparable"]
    assert all(r["status"] == "like-for-like" for r in s["rows"])

    c = compare(old_legacy, new)
    assert c["verdict"]["stream_cmp"] == "version-break"
    md = to_markdown(c)
    assert "VERSION-BREAK" in md and "compare harnesses, not" in md


def test_adjudication_no_prev_hash_verdict():
    """Round-11 ADVICE: a flagged query the previous sidecar never
    fingerprinted must read 'no-prev-hash' (a coverage gap), not
    'source-changed' (an accusation)."""
    import bench

    rows = [
        {"query": "qa", "status": "suspect", "old": 1.0, "new": 2.0,
         "old_spread": [0.9, 1.1], "norm_ratio": 2.0},
        {"query": "qb", "status": "suspect", "old": 1.0, "new": 2.0,
         "old_spread": [0.9, 1.1], "norm_ratio": 2.0},
    ]
    prev = {"query_src_hash": {"qb": "deadbeef0000"}}
    src = {"qa": "aaaaaaaaaaaa", "qb": "bbbbbbbbbbbb"}
    dummy = lambda *a, **k: None  # noqa: E731 - never called for these verdicts
    out = bench.adjudicate_suspects(
        None, {"qa": dummy, "qb": dummy}, rows, prev, 1.0, src
    )
    by = {r["query"]: r["verdict"] for r in out}
    assert by["qa"] == "no-prev-hash"
    assert by["qb"] == "source-changed"


def _mkrow(name, status="within-noise", old=1.0, new=1.0):
    return {"query": name, "status": status, "old": old, "new": new,
            "old_spread": [old * 0.95, old * 1.05], "norm_ratio": new / old}


def test_pick_anchors_nearest_runtime_class_same_code():
    """Anchor selection (VERDICT r12 #3): only within-noise rows with an
    unchanged source fingerprint qualify, ranked by runtime-class
    proximity to the suspect (|log old-ratio|)."""
    import bench

    rows = [
        _mkrow("sus", status="suspect", old=3.0, new=5.4),
        _mkrow("far_micro", old=0.2),
        _mkrow("near_a", old=2.8),
        _mkrow("near_b", old=3.3),
        _mkrow("changed", old=3.0),          # source changed -> excluded
        _mkrow("flagged", status="REGRESSION", old=3.1),  # flagged -> excluded
    ]
    prev = {n: "h_" + n for n in ("sus", "far_micro", "near_a", "near_b", "flagged")}
    src = dict(prev)
    src["changed"] = "different"
    prev["changed"] = "h_changed"
    got = [a["query"] for a in bench.pick_anchors("sus", rows, prev, src)]
    assert got == ["near_a", "near_b"] or got == ["near_b", "near_a"]
    assert "far_micro" not in got and "changed" not in got and "flagged" not in got


def test_classify_persist_box_vs_query(monkeypatch):
    """The third adjudication stage: anchors drifting WITH the suspect ->
    persists-box; anchors steady -> persists-query; no anchors ->
    persists-unclassified.  Measurement is stubbed so the rule itself is
    what's under test."""
    import bench

    solos = {"a1": 1.7, "a2": 1.9, "steady1": 1.0, "steady2": 1.05}
    monkeypatch.setattr(
        bench, "_solo_measure",
        lambda spark, fn: ([solos[fn]] * 3, solos[fn]),
    )
    queries = {n: n for n in solos}  # fn IS the name for the stub

    # suspect solo_norm 1.8; anchors at ~1.8 too -> box drift
    rec = {"query": "sus", "solo_norm": 1.8}
    anchors = [{"query": "a1", "old": 1.0}, {"query": "a2", "old": 1.0}]
    bench.classify_persist(None, queries, rec, anchors, 1.0)
    assert rec["verdict"] == "persists-box"
    assert rec["anchor_norm"] >= 1.7 and rec["residual_vs_anchors"] <= 1.06

    # same suspect, anchors steady at ~1.0 -> query-specific drift
    rec = {"query": "sus", "solo_norm": 1.8}
    anchors = [{"query": "steady1", "old": 1.0}, {"query": "steady2", "old": 1.0}]
    bench.classify_persist(None, queries, rec, anchors, 1.0)
    assert rec["verdict"] == "persists-query"
    assert rec["residual_vs_anchors"] > 1.25

    # no anchors available -> named unclassified, never bare `persists`
    rec = {"query": "sus", "solo_norm": 1.8}
    bench.classify_persist(None, queries, rec, [], 1.0)
    assert rec["verdict"] == "persists-unclassified"


def test_adjudicate_runs_anchor_stage_on_persists(monkeypatch):
    """End-to-end: a suspect whose solo re-measure persists must leave
    adjudicate_suspects carrying a CLASSIFIED verdict and its anchor
    evidence rows — BENCH_r13+ compares ship zero bare `persists`."""
    import bench

    solos = {"sus": 3.0, "anchor1": 1.0, "anchor2": 1.0}
    monkeypatch.setattr(
        bench, "_solo_measure",
        lambda spark, fn: ([solos[fn]] * 3, solos[fn]),
    )
    rows = [
        _mkrow("sus", status="suspect", old=1.0, new=3.0),
        _mkrow("anchor1", old=1.0),
        _mkrow("anchor2", old=1.0),
    ]
    prev = {"query_src_hash": {"sus": "x", "anchor1": "y", "anchor2": "z"}}
    src = {"sus": "x", "anchor1": "y", "anchor2": "z"}
    out = bench.adjudicate_suspects(
        None, {n: n for n in solos}, rows, prev, 1.0, src
    )
    rec = next(r for r in out if r["query"] == "sus")
    assert rec["verdict"] == "persists-query"
    assert len(rec["anchors"]) == 2
    assert all(a["solo_norm"] == 1.0 for a in rec["anchors"])


def test_anchor_rows_render_in_markdown():
    """The compare markdown must carry the anchor evidence under the
    classified persists row."""
    from tools.bench_compare import attach_adjudications

    old = detail({"q": 1.0}, {"q": [0.95, 1.05]})
    new = detail({"q": 1.01}, {"q": [0.99, 1.05]})
    new["compare"] = {
        "adjudications": [
            {
                "query": "q", "status": "suspect", "old": 1.0,
                "bench_median": 3.0, "solo_runs": [3.0, 3.0, 3.0],
                "solo_median": 3.0, "solo_norm": 3.0, "src_unchanged": True,
                "verdict": "persists-query", "anchor_norm": 1.0,
                "residual_vs_anchors": 3.0,
                "anchors": [
                    {"query": "a1", "old": 1.0, "solo_median": 1.0,
                     "solo_norm": 1.0, "solo_runs": [1.0] * 3},
                ],
            }
        ]
    }
    result = attach_adjudications(compare(old, new), new)
    md = to_markdown(result)
    assert "persists-query" in md
    assert "anchors (norm med" in md and "a1 old 1.00" in md


def test_xsession_stream_probe_version_gated(monkeypatch, tmp_path):
    """VERDICT r12 #7: the cross-session stream rate is the median of the
    last 3 same-version sessions' settled medians; sidecars from another
    probe version are skipped (a staging change is a harness change)."""
    import json

    import bench

    def write(name, rps_1k, rps_1m, version):
        d = {"stream_rows_per_sec": rps_1k, "stream_rows_per_sec_1m_keys": rps_1m,
             "stream_probe_version": version}
        (tmp_path / name).write_text(json.dumps(d))

    cur = bench.STREAM_PROBE_VERSION
    write("r10.json", 9_999_999, 9_999_999, {"staging": "v1", "protocol": "old"})
    write("r11.json", 4_000_000, 2_000_000, cur)
    write("r12.json", 5_000_000, 3_000_000, cur)
    monkeypatch.setattr(bench, "OUT_DIR", str(tmp_path))

    x = bench.xsession_stream_probe(4_500_000, 2_500_000)
    assert x["n_sessions"] == 3
    assert x["stream_1k"] == 4_500_000  # median of (4.5M, 5M, 4M)
    assert x["stream_1m"] == 2_500_000
    assert 9_999_999 not in x["sessions_1k"]  # version-break sidecar skipped


def test_headline_panel_frozen_and_shared_with_previous_round():
    """HEADLINE size policy (VERDICT r12 #4): the panel is capped at 116
    and must share ≥100 queries with the previous round's committed
    sidecar, so the drift gate's session factor stays statistically
    powered round over round."""
    import glob
    import json
    import os

    import bench

    assert len(bench.HEADLINE) <= 116, (
        "HEADLINE is a frozen measurement panel — rotate a same-family "
        "representative OUT for every query rotated in (see bench.py policy)"
    )
    snaps = sorted(glob.glob(os.path.join(bench.OUT_DIR, "r*.json")))
    if not snaps:  # fresh clone: nothing to share with
        return
    with open(snaps[-1]) as f:
        prev = set(json.load(f).get("queries", {}))
    shared = prev & set(bench.HEADLINE)
    assert len(shared) >= 100, (len(shared), "panel churn beyond the ±12/round bound")


def test_null_thresholds_normalized_with_floors(monkeypatch, tmp_path):
    """Gate thresholds calibrate from the committed same-code null
    distribution, NORMALIZED by the null run's own session factor, with
    the static constants as floors (round-13: the r13 box's raw ratios
    read p90 1.42 but 1.14 of that is session factor)."""
    import json

    import tools.bench_compare as bc

    # point the loader at a synthetic artifact
    import os
    null = {
        "session_factor_AB": 2.0,
        # normalized ratios: 40 at 1.0 plus a tail (1.45, 1.5, 1.6, 2.0);
        # with n=44, p90 lands in the 1.0 mass and p98 on the 1.6
        "ratios": {f"q{i}": 2.0 for i in range(40)}
        | {"t1": 2.9, "t2": 3.0, "t3": 3.2, "t4": 4.0},
    }
    (tmp_path / "NULL_SPREAD.json").write_text(json.dumps(null))
    real_join = os.path.join

    def fake_join(*parts):
        if parts[-1] == "NULL_SPREAD.json":
            return str(tmp_path / "NULL_SPREAD.json")
        return real_join(*parts)

    monkeypatch.setattr(bc.os, "path", os.path) if hasattr(bc, "os") else None
    monkeypatch.setattr("os.path.join", fake_join)
    s, r = bc.null_thresholds()
    # normalized: 100×1.0 + (1.45, 1.5, 1.6, 2.0); p90 of that = 1.0 → floor
    assert s == 1.25
    # p98 index lands in the tail (1.6) → above the 1.5 floor
    assert r == 1.6

    # unreadable artifact → floors
    (tmp_path / "NULL_SPREAD.json").write_text("{broken")
    assert bc.null_thresholds() == (1.25, 1.5)


def test_xsession_stream_probe_counts_and_round_guard(monkeypatch, tmp_path):
    """r13 ADVICE: (a) a same-version sidecar with NO rates must not eat
    one of the 3 session slots; (b) a sidecar from the round currently
    being recorded (a mid-round re-run after r{N}.json was committed) is
    skipped, not double-weighted."""
    import json

    import bench

    def write(name, rps_1k, rps_1m, version):
        d = {"stream_probe_version": version}
        if rps_1k is not None:
            d["stream_rows_per_sec"] = rps_1k
        if rps_1m is not None:
            d["stream_rows_per_sec_1m_keys"] = rps_1m
        (tmp_path / name).write_text(json.dumps(d))

    cur = bench.STREAM_PROBE_VERSION
    write("r14.json", 9_000_000, 9_000_000, cur)  # this round's own re-run
    write("r13.json", None, None, cur)            # contributes nothing
    write("r12.json", 5_000_000, 3_000_000, cur)
    write("r11.json", 4_000_000, 2_000_000, cur)
    monkeypatch.setattr(bench, "OUT_DIR", str(tmp_path))
    monkeypatch.setattr(bench, "_building_round", lambda: 14)

    x = bench.xsession_stream_probe(4_500_000, 2_500_000)
    # r14 skipped (round guard), r13 skipped (no contribution): the
    # medians come from the current session + r12 + r11
    assert x["n_sessions"] == 3
    assert 9_000_000 not in x["sessions_1k"]
    assert x["stream_1k"] == 4_500_000
    assert x["stream_1m"] == 2_500_000


def test_exec_frac_panel_emits_decomposition_fields(spark):
    """VERDICT r13 #4: the sidecar's exec_frac_top10 panel must carry the
    fresh/recollect/exec_frac triple for the most expensive queries, with
    0 < exec_frac <= ~1 (a re-collect never pays MORE than the fresh
    fn()+collect on a warm plan, modulo timer noise)."""
    import bench

    def q_fast(s, sf_dir):
        return s.range(1000).selectExpr("sum(id) AS s")

    def q_slow(s, sf_dir):
        return s.range(200_000).selectExpr("sum(id * id) AS s")

    panel = bench.exec_frac_panel(
        spark, {"fast": q_fast, "slow": q_slow}, {"fast": 0.1, "slow": 0.9},
        top_n=1,
    )
    assert list(panel) == ["slow"]  # most-expensive-first, capped at top_n
    rec = panel["slow"]
    assert rec["fresh_sec"] > 0 and rec["recollect_sec"] > 0
    assert 0 < rec["exec_frac"] <= 1.5, rec
