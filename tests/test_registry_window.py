"""The driver's hard CORRECTNESS gate hash-checks only the first
``DRIVER_WINDOW`` entries of the registry.  Guard the round-6 interleave:
the window must span every bench family (round-5 verdict top finding — a
window of 100% relational/window queries left the engine's LLM-pipeline
surface without driver-grade evidence), keep the flagship first, and stay
almost entirely value-oracled.
"""

from __future__ import annotations

import re

from flink_net_spark.queries import DRIVER_WINDOW, ORACLES, QUERIES

# Mirror of bench.py's family rollup (first match wins).
FAMILY_PATTERNS = [
    ("tpch", r"^q\d+_"),
    ("stream", r"^(stream_|pipeline_)"),
    ("window", r"^window_"),
    ("join", r"^join_"),
    ("graph", r"^graph_"),
    ("dedup", r"^dedup_"),
    ("ann", r"^(sim_|emb_)"),
    ("text", r"^(text_|flatmap_|vocab_|tfidf_)"),
    ("curation", r"^(curation_|sample_)"),
    ("rel", r"."),
]


def _family(name: str) -> str:
    for fam, pat in FAMILY_PATTERNS:
        if re.match(pat, name):
            return fam
    return "rel"


def test_driver_window_spans_every_family():
    window = list(QUERIES)[:DRIVER_WINDOW]
    assert window[0] == "q1_pricing_summary"  # entry() flagship stays first
    fams = {_family(n) for n in window}
    assert fams == {f for f, _ in FAMILY_PATTERNS}, sorted(fams)


def test_driver_window_is_value_oracled():
    window = list(QUERIES)[:DRIVER_WINDOW]
    missing = [n for n in window if n not in ORACLES]
    assert not missing, missing


def test_registry_reorder_is_a_permutation():
    # The interleave must never drop or duplicate a query or its oracle.
    assert len(QUERIES) == len(set(QUERIES))
    assert set(ORACLES) <= set(QUERIES)


def test_window_rotates_toward_unchecked_queries():
    """Round-7 rotation (verdict #4): the window must fill with queries
    that have no prior driver-grade CORRECTNESS row, so evidence
    accumulates across rounds — while test_driver_window_spans_every_family
    above still holds (rotation must not collapse the family spread)."""
    from flink_net_spark.queries import _driver_checked

    checked = _driver_checked()
    if not checked:  # fresh clone: no artifacts, nothing to rotate against
        return
    window = list(QUERIES)[:DRIVER_WINDOW]
    unchecked_total = len([n for n in QUERIES if n not in checked])
    fresh_in_window = len([n for n in window if n not in checked])
    # q1 stays pinned and up to one already-checked pick per module may be
    # needed for family coverage — everything else must be fresh.
    assert fresh_in_window >= min(unchecked_total, DRIVER_WINDOW) - 15, (
        fresh_in_window,
        unchecked_total,
    )


def test_rotation_keys_on_green_not_seen():
    """Round-8 verdict #2: a driver row that FAILED (hash mismatch) or
    ERRORED (e.g. the pre-oracle ``err: no_oracle`` rows) must NOT count as
    driver-checked — otherwise a red query rotates out of the window and is
    never rechecked (exactly how the r07 NLL reds got buried in r08).
    Verified against the committed artifacts: every name _driver_checked()
    returns has at least one all-three-green row, and the known failure
    modes (r07 NLL hash-fails, r02–r05 no_oracle rows) are re-admitted."""
    import glob
    import json
    import os

    from flink_net_spark.queries import _driver_checked

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows_by_name: dict[str, list[dict]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for nm, row in json.load(f).items():
                rows_by_name.setdefault(nm, []).append(row)
    if not rows_by_name:  # fresh clone
        return

    def green(row: dict) -> bool:
        return (
            row.get("rows_match") is True
            and row.get("schema_match") is True
            and row.get("hash_match") in (True, None)
            and row.get("err") is None
        )

    checked = _driver_checked()
    for nm in checked:
        assert any(green(r) for r in rows_by_name.get(nm, [])), nm
    # names with only red/err rows must be OUT of `checked` (→ re-enter)
    never_green = {
        nm for nm, rows in rows_by_name.items() if not any(green(r) for r in rows)
    }
    assert not (never_green & checked), never_green & checked


def test_no_libm_transcendental_in_any_oracle():
    """Round-8 verdict #1: libm ``ln``/``log``/``exp`` are not correctly
    rounded, so an oracle contract whose hashed value flows through them
    can flip a quantization boundary between engines.  Every log in the
    tree must be the deterministic expression from functions/detmath.py
    (injected literals + IEEE-exact ops).  ``sqrt`` and division stay
    allowed — IEEE requires them correctly rounded."""
    import re

    from flink_net_spark.queries import ORACLES

    pat = re.compile(r"\b(ln|log|log2|log10|log1p|exp|expm1|pow|power)\s*\(", re.I)
    offenders = {nm: pat.findall(sql) for nm, sql in ORACLES.items() if pat.search(sql)}
    assert not offenders, offenders


def test_every_query_has_green_evidence_or_is_in_window():
    """Round-8 verdict #7 (evidence tail): any registry query still lacking
    an all-green driver row must be IN the current driver window — i.e.
    scheduled for checking this round.  With the green-keyed rotation this
    closes the tail: once CORRECTNESS_r09 lands, every one of the registry
    queries has ≥1 green row and the set below is empty."""
    from flink_net_spark.queries import _driver_checked

    checked = _driver_checked()
    if not checked:  # fresh clone
        return
    window = set(list(QUERIES)[:DRIVER_WINDOW])
    stranded = set(QUERIES) - checked - window
    assert not stranded, sorted(stranded)
