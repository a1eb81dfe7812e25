"""Compact-line per-query map contract (r17, VERDICT r16 #1).

The driver's PERF builder reads per-query medians from the PRINTED line
only, and records a ~2000-char stdout tail — so the emitted map must (a)
always contain every pinned name that was measured, (b) fit the byte
budget after main()'s shedding pass, and (c) shed unpinned entries first
(cheapest first) so the pinned set is stable across rounds and across the
driver's 32-core/8-core runs.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def test_pin_file_exists_and_names_are_panel_queries():
    pins = bench._compact_pin_names()
    assert len(pins) >= 30
    assert "graph_connected_components" in pins  # adjudication subject
    assert "q9_profit_by_nation" in pins  # adjudication subject
    assert "stream_window_tumbling_hourly" in pins  # adjudication subject
    assert len(pins) == len(set(pins)), "duplicate pin names"


def test_compact_map_contains_all_measured_pins():
    pins = bench._compact_pin_names()
    timings = {n: 0.5 for n in pins}
    timings.update({f"zz_extra_{i}": 2.0 for i in range(40)})
    qmap, elided = bench._compact_query_map(timings)
    for n in pins:
        assert n in qmap
    assert elided == len(timings) - len(qmap)


def test_shed_keeps_pins_and_fits_budget():
    """Replicate main()'s shedding loop: with an oversized map, unpinned
    entries go first (cheapest first) and the line lands under budget with
    every pinned name intact."""
    pins = bench._compact_pin_names()
    timings = {n: 1.0 + i * 0.01 for i, n in enumerate(pins)}
    timings.update({f"unpinned_query_with_a_long_name_{i:03d}": 0.2 + i * 0.001
                    for i in range(60)})
    compact_queries, n_elided = bench._compact_query_map(timings)
    compact = {"metric": "headline_queries_total_wall_time", "value": 1.0,
               "unit": "sec", "queries": compact_queries, "qx": n_elided,
               "filler": "x" * 700}
    line = json.dumps(compact, separators=(",", ":"))
    pinned = set(pins)
    if len(line) > bench._COMPACT_LINE_BUDGET:
        for name in sorted(compact_queries, key=compact_queries.get):
            if len(line) <= bench._COMPACT_LINE_BUDGET:
                break
            if name in pinned:
                continue
            compact_queries.pop(name, None)
            compact["qx"] = len(timings) - len(compact_queries)
            line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= bench._COMPACT_LINE_BUDGET
    for n in pins:
        assert n in compact_queries, "shedding removed a pinned name"
    parsed = json.loads(line)
    assert parsed["queries"] == compact_queries
