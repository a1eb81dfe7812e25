"""Pin the README's registry headline count to the actual registry.

r15 VERDICT #3: the README count drifted (227 vs 228) because it was
hand-bumped.  Rather than generating the doc, pin it: this test fails the
suite the moment a query lands (or is removed) without the README headline
following, so the count can never silently drift again.
"""

from __future__ import annotations

import pathlib
import re


def test_readme_count_matches_registry():
    from flink_net_spark.queries import QUERIES

    readme = pathlib.Path(__file__).resolve().parents[1] / "README.md"
    m = re.search(r"(\d+) registered queries", readme.read_text())
    assert m, "README.md no longer states the registered-queries count"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} registered queries but the registry has "
        f"{len(QUERIES)} — update the README headline (r15 verdict #3)"
    )
