"""Every registered query with an oracle must hash-match DuckDB — this
mirrors the driver's CORRECTNESS gate (one parametrized test per query).

Queries without an oracle get a smoke run: they must execute and return a
stable schema.  As of round 6 that set is EMPTY (the approx sketches now
emit their accuracy contract as data, so all 139 queries are
value-oracled) — the parametrization skips; it self-reactivates if a
future no-oracle query registers.
"""

from __future__ import annotations

import pytest

from flink_net_spark.queries import META, ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_flat_schema, assert_matches_oracle

WITH_ORACLE = sorted(n for n in QUERIES if n in ORACLES)
WITHOUT_ORACLE = sorted(n for n in QUERIES if n not in ORACLES)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, QUERIES[name], ORACLES[name], name)


@pytest.mark.parametrize("name", WITHOUT_ORACLE)
def test_query_smoke(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns, f"{name}: no columns"
    assert_flat_schema(df, name)
    assert df.count() >= 0


def test_registry_metadata_complete():
    """Every registered query carries machine-readable metadata, and the
    deliberate O(n²) ground-truth shapes are tagged ``scale_safe=False`` so
    bench harnesses / samplers / plan audits can honor the tag instead of
    hand-maintained exclusion lists."""
    assert set(META) == set(QUERIES)
    not_scale_safe = {n for n, m in META.items() if not m["scale_safe"]}
    assert not_scale_safe == {
        "dedup_embedding_cosine",
        "sim_cosine_topk",
        # round-9/10: ground truth is a deliberate bounded all-pairs over
        # the fixed-COUNT hash sample (the audited LSH path is the scale
        # path)
        "dedup_lsh_recall_audit",
        # round-10: ground truth reuses the brute-force top-k oracle shape
        # (the audited ANN variants are the scale paths)
        "sim_ann_recall_audit",
        # round-10: the dense leg deliberately reuses the brute-force
        # ground-truth shape; at scale it swaps 1:1 for an audited ANN
        # variant (RRF consumes only (query, neighbor, rank) tuples)
        "sim_rrf_hybrid",
    }
