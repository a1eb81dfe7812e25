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


def test_weighted_quantiles_match_handbuilt(spark):
    """agg_weighted_quantiles must equal an independent Python weighted-
    median computation at sf0.001 — guards against a cumulative-window
    definition both engines could share wrongly (e.g. strict > vs >=)."""
    from flink_net_spark.tables import load_table

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_extendedprice", "l_quantity")
        .collect()
    )
    acc: dict = {}
    for r in li:
        k = (r["l_returnflag"], r["l_linestatus"])
        v = int(round(r["l_extendedprice"] * 100))
        acc.setdefault(k, {}).setdefault(v, 0)
        acc[k][v] += int(round(r["l_quantity"]))
    expected = {}
    for k, wm in acc.items():
        tot = sum(wm.values())
        picks, cum = {}, 0
        for v in sorted(wm):
            cum += wm[v]
            if "p25" not in picks and 4 * cum >= tot:
                picks["p25"] = v
            if "p50" not in picks and 2 * cum >= tot:
                picks["p50"] = v
            if "p75" not in picks and 4 * cum >= 3 * tot:
                picks["p75"] = v
        expected[k] = (tot, picks["p25"], picks["p50"], picks["p75"])
    rows = QUERIES["agg_weighted_quantiles"](spark, SF_DIR).collect()
    got = {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["w_total"], r["wp25_cents"], r["wp50_cents"], r["wp75_cents"]
        )
        for r in rows
    }
    assert got == expected
