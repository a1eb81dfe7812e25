"""Adversarial edge-corpus oracle replay (round-7 VERDICT #3, made durable).

The friendly testdata SFs (non-empty ASCII prose, healthy-norm embeddings)
let a whole family of oracle-contract bugs pass silently: DuckDB
``list_sum([]) → NULL`` on empty input, UTF-8-byte vs code-point maths on
multi-byte text, and cosine divide-by-zero on zero-norm vectors.  The
round-7 sweep over `tools/make_edge_fixture.py`'s corpus caught 8 such bugs
(see DRIVERSIM_edge.json).  This test pins those exact queries against
their REGISTERED oracles on the edge corpus so the class can never
reappear silently — the full-inventory replay stays a per-round tool run;
this is the fast in-suite guard over the queries that actually broke.
"""

from __future__ import annotations

import duckdb
import pytest

from flink_net_spark.queries import ORACLES, QUERIES
from flink_net_spark.tables import TABLE_NAMES, table_path

# The 8 queries the round-7 edge sweep turned red, plus the two whose
# contract was rewritten for representation-independence that round.
EDGE_QUERIES = [
    "mm_decode_stats",
    "mm_frame_sample",
    "mm_payload_features",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "sim_cosine_topk",
    "sim_ann_ivf",
    "sim_range_search_blocked",
    "sim_semdedup",
    "mm_payload_stats",
    # round-15: the edge corpus now carries TIMESTAMP(NANOS) events with
    # sub-µs collision pairs (VERDICT r14 #4) — pin the ts-ordering oracle
    # family in-suite against it (full coverage stays the per-round
    # DRIVERSIM_edge replay).
    "join_asof",
    "join_asof_nearest",
    "join_asof_tolerance",
    "cdc_scd2_versions",
    "funnel_conversion",
    "window_count_per_key",
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    import tools.make_edge_fixture as mk

    out = tmp_path_factory.mktemp("sf_edge")
    orig = mk.OUT
    mk.OUT = out
    try:
        mk.main()
    finally:
        mk.OUT = orig
    return str(out)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{table_path(edge_dir, name)}')"
        )
    yield con
    con.close()


def test_edge_corpus_planted_near_duplicates_surface(spark, edge_dir):
    """Round-12 (VERDICT r11 #2): the exact duplicate only exercises the
    hamming-0 / Jaccard-1 paths; the fixture now plants TRUE near-dups and
    the banded family must surface them as non-trivial matches:
      - mm_phash_dedup: the 1-char-edited copy of doc 2 within 0 < hamming
        <= 3 (near-miss banding, not just identical fingerprints);
      - dedup_minhash_lsh: the tail-rewritten copy of doc 1 at
        0.3 < jaccard < 1.0;
      - dedup_incremental_minhash: both planted ids are ≡ 0 (mod 10), so
        the incoming batch must report them as verified non-exact dups of
        their ≢ 0 sources."""
    ph_near, mh_near, chunk_near = _edge_near_ids(edge_dir)

    ph = {
        (r.doc_a, r.doc_b): r.hamming
        for r in QUERIES["mm_phash_dedup"](spark, edge_dir).collect()
    }
    assert 1 <= ph[(2, ph_near)] <= 3, ph.get((2, ph_near))

    mh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["dedup_minhash_lsh"](spark, edge_dir).collect()
    }
    assert 0.3 < mh[(1, mh_near)] < 1.0, mh.get((1, mh_near))

    inc = {
        r.doc_id: r
        for r in QUERIES["dedup_incremental_minhash"](spark, edge_dir).collect()
    }
    assert inc[mh_near].best_match_id == 1 and inc[mh_near].is_dup
    assert 0.3 < inc[mh_near].best_jaccard < 1.0
    assert inc[ph_near].is_dup and inc[ph_near].best_jaccard < 1.0

    # the asymmetric pair: the 65%-prefix chunk of doc 3 is fully CONTAINED
    # (containment 1.0) at Jaccard < 0.7 — exactly the superset/quotation
    # signal a symmetric threshold misses
    cont = {
        (r.doc_a, r.doc_b): r
        for r in QUERIES["dedup_containment"](spark, edge_dir).collect()
    }
    r = cont[(3, chunk_near)]
    assert r.contained_doc == chunk_near
    assert max(r.cont_a, r.cont_b) >= 0.99
    assert r.jaccard < 0.7, r


def _edge_near_ids(edge_dir: str) -> tuple[int, int, int]:
    """(phash_near_id, minhash_near_id, containment_chunk_id) — the three
    src_near docs, in id order (the fixture assigns them ascending)."""
    import duckdb as _duck

    rows = _duck.sql(
        f"SELECT doc_id FROM read_parquet('{edge_dir}/documents.parquet') "
        "WHERE source = 'src_near' ORDER BY doc_id"
    ).fetchall()
    assert len(rows) == 3, rows
    return rows[0][0], rows[1][0], rows[2][0]


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_corpus_matches_oracle(spark, edge_dir, edge_duck, name):
    from tests.conftest import _canon_rows

    sdf = QUERIES[name](spark, edge_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = edge_duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), (name, scols, dcols)
    assert len(srows) == len(drows), (name, len(srows), len(drows))
    s, d = _canon_rows(srows, scols), _canon_rows(drows, dcols)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, (name, mismatches[:3])
