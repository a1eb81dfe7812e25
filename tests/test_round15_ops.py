"""Behavioral tests for the round-15 operators.

The DuckDB oracle (tests/test_queries_oracle.py + driver gate) pins
cross-engine value equality; these pin SEMANTICS that a consistently-wrong
dual implementation could still hash-match on.
"""

from __future__ import annotations

from flink_net_spark.queries import QUERIES
from flink_net_spark.tables import release_persisted

SF = "/root/testdata/sf0.001"


def test_stream_incremental_minhash_equals_batch(spark):
    """The stream op's whole contract: identical answer to the batch
    dedup_incremental_minhash through real micro-batches — the band index
    carried as keyed state must accumulate the same new↔old candidate set
    under the replay's batch slicing as the batch banded equi-join."""
    b = QUERIES["dedup_incremental_minhash"](spark, SF)
    s = QUERIES["stream_incremental_minhash"](spark, SF)
    brows = [tuple(r) for r in b.collect()]
    srows = [tuple(r) for r in s.collect()]
    release_persisted(b)
    release_persisted(s)
    assert brows == srows
    assert brows, "fixture produced no incoming docs"
    # the edge near-dup discipline: at least one verified non-exact dup
    # exists at sf0.001 (planted corpus duplicates — 8 of 50 incoming docs
    # verify as dups), and non-candidates report the (0, -1, 0.0, false)
    # contract row.  (r15 ADVICE: the earlier `any(...) or all(not ...)`
    # form was a tautology and enforced nothing.)
    assert any(r[4] for r in srows)
    assert all(r[1] == 0 and r[2] == -1 for r in srows if r[3] == 0.0)


def test_lpa_labels_are_community_members(spark):
    """Every LPA community label must itself be a node of the graph (labels
    only ever copy neighbor labels, which start as node ids), and the
    bipartite color split must both be present with consistent totals."""
    df = QUERIES["graph_lpa_communities"](spark, SF)
    rows = {r["kind"]: r for r in df.collect()}
    release_persisted(df)
    assert set(rows) == {"part", "supplier"}
    for r in rows.values():
        assert 1 <= r["n_communities"] <= r["n_nodes"]
        assert r["max_comm_size"] >= 1
        assert r["n_changed_last"] == 0


def test_binary_hamming_rerank_recall_vs_exact(spark):
    """The binary sign-sketch is a lossy prefilter — its value is recall
    against the exhaustive cosine truth.  Pin the measured band (0.8-1.0
    per query on this corpus) with headroom: >= 0.6 per query, >= 0.8
    mean.  A broken packing, xor, or salt phase craters this long before
    it perturbs the oracle-checked determinism."""
    truth: dict = {}
    for r in QUERIES["sim_cosine_topk"](spark, SF).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got: dict = {}
    for r in QUERIES["sim_binary_hamming_rerank"](spark, SF).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    rec = {q: len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth}
    assert all(v >= 0.6 for v in rec.values()), rec
    assert sum(rec.values()) / len(rec) >= 0.8, rec
