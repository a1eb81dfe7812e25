"""Planted-neighbor ANN recall audit (VERDICT r10 #4).

The random synthetic embeddings are the worst case for locality methods, so
the brute-force recall audit can only check relative ordering.  The planted
fixture gives every probe query 8 known near-duplicates (±0.3% perturbed
copies at vec_id 300..339), making ABSOLUTE recall meaningful — and these
tests pin both the targets and the audit's discrimination: a degraded
probe/banding parameter must actually move the number.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_net_spark.queries import QUERIES, similarity
from tests.conftest import SF_DIR


def _rows(spark):
    return {
        r["method"]: r.asDict()
        for r in QUERIES["sim_ann_planted_recall"](spark, SF_DIR).collect()
    }


def test_planted_recall_absolute_targets(spark):
    """Every ANN variant must retrieve ALL 40 planted near-duplicates on
    the synthetic corpus (measured 1.0 across sf0.001/0.01/0.1): the
    plants sit at cosine ≈ 0.999996 against a ~0.3 random background, so
    anything short of full recall is a geometry bug, not noise."""
    rows = _rows(spark)
    assert set(rows) == {"ivf", "ivfpq", "lsh", "multiprobe"}
    for method, r in rows.items():
        assert r["n_planted_pairs"] == 40, r
        assert r["recall_e6"] == 1_000_000, (method, r)


def test_planted_audit_catches_probe_regression(spark, monkeypatch):
    """Discrimination, probe side: with NPROBE degraded to 0 the IVF leg
    probes no cells and planted recall must collapse — the audit moves
    when the parameter regresses (the property the random-vector audit
    cannot provide)."""
    emb = similarity._planted_embeddings(spark, SF_DIR)
    monkeypatch.setattr(similarity, "NPROBE", 0)
    ann = similarity.sim_ann_ivf(spark, SF_DIR, emb=emb)
    assert ann.count() == 0


def test_planted_audit_catches_banding_regression(spark, monkeypatch):
    """Discrimination, banding side: replace the hyperplane bucket with a
    locality-free one (vec_id % 97) — plants land in different buckets
    than their seed query and single-table LSH recall must collapse."""
    emb = similarity._planted_embeddings(spark, SF_DIR)
    monkeypatch.setattr(similarity, "_ST_BUCKET_EXPR", "vec_id % 97")
    ann = similarity.sim_ann_lsh(spark, SF_DIR, emb=emb).select(
        "query_id", "neighbor_id"
    )
    planted = (
        ann.sparkSession.createDataFrame(
            [(v % similarity.N_QUERIES, v) for v in range(similarity.PLANT_LO, similarity.PLANT_HI)],
            "query_id LONG, neighbor_id LONG",
        )
    )
    caught = ann.join(
        planted,
        (ann.query_id == planted.query_id) & (ann.neighbor_id == planted.neighbor_id),
    ).count()
    assert caught < 40, caught


def test_maxsim_pruned_full_recall_and_score_parity(spark):
    """At test scale the per-token candidate fan-in (M=32 per token, 5
    tokens per query) must recover the exhaustive top-k EXACTLY: n_caught
    == MAXSIM_TOPK for every query, and each caught doc's pruned score
    must equal its exhaustive score (pruning may only REMOVE candidates,
    never change a survivor's exact Σ-max score)."""
    from flink_net_spark.queries import QUERIES
    from flink_net_spark.queries.similarity import MAXSIM_TOPK
    from flink_net_spark.tables import release_persisted

    sf = "/root/testdata/sf0.001"
    pr = QUERIES["sim_maxsim_pruned"](spark, sf)
    pruned = pr.collect()
    release_persisted(pr)
    assert pruned, "fixture must produce ranked rows"
    assert all(r["n_caught"] == MAXSIM_TOPK for r in pruned)

    exh = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in QUERIES["sim_maxsim_late_interaction"](spark, sf).collect()
    }
    for r in pruned:
        assert exh[(r["query_id"], r["doc_id"])] == r["score"], r


def test_kcenter_matches_independent_farthest_first(spark):
    """sample_coreset_kcenter must equal an independent farthest-first
    traversal over the same quantized vectors at sf0.001, including each
    pick's selection radius and the final coverage radius."""
    from flink_net_spark.queries import QUERIES
    from flink_net_spark.queries.similarity import KCENTER_K
    from flink_net_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    vecs = {
        int(r["vec_id"]): [int(round(float(x) * 1000)) for x in r["embedding"]]
        for r in load_table(spark, sf, "embeddings").collect()
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    centers = [0]
    picks = [(0, 0, 0)]
    mind = {v: d2(vecs[v], vecs[0]) for v in vecs}
    for i in range(1, KCENTER_K):
        nxt = min(vecs, key=lambda v: (-mind[v], v))
        picks.append((i, nxt, mind[nxt]))
        centers.append(nxt)
        for v in vecs:
            mind[v] = min(mind[v], d2(vecs[v], vecs[nxt]))
    radius = max(mind.values())

    rows = QUERIES["sample_coreset_kcenter"](spark, sf).collect()
    got = [(r["sel_round"], r["center_id"], r["sel_dist"]) for r in rows]
    assert got == picks
    assert all(r["coverage_radius"] == radius for r in rows)
    assert all(r["n_vecs"] == len(vecs) for r in rows)
