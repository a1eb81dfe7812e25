#!/usr/bin/env python
"""Build the adversarial edge-fixture corpus (round-7 VERDICT #3).

The sandbox SFs are friendly: every document is non-empty ASCII prose, every
embedding has a healthy norm.  Any oracle in the `list_sum(empty) → NULL` /
code-point-vs-byte family therefore passes at sf0.01 while silently diverging
on real-corpus inputs.  This script clones sf0.001 and injects exactly the
inputs that break that family:

documents (+8 rows past max doc_id):
  - empty text
  - whitespace-only text
  - one single-char doc, one 1-token doc
  - multi-byte UTF-8: accents, CJK, emoji (byte length != char length)
  - punctuation-only text (tokenizers yield zero word tokens)
  - one exact duplicate of an existing document's text (dedup paths)
embeddings (+4 rows past max vec_id):
  - the all-zero vector (norm 0 — divide-by-zero guard in every cosine)
  - an exact duplicate of an existing vector
  - a one-hot vector and its negation (cosine -1 pair)

n_chars stays = length(text) (both engines derive from the same parquet, so
any n_chars-based oracle still agrees).  Every other table is copied verbatim.

Usage: python tools/make_edge_fixture.py [out_dir]   # default /tmp/sf_edge
Then:  python tools/driver_sim.py /tmp/sf_edge       # -> DRIVERSIM_edge.json
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb
import pandas as pd

SRC = Path("/root/testdata/sf0.001")
OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_edge")

COPY_VERBATIM = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
]


def _write_ns_events() -> None:
    """events at TIMESTAMP(NANOS) precision + sub-µs collision pairs
    (round-15, VERDICT r14 #4): up-convert the sf0.001 events to ns and
    append NEW users whose events collide inside single microseconds with
    the ns part OPPOSED to the µs-level ordering — the exact pattern
    tests/test_analytics_ops.py::_ns_collision_events_dir proved flips
    asof match, count-window chunk sums, funnel conversion, and SCD2
    version order under raw-ns ordering.  Replaying the full registry on
    this corpus driver-gates EVERY ts-ordering oracle against the hazard:
    Spark reads through load_table's nanosAsLong -> `div 1000` branch and
    every oracle µs-truncates (CAST(ts AS TIMESTAMP)), so both engines
    hold the µs view regardless of whether DuckDB reads NANOS truncated
    (1.0.0) or native TIMESTAMP_NS (≥1.1)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(SRC / "events.parquet")
    d = src.to_pydict()
    eid0 = max(d["event_id"]) + 1
    uid0 = max(d["user_id"]) + 1
    ns = [int(t.value) * 1000 for t in src["ts"]]  # µs -> epoch-ns
    base = ((max(ns) // 10**9) + 3600) * 10**9  # 1h past the corpus
    us = lambda k: base + k * 1000
    collide = [
        # (event_id, ts_ns, user_id, event_type, value) — see the unit
        # fixture for why each pair discriminates raw-ns ordering.
        (eid0 + 0, us(0) + 100, uid0 + 0, "view", 1.0),
        (eid0 + 1, us(0) + 900, uid0 + 0, "click", 1.0),
        (eid0 + 2, us(1), uid0 + 1, "click", 1.0),
        (eid0 + 3, us(2), uid0 + 1, "click", 2.0),
        (eid0 + 4, us(3), uid0 + 1, "click", 4.0),
        (eid0 + 5, us(4), uid0 + 1, "click", 8.0),
        (eid0 + 6, us(5) + 900, uid0 + 1, "click", 16.0),
        (eid0 + 7, us(5) + 100, uid0 + 1, "click", 32.0),
        (eid0 + 8, us(10) + 800, uid0 + 2, "signup", 1.0),
        (eid0 + 9, us(10) + 200, uid0 + 2, "purchase", 1.0),
        (eid0 + 10, us(20) + 900, uid0 + 3, "error", 1.0),
        (eid0 + 11, us(20) + 100, uid0 + 3, "view", 1.0),
        (eid0 + 12, us(30), uid0 + 3, "purchase", 1.0),
    ]
    t = pa.table(
        {
            "event_id": pa.array(d["event_id"] + [r[0] for r in collide], pa.int64()),
            "ts": pa.array(ns + [r[1] for r in collide], pa.timestamp("ns")),
            "user_id": pa.array(d["user_id"] + [r[2] for r in collide], pa.int64()),
            "event_type": pa.array(
                d["event_type"] + [r[3] for r in collide], pa.string()
            ),
            "value": pa.array(d["value"] + [r[4] for r in collide], pa.float64()),
            "props": pa.array(d["props"] + ["{}"] * len(collide), pa.string()),
        }
    )
    pq.write_table(t, OUT / "events.parquet", store_schema=False)
    print(f"events: {src.num_rows} rows -> ns precision, +{len(collide)} sub-µs"
          f" collision rows (users {uid0}..{uid0 + 3})")


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    for t in COPY_VERBATIM:
        shutil.copyfile(SRC / f"{t}.parquet", OUT / f"{t}.parquet")
    _write_ns_events()

    con = duckdb.connect()
    docs = con.execute(f"SELECT * FROM read_parquet('{SRC}/documents.parquet')").df()
    base = int(docs["doc_id"].max()) + 1
    dup_text = str(docs.loc[docs["doc_id"] == 0, "text"].iloc[0])
    edge_texts = [
        "",                                   # empty body
        "   \t  ",                            # whitespace-only
        "x",                                  # single char
        "token",                              # single token
        "héllo wörld café naïve",             # latin-1-ish multi-byte
        "汉字テキスト 机器学习 データ",          # CJK, byte len >> char len
        "rocket 🚀 launch 🌕 emoji",           # astral-plane code points
        "!!! ??? ... ;;; ---",                # punctuation only, zero word tokens
        dup_text,                             # exact duplicate of doc 0
    ]
    extra = pd.DataFrame(
        {
            "doc_id": [base + i for i in range(len(edge_texts))],
            "text": edge_texts,
            "lang": ["en", "de", "fr", "es", "fr", "zh", "en", "es", "en"],
            "source": ["src_edge"] * (len(edge_texts) - 1) + ["src0"],
            "n_chars": [len(t) for t in edge_texts],
        }
    )

    # --- planted NEAR-duplicates (round-12, VERDICT r11 #2) ---------------
    # The exact duplicate above exercises only the hamming-0 / Jaccard-1
    # paths: a corpus where every banded match is an identical doc stays
    # green even if near-miss banding were broken.  Plant two true
    # near-dups, ids ≡ 0 (mod 10) so dedup_incremental_minhash's incoming
    # batch contains them (their source docs are ≢ 0 mod 10):
    #   - phash near-dup: one in-place char edit of doc 2's text, SEARCHED
    #     at build time to land at Hamming 1..3 of the 60-bit fns
    #     fingerprint (exact mirror of operators/multimodal.py::
    #     perceptual_hash's deterministic path) → mm_phash_dedup must
    #     surface a pair with 0 < hamming <= 3;
    #   - minhash near-dup: doc 1's text with its final 8 tokens replaced
    #     (3-token shingle Jaccard ~0.7, well above the 0.3 verify
    #     threshold but below 1.0) → dedup_minhash_lsh /
    #     dedup_incremental_minhash must surface a NON-exact match.
    import numpy as np

    def _phash60(text: str) -> int:
        n = len(text)
        if n == 0:
            return 0
        cp = np.fromiter(map(ord, text), dtype=np.int64, count=n)
        blk = (np.arange(n, dtype=np.int64) * 60) // n
        sums = np.bincount(blk, weights=cp, minlength=60).astype(np.int64)
        cnts = np.bincount(blk, minlength=60).astype(np.int64)
        bits = sums * n > int(cp.sum()) * cnts
        return int((np.int64(1) << np.nonzero(bits)[0]).sum())

    ph_src = str(docs.loc[docs["doc_id"] == 2, "text"].iloc[0])
    base_h = _phash60(ph_src)
    near_ph = None
    for pos in range(len(ph_src)):
        for delta in (1, 2, -1, -2):
            c = ord(ph_src[pos]) + delta
            if not (33 <= c < 127):
                continue
            cand = ph_src[:pos] + chr(c) + ph_src[pos + 1 :]
            if 1 <= bin(base_h ^ _phash60(cand)).count("1") <= 3:
                near_ph = cand
                break
        if near_ph is not None:
            break
    assert near_ph is not None, "no 1-char edit of doc 2 lands at hamming 1..3"

    mh_src = str(docs.loc[docs["doc_id"] == 1, "text"].iloc[0])
    toks = [t for t in mh_src.split(" ") if t]
    near_mh = " ".join(toks[:-8] + [f"zn{i}" for i in range(8)])
    sh = lambda ts: {tuple(ts[i : i + 3]) for i in range(len(ts) - 2)}
    a, b = sh(toks), sh([t for t in near_mh.split(" ") if t])
    jac = len(a & b) / len(a | b)
    assert 0.3 < jac < 1.0, f"minhash near-dup jaccard {jac} outside (0.3, 1)"

    # containment pair: the first 65% of doc 3's tokens — a strict prefix
    # chunk, so containment(chunk ⊆ doc 3) = 1.0 while Jaccard ≈ 0.6 (the
    # asymmetric superset/quotation signal dedup_containment exists for,
    # which NO symmetric-Jaccard threshold at 0.7 would flag).
    c_src = [t for t in str(docs.loc[docs["doc_id"] == 3, "text"].iloc[0]).split(" ") if t]
    chunk = " ".join(c_src[: (len(c_src) * 65) // 100])
    ja, jb = sh(c_src), sh([t for t in chunk.split(" ") if t])
    cont_j = len(ja & jb) / len(ja | jb)
    assert jb <= ja and 0.3 < cont_j < 0.7, f"containment-pair jaccard {cont_j}"
    print(f"near-dups: phash hamming {bin(base_h ^ _phash60(near_ph)).count('1')}"
          f" (vs doc 2), shingle jaccard {jac:.3f} (vs doc 1), "
          f"containment chunk jaccard {cont_j:.3f} (vs doc 3)")

    nbase = ((base + len(edge_texts) + 9) // 10) * 10
    near = pd.DataFrame(
        {
            "doc_id": [nbase, nbase + 10, nbase + 20],
            "text": [near_ph, near_mh, chunk],
            "lang": ["en", "en", "en"],
            "source": ["src_near", "src_near", "src_near"],
            "n_chars": [len(near_ph), len(near_mh), len(chunk)],
        }
    )
    # --- quantization-boundary docs (round-8 VERDICT #5) -----------------
    # Engineer the corpus so one token's unigram-NLL value
    # 1e6·(ln N − ln c) lands as close to a .5 rounding boundary as this
    # corpus size permits.  Knobs: m docs of the marker token 'zqb'
    # repeated 50× (c = 50m) plus f unique filler tokens (N = N0+50m+f).
    # Rational-approximation bounds cap the achievable proximity at
    # ~1/(2·#combinations) ≈ 1e-7 — thousands of ulps, but 100× tighter
    # than anything the natural corpus produces; the true ≤1-ulp straddle
    # (impossible to build into a small corpus) is proven pair-wise in
    # tests/test_detmath.py::test_boundary_pairs_straddle_and_det_ln_is_immune.
    # The retired libm-ln contracts are maximally fragile exactly here; the
    # det-ln contracts must stay green (checked by every edge replay).
    import numpy as np
    from decimal import Decimal, getcontext

    tok_df = pd.concat([docs, extra, near], ignore_index=True)
    n0 = int(
        duckdb.sql(
            "SELECT SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))"
            " FROM tok_df"
        ).fetchone()[0]
    )
    ms = np.arange(1, 41)
    fs = np.arange(0, 50001)
    best = (1.0, None)
    for m in ms:
        v = 1e6 * (np.log(n0 + 50 * m + fs) - np.log(50.0 * m))
        dist = np.abs((v % 1.0) - 0.5)
        i = int(dist.argmin())
        if dist[i] < best[0]:
            best = (float(dist[i]), (int(m), int(fs[i])))
    getcontext().prec = 50
    m, f = best[1]
    v_exact = (Decimal(n0 + 50 * m + f).ln() - Decimal(50 * m).ln()) * 10**6
    prox = abs(v_exact - (int(v_exact) + Decimal("0.5")))
    assert prox < Decimal("1e-5"), prox
    print(f"boundary docs: m={m} f={f} N={n0 + 50 * m + f} c={50 * m} "
          f"|v-boundary|={float(prox):.3e}")

    bbase = nbase + 21  # past the near-dup ids (nbase, nbase + 10, nbase + 20)
    btexts = [" ".join(["zqb"] * 50) for _ in range(m)]
    btexts += [
        " ".join(f"zf{j}" for j in range(i, min(i + 50, f)))
        for i in range(0, f, 50)
    ]
    boundary = pd.DataFrame(
        {
            "doc_id": [bbase + i for i in range(len(btexts))],
            "text": btexts,
            "lang": ["en"] * len(btexts),
            "source": ["src_boundary"] * len(btexts),
            "n_chars": [len(t) for t in btexts],
        }
    )

    out_docs = pd.concat([docs, extra, near, boundary], ignore_index=True)
    out_docs.to_parquet(OUT / "documents.parquet", index=False)

    emb = con.execute(f"SELECT * FROM read_parquet('{SRC}/embeddings.parquet')").df()
    vbase = int(emb["vec_id"].max()) + 1
    dim = len(emb["embedding"].iloc[0])
    dup_vec = [float(x) for x in emb.loc[emb["vec_id"] == 0, "embedding"].iloc[0]]
    one_hot = [0.0] * dim
    one_hot[0] = 1.0
    extra_emb = pd.DataFrame(
        {
            "vec_id": [vbase, vbase + 1, vbase + 2, vbase + 3],
            "embedding": [
                [0.0] * dim,                 # zero norm
                dup_vec,                     # exact duplicate of vec 0
                one_hot,                     # cosine -1 pair...
                [-x for x in one_hot],       # ...with this one
            ],
            "label": [0, int(emb.loc[emb["vec_id"] == 0, "label"].iloc[0]), 1, 1],
        }
    )
    out_emb = pd.concat([emb, extra_emb], ignore_index=True)
    # match source dtypes (label is int32, embedding list<float>)
    out_emb["label"] = out_emb["label"].astype("int32")
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema(SRC / "embeddings.parquet")
    pq.write_table(
        pa.Table.from_pandas(out_emb, schema=pa.schema([schema.field(i) for i in range(len(schema.names))]), preserve_index=False),
        OUT / "embeddings.parquet",
    )
    print(f"edge fixture at {OUT}: documents +{len(edge_texts)}, embeddings +4 (dim={dim})")


if __name__ == "__main__":
    main()
