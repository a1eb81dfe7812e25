"""Deduplication operators for training-data pipelines (SURVEY.md §7 ph. 6).

Exact, MinHash+LSH, SimHash, n-gram-Jaccard, and embedding-cosine near-dup —
all as deterministic column-expression pipelines so the DuckDB oracle can
replicate them value-for-value (see flink_net_spark.functions.hashing).

Scale design:
  - exact dedup: hash-groupBy — one shuffle on the content hash.
  - MinHash+LSH: shingle→sign→band→bucket-join.  The candidate join is an
    EQUI-join on (band_index, band_key): at 100 TB this is the only shuffle
    and it only moves (doc_id, band_key) pairs, never the text.  Verify
    (exact Jaccard) touches candidates only.
  - n-gram Jaccard: blocked all-pairs inside (lang, length-bucket) groups —
    the block key is the shuffle key; no global cartesian.
  - embedding near-dup: all-pairs is the *oracle* shape; the scale path is
    the LSH bucket variant in queries/similarity.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_net_spark.functions import hashing as H
from flink_net_spark.queries import query
from flink_net_spark.tables import load_table, spread_small_scan

MINHASH_K = 16
LSH_BANDS = 8  # 2 rows per band
JACCARD_VERIFY_THRESHOLD = 0.3
NGRAM_JACCARD_THRESHOLD = 0.05
COSINE_DUP_THRESHOLD = 0.4


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text)   AS content_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*)    AS n_copies
    FROM documents
    GROUP BY md5(text)
    ORDER BY keep_doc_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy; keeps the lowest doc_id of each
    duplicate group (deterministic canonical pick)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keep_doc_id")
    )


def _spark_shingle_hash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shingle/hash HOFs are the CPU-heavy map stage: spread a sub-splittable
    # small scan across cores before computing them (no-op at real scale)
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    return d.withColumn("th", F.expr(H.spark_token_hashes("text"))).select(
        "doc_id",
        F.expr(H.spark_hashed_shingles("th")).alias("sh"),
    )


# token-hash subquery feeding every shingle-based oracle
_DUCK_TH_DOCS = f"(SELECT *, {H.duckdb_token_hashes('text')} AS th FROM documents)"
_DUCK_SHINGLES = H.duckdb_hashed_shingles("th")

# Shared CTE chain: documents → shingles → minhash sigs → LSH bands →
# candidates → exact-Jaccard-verified pairs.  Used by dedup_minhash_lsh and
# (extended with a recursive component search) dedup_resolve_groups.
_DUCK_MINHASH_PAIR_CTES = f"""
    sh AS (
        SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM {_DUCK_TH_DOCS}
    ),
    sig AS (
        SELECT doc_id, sh, {H.duckdb_minhash_sig("sh", MINHASH_K)} AS sig FROM sh
    ),
    bands AS (
        SELECT doc_id, b,
               sig[2 * b + 1] * {H.MOD} + sig[2 * b + 2] AS band_key
        FROM sig CROSS JOIN UNNEST(range(0, {LSH_BANDS})) AS t(b)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    verified AS (
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(x.sh, y.sh)) * 1.0
                 / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jaccard
        FROM cand c
        JOIN sh x ON x.doc_id = c.doc_a
        JOIN sh y ON y.doc_id = c.doc_b
    )
"""


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified near-dup pairs (doc_a < doc_b, jaccard ≥ threshold).

    The shingle DF feeds three subtrees (signatures + both verify sides);
    persist() shares one scan/compute across them — Catalyst does not
    dedupe common subtrees on its own."""
    sh = _spark_shingle_hash_df(spark, sf_dir).persist()
    sig = sh.withColumn("sig", F.expr(H.spark_minhash_sig("sh", MINHASH_K)))
    bands = sig.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {LSH_BANDS - 1}), "
                f"b -> struct(b AS b, sig[2*b] * {H.MOD}L + sig[2*b+1] AS band_key))"
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.b").alias("b"), F.col("bk.band_key").alias("band_key"))

    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    x = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    y = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .withColumn("jaccard", inter * F.lit(1.0) / union)
        .filter(F.col("jaccard") >= JACCARD_VERIFY_THRESHOLD)
    )


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_DUCK_MINHASH_PAIR_CTES}
    SELECT doc_a, doc_b, ROUND(jaccard, 4) AS jaccard
    FROM verified
    WHERE jaccard >= {JACCARD_VERIFY_THRESHOLD}
    ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection: word-3gram shingles → 16 minhashes →
    8 bands × 2 rows → bucket-join candidates → exact-Jaccard verify.

    Fully deterministic (fixed hash coefficients), so the oracle replicates
    the *pipeline*, not just the ground truth."""
    return (
        _minhash_pairs(spark, sf_dir)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@query(
    "dedup_resolve_groups",
    oracle=f"""
    WITH RECURSIVE {_DUCK_MINHASH_PAIR_CTES},
    pairs AS (
        SELECT doc_a, doc_b FROM verified WHERE jaccard >= {JACCARD_VERIFY_THRESHOLD}
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(n, m) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.n, e.v FROM reach r JOIN edges e ON r.m = e.u
    )
    SELECT n AS doc_id,
           LEAST(n, MIN(m)) AS group_id,
           (LEAST(n, MIN(m)) = n) AS keep
    FROM reach
    GROUP BY n
    ORDER BY doc_id
    """,
)
def dedup_resolve_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → keep-set resolution: connected components over the verified
    MinHash near-dup pairs by iterative min-label propagation; the minimum
    doc_id of each component is the canonical survivor (``keep = true``) —
    the near-dup generalization of ``dedup_exact``'s MIN(doc_id) pick.

    Scale: each iteration is one shuffle join on the (small) edge set —
    pairs, not documents.  Iteration count = component diameter; near-dup
    clusters are dense, so this converges in a handful of rounds (the same
    min-propagation step GraphX/GraphFrames connected components uses).
    ``localCheckpoint`` truncates lineage each round so the plan stays
    O(1) per iteration instead of accumulating every prior join (a 50-round
    un-truncated loop compiles a 1000+-join plan and recomputes from
    scratch on any cache eviction).  The oracle walks the same components
    with a recursive CTE."""
    pairs = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(50):  # bound: diameter of the largest component
        nbr = (
            edges.join(labels.withColumnRenamed("id", "v_id"), F.col("v") == F.col("v_id"))
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.withColumnRenamed("label", "old_label")
            .join(nbr.withColumnRenamed("u", "id"), "id", "left")
            .select(
                "id",
                F.least(
                    F.col("old_label"), F.coalesce(F.col("nbr_min"), F.col("old_label"))
                ).alias("label"),
                "old_label",
            )
            .localCheckpoint()  # eager: materializes + truncates lineage
        )
        changed = new_labels.filter(F.col("label") != F.col("old_label")).count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            break
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("group_id"),
        (F.col("label") == F.col("id")).alias("keep"),
    ).orderBy("doc_id")


_NGRAM_BLOCK_CAP = 1000


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH h0 AS (
        SELECT doc_id, lang, n_chars // 50 AS len_bucket, {_DUCK_SHINGLES} AS sh
        FROM {_DUCK_TH_DOCS}
    ),
    h AS (
        SELECT * FROM (
            SELECT h0.*, ROW_NUMBER() OVER (PARTITION BY lang, len_bucket
                                            ORDER BY doc_id) AS rn
            FROM h0
        ) WHERE rn <= {_NGRAM_BLOCK_CAP}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
    FROM h a
    JOIN h b ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh)) * 1.0
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
          >= {NGRAM_JACCARD_THRESHOLD}
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked n-gram Jaccard: all-pairs *within* (lang, length-bucket)
    blocks — the block key carries the shuffle, so no global cartesian.

    Blocks are CAPPED at 1000 docs (row_number by doc_id): at 100 TB a hot
    block (e.g. ``(en, common-length)``) would otherwise go quadratic.
    Bounded blocked all-pairs is the documented contract; unbounded
    near-dup coverage is ``dedup_minhash_lsh``'s job."""
    w_block = None  # Window import below keeps module import light
    from pyspark.sql.window import Window

    w_block = Window.partitionBy("lang", "len_bucket").orderBy("doc_id")
    sh = (
        spread_small_scan(load_table(spark, sf_dir, "documents"))
        .withColumn("th", F.expr(H.spark_token_hashes("text")))
        .select(
            "doc_id",
            "lang",
            (F.col("n_chars") / 50).cast("long").alias("len_bucket"),
            F.expr(H.spark_hashed_shingles("th")).alias("sh"),
        )
        .withColumn("rn", F.row_number().over(w_block))
        .filter(F.col("rn") <= _NGRAM_BLOCK_CAP)
        .drop("rn")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    jac = inter * F.lit(1.0) / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= NGRAM_JACCARD_THRESHOLD)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round("jaccard", 4).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


_SIMHASH_BITS = 60  # sign-safe in a BIGINT; 32 bits cannot separate the synthetic vocab


def _spark_simhash(features: str = "sh") -> str:
    """Simhash over a feature-hash ARRAY COLUMN (3-gram shingle hashes).
    Features must genuinely differ between near-but-not-duplicate docs;
    distinct-WORD features degenerate on a shared vocabulary (every doc
    carries most words, so every doc hashes alike — observed: 5M bogus
    pairs at sf0.1)."""
    bit_sum = (
        f"transform(sequence(0, {_SIMHASH_BITS - 1}), b -> "
        f"CASE WHEN aggregate({features}, 0L, (acc, h) -> acc + "
        f"CASE WHEN (h div shiftleft(1L, b)) % 2 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN shiftleft(1L, b) ELSE 0L END)"
    )
    return f"aggregate({bit_sum}, 0L, (acc, x) -> acc + x)"


def _duckdb_simhash(features: str = "sh") -> str:
    bit = (
        f"CASE WHEN list_sum([CASE WHEN (h // (1::BIGINT << b)) % 2 = 1 "
        f"THEN 1 ELSE -1 END for h in {features}]) > 0 THEN (1::BIGINT << b) ELSE 0 END"
    )
    return f"list_sum([{bit} for b in range(0, {_SIMHASH_BITS})])"


@query(
    "dedup_simhash",
    oracle=f"""
    SELECT doc_id, CAST({_duckdb_simhash()} AS BIGINT) AS simhash
    FROM (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM {_DUCK_TH_DOCS})
    ORDER BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash over distinct word tokens: per bit, sign of the sum of
    ±1 votes from each token hash.  Near-dups then pair by low Hamming
    distance (see ``dedup_simhash_pairs``)."""
    sh = _spark_shingle_hash_df(spark, sf_dir)
    return sh.select("doc_id", F.expr(_spark_simhash()).alias("simhash")).orderBy("doc_id")


_HAMMING_MAX = 3
_SIMHASH_BANDS = 4  # 15-bit bands; pigeonhole: ≤3 differing bits touch ≤3 of 4 bands


@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, CAST({_duckdb_simhash()} AS BIGINT) AS simhash
        FROM (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM {_DUCK_TH_DOCS})
    ),
    bands AS (
        SELECT doc_id, simhash, b, (simhash >> (15 * b)) & 32767 AS band_val
        FROM sh CROSS JOIN UNNEST(range(0, {_SIMHASH_BANDS})) AS t(b)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sa, b.simhash AS sb
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= {_HAMMING_MAX}
    ORDER BY doc_a, doc_b
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairing by banded Hamming join.

    The 32-bit simhash splits into 4 byte-bands; any pair within Hamming
    distance ≤3 must agree on ≥1 band (pigeonhole), so candidates come from
    an EQUI-join on (band, band_val) — at 100 TB the shuffle moves only
    (doc_id, simhash, band_val) triples, never text, and the verify step is
    a single bit_count(xor) per candidate.  This is the pairing step the
    round-1 docstring promised (reference analog: content-identity dedup is
    the reference's only dedup concept; SimHash banding is our north-star
    superset)."""
    # persist: without it Catalyst's projection collapse inlines the whole
    # text→token→shingle→simhash expression into BOTH join sides and the
    # verify projection, recomputing the full pipeline per candidate row
    sh = (
        _spark_shingle_hash_df(spark, sf_dir)
        .select("doc_id", F.expr(_spark_simhash()).alias("simhash"))
        .persist()
    )
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {_SIMHASH_BANDS - 1}), "
                f"b -> struct(b AS b, (simhash div shiftleft(1L, 15 * b)) % 32768 AS band_val))"
            )
        ).alias("bv"),
    ).select("doc_id", "simhash", F.col("bv.b").alias("b"), F.col("bv.band_val").alias("band_val"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("CAST(bit_count(sa ^ sb) AS INT)"))
        .filter(F.col("hamming") <= _HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


@query(
    "dedup_embedding_cosine",
    scale_safe=False,
    oracle=f"""
    WITH e AS (
        SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding])) AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_sum([a.v[i] * b.v[i] for i in range(1, 65)]) / (a.nrm * b.nrm), 4)
               AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_sum([a.v[i] * b.v[i] for i in range(1, 65)]) / (a.nrm * b.nrm)
          >= {COSINE_DUP_THRESHOLD}
    ORDER BY vec_a, vec_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (all-pairs form — correctness oracle;
    the LSH-bucketed scale path is ``sim_ann_lsh``).  Dot products in
    column expressions (zip_with + aggregate), no Python."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
        F.expr(
            "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            "0.0D, (acc, x) -> acc + x))"
        ).alias("nrm"),
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)")
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
        .select("vec_a", "vec_b", F.round("cosine", 4).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )
