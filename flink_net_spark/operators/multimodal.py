"""Multimodal columns: opaque binary payloads + typed metadata.

Model: media (image/audio/video) travels as a ``binary`` column next to a
typed metadata struct ``{mime, width, height, n_bytes}`` — the reference's
opaque-POCO/byte[] serializer surface maps here
(FlinkDotNet/FlinkDotNet.Core.Abstractions/Execution/SerializerRegistry.cs:20-28
registers ``byte[]`` as a first-class record type).

Decode/feature-extract run as Arrow-batched ``mapInPandas`` — the payload
bytes stay executor-side, one Arrow batch per partition slice, never
row-at-a-time and never on the driver.  Real codecs are a live hook:
``decode_image`` / ``resize_image`` / ``frame_sample`` / ``perceptual_hash``
take a ``use_pil``/``use_av`` flag that is resolved ON THE DRIVER (probed
there when left ``None``) and shipped with the plan, so every executor
takes the same branch — a heterogeneous cluster (codec installed on some
executors only) fails fast with an ImportError instead of silently mixing
codec outputs in one result (round-11 ADVICE).  Rows the real codec cannot
parse still fall back per row to the deterministic FNSB-container maths —
one static output schema either way, with a ``codec`` column recording
which path each row took.  ``fake_decode_stats`` / ``fake_resize`` /
``fake_frame_sample`` are the fallback maths exposed directly (stable
oracles regardless of installed codecs) and are what oracle queries use.

Scale: payload columns dominate bytes at 100 TB — keep them OUT of shuffles
(derive features first, then drop the payload before any groupBy/join; all
helpers here project the payload away in their output).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYLOAD_MAGIC = b"FNSB"  # fake container header: magic | w:4 ascii | h:4 ascii | body
HEADER_LEN = 12


def _pil_available() -> bool:
    """Driver-side PIL probe — the plan-shipped codec decision (see the
    module docstring: one uniform branch for every executor)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _av_available() -> bool:
    """Driver-side PyAV probe (same contract as :func:`_pil_available`)."""
    try:
        import av  # noqa: F401

        return True
    except ImportError:
        return False


def attach_payloads(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a deterministic multimodal table from a text table: payload =
    magic + zero-padded ascii width/height (derived from the id) + body
    bytes; metadata struct alongside.  Column expressions only — the
    construction itself is oracle-checkable byte-for-byte."""
    w = (F.col(id_col) % 640 + 16).cast("int")
    h = (F.col(id_col) % 480 + 16).cast("int")
    header = F.concat(
        F.lit("FNSB"),
        F.lpad(w.cast("string"), 4, "0"),
        F.lpad(h.cast("string"), 4, "0"),
    )
    payload = F.concat(header, F.col(text_col)).cast("binary")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("image/x-fns").alias("mime"),
            w.cast("long").alias("width"),
            h.cast("long").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    use_pil: bool | None = None,
) -> DataFrame:
    """Image decode via Arrow-batched ``mapInPandas`` with a REAL codec hook.

    The codec decision is made DRIVER-SIDE (``use_pil=None`` probes PIL on
    the driver) and ships with the plan, so every executor takes the same
    branch; an executor missing the promised codec raises instead of
    silently diverging (round-11 ADVICE).  Per row:

    - PIL promised and the payload is a decodable image → real decode:
      ``width``/``height`` from the codec, ``body_checksum``/``body_bytes``
      over the decoded pixel buffer, ``codec = 'pil:<format>'``.
    - no PIL but the payload sniffs as PNG → the bounded in-repo stdlib
      decoder (:mod:`flink_net_spark.operators.png_stdlib` — 8-bit
      gray/RGB/RGBA, all five filters, no interlace): same output fields
      over the decoded RGB buffer, ``codec = 'png-stdlib'``.  Stdlib-only
      and deterministic, so it is identical on every executor; unsupported
      PNG variants raise inside the decoder and fall through — never a
      wrong decode.
    - otherwise → the deterministic FNSB-container parse (identical maths to
      :func:`fake_decode_stats`), ``codec = 'fns'`` (or ``'raw'`` when the
      magic header is absent).

    The output schema is identical on every path — required anyway by
    ``mapInPandas``'s static schema, and it means a job built against the
    synthetic corpus runs unchanged on real images."""
    from flink_net_spark.session import ship_package_to_executors

    ship_package_to_executors(df.sparkSession)
    if use_pil is None:
        use_pil = _pil_available()

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io

        from flink_net_spark.operators.png_stdlib import PNG_SIG, decode_png_rgb8

        if use_pil:
            import PIL.Image as _Image  # promised by the driver: missing = loud
        else:
            _Image = None
        for pdf in batches:
            ids, widths, heights, sums, md5s, sizes, codecs = [], [], [], [], [], [], []
            for i, raw in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(raw)
                ids.append(int(i))
                if _Image is not None:
                    try:
                        img = _Image.open(io.BytesIO(b))
                        img.load()
                        px = img.tobytes()
                        widths.append(int(img.size[0]))
                        heights.append(int(img.size[1]))
                        sums.append(int(sum(px) % 1_000_000_007))
                        md5s.append(hashlib.md5(px).hexdigest())
                        sizes.append(len(px))
                        codecs.append("pil:" + (img.format or "unknown").lower())
                        continue
                    except Exception:
                        pass  # not a real image — deterministic container path
                elif b[:8] == PNG_SIG:
                    try:
                        w0, h0, px = decode_png_rgb8(b)
                        widths.append(w0)
                        heights.append(h0)
                        sums.append(int(sum(px) % 1_000_000_007))
                        md5s.append(hashlib.md5(px).hexdigest())
                        sizes.append(len(px))
                        codecs.append("png-stdlib")
                        continue
                    except ValueError:
                        pass  # unsupported variant — deterministic path
                ok = b[:4] == PAYLOAD_MAGIC
                widths.append(int(b[4:8]) if ok else -1)
                heights.append(int(b[8:12]) if ok else -1)
                body = b[HEADER_LEN:] if ok else b
                sums.append(int(sum(body) % 1_000_000_007))
                md5s.append(hashlib.md5(body).hexdigest())
                sizes.append(len(body))
                codecs.append("fns" if ok else "raw")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": widths,
                    "height": heights,
                    "body_checksum": sums,
                    "body_md5": md5s,
                    "body_bytes": sizes,
                    "codec": codecs,
                }
            )

    return df.mapInPandas(
        decode,
        "doc_id BIGINT, width BIGINT, height BIGINT, body_checksum BIGINT, "
        "body_md5 STRING, body_bytes BIGINT, codec STRING",
    )


def fake_decode_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 'decode': parse the fake header + body checksum via
    mapInPandas.  Identical plumbing to a real decoder: binary in, struct
    of decoded properties out, Arrow-batched, payload dropped after.

    ``body_md5`` is the representation-independent body digest: md5 over
    the raw body OCTETS, which equals DuckDB's ``md5(text)`` (VARCHAR md5
    hashes UTF-8 bytes) by construction — exact agreement for empty bodies
    and multi-byte characters alike.  ``body_checksum`` (byte sum mod 1e9+7)
    stays for cheap in-repo assertions but is NOT oracle-portable: a
    code-point sum differs from a UTF-8 byte sum on any non-ASCII body."""
    from flink_net_spark.session import ship_package_to_executors

    ship_package_to_executors(df.sparkSession)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, widths, heights, sums, md5s, sizes = [], [], [], [], [], []
            for i, raw in zip(pdf[id_col], pdf["payload"]):
                b = bytes(raw)
                ok = b[:4] == PAYLOAD_MAGIC
                ids.append(int(i))
                widths.append(int(b[4:8]) if ok else -1)
                heights.append(int(b[8:12]) if ok else -1)
                body = b[HEADER_LEN:] if ok else b
                sums.append(int(sum(body) % 1_000_000_007))
                md5s.append(hashlib.md5(body).hexdigest())
                sizes.append(len(body))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": widths,
                    "height": heights,
                    "body_checksum": sums,
                    "body_md5": md5s,
                    "body_bytes": sizes,
                }
            )

    return df.mapInPandas(
        decode,
        "doc_id BIGINT, width BIGINT, height BIGINT, body_checksum BIGINT, "
        "body_md5 STRING, body_bytes BIGINT",
    )


def payload_features(df: DataFrame, dim: int = 16, id_col: str = "doc_id") -> DataFrame:
    """Deterministic feature extraction: fold the payload's CODE POINTS into
    a fixed-dim float vector (per-dim stride sums) — the mapInPandas shape
    of a real embedding model (payload → fixed-length array<float>), minus
    the model.  Code points (via :func:`_frame_units`), not bytes, so the
    maths match a character-indexed SQL oracle on multi-byte text; latin-1
    fallback keeps arbitrary binary deterministic.  Output drops the
    payload (shuffle hygiene)."""
    from flink_net_spark.session import ship_package_to_executors

    ship_package_to_executors(df.sparkSession)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for i, raw in zip(pdf[id_col], pdf["payload"]):
                s = _frame_units(bytes(raw))
                acc = [0] * dim
                for pos, ch in enumerate(s):
                    acc[pos % dim] = (acc[pos % dim] + ord(ch)) % 4096
                ids.append(int(i))
                vecs.append([float(x) / 4096.0 for x in acc])
            yield pd.DataFrame({"doc_id": ids, "features": vecs})

    return df.mapInPandas(extract, f"doc_id BIGINT, features ARRAY<FLOAT>")


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
    use_av: bool | None = None,
) -> DataFrame:
    """Video frame sampling (1 clip row → N frame rows) with a REAL codec
    hook: ``av`` (PyAV/ffmpeg) availability is decided DRIVER-SIDE
    (``use_av=None`` probes it there) and shipped with the plan; rows it
    can demux get every ``every_n``-th decoded video frame (checksum over
    the frame's plane bytes, ``codec='av'``); everything else takes the
    deterministic FNSB path (``FRAME_BYTES``-sized pseudo-frames, identical
    maths to :func:`fake_frame_sample`, ``codec='fns'``).  One static output
    schema on both paths."""
    from flink_net_spark.session import ship_package_to_executors

    ship_package_to_executors(df.sparkSession)
    if use_av is None:
        use_av = _av_available()

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        if use_av:
            import av as _av  # promised by the driver: missing = loud
        else:
            _av = None
        for pdf in batches:
            ids, idxs, sums, codecs = [], [], [], []
            for i, raw in zip(pdf[id_col], pdf["payload"]):
                b = bytes(raw)
                if _av is not None:
                    try:
                        with _av.open(io.BytesIO(b)) as container:
                            for k, frame in enumerate(container.decode(video=0)):
                                if k % every_n:
                                    continue
                                buf = bytes(frame.planes[0])
                                ids.append(int(i))
                                idxs.append(k)
                                sums.append(int(sum(buf) % 1_000_000_007))
                                codecs.append("av")
                        continue
                    except Exception:
                        pass  # not a real video — deterministic container path
                body = _frame_units(b[HEADER_LEN:] if b[:4] == PAYLOAD_MAGIC else b)
                for k in range(0, len(body) // FRAME_BYTES, every_n):
                    frame_s = body[k * FRAME_BYTES : (k + 1) * FRAME_BYTES]
                    ids.append(int(i))
                    idxs.append(k)
                    sums.append(sum(ord(c) for c in frame_s))
                    codecs.append("fns")
            yield pd.DataFrame(
                {"doc_id": ids, "frame_index": idxs, "checksum": sums, "codec": codecs}
            )

    return df.mapInPandas(
        sample, "doc_id BIGINT, frame_index BIGINT, checksum BIGINT, codec STRING"
    )


FRAME_BYTES = 32  # fake codec: the body is a sequence of 32-CODE-POINT "frames"


def _frame_units(body: bytes) -> str:
    """Decode the body into the unit stream the fake framing runs over:
    CODE POINTS, not bytes.  UTF-8 when the body decodes (so the maths are
    representation-independent and match a character-indexed SQL oracle on
    multi-byte text — the round-7 edge-fixture lesson: byte-framing drifted
    from the oracle's ``substring``/``ascii`` char maths on CJK/emoji);
    latin-1 otherwise (bijective byte↔code-point, so arbitrary binary still
    frames deterministically)."""
    try:
        return body.decode("utf-8")
    except UnicodeDecodeError:
        return body.decode("latin-1")


def fake_frame_sample(
    df: DataFrame, every_n: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic frame sampling: treat the payload body as concatenated
    ``FRAME_BYTES``-code-point frames, keep every ``every_n``-th COMPLETE
    frame, emit one row per kept frame with its code-point checksum.  This
    is the 1→N explode shape of real video sampling (one clip row → many
    frame rows), Arrow-batched, payload dropped from the output.

    Scale: output rows ≈ input_units / (FRAME_BYTES · every_n) — the UDF is
    the hot path, so it stays vectorizable per batch and never shuffles the
    payload; downstream ops see only (doc_id, frame_index, checksum)."""
    from flink_net_spark.session import ship_package_to_executors

    ship_package_to_executors(df.sparkSession)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for i, raw in zip(pdf[id_col], pdf["payload"]):
                b = bytes(raw)
                body = _frame_units(b[HEADER_LEN:] if b[:4] == PAYLOAD_MAGIC else b)
                for k in range(0, len(body) // FRAME_BYTES, every_n):
                    frame = body[k * FRAME_BYTES : (k + 1) * FRAME_BYTES]
                    ids.append(int(i))
                    idxs.append(k)
                    sums.append(sum(ord(c) for c in frame))
            yield pd.DataFrame({"doc_id": ids, "frame_index": idxs, "checksum": sums})

    return df.mapInPandas(sample, "doc_id BIGINT, frame_index BIGINT, checksum BIGINT")


def resize_image(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    use_pil: bool | None = None,
) -> DataFrame:
    """Image resize to (``width``, ``height``) with a REAL codec hook: PIL
    availability is decided DRIVER-SIDE (plan-shipped flag); decodable rows
    are resampled and re-encoded as PNG (``codec='pil'``); non-image rows
    take the deterministic path — FNSB header rewritten to the target dims,
    body byte-stride-downsampled (``codec='fns'``).  Bytes-in/bytes-out,
    payload stays executor-side, one static output schema on both paths."""
    from flink_net_spark.session import ship_package_to_executors

    ship_package_to_executors(df.sparkSession)
    if use_pil is None:
        use_pil = _pil_available()

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        if use_pil:
            import PIL.Image as _Image  # promised by the driver: missing = loud
        else:
            _Image = None
        for pdf in batches:
            ids, payloads, widths, heights, codecs = [], [], [], [], []
            for i, raw in zip(pdf[id_col], pdf["payload"]):
                b = bytes(raw)
                ids.append(int(i))
                if _Image is not None:
                    try:
                        img = _Image.open(io.BytesIO(b))
                        img.load()
                        out = io.BytesIO()
                        img.resize((width, height)).save(out, format="PNG")
                        payloads.append(out.getvalue())
                        widths.append(width)
                        heights.append(height)
                        codecs.append("pil")
                        continue
                    except Exception:
                        pass  # not a real image — deterministic container path
                ok = b[:4] == PAYLOAD_MAGIC
                body = (b[HEADER_LEN:] if ok else b)[::2]
                header = PAYLOAD_MAGIC + b"%04d%04d" % (width, height)
                payloads.append(header + body)
                widths.append(width)
                heights.append(height)
                codecs.append("fns" if ok else "raw")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "width": widths,
                    "height": heights,
                    "codec": codecs,
                }
            )

    return df.mapInPandas(
        resize, "doc_id BIGINT, payload BINARY, width INT, height INT, codec STRING"
    )


def fake_resize(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 'half-scale resize': keep every 2nd body byte, rebuild
    the header with halved dimensions — bytes-in/bytes-out mapInPandas, the
    exact plumbing of a real thumbnailer (payload transforms executor-side;
    metadata struct recomputed to match)."""
    from flink_net_spark.session import ship_package_to_executors

    ship_package_to_executors(df.sparkSession)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, widths, heights = [], [], [], []
            for i, raw in zip(pdf[id_col], pdf["payload"]):
                b = bytes(raw)
                ok = b[:4] == PAYLOAD_MAGIC
                w = int(b[4:8]) // 2 if ok else -1
                h = int(b[8:12]) // 2 if ok else -1
                body = (b[HEADER_LEN:] if ok else b)[::2]
                header = PAYLOAD_MAGIC + b"%04d%04d" % (max(w, 0), max(h, 0))
                ids.append(int(i))
                payloads.append(header + body)
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads, "width": widths, "height": heights}
            )

    return df.mapInPandas(resize, "doc_id BIGINT, payload BINARY, width INT, height INT")


PHASH_BITS = 60  # 4 x 15-bit bands downstream (the dedup_simhash_pairs shape)


def perceptual_hash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    use_pil: bool | None = None,
) -> DataFrame:
    """Perceptual fingerprint (aHash / blockhash family) with a REAL codec
    hook — the image-dedup primitive (reference capability anchor: the
    binary-payload POCO surface, SerializerRegistry.cs:20-28, which SURVEY
    maps to multimodal columns).

    The PIL decision is DRIVER-SIDE and plan-shipped (``use_pil=None``
    probes the driver) so all executors agree — a cluster where only some
    executors carry PIL raises instead of silently mixing pil- and
    fns-coded fingerprints in one banded join (round-11 ADVICE); the
    ``codec`` column additionally records the per-row path so any mix IS
    data (queries/llm_ops.py::mm_phash_stats counts it under the oracle).

    - ``use_pil`` and the payload decodable → real aHash: grayscale,
      resample to 10×6 (= ``PHASH_BITS`` pixels), each bit = pixel above
      the mean (``codec='pil'``).
    - no PIL but the payload sniffs as PNG → the same aHash pipeline over
      the bounded in-repo stdlib decoder (``codec='png-stdlib'``): PIL's
      exact integer luma formula, box-average resample to 10×6 (PIL's
      default resize is bicubic, so cross-codec fingerprints are NOT
      comparable — fingerprints are codec-scoped, which is exactly why the
      codec column propagates), threshold in integer cross-multiplication.
      Deterministic and stdlib-only: identical on every executor.
    - otherwise → the deterministic FNSB path over the decoded unit stream
      (:func:`_frame_units` code points — the fake corpus's "pixels"):
      position p of an n-unit body falls in block ``p*60 // n``; bit b =
      block b's code-point mean above the body mean, compared in exact
      integer cross-multiplication (``sum_b * n > total * n_b``) so a SQL
      oracle reproduces every bit (``codec='fns'``/``'raw'``).

    Near-duplicate payloads (small edits) move few block means across the
    body mean, so they land within small Hamming distance — pair them with
    the banded equi-join in queries/llm_ops.py::mm_phash_dedup, never a
    cartesian.  Arrow-batched, numpy-vectorized per row-batch; payload
    dropped from the output (shuffle hygiene)."""
    from flink_net_spark.session import ship_package_to_executors

    ship_package_to_executors(df.sparkSession)
    if use_pil is None:
        use_pil = _pil_available()

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np

        from flink_net_spark.operators.png_stdlib import (
            PNG_SIG,
            decode_png_rgb8,
            grayscale_rgb8,
        )

        if use_pil:
            import PIL.Image as _Image  # promised by the driver: missing = loud
        else:
            _Image = None
        for pdf in batches:
            ids, hashes, codecs = [], [], []
            for i, raw in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(raw)
                ids.append(int(i))
                if _Image is not None:
                    try:
                        img = _Image.open(io.BytesIO(b))
                        img.load()
                        px = np.asarray(
                            img.convert("L").resize((10, 6)), dtype=np.int64
                        ).ravel()
                        bits = px * px.size > int(px.sum())
                        hashes.append(int((np.int64(1) << np.nonzero(bits)[0]).sum()))
                        codecs.append("pil")
                        continue
                    except Exception:
                        pass  # not a real image — deterministic container path
                elif b[:8] == PNG_SIG:
                    try:
                        w0, h0, px3 = decode_png_rgb8(b)
                        lum = grayscale_rgb8(px3, w0, h0)
                        # box-average resample to 10×6: pixel (y, x) lands in
                        # cell (y*6//h, x*10//w); bit = cell mean above the
                        # image mean, in exact integer cross-multiplication
                        ys = (np.arange(h0, dtype=np.int64) * 6) // h0
                        xs = (np.arange(w0, dtype=np.int64) * 10) // w0
                        cells = np.zeros((6, 10), dtype=np.int64)
                        cnts = np.zeros((6, 10), dtype=np.int64)
                        np.add.at(cells, (ys[:, None], xs[None, :]), lum)
                        np.add.at(cnts, (ys[:, None], xs[None, :]), 1)
                        bits = (cells * lum.size > int(lum.sum()) * cnts).ravel()
                        hashes.append(int((np.int64(1) << np.nonzero(bits)[0]).sum()))
                        codecs.append("png-stdlib")
                        continue
                    except ValueError:
                        pass  # unsupported variant — deterministic path
                ok = b[:4] == PAYLOAD_MAGIC
                s = _frame_units(b[HEADER_LEN:] if ok else b)
                n = len(s)
                if n == 0:
                    hashes.append(0)
                    codecs.append("fns" if ok else "raw")
                    continue
                cp = np.fromiter(map(ord, s), dtype=np.int64, count=n)
                blk = (np.arange(n, dtype=np.int64) * PHASH_BITS) // n
                sums = np.bincount(blk, weights=cp, minlength=PHASH_BITS).astype(
                    np.int64
                )
                cnts = np.bincount(blk, minlength=PHASH_BITS).astype(np.int64)
                bits = sums * n > int(cp.sum()) * cnts
                hashes.append(int((np.int64(1) << np.nonzero(bits)[0]).sum()))
                codecs.append("fns" if ok else "raw")
            yield pd.DataFrame({"doc_id": ids, "phash": hashes, "codec": codecs})

    return df.mapInPandas(phash, "doc_id BIGINT, phash BIGINT, codec STRING")


AUDIO_FRAME = 32  # code points per analysis frame (the fake corpus's "samples")


def _audio_units(b: bytes):
    """Decode a payload into the int64 unit stream the audio operators
    frame — ONE decode stage shared by :func:`audio_energy` and
    :func:`audio_frames` so the per-frame stream and the per-clip summary
    can never disagree on the same document.

    RIFF/WAVE payloads take the REAL stdlib-:mod:`wave` PCM branch when
    they parse as 16-bit PCM (any channel count — interleaved samples form
    the unit stream, like a mono downmix-free energy pass).  Anything the
    codec rejects (compressed/ADPCM formats, truncated chunks, non-16-bit
    widths) falls back to the deterministic fake-unit branch instead of
    failing the task — decode robustness is a per-ROW property, never a
    job-level one."""
    import io
    import wave

    import numpy as np

    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        try:
            with wave.open(io.BytesIO(b)) as w:
                if w.getsampwidth() == 2:
                    pcm = w.readframes(w.getnframes())
                    return np.frombuffer(
                        pcm[: len(pcm) - (len(pcm) % 2)], dtype="<i2"
                    ).astype(np.int64)
        except (wave.Error, EOFError):
            pass
    s = _frame_units(b[HEADER_LEN:] if b[:4] == PAYLOAD_MAGIC else b)
    return np.fromiter(map(ord, s), dtype=np.int64, count=len(s))


def audio_frames(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-frame energy stream (doc_id, k, e) from the same decode stage as
    :func:`audio_energy` — the frame-level output segmentation operators
    (VAD islands, diarization windows) consume.  Complete frames only;
    exact integer energies; numpy-vectorized per Arrow batch."""
    from flink_net_spark.session import ship_package_to_executors

    ship_package_to_executors(df.sparkSession)

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, ks, es = [], [], []
            for i, raw in zip(pdf[id_col], pdf[payload_col]):
                units = _audio_units(bytes(raw))
                n = len(units) // AUDIO_FRAME
                if n == 0:
                    continue
                cp = units[: n * AUDIO_FRAME]
                e = (cp * cp).reshape(n, AUDIO_FRAME).sum(axis=1)
                ids.extend([int(i)] * n)
                ks.extend(range(n))
                es.extend(int(x) for x in e)
            yield pd.DataFrame({"doc_id": ids, "k": ks, "e": es})

    return df.mapInPandas(frames, "doc_id BIGINT, k BIGINT, e BIGINT")


def audio_energy(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-frame audio-style energy analysis over the decoded payload — the
    waveform-feature primitive (frame energy + activity detection), shaped
    like a real PCM pipeline: decode → frame → per-frame reduction →
    per-clip summary, all executor-side in Arrow batches.

    Deterministic maths over the decoded unit stream (:func:`_frame_units`
    code points standing in for PCM samples): the body frames into
    ``AUDIO_FRAME``-unit windows (complete frames only, like
    :func:`fake_frame_sample`); a frame's energy is the exact integer sum
    of squared code points; a frame is "loud" when its energy strictly
    exceeds the clip's mean frame energy (integer cross-multiplication:
    ``e * n_frames > total_energy``).  Round-14: a RIFF/WAVE payload takes
    the REAL PCM branch — stdlib :mod:`wave` (no third-party codec)
    decodes 16-bit PCM and the exact same framing/energy/loudness maths
    run over the int16 samples, so the fake-unit branch and a real codec
    demonstrably share one pipeline (same schema, same reductions):
    (doc_id, n_frames, total_energy, n_loud, max_energy).  The decode
    stage is :func:`_audio_units`, SHARED with :func:`audio_frames` so
    the frame stream and the clip summary always agree per document, and
    codec failures fall back per row (never fail the job).
    numpy-vectorized per row."""
    from flink_net_spark.session import ship_package_to_executors

    ship_package_to_executors(df.sparkSession)

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nf, tot, loud, mx = [], [], [], [], []
            for i, raw in zip(pdf[id_col], pdf[payload_col]):
                units = _audio_units(bytes(raw))
                ids.append(int(i))
                n = len(units) // AUDIO_FRAME
                if n == 0:
                    nf.append(0); tot.append(0); loud.append(0); mx.append(0)
                    continue
                cp = units[: n * AUDIO_FRAME]
                e = (cp * cp).reshape(n, AUDIO_FRAME).sum(axis=1)
                total = int(e.sum())
                nf.append(n)
                tot.append(total)
                loud.append(int((e * n > total).sum()))
                mx.append(int(e.max()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": nf,
                    "total_energy": tot,
                    "n_loud": loud,
                    "max_energy": mx,
                }
            )

    return df.mapInPandas(
        energy,
        "doc_id BIGINT, n_frames BIGINT, total_energy BIGINT, n_loud BIGINT, "
        "max_energy BIGINT",
    )


CUT_THRESHOLD = 256  # |Δ frame checksum| above this = a scene cut


def scene_cuts(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Video scene-cut detection over consecutive decoded frames — the
    shot-segmentation primitive (cut = adjacent-frame distance above a
    threshold; real systems use histogram/SSIM distance, this deterministic
    path uses the |Δ| of the FRAME_BYTES-code-point frame checksums, the
    same frame stream :func:`fake_frame_sample` emits at every_n=1).

    Per clip: frame count, cut count (|Δ| > ``CUT_THRESHOLD``), the first
    cut's frame index (-1 when none) and the maximum adjacent-frame delta.
    Clips shorter than two frames report (n, 0, -1, 0).  All maths exact
    integers, numpy-vectorized per row, payload dropped from the output; a
    real decoder (PyAV frame iterator + histogram distance) swaps into the
    same schema."""
    from flink_net_spark.session import ship_package_to_executors

    ship_package_to_executors(df.sparkSession)

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, nf, nc, fc, mx = [], [], [], [], []
            for i, raw in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(raw)
                s = _frame_units(b[HEADER_LEN:] if b[:4] == PAYLOAD_MAGIC else b)
                n = len(s) // FRAME_BYTES
                ids.append(int(i))
                if n < 2:
                    nf.append(n); nc.append(0); fc.append(-1); mx.append(0)
                    continue
                cp = np.fromiter(
                    map(ord, s[: n * FRAME_BYTES]), dtype=np.int64,
                    count=n * FRAME_BYTES,
                )
                cs = cp.reshape(n, FRAME_BYTES).sum(axis=1)
                dd = np.abs(np.diff(cs))
                cut_at = np.nonzero(dd > CUT_THRESHOLD)[0]
                nf.append(n)
                nc.append(int(cut_at.size))
                fc.append(int(cut_at[0] + 1) if cut_at.size else -1)
                mx.append(int(dd.max()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": nf,
                    "n_cuts": nc,
                    "first_cut": fc,
                    "max_delta": mx,
                }
            )

    return df.mapInPandas(
        cuts,
        "doc_id BIGINT, n_frames BIGINT, n_cuts BIGINT, first_cut BIGINT, "
        "max_delta BIGINT",
    )
