"""Multimodal columns: opaque binary payloads + typed metadata.

Model: media (image/audio/video) travels as a ``binary`` column next to a
typed metadata struct ``{mime, width, height, n_bytes}`` — the reference's
opaque-POCO/byte[] serializer surface maps here
(FlinkDotNet/FlinkDotNet.Core.Abstractions/Execution/SerializerRegistry.cs:20-28
registers ``byte[]`` as a first-class record type).

Decode/feature-extract run as Arrow-batched ``mapInPandas`` — the payload
bytes stay executor-side, one Arrow batch per partition slice, never
row-at-a-time and never on the driver.  Real codecs (PIL/ffmpeg) are NOT in
this container: ``decode_image`` is gated behind an import-try and raises
``NotImplementedError`` without it; ``fake_decode_stats`` is the
deterministic stand-in that exercises the identical plumbing (schema,
partitioning, UDF signature, batch shape) and is what tests/queries use.

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
            w.alias("width"),
            h.alias("height"),
            F.length(payload).alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_image(df: DataFrame, payload_col: str = "payload"):
    """REAL image decode — requires an image codec library.

    The container ships no PIL/opencv/ffmpeg; this is the clearly-marked
    stub demanded by the build brief.  The deterministic plumbing-equivalent
    is :func:`fake_decode_stats`."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - always taken in this env
        raise NotImplementedError(
            "image codec not available in this environment; "
            "use fake_decode_stats() for the plumbing-identical deterministic path"
        ) from exc
    raise NotImplementedError("real decode path reserved for codec-equipped clusters")


def fake_decode_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 'decode': parse the fake header + body checksum via
    mapInPandas.  Identical plumbing to a real decoder: binary in, struct
    of decoded properties out, Arrow-batched, payload dropped after."""
    from flink_net_spark.session import ship_package_to_executors

    ship_package_to_executors(df.sparkSession)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widths, heights, sums, sizes = [], [], [], [], []
            for i, raw in zip(pdf[id_col], pdf["payload"]):
                b = bytes(raw)
                ok = b[:4] == PAYLOAD_MAGIC
                ids.append(int(i))
                widths.append(int(b[4:8]) if ok else -1)
                heights.append(int(b[8:12]) if ok else -1)
                body = b[HEADER_LEN:] if ok else b
                sums.append(int(sum(body) % 1_000_000_007))
                sizes.append(len(body))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": widths,
                    "height": heights,
                    "body_checksum": sums,
                    "body_bytes": sizes,
                }
            )

    return df.mapInPandas(
        decode, "doc_id BIGINT, width INT, height INT, body_checksum BIGINT, body_bytes INT"
    )


def payload_features(df: DataFrame, dim: int = 16, id_col: str = "doc_id") -> DataFrame:
    """Deterministic feature extraction: fold payload bytes into a fixed-dim
    float vector (per-dim byte-stride sums) — the mapInPandas shape of a
    real embedding model (bytes → fixed-length array<float>), minus the
    model.  Output drops the payload (shuffle hygiene)."""
    from flink_net_spark.session import ship_package_to_executors

    ship_package_to_executors(df.sparkSession)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for i, raw in zip(pdf[id_col], pdf["payload"]):
                b = bytes(raw)
                acc = [0] * dim
                for pos, byte in enumerate(b):
                    acc[pos % dim] = (acc[pos % dim] + byte) % 4096
                ids.append(int(i))
                vecs.append([float(x) / 4096.0 for x in acc])
            yield pd.DataFrame({"doc_id": ids, "features": vecs})

    return df.mapInPandas(extract, f"doc_id BIGINT, features ARRAY<FLOAT>")


def frame_sample(df: DataFrame, every_n: int = 10):
    """Video frame sampling with a REAL codec — requires ffmpeg/pyav.
    Gated stub per brief; ``fake_frame_sample`` exercises identical
    plumbing (bytes in → one row per sampled frame out)."""
    raise NotImplementedError(
        "video codecs not available in this environment; the mapInPandas "
        "pattern is identical to fake_frame_sample (bytes in, frame rows out)"
    )


FRAME_BYTES = 32  # fake codec: the body is a sequence of 32-byte "frames"


def fake_frame_sample(
    df: DataFrame, every_n: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic frame sampling: treat the payload body as concatenated
    ``FRAME_BYTES``-sized frames, keep every ``every_n``-th COMPLETE frame,
    emit one row per kept frame with its byte checksum.  This is the 1→N
    explode shape of real video sampling (one clip row → many frame rows),
    Arrow-batched, payload dropped from the output.

    Scale: output rows ≈ input_bytes / (FRAME_BYTES · every_n) — the UDF is
    the hot path, so it stays vectorizable per batch and never shuffles the
    payload; downstream ops see only (doc_id, frame_index, checksum)."""
    from flink_net_spark.session import ship_package_to_executors

    ship_package_to_executors(df.sparkSession)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for i, raw in zip(pdf[id_col], pdf["payload"]):
                b = bytes(raw)
                body = b[HEADER_LEN:] if b[:4] == PAYLOAD_MAGIC else b
                for k in range(0, len(body) // FRAME_BYTES, every_n):
                    frame = body[k * FRAME_BYTES : (k + 1) * FRAME_BYTES]
                    ids.append(int(i))
                    idxs.append(k)
                    sums.append(int(sum(frame)))
            yield pd.DataFrame({"doc_id": ids, "frame_index": idxs, "checksum": sums})

    return df.mapInPandas(sample, "doc_id BIGINT, frame_index INT, checksum BIGINT")


def resize_image(df: DataFrame, width: int, height: int):
    """REAL image resize — requires an image codec.  Gated stub per brief;
    ``fake_resize`` exercises identical plumbing."""
    raise NotImplementedError(
        "image codecs not available in this environment; the mapInPandas "
        "pattern is identical to fake_resize (bytes in, smaller bytes out)"
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
