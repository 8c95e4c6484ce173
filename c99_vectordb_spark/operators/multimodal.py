"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY §2.11; BASELINE.json north star).

Image/audio/video payloads are ``BinaryType`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so each executor processes
whole record batches (the shape that matters at 100 TB: map-only, no
shuffle, batch-granular Python crossing).

Codec support is tiered by what this container allows:

- ``image/bmp`` and ``audio/wav``: REAL pure-Python parsers of the
  public BMP (BITMAPINFOHEADER, 24/32bpp uncompressed) and WAV/RIFF
  (PCM) formats — header-validated, pixel/sample data decoded to
  bytes. Public-spec formats need no codec library.
- ``application/raw``: deterministic identity codec (test/demo path).
- compressed formats (JPEG/PNG/MP3/H.264...): STUBBED — their codecs
  need native libraries not installed here; ``decode_payload`` raises
  ``NotImplementedError`` with a clear message. The Spark-side
  plumbing (schema, batching, UDF signatures, partition behavior) is
  identical for all tiers and tested end-to-end.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: multimodal record: payload + mime + per-modality metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video|text
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("head_hash", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


class MediaDecodeError(ValueError):
    """Malformed payload for the claimed mime type."""


def decode_bmp(payload: bytes) -> tuple[bytes, dict]:
    """Parse an uncompressed 24/32bpp BMP (public format: BITMAPFILEHEADER
    + BITMAPINFOHEADER): returns (pixel bytes bottom-up as stored,
    {width, height, bpp}). Pure stdlib ``struct`` — no codec library."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise MediaDecodeError("not a BMP: missing 'BM' magic / truncated header")
    file_size, _, _, pix_offset = struct.unpack_from("<IHHI", payload, 2)
    hdr_size, width, height, planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40:
        raise MediaDecodeError(f"unsupported DIB header size {hdr_size}")
    if compression != 0:
        raise MediaDecodeError(f"compressed BMP (method {compression}) unsupported")
    if bpp not in (24, 32):
        raise MediaDecodeError(f"only 24/32bpp supported, got {bpp}")
    if width <= 0 or height == 0:
        raise MediaDecodeError(f"invalid dimensions {width}x{height}")
    rows = abs(height)
    row_stride = ((width * bpp // 8) + 3) & ~3  # rows pad to 4 bytes
    need = pix_offset + row_stride * rows
    if len(payload) < need:
        raise MediaDecodeError(f"pixel data truncated: {len(payload)} < {need}")
    return payload[pix_offset:need], {
        "width": width,
        "height": height,
        "bpp": bpp,
    }


def decode_wav(payload: bytes) -> tuple[bytes, dict]:
    """Parse a PCM WAV (public RIFF format): returns (sample bytes,
    {channels, sample_rate, bits}). Walks RIFF chunks to 'fmt '/'data'."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaDecodeError("not a WAV: missing RIFF/WAVE magic")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1:
                raise MediaDecodeError(f"non-PCM WAV (format {audio_fmt}) unsupported")
            fmt = {"channels": channels, "sample_rate": rate, "bits": bits}
        elif cid == b"data":
            if len(body) < size:
                raise MediaDecodeError(f"data chunk truncated: {len(body)} < {size}")
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise MediaDecodeError("WAV missing fmt or data chunk")
    return data, fmt


def decode_payload(payload: bytes, mime: str):
    """Decode a binary payload to its raw content bytes.

    image/bmp and audio/wav are REAL pure-Python parsers (public
    formats); application/raw is the identity codec; compressed
    formats raise — their codecs need native libraries not installed
    in this environment (clearly-marked stub tier)."""
    if mime == "application/raw":
        return payload
    if mime == "image/bmp":
        return decode_bmp(payload)[0]
    if mime in ("audio/wav", "audio/x-wav", "audio/wave"):
        return decode_wav(payload)[0]
    raise NotImplementedError(
        f"codec for {mime!r} not available in this environment; "
        "plug a real decoder here (PIL/libav/...) on a cluster image"
    )


def encode_bmp(content: bytes, width: int = 4) -> bytes:
    """Pack raw bytes as a 24bpp BMP (width chosen so the row stride
    needs no padding). Deterministic inverse of :func:`decode_bmp` up
    to zero-padding — used to synthesize real-format test payloads."""
    bpr = width * 3
    if bpr % 4:
        raise ValueError("choose width with width*3 % 4 == 0")
    rows = max(1, -(-len(content) // bpr))
    pix = content.ljust(rows * bpr, b"\x00")
    header = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, rows, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return header + dib + pix


def encode_wav(
    samples: bytes, channels: int = 1, rate: int = 8000, bits: int = 16
) -> bytes:
    """Wrap raw sample bytes in a PCM WAV container (RIFF/fmt/data).
    Odd-length sample data gets a RIFF pad byte OUTSIDE the declared
    chunk size, so decode_wav(encode_wav(x)) == x exactly."""
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    pad = b"\x00" if len(samples) % 2 else b""
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(samples)) + samples + pad
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def media_decode_meta(media: DataFrame) -> DataFrame:
    """Header-level decode probe: per payload, the typed metadata the
    container format declares (BMP: width/height/bpp; WAV: channels/
    sample_rate/bits), or the decode error. Map-only mapInPandas —
    reads only headers, never shuffles payloads."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                mime = r.mime or "application/raw"
                try:
                    if r.payload is None:
                        rows.append((r.id, mime, False, "null payload", None))
                    elif mime == "image/bmp":
                        _, m = decode_bmp(bytes(r.payload))
                        rows.append((r.id, mime, True, None, {k: str(v) for k, v in m.items()}))
                    elif mime in ("audio/wav", "audio/x-wav", "audio/wave"):
                        _, m = decode_wav(bytes(r.payload))
                        rows.append((r.id, mime, True, None, {k: str(v) for k, v in m.items()}))
                    elif mime == "application/raw":
                        rows.append(
                            (r.id, mime, True, None, {"n_bytes": str(len(r.payload))})
                        )
                    else:
                        # keep the probe consistent with decode_payload:
                        # a mime it would refuse must not claim ok=True
                        rows.append(
                            (r.id, mime, False,
                             f"codec for {mime!r} not available", None)
                        )
                except MediaDecodeError as e:
                    rows.append((r.id, mime, False, str(e), None))
            yield pd.DataFrame(rows, columns=["id", "mime", "ok", "error", "meta"])

    return media.mapInPandas(gen, schema=META_SCHEMA)


def _head_hash(b: bytes, n: int = 16) -> int:
    """Stable polynomial hash of the first n payload bytes (the same
    fold as hashing.token_hash, over bytes)."""
    h = 0
    for x in b[:n]:
        h = (h * 31 + x) % 1_000_000_007
    return h


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction over media batches via mapInPandas.

    The fake feature vector is a deterministic byte-histogram projection
    (stand-in for a real image/audio encoder); the real deliverable is
    the stage shape: Arrow batches in, Arrow batches out, map-only.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = r.payload
                if payload is None:
                    rows.append((r.id, r.modality, None, None, None))
                    continue
                data = decode_payload(bytes(payload), r.mime or "application/raw")
                feat = [0.0] * dim
                for i, x in enumerate(data):
                    feat[(x + i) % dim] += 1.0
                total = sum(feat) or 1.0
                rows.append(
                    (
                        r.id,
                        r.modality,
                        len(data),
                        _head_hash(data),
                        [v / total for v in feat],
                    )
                )
            yield pd.DataFrame(
                rows, columns=["id", "modality", "n_bytes", "head_hash", "feature"]
            )

    return media.mapInPandas(gen, schema=FEATURES_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents corpus (UTF-8 bytes
    as 'application/raw' payloads) — deterministic test/demo input
    exercising the full binary-column path."""
    return docs.select(
        F.col("doc_id").alias("id"),
        F.lit("text").alias("modality"),
        F.lit("application/raw").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )


def media_from_documents_mixed(docs: DataFrame) -> DataFrame:
    """Synthesize a mixed-format media table from the documents corpus:
    even doc_ids become real BMP images, odd doc_ids real WAV audio,
    both carrying the document's UTF-8 bytes as content. Deterministic,
    exercises the REAL format parsers through the full Arrow path."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = (r.text or "").encode("utf-8")
                if r.doc_id % 2 == 0:
                    rows.append(
                        (r.doc_id, "image", "image/bmp", encode_bmp(content), {"lang": r.lang})
                    )
                else:
                    rows.append(
                        (r.doc_id, "audio", "audio/wav", encode_wav(content), {"lang": r.lang})
                    )
            yield pd.DataFrame(
                rows, columns=["id", "modality", "mime", "payload", "meta"]
            )

    return docs.select("doc_id", "text", "lang").mapInPandas(gen, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: emit one row per sampled offset of
    each payload (what real video frame extraction would do), as a
    JVM-side posexplode over byte slices — no Python involved."""
    n = F.length("payload")
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return media.select(
        "id",
        "modality",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    ).filter(F.col("byte_offset") < n)
