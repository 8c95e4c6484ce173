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
- ``image/png``: REAL pure-stdlib decoder — chunk walk with CRC
  verification, zlib inflate of the IDAT stream, and full scanline
  unfiltering (None/Sub/Up/Average/Paeth) for 8-bit gray/RGB/GA/RGBA.
  PNG's only compression is DEFLATE, which the stdlib ships.
- ``application/raw``: deterministic identity codec (test/demo path).
- lossy formats (JPEG/MP3/H.264...): STUBBED — their codecs need
  native libraries not installed here; ``decode_payload`` raises
  ``NotImplementedError`` with a clear message. The Spark-side
  plumbing (schema, batching, UDF signatures, partition behavior) is
  identical for all tiers and tested end-to-end.
"""

from __future__ import annotations

import struct
import zlib
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per PNG color type (8-bit only; 3=palette unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (public spec, RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[bytes, dict]:
    """Parse an 8-bit non-interlaced PNG (public format: RFC 2083):
    returns (unfiltered pixel bytes top-down, {width, height,
    bit_depth, color_type}). Pure stdlib — chunk CRCs verified,
    IDAT inflated with zlib, all five scanline filters inverted."""
    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise MediaDecodeError("not a PNG: missing signature")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise MediaDecodeError(f"chunk {ctype!r} truncated")
        if pos + 12 + length > len(payload):
            raise MediaDecodeError(f"chunk {ctype!r} missing CRC")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise MediaDecodeError(f"chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            if length != 13:
                raise MediaDecodeError(f"IHDR length {length} != 13")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise MediaDecodeError("PNG missing IHDR chunk")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise MediaDecodeError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise MediaDecodeError("interlaced (Adam7) PNG unsupported")
    if bit_depth != 8:
        raise MediaDecodeError(f"only 8-bit PNG supported, got {bit_depth}")
    if color_type not in _PNG_CHANNELS:
        raise MediaDecodeError(f"unsupported PNG color type {color_type}")
    if width <= 0 or height <= 0:
        raise MediaDecodeError(f"invalid dimensions {width}x{height}")
    if not idat:
        raise MediaDecodeError("PNG missing IDAT data")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise MediaDecodeError(f"IDAT inflate failed: {e}") from e
    bpp = _PNG_CHANNELS[color_type]  # bytes per pixel at depth 8
    stride = width * bpp
    if len(raw) != height * (1 + stride):
        raise MediaDecodeError(
            f"decompressed size {len(raw)} != {height * (1 + stride)}"
        )
    out = bytearray(height * stride)
    prev_start = -1
    for y in range(height):
        ftype = raw[y * (1 + stride)]
        line = raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)]
        start = y * stride
        if ftype == 0:  # None
            out[start : start + stride] = line
        elif ftype == 1:  # Sub
            for i, x in enumerate(line):
                left = out[start + i - bpp] if i >= bpp else 0
                out[start + i] = (x + left) & 0xFF
        elif ftype == 2:  # Up
            for i, x in enumerate(line):
                up = out[prev_start + i] if y else 0
                out[start + i] = (x + up) & 0xFF
        elif ftype == 3:  # Average
            for i, x in enumerate(line):
                left = out[start + i - bpp] if i >= bpp else 0
                up = out[prev_start + i] if y else 0
                out[start + i] = (x + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i, x in enumerate(line):
                left = out[start + i - bpp] if i >= bpp else 0
                up = out[prev_start + i] if y else 0
                ul = out[prev_start + i - bpp] if (y and i >= bpp) else 0
                out[start + i] = (x + _paeth(left, up, ul)) & 0xFF
        else:
            raise MediaDecodeError(f"unknown PNG filter type {ftype} (row {y})")
        prev_start = start
    return bytes(out), {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
    }


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(content: bytes, width: int = 4, filter_type: int = 0) -> bytes:
    """Pack raw bytes as an 8-bit RGB PNG (color type 2). Deterministic
    inverse of :func:`decode_png` up to zero-padding; ``filter_type``
    applies the chosen scanline filter to every row so tests can
    exercise each of the five inverse filters."""
    bpp = 3
    stride = width * bpp
    rows = max(1, -(-len(content) // stride))
    pix = content.ljust(rows * stride, b"\x00")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(rows):
        line = pix[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw += line
        elif filter_type == 1:  # Sub
            raw += bytes(
                (line[i] - (line[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 2:  # Up
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif filter_type == 3:  # Average
            raw += bytes(
                (line[i] - ((line[i - bpp] if i >= bpp else 0) + prev[i]) // 2)
                & 0xFF
                for i in range(stride)
            )
        elif filter_type == 4:  # Paeth
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"filter_type must be 0..4, got {filter_type}")
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, rows, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


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
    if mime == "image/png":
        return decode_png(payload)[0]
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
                    elif mime == "image/png":
                        _, m = decode_png(bytes(r.payload))
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


def media_from_documents_png(docs: DataFrame) -> DataFrame:
    """Synthesize a PNG media table from the documents corpus: every
    document's UTF-8 bytes compressed into a real RGB PNG (the row's
    filter type cycles through all five PNG filters by doc_id, so the
    corpus exercises every inverse filter). Deterministic end to end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = (r.text or "").encode("utf-8")
                rows.append(
                    (
                        r.doc_id,
                        "image",
                        "image/png",
                        encode_png(content, filter_type=r.doc_id % 5),
                        {"lang": r.lang},
                    )
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
