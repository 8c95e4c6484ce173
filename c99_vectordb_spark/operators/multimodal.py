"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY §2.11; BASELINE.json north star).

Image/audio/video payloads are ``BinaryType`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so each executor processes
whole record batches (the shape that matters at 100 TB: map-only, no
shuffle, batch-granular Python crossing).

The image/audio codec libraries are not installed in this container,
so the actual decode is STUBBED: ``decode_payload`` raises
``NotImplementedError`` for real codecs and a deterministic fake
("raw") codec exists so the Spark-side plumbing — schema, batching,
UDF signatures, partition behavior — is real and tested end-to-end.
"""

from __future__ import annotations

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


def decode_payload(payload: bytes, mime: str):
    """Decode a binary payload. Real codecs are unavailable in this
    environment — only the deterministic 'application/raw' fake codec
    is implemented; everything else raises (clearly-marked stub)."""
    if mime == "application/raw":
        return payload
    raise NotImplementedError(
        f"codec for {mime!r} not available in this environment; "
        "plug a real decoder here (PIL/libav/...) on a cluster image"
    )


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
