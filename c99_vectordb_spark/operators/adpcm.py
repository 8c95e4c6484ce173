"""IMA (DVI4) ADPCM — a REAL lossy audio codec tier.

Upgrades part of the guarded-stub lossy-codec tier (multimodal.py) to a
genuine implementation: IMA-ADPCM is the public-spec 4-bit adaptive
differential PCM codec (IMA Digital Audio Focus Group, 1992; also
RFC 3551 DVI4 and the WAV format-0x11 payload), giving 4:1 compression
of 16-bit PCM with a fully INTEGER state machine — which is what makes
it the one lossy audio codec whose output can be verified hash-exactly
cross-engine: the per-sample predictor/step-index recursion replays in
a DuckDB recursive CTE (queries_ext._oracle_adpcm_roundtrip), unlike
MP3/AAC whose float filterbanks have no SQL twin (those remain
documented stubs).

Spec recap (encoder; the decoder runs the identical state update from
the transmitted nibble, so encoder-side reconstruction IS the decoded
signal):

    step = STEP_TABLE[index]; diff = sample - predictor
    sign = 8 if diff < 0; diff = |diff|
    vpdiff = step >> 3
    bit4: diff >= step      -> subtract, vpdiff += step
    bit2: diff >= step >> 1 -> subtract, vpdiff += step >> 1
    bit1: diff >= step >> 2 ->           vpdiff += step >> 2
    predictor +/- vpdiff, clamped to int16
    index += INDEX_TABLE[nibble], clamped to [0, 88]

State starts at (predictor=0, index=0) — header-free by convention
here; a container would carry the block-initial state.
"""

from __future__ import annotations

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]

INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _encode_step(sample: int, predictor: int, index: int) -> tuple[int, int, int]:
    """One encoder step: returns (nibble, new_predictor, new_index)."""
    step = STEP_TABLE[index]
    diff = sample - predictor
    sign = 8 if diff < 0 else 0
    if sign:
        diff = -diff
    delta = 0
    vpdiff = step >> 3
    if diff >= step:
        delta = 4
        diff -= step
        vpdiff += step
    step >>= 1
    if diff >= step:
        delta |= 2
        diff -= step
        vpdiff += step
    step >>= 1
    if diff >= step:
        delta |= 1
        vpdiff += step
    predictor = predictor - vpdiff if sign else predictor + vpdiff
    predictor = max(-32768, min(32767, predictor))
    nibble = delta | sign
    index = max(0, min(88, index + INDEX_TABLE[nibble]))
    return nibble, predictor, index


def adpcm_encode(samples: list[int]) -> tuple[bytes, list[int]]:
    """Encode 16-bit samples to 4-bit nibbles (low nibble first per
    byte). Returns (code_bytes, reconstructed_samples) — the
    reconstruction is what a decoder produces, emitted here because
    the encoder tracks the identical state."""
    predictor, index = 0, 0
    nibbles: list[int] = []
    recon: list[int] = []
    for s in samples:
        nib, predictor, index = _encode_step(s, predictor, index)
        nibbles.append(nib)
        recon.append(predictor)
    if len(nibbles) % 2:
        nibbles.append(0)
    data = bytes(
        nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
    )
    return data, recon


def adpcm_decode(data: bytes, n_samples: int) -> list[int]:
    """Decode ``n_samples`` from packed nibbles (low nibble first)."""
    predictor, index = 0, 0
    out: list[int] = []
    for i in range(n_samples):
        byte = data[i // 2]
        nibble = (byte >> 4) if i % 2 else (byte & 0x0F)
        step = STEP_TABLE[index]
        vpdiff = step >> 3
        if nibble & 4:
            vpdiff += step
        if nibble & 2:
            vpdiff += step >> 1
        if nibble & 1:
            vpdiff += step >> 2
        predictor = predictor - vpdiff if nibble & 8 else predictor + vpdiff
        predictor = max(-32768, min(32767, predictor))
        index = max(0, min(88, index + INDEX_TABLE[nibble]))
        out.append(predictor)
    return out


def media_adpcm_metrics(media):
    """Spark tier: ADPCM transcode metrics over WAV payloads —
    per document: sample count, packed code size (the 4:1 story:
    2 bytes/sample -> 0.5), max / total absolute reconstruction error,
    and the final (predictor, step-index) state. Map-only mapInPandas
    over Arrow batches; integer-exact outputs, so the DuckDB
    recursive-CTE twin hash-matches every row.

    Odd trailing bytes are dropped (a 16-bit stream has whole
    samples); ASCII-payload WAVs yield small positive samples, but the
    codec path is the full signed-int16 spec either way.
    """
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from .multimodal import MediaDecodeError, decode_wav

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("code_bytes", T.LongType(), True),
            T.StructField("max_abs_err", T.LongType(), True),
            T.StructField("sum_abs_err", T.LongType(), True),
            T.StructField("end_predictor", T.LongType(), True),
            T.StructField("end_index", T.LongType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                data, fmt = decode_wav(bytes(r.payload))
                if fmt["bits"] != 16:
                    raise MediaDecodeError("media_adpcm_metrics expects 16-bit PCM")
                data = data[: len(data) // 2 * 2]
                samples = [
                    int.from_bytes(data[i : i + 2], "little", signed=True)
                    for i in range(0, len(data), 2)
                ]
                predictor, index = 0, 0
                max_err = sum_err = 0
                for s in samples:
                    _, predictor, index = _encode_step(s, predictor, index)
                    err = abs(s - predictor)
                    sum_err += err
                    if err > max_err:
                        max_err = err
                rows.append(
                    (
                        r.id,
                        len(samples),
                        (len(samples) + 1) // 2,  # 2 nibbles per byte
                        max_err,
                        sum_err,
                        predictor,
                        index,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return media.mapInPandas(gen, schema=schema)
