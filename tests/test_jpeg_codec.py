"""Baseline JPEG codec (operators/jpeg_codec) — pure numpy T.81 tier.

Round-trip properties: uniform 8x8 blocks are EXACT under the flat
DC-step-8 quant table (the multimodal_jpeg_pixel oracle's foundation);
arbitrary images are lossy-but-bounded at quant 1; restart markers and
odd geometries round-trip; malformed/unsupported streams raise.
"""

from __future__ import annotations

import numpy as np
import pytest

from c99_vectordb_spark.operators.jpeg_codec import (
    FLAT_QTABLE,
    JpegError,
    decode_jpeg,
    encode_jpeg,
)


def _uniform_stack(doc_id: int, nb: int) -> np.ndarray:
    blocks = ((7 * doc_id + 13 * np.arange(nb)) % 256).astype(np.uint8)
    img = np.repeat(blocks, 64).reshape(nb * 8, 8)
    return np.stack([img] * 3, axis=-1)


def test_uniform_blocks_roundtrip_exact():
    for doc_id in (0, 1, 17, 255, 9999):
        img = _uniform_stack(doc_id, 9)
        out, meta = decode_jpeg(encode_jpeg(img))
        assert np.array_equal(out, img)
        assert meta == {
            "width": 8, "height": 72, "components": 3,
            "precision": 8, "mode": "baseline",
        }


def test_random_image_bounded_error_q1():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (24, 40, 3), dtype=np.uint8)
    out, _ = decode_jpeg(encode_jpeg(img, qtable=[1] * 64))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 4


def test_lossy_flat_qtable_changes_but_tracks():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    out, _ = decode_jpeg(encode_jpeg(img, qtable=FLAT_QTABLE))
    # lossy: not equal, but mean error bounded by the quant step scale
    assert not np.array_equal(out, img)
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 16


def test_odd_geometry_and_determinism():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (13, 21, 3), dtype=np.uint8)
    p1, p2 = encode_jpeg(img), encode_jpeg(img)
    assert p1 == p2
    out, meta = decode_jpeg(p1)
    assert out.shape == (13, 21, 3)
    assert (meta["width"], meta["height"]) == (21, 13)


def test_restart_markers_equivalent():
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (40, 24, 3), dtype=np.uint8)
    base, _ = decode_jpeg(encode_jpeg(img, qtable=[1] * 64))
    for ri in (1, 3, 7):
        out, _ = decode_jpeg(encode_jpeg(img, qtable=[1] * 64, restart_interval=ri))
        assert np.array_equal(base, out), ri


def test_rejects_malformed_and_unsupported():
    good = encode_jpeg(_uniform_stack(3, 2))
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(JpegError):
        decode_jpeg(good[:30])
    with pytest.raises(JpegError, match="progressive"):
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(JpegError, match="coding process"):
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc3", 1))
    # subsampling flag rejected: patch the Y component's 0x11 factors
    sof_at = good.index(b"\xff\xc0")
    bad = bytearray(good)
    bad[sof_at + 11] = 0x22  # component 1 sampling 2x2
    with pytest.raises(JpegError, match="subsampl"):
        decode_jpeg(bytes(bad))
    # truncated entropy stream
    with pytest.raises(JpegError):
        decode_jpeg(good[:-4])


def test_geometry_roundtrip_property():
    """Any (h, w) in a broad range round-trips to the exact shape, and
    uniform images of any gray decode exactly (hypothesis-style sweep,
    deterministic seeds)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 33),
        w=st.integers(1, 33),
        v=st.integers(0, 255),
    )
    def prop(h: int, w: int, v: int) -> None:
        img = np.full((h, w, 3), v, dtype=np.uint8)
        out, meta = decode_jpeg(encode_jpeg(img))
        assert out.shape == (h, w, 3)
        assert (meta["width"], meta["height"]) == (w, h)
        # uniform image: exact under the flat DC-step-8 table
        assert np.array_equal(out, img), (h, w, v)

    prop()


def test_bitwriter_bitreader_inverse():
    """The entropy bit layer round-trips arbitrary bit strings through
    byte stuffing (the 0xFF00 path included)."""
    from hypothesis import given, settings, strategies as st

    from c99_vectordb_spark.operators.jpeg_codec import _BitReader, _BitWriter

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 0xFFFF), st.integers(1, 16)), max_size=40))
    def prop(chunks: list[tuple[int, int]]) -> None:
        bw = _BitWriter()
        for value, nbits in chunks:
            bw.write(value, nbits)
        bw.flush()
        br = _BitReader(bytes(bw.out), 0)
        for value, nbits in chunks:
            assert br.read_bits(nbits) == value & ((1 << nbits) - 1)

    prop()


def test_decoder_never_crashes_on_fuzz():
    """Arbitrary bytes — random, truncations of valid streams, and
    valid streams with flipped bytes — must either decode or raise
    JpegError; no IndexError/struct.error/overflow leaks."""
    from hypothesis import given, settings, strategies as st

    good = encode_jpeg(_uniform_stack(5, 3), qtable=[1] * 64)

    @settings(max_examples=150, deadline=None)
    @given(st.data())
    def prop(data) -> None:
        mode = data.draw(st.integers(0, 2))
        if mode == 0:
            payload = data.draw(st.binary(max_size=200))
        elif mode == 1:
            payload = good[: data.draw(st.integers(0, len(good)))]
        else:
            i = data.draw(st.integers(0, len(good) - 1))
            b = data.draw(st.integers(0, 255))
            payload = good[:i] + bytes([b]) + good[i + 1 :]
        try:
            decode_jpeg(payload)
        except JpegError:
            pass

    prop()


def test_encoder_validates_inputs():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 3), dtype=np.float64))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), qtable=[0] * 64)


# ---------------------------------------------------------------------------
# IMA-ADPCM (operators/adpcm.py) — the lossy AUDIO codec tier
# ---------------------------------------------------------------------------

def test_adpcm_decode_matches_encoder_reconstruction():
    from c99_vectordb_spark.operators.adpcm import adpcm_decode, adpcm_encode

    samples = [0, 100, -200, 5000, -30000, 32767, -32768, 7, 7, 7, 0]
    code, recon = adpcm_encode(samples)
    assert len(code) == (len(samples) + 1) // 2
    assert adpcm_decode(code, len(samples)) == recon


def test_adpcm_tracks_signal_within_step_size():
    """After convergence, reconstruction error is bounded by the step
    size — the defining property of ADPCM. A slow ramp keeps the codec
    in small-step territory, so error stays tiny relative to int16."""
    from c99_vectordb_spark.operators.adpcm import adpcm_encode

    ramp = [i * 3 for i in range(500)]
    _, recon = adpcm_encode(ramp)
    tail_errs = [abs(s - p) for s, p in zip(ramp[50:], recon[50:])]
    assert max(tail_errs) <= 16  # small steps once locked on


def test_adpcm_random_roundtrip_property():
    import random

    from c99_vectordb_spark.operators.adpcm import (
        STEP_TABLE,
        adpcm_decode,
        adpcm_encode,
    )

    rng = random.Random(7)
    for _ in range(20):
        n = rng.randrange(1, 200)
        samples = [rng.randrange(-32768, 32768) for _ in range(n)]
        code, recon = adpcm_encode(samples)
        out = adpcm_decode(code, n)
        assert out == recon
        assert all(-32768 <= v <= 32767 for v in out)
        # per-step error can never exceed sample range + max step
        assert all(
            abs(s - p) <= 65535 + STEP_TABLE[-1]
            for s, p in zip(samples, recon)
        )


def test_adpcm_compression_ratio_is_4x():
    from c99_vectordb_spark.operators.adpcm import adpcm_encode

    n = 1000
    code, _ = adpcm_encode([0] * n)
    assert len(code) * 4 == n * 2  # 0.5 B/sample vs 2 B/sample PCM
