"""GIF89a + hand-rolled LZW codec tests (operators/multimodal).

The LZW coder is the one entropy coder in the repo with no stdlib
implementation to lean on, so these pin the spec edges explicitly:
width growth at every code-size boundary, the 4096-entry dictionary
CLEAR reset (multiple times), the KwKwK decode case, sub-block
framing at the 255-byte boundary, and extension-block skipping.
"""
from __future__ import annotations

import hashlib
import struct

import pytest

from c99_vectordb_spark.operators.multimodal import (
    MediaDecodeError,
    _lzw_decode_gif,
    _lzw_encode_gif,
    decode_gif,
    encode_gif,
)


def _roundtrip(content: bytes) -> None:
    enc = encode_gif(content)
    dec, meta = decode_gif(enc)
    w, h = meta["width"], meta["height"]
    assert dec == content + b"\x00" * (w * h - len(content))
    assert meta["n_colors"] == 256
    assert h == max(1, -(-len(content) // w))


def test_roundtrip_edges():
    for content in (
        b"",
        b"x",
        b"abc",
        b"abcd",
        b"abcde",
        bytes(range(256)),
        b"\xff" * 1000,
    ):
        _roundtrip(content)


def test_kwkwk_case():
    # runs of one symbol hit code == next-unassigned immediately
    _roundtrip(b"a" * 500)
    _roundtrip(b"ababababab" * 50)


def test_width_growth_and_dict_reset():
    # incompressible stream: one code per ~1.2 bytes -> crosses every
    # width boundary and resets the 4096-entry dictionary repeatedly
    data = b"".join(
        hashlib.md5(str(i).encode()).digest() for i in range(3000)
    )  # 48000 bytes
    _roundtrip(data)
    raw = _lzw_encode_gif(data, 8)
    assert _lzw_decode_gif(raw, 8) == data
    # compression actually happened on compressible input
    comp = _lzw_encode_gif(b"the quick brown fox " * 500, 8)
    assert len(comp) < 10000 // 2


def test_subblock_framing():
    # payload large enough that the LZW stream spans many 255-byte
    # sub-blocks; decode_gif must reassemble them exactly
    content = b"block framing test " * 400
    enc = encode_gif(content)
    # count sub-blocks: walk from the min-code-size byte
    dec, _ = decode_gif(enc)
    assert dec.rstrip(b"\x00") == content.rstrip(b"\x00")


def test_extension_blocks_skipped():
    content = b"hello extension world"
    enc = bytearray(encode_gif(content))
    # splice a Graphic Control Extension right before the image
    # descriptor (0x2C after header+LSD+GCT = 13 + 768)
    idx = 13 + 768
    assert enc[idx] == 0x2C
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    spliced = bytes(enc[:idx]) + gce + bytes(enc[idx:])
    dec, meta = decode_gif(spliced)
    assert dec[: len(content)] == content


def test_decode_rejects_garbage():
    with pytest.raises(MediaDecodeError):
        decode_gif(b"NOTAGIF")
    with pytest.raises(MediaDecodeError):
        decode_gif(b"GIF89a" + struct.pack("<HHBBB", 4, 1, 0, 0, 0) + b"\x3B")
    # truncated LZW stream (no EOI): chop the data blocks
    enc = bytearray(encode_gif(b"truncate me please now"))
    with pytest.raises(MediaDecodeError):
        decode_gif(bytes(enc[: 13 + 768 + 10 + 3]) + b"\x00\x3b")


def test_pixel_count_mismatch_rejected():
    enc = bytearray(encode_gif(b"abcdefgh"))
    # lie about the height in both LSD and image descriptor
    struct.pack_into("<H", enc, 8, 7)
    struct.pack_into("<H", enc, 13 + 768 + 7, 7)
    with pytest.raises(MediaDecodeError):
        decode_gif(bytes(enc))


def test_oracle_byte_sum_matches_utf8_on_non_ascii():
    """The oracle's per-codepoint UTF-8 byte-sum closed form must equal
    the codec's true byte sum for multibyte text — the synthetic corpus
    is ASCII-only, so this pins the branch the data can't reach
    (session code-review finding: the first oracle summed codepoints
    over byte positions and diverged on 'héllo')."""
    import duckdb

    from c99_vectordb_spark.queries_wave7 import _ORACLE_MULTIMODAL_GIF

    rows = [
        (1, "héllo"),
        (2, "ASCII only text"),
        (3, "emoji \U0001F600 and € euro"),
        (4, "широкий cyrillic"),
        (5, ""),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got = {
        r[0]: (r[2], r[4], r[5])
        for r in con.execute(_ORACLE_MULTIMODAL_GIF).fetchall()
    }
    for doc_id, text in rows:
        raw = text.encode("utf-8")
        height = max(1, -(-len(raw) // 4))
        assert got[doc_id] == (height, height * 4, sum(raw)), text
        # and the codec agrees end to end
        dec, meta = decode_gif(encode_gif(raw))
        assert sum(dec) == sum(raw)
        assert meta["height"] == height
