"""Baseline JPEG codec — pure stdlib + numpy (public ITU-T T.81 spec).

Completes the multimodal lossy-codec tier (reference north star;
SURVEY §2.11): a real entropy decoder (canonical Huffman, DC
prediction, run-length AC, byte unstuffing, restart markers) and a
real encoder (level shift, 8x8 DCT-II, quantization, zigzag, Huffman)
so JPEG payloads flow through the same mapInPandas stages as BMP/WAV/
PNG. Scope: baseline sequential DCT, 8-bit, 1 or 3 components, 4:4:4
sampling (no subsampling); progressive/lossless/arithmetic streams are
rejected with a clear error.

The encoder emits its OWN canonical Huffman tables (all DC categories
at 4 bits, all 162 AC symbols at 8 bits — Kraft-valid, no all-ones
code) and writes them into DHT segments, so any T.81 decoder can read
the output; the decoder builds its tables from whatever DHT segments
the stream carries, so it reads other encoders' baseline 4:4:4 files
too. Compression is deliberately suboptimal-but-valid: this tier is
about correct structure at Spark scale, not rate-distortion.

Exactness property used by the multimodal_jpeg_pixel query's DuckDB
twin: an 8x8-aligned image of uniform blocks round-trips EXACTLY under
a flat quant table whose DC step is 8 — the DCT of a constant block is
DC-only with DC = 8*(v-128), quantization divides it without remainder,
and the IDCT reconstructs the constant — so pixel sums have a closed
form in SQL while the full huffman/DC-prediction/bit-stuffing path is
still exercised with real varying codes.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

#: flat quant table: DC step 8 (divides every uniform-block DC exactly),
#: AC step 16 — deterministic, exactness-friendly (see module docstring)
FLAT_QTABLE = [8] + [16] * 63

#: canonical code lengths for this encoder's tables: 12 DC categories
#: (diff magnitude 0..11 bits) all at length 4; EOB, ZRL and every
#: (run 0..15, size 1..10) AC symbol at length 8. Kraft: 12/16 < 1 and
#: 162/256 < 1, and neither table assigns an all-ones code.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_BITS = [0, 0, 0, 12] + [0] * 12           # 12 codes of length 4
_AC_BITS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8  # 162 codes of length 8


class JpegError(ValueError):
    """Malformed or unsupported JPEG stream."""


#: per-frame pixel-allocation cap (pixels x components): a ~100-byte
#: crafted payload can claim 65500x65500x3 in its SOF, which would
#: np.empty ~100 GiB before any entropy byte is read — cap it so a
#: malformed payload raises JpegError instead of OOM-killing the task
MAX_DECODE_PIXELS = 1 << 26


def iter_jpeg_segments(payload: bytes):
    """Walk the marker stream, yielding (marker, body, next_pos) for
    every length-bearing segment. Shared by the full decoder and the
    header tier (multimodal.decode_jpeg_meta) so hardening lives in ONE
    place. Validates SOI, fill-byte runs, and per-segment bounds;
    skips standalone TEM/RSTn; stops after SOS (entropy follows at
    next_pos) or EOI."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG: missing SOI marker")
    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1  # fill bytes before a marker are legal
        if pos + 2 > len(payload):
            raise JpegError("truncated marker at end of payload")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            return
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2  # TEM / RSTn: standalone, no length field
            continue
        if pos + 4 > len(payload):
            raise JpegError("truncated segment header")
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if seglen < 2 or pos + 2 + seglen > len(payload):
            raise JpegError(
                f"segment 0xFF{marker:02X} length {seglen} overruns payload"
            )
        body = payload[pos + 4 : pos + 2 + seglen]
        next_pos = pos + 2 + seglen
        yield marker, body, next_pos
        if marker == 0xDA:  # start of scan: entropy data follows
            return
        pos = next_pos


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical algorithm (T.81 C.2):
    codes of each length are consecutive, doubling when length grows."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, symbols).items()
    }


#: orthonormal 8x8 DCT-II matrix: forward F = M @ s @ M.T equals the
#: T.81 FDCT (with its 1/4 · C(u)C(v) scaling); inverse s = M.T @ F @ M
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _DCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)  # pad with 1s


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, surfaces RSTn."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None  # pending non-RST marker

    def _fill(self) -> None:
        if self.marker is not None:
            raise JpegError("entropy data exhausted at marker")
        if self.pos >= len(self.data):
            raise JpegError("entropy data truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise JpegError("dangling 0xFF at end of scan")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                self.marker = nxt
                self.pos += 1
                raise JpegError(f"marker 0xFF{nxt:02X} inside entropy data")
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def at_restart(self) -> bool:
        """True if the next marker is RSTn; consumes it and realigns."""
        # byte-align, then look for FF D0..D7
        self._n = 0
        self._acc = 0
        if self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            m = self.data[self.pos + 1]
            if 0xD0 <= m <= 0xD7:
                self.pos += 2
                return True
        return False


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code (no symbol within 16 bits)")


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the raw size-bit field to a signed diff."""
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------- encode

def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body


def _encode_block(
    bw: _BitWriter,
    coefs: np.ndarray,
    pred_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Huffman-encode one quantized zigzag block; returns its DC."""
    dc = int(coefs[0])
    diff = dc - pred_dc
    s = _category(diff)
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coefs[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def encode_jpeg(
    rgb: np.ndarray,
    qtable: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline 4:4:4 JFIF
    JPEG. Deterministic; one quant table and one DC + one AC Huffman
    table shared by all components (all written into the stream).
    ``restart_interval`` > 0 writes a DRI segment and emits RSTn every
    N MCUs (predictors reset, bits padded to a byte) — T.81 F.1.2.2.4."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8")
    q = np.array(qtable if qtable is not None else FLAT_QTABLE, dtype=np.float64)
    if q.shape != (64,) or (q < 1).any():
        raise ValueError("qtable must be 64 entries >= 1 (zigzag order)")
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    bh, bw_ = -(-h // 8), -(-w // 8)
    padded = np.pad(
        rgb.astype(np.float64), ((0, bh * 8 - h), (0, bw_ * 8 - w), (0, 0)),
        mode="edge",
    )
    ycc = _rgb_to_ycbcr(padded) - 128.0
    dc_codes = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_SYMBOLS)
    qmat = np.empty(64)
    qmat[ZIGZAG] = q  # natural-order step for each coefficient
    qmat = qmat.reshape(8, 8)
    writer = _BitWriter()
    preds = [0, 0, 0]
    mcu = 0
    for by in range(bh):
        for bx in range(bw_):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes(
                    [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]
                )
                preds = [0, 0, 0]
            for c in range(3):
                block = ycc[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, c]
                coefs = _DCT_M @ block @ _DCT_M.T
                quant = np.round(coefs / qmat).astype(np.int32)
                zz = quant.reshape(-1)[ZIGZAG]
                preds[c] = _encode_block(writer, zz, preds[c], dc_codes, ac_codes)
            mcu += 1
    writer.flush()

    app0 = b"JFIF\x00\x01\x01\x01\x00\x48\x00\x48\x00\x00"
    dqt = bytes([0x00]) + bytes(int(x) for x in q)
    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    dht_dc = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_SYMBOLS)
    dht_ac = bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_SYMBOLS)
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    dri = _seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8"
        + _seg(0xE0, app0)
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + dri
        + _seg(0xDA, sos)
        + bytes(writer.out)
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------- decode

def decode_jpeg(payload: bytes) -> tuple[np.ndarray, dict]:
    """Decode a baseline sequential 4:4:4 (or grayscale) JPEG to an
    (h, w, ncomp) uint8 array + header metadata. Huffman and quant
    tables are read from the stream; progressive / subsampled /
    arithmetic streams raise JpegError."""
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    scan_comps = None
    restart_interval = 0
    pos = len(payload)
    for marker, body, next_pos in iter_jpeg_segments(payload):
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                if i + 65 > len(body):
                    raise JpegError("DQT truncated")
                qtables[tq] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.float64)
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                if i + 17 > len(body):
                    raise JpegError("DHT truncated")
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                symbols = list(body[i + 17 : i + 17 + n])
                if len(symbols) < n:
                    raise JpegError("DHT truncated")
                htables[(tc, th)] = _decode_table(bits, symbols)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            if len(body) < 6:
                raise JpegError("SOF body truncated")
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * ncomp:
                raise JpegError("SOF component list truncated")
            if precision != 8:
                raise JpegError(f"only 8-bit precision supported, got {precision}")
            if ncomp not in (1, 3):
                raise JpegError(f"unsupported component count {ncomp}")
            comps = []
            for c in range(ncomp):
                cid, sampling, tq = body[6 + 3 * c : 9 + 3 * c]
                if sampling != 0x11:
                    raise JpegError(
                        "subsampled JPEG unsupported (4:4:4 only); "
                        f"component {cid} has sampling 0x{sampling:02X}"
                    )
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker == 0xC2:
            raise JpegError("progressive JPEG unsupported (baseline only)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"unsupported coding process (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise JpegError("DRI body truncated")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS: entropy data follows at next_pos
            if len(body) < 1:
                raise JpegError("SOS body truncated")
            ns = body[0]
            if len(body) < 1 + 2 * ns:
                raise JpegError("SOS component list truncated")
            scan_comps = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cs, tables >> 4, tables & 0x0F))
            pos = next_pos
    if sof is None:
        raise JpegError("JPEG missing SOF frame header")
    if scan_comps is None:
        raise JpegError("JPEG missing SOS scan header")
    h, w, comps = sof
    if len(scan_comps) != len(comps):
        raise JpegError("scan component count != frame component count")
    bh, bw_ = -(-h // 8), -(-w // 8)
    ncomp = len(comps)
    if bh * 8 * bw_ * 8 * ncomp > MAX_DECODE_PIXELS:
        raise JpegError(
            f"frame {w}x{h}x{ncomp} exceeds the decoder pixel cap "
            f"({MAX_DECODE_PIXELS} component-pixels)"
        )
    planes = np.empty((bh * 8, bw_ * 8, ncomp), dtype=np.float64)
    qs, dcs, acs = [], [], []
    for (cid, tq), (scs, td, ta) in zip(comps, scan_comps):
        if scs != cid:
            raise JpegError("SOS component order != SOF order")
        if tq not in qtables:
            raise JpegError(f"missing quant table {tq}")
        if (0, td) not in htables or (1, ta) not in htables:
            raise JpegError(f"missing Huffman table dc{td}/ac{ta}")
        qnat = np.empty(64)
        qnat[ZIGZAG] = qtables[tq]
        qs.append(qnat.reshape(8, 8))
        dcs.append(htables[(0, td)])
        acs.append(htables[(1, ta)])
    br = _BitReader(payload, pos)
    preds = [0] * ncomp
    mcu = 0
    for by in range(bh):
        for bx in range(bw_):
            if restart_interval and mcu and mcu % restart_interval == 0:
                if not br.at_restart():
                    raise JpegError(f"expected restart marker before MCU {mcu}")
                preds = [0] * ncomp
            for c in range(ncomp):
                zz = np.zeros(64, dtype=np.int64)
                s = _read_symbol(br, dcs[c])
                if s > 15:
                    # a corrupt DHT can map a code to an arbitrary
                    # symbol; an unchecked size would read a huge bit
                    # field and overflow downstream arithmetic
                    raise JpegError(f"DC size category {s} out of range")
                diff = _extend(br.read_bits(s), s) if s else 0
                preds[c] += diff
                zz[0] = preds[c]
                k = 1
                while k < 64:
                    rs = _read_symbol(br, acs[c])
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    if k > 63:
                        raise JpegError("AC run overflows block")
                    size = rs & 0x0F
                    zz[k] = _extend(br.read_bits(size), size)
                    k += 1
                quant = np.empty(64)
                quant[ZIGZAG] = zz
                coefs = quant.reshape(8, 8) * qs[c]
                block = _DCT_M.T @ coefs @ _DCT_M
                planes[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, c] = block
            mcu += 1
    planes += 128.0
    if ncomp == 3:
        rgb = _ycbcr_to_rgb(planes)
    else:
        rgb = planes
    out = np.clip(np.round(rgb[:h, :w]), 0, 255).astype(np.uint8)
    return out, {
        "width": w,
        "height": h,
        "components": ncomp,
        "precision": 8,
        "mode": "baseline",
    }
