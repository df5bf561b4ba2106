"""Minimal, dependency-free baseline JPEG codec (numpy only).

Round-5 breadth item (VERDICT r4 item 7a): replaces the PIL-gated JPEG
branch in ``operators/multimodal._decode_image_bytes`` with a real
from-scratch baseline-DCT decoder, following the same oracle-replay
discipline as the PNG codec (functions/png.py): every oracle-hashed
query that feeds this codec fabricates payloads whose decoded statistics
are closed-form computable in SQL, so any codec bug breaks the value
hash.

Written to the public spec, ITU-T T.81 (ISO/IEC 10918-1) with the JFIF
container (https://www.w3.org/Graphics/JPEG/itu-t81.pdf): marker layout
§B, canonical Huffman construction §C.2, zigzag §A.3.6, the Annex K.1/K.2
quantization tables and K.3 Huffman tables (all published example
tables — the encoder emits its tables into the stream, the decoder reads
whatever tables the stream carries).

Encode envelope: 8-bit baseline sequential, grayscale (1 component) or
RGB via BT.601 YCbCr at 4:4:4 or 4:2:0 (chroma 2×2 box-mean
downsampled), integer quality scaling of the Annex K tables,
edge-replication padding to full MCU coverage.

Decode envelope: baseline (SOF0) and extended-sequential (SOF1) Huffman,
8-bit precision, 1 or 3 components, sampling factors 1–2 per axis
(4:4:4 / 4:2:2 / 4:2:0; interleaved MCUs per §A.2.3, replication
upsampling), tables from the stream, FF00 byte-unstuffing, restart
intervals (DRI / RST0-7 with byte-alignment and DC-predictor reset,
§B.2.1.2/§E.2.4). Out of envelope — raise ``NotImplementedError``,
never a wrong pixel: progressive (SOF2), arithmetic coding (SOF9+),
12-bit precision, sampling factors >2, lossless/hierarchical modes.

Determinism contract (what makes oracle replay possible):

* the encoder quantizes the DC coefficient from the INTEGER block sum
  with exact round-half-away-from-zero integer arithmetic (the float
  DCT path only feeds the AC coefficients), so for a block of constant
  value ``v`` the only nonzero quantized coefficient is
  ``qd = sign(m)·((16·|m| + q00) // (2·q00))`` with ``m = v − 128``;
* the decoder reconstructs pixels as
  ``clip(floor(DC·q00/8 + idct(AC) + 0.5) + 128, 0, 255)`` with the DC
  term kept OUT of the float IDCT (division by 8 is exact in binary
  floating point), so a constant block decodes to exactly
  ``clip(floor((qd·q00 + 4)/8) + 128, 0, 255)`` — pure integer math a
  DuckDB oracle reproduces bit-for-bit.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "QUANT_LUMA",
    "QUANT_CHROMA",
    "decode_jpeg",
    "encode_jpeg_gray",
    "encode_jpeg_rgb",
    "is_jpeg",
    "quant_table",
]

# --------------------------------------------------------------------------
# Published example tables (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

#: Annex K.1 luminance quantization table (row-major), quality ~50.
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

#: Annex K.2 chrominance quantization table.
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Annex K.3 Huffman table specifications: (BITS[1..16], HUFFVAL).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def quant_table(base: np.ndarray, qscale: int = 1) -> np.ndarray:
    """Integer quality scaling: multiply the Annex K table by ``qscale``
    and clip to the 8-bit-precision DQT range [1, 255]. qscale=1 is the
    published ~quality-50 table; qscale=2 halves the bitrate again."""
    return np.clip(base * int(qscale), 1, 255).astype(np.int64)


# --------------------------------------------------------------------------
# Zigzag and DCT
# --------------------------------------------------------------------------


def _zigzag_order() -> list[tuple[int, int]]:
    """(row, col) pairs in T.81 §A.3.6 zigzag order: anti-diagonals,
    odd diagonals walk row-increasing, even diagonals row-decreasing."""
    return sorted(
        ((u, v) for u in range(8) for v in range(8)),
        key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else -p[0]),
    )


_ZIGZAG = _zigzag_order()
_ZZ_ROWS = np.array([u for u, _ in _ZIGZAG])
_ZZ_COLS = np.array([v for _, v in _ZIGZAG])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: T[u,x] = c(u)/2 · cos((2x+1)uπ/16),
    c(0)=1/√2, else 1. Forward 2D DCT of block B is T·B·Tᵀ."""
    t = np.zeros((8, 8))
    for u in range(8):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            t[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return t


_DCT_T = _dct_matrix()


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """Round half away from zero (the convention this codec fixes for AC
    quantization — np.rint's banker's rounding is NOT used anywhere)."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


# --------------------------------------------------------------------------
# Huffman coding (canonical construction, T.81 §C.2)
# --------------------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via the canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    """MSB-first bit accumulator with T.81 §B.1.1.5 FF00 byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def put_marker(self, byte2: int) -> None:
        """Byte-align, then append a raw FF-marker (NOT stuffed — markers
        are the one legal bare 0xFF in entropy data, §B.1.1.5)."""
        self.flush()
        self.out += bytes((0xFF, byte2))


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 unstuffing.
    Stops (raises _MarkerFound) at any non-stuffing marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG after 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                # RSTn here means the decoder lost sync with the declared
                # restart interval; any other marker means a truncated scan.
                raise ValueError("marker inside entropy data (truncated scan?)")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def expect_rst(self, m: int) -> None:
        """§E.2.4: at a restart boundary the encoder byte-aligned and
        emitted RSTm. Discard the (<8) pad bits buffered past the last
        decoded symbol, then consume the marker and check its sequence
        number (m cycles 0..7)."""
        if self.nbits >= 8:
            raise ValueError("restart boundary with a full undecoded byte")
        self.acc = 0
        self.nbits = 0
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("expected RST marker at restart boundary")
        got = self.data[self.pos + 1]
        if not 0xD0 <= got <= 0xD7:
            raise ValueError(f"expected RSTn at restart boundary, got FF{got:02X}")
        if got - 0xD0 != m:
            raise ValueError(
                f"RST sequence error: expected RST{m}, got RST{got - 0xD0}"
            )
        self.pos += 2

    def get(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.get(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    """T.81 §F.2.2.1 EXTEND: map the s low bits to a signed amplitude."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _magnitude(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _quantize_block(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Quantize one 8×8 block of uint8 samples. DC comes from the exact
    integer block sum (see module docstring determinism contract); ACs
    from the float DCT, rounded half away from zero."""
    shifted = block.astype(np.float64) - 128.0
    coef = _DCT_T @ shifted @ _DCT_T.T
    out = _round_half_away(coef / q).astype(np.int64)
    dc_int = int(block.sum()) - 128 * 64  # = 8 · DC, exactly
    d = 8 * int(q[0, 0])
    qd = (2 * abs(dc_int) + d) // (2 * d)
    out[0, 0] = qd if dc_int >= 0 else -qd
    return out


def _encode_block(
    bw: _BitWriter,
    qblock: np.ndarray,
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    zz = qblock[_ZZ_ROWS, _ZZ_COLS]
    dc = int(zz[0])
    diff = dc - prev_dc
    s = _magnitude(diff)
    code, length = dc_codes[s]
    bw.put(code, length)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if nz.size else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            bw.put(code, length)
            run -= 16
        s = _magnitude(v)
        code, length = ac_codes[(run << 4) | s]
        bw.put(code, length)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.put(code, length)
    return dc


def _segment(marker: bytes, payload: bytes) -> bytes:
    return marker + struct.pack(">H", len(payload) + 2) + payload


def _dht_payload(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tclass << 4 | tid]) + bytes(bits) + bytes(vals)


def _encode_jpeg(
    planes: list[np.ndarray],
    qscale: int,
    color: bool,
    restart_interval: int = 0,
    samp: list[tuple[int, int]] | None = None,
    size: tuple[int, int] | None = None,
) -> bytes:
    """Shared encoder body: ``planes[c]`` is component c at its OWN
    (possibly subsampled) resolution; ``samp[c]`` its (hs, vs) sampling
    factors (default all (1, 1) = 4:4:4); ``size`` the full-resolution
    (h, w) recorded in SOF (defaults to planes[0]'s shape — correct
    whenever component 0 samples at (hmax, vmax), as Y does).
    ``restart_interval`` > 0 emits a DRI segment and an RSTm marker
    (byte-aligned, DC predictors reset) every that-many MCUs."""
    samp = samp or [(1, 1)] * len(planes)
    h, w = size or planes[0].shape
    q_luma = quant_table(QUANT_LUMA, qscale)
    q_chroma = quant_table(QUANT_CHROMA, qscale)
    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    out += _segment(
        b"\xff\xe0", b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    # DQT
    out += _segment(
        b"\xff\xdb", bytes([0x00]) + q_luma[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    )
    if color:
        out += _segment(
            b"\xff\xdb",
            bytes([0x01]) + q_chroma[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes(),
        )
    # SOF0
    ncomp = 3 if color else 1
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        tq = 0 if cid == 1 else 1
        hs, vs = samp[cid - 1]
        sof += bytes([cid, hs << 4 | vs, tq])
    out += _segment(b"\xff\xc0", sof)
    # DHT
    out += _segment(b"\xff\xc4", _dht_payload(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS))
    out += _segment(b"\xff\xc4", _dht_payload(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS))
    if color:
        out += _segment(
            b"\xff\xc4", _dht_payload(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        )
        out += _segment(
            b"\xff\xc4", _dht_payload(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
        )
    # DRI
    if restart_interval:
        out += _segment(b"\xff\xdd", struct.pack(">H", restart_interval))
    # SOS
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        tbl = 0 if cid == 1 else 1
        sos += bytes([cid, tbl << 4 | tbl])
    sos += bytes([0, 63, 0])
    out += _segment(b"\xff\xda", sos)

    dc_luma = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_luma = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_chroma = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_chroma = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    hmax = max(hs for hs, _ in samp)
    vmax = max(vs for _, vs in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    # pad each component plane (at its own resolution) to full MCU coverage
    padded = []
    for p, (hs, vs) in zip(planes, samp):
        th, tw = mcus_y * 8 * vs, mcus_x * 8 * hs
        ph_, pw_ = p.shape
        padded.append(np.pad(p, ((0, th - ph_), (0, tw - pw_)), mode="edge"))
    bw = _BitWriter()
    prev_dc = [0] * ncomp
    mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.put_marker(0xD0 + rst)
                rst = (rst + 1) % 8
                prev_dc = [0] * ncomp
            for ci in range(ncomp):
                hs, vs = samp[ci]
                q = q_luma if ci == 0 else q_chroma
                dc_codes = dc_luma if ci == 0 else dc_chroma
                ac_codes = ac_luma if ci == 0 else ac_chroma
                for byi in range(vs):
                    for bxi in range(hs):
                        r0 = (my * vs + byi) * 8
                        c0 = (mx * hs + bxi) * 8
                        qb = _quantize_block(
                            padded[ci][r0 : r0 + 8, c0 : c0 + 8], q
                        )
                        prev_dc[ci] = _encode_block(
                            bw, qb, prev_dc[ci], dc_codes, ac_codes
                        )
            mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_gray(
    img: np.ndarray, qscale: int = 1, restart_interval: int = 0
) -> bytes:
    """Encode an (h, w) uint8 array as a baseline grayscale JPEG."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("encode_jpeg_gray expects an (h, w) array")
    return _encode_jpeg([a], qscale, color=False, restart_interval=restart_interval)


def encode_jpeg_rgb(
    img: np.ndarray,
    qscale: int = 1,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline YCbCr JPEG
    (BT.601 forward transform, rounded half up). ``subsampling``:
    '444' (full-res chroma), '422' (chroma halved horizontally, 1×2
    box-mean), or '420' (chroma 2×2 box-mean downsampled, half-up —
    the web's default storage format)."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_jpeg_rgb expects an (h, w, 3) array")
    if subsampling not in ("444", "422", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [
        np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8) for p in (y, cb, cr)
    ]
    if subsampling == "444":
        return _encode_jpeg(
            planes, qscale, color=True, restart_interval=restart_interval
        )
    h, w = planes[0].shape
    # 4:2:0 / 4:2:2 chroma: pad to even dims (edge), box mean, half-up.
    fy = 2 if subsampling == "420" else 1
    sub = [planes[0]]
    for p in planes[1:]:
        q = np.pad(
            p, ((0, h % fy if fy == 2 else 0), (0, w % 2)), mode="edge"
        ).astype(np.int64)
        hh, ww = q.shape
        blocks = q.reshape(hh // fy, fy, ww // 2, 2).sum(axis=(1, 3))
        n = 2 * fy
        sub.append(((blocks + n // 2) // n).astype(np.uint8))  # floor(mean+0.5)
    return _encode_jpeg(
        sub,
        qscale,
        color=True,
        restart_interval=restart_interval,
        samp=[(2, fy), (1, 1), (1, 1)],
        size=(h, w),
    )


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def is_jpeg(data: bytes) -> bool:
    """SOI sniff — 2 bytes, per ADVICE r3 (don't enumerate APPn)."""
    return len(data) >= 3 and data[:3] == b"\xff\xd8\xff"


def _idct_block(coef: np.ndarray) -> np.ndarray:
    """Inverse DCT with the DC term split out so a DC-only block is exact
    (qd·q00/8 has denominator 8 — exact in binary floating point)."""
    dc = float(coef[0, 0])
    ac = coef.astype(np.float64)
    ac = ac.copy()
    ac[0, 0] = 0.0
    return (_DCT_T.T @ ac @ _DCT_T) + dc / 8.0


def _parse_headers(data: bytes) -> dict:
    """Walk the marker stream up to (and including) SOS; return every
    decode table plus where the entropy-coded data starts. Shared by the
    whole-file decoder and the restart-segment APIs (one header parse
    serves any number of independently decodable segments)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        # §B.1.1.2: any number of 0xFF fill bytes may pad before a marker;
        # skip them so the marker id is never itself read as 0xFF (ADVICE
        # r5: a foreign JPEG with fill bytes otherwise misparses — 0xFF is
        # not a marker id and the next two bytes get read as a bogus
        # segment length).
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT — may hold several tables
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                n = 64 * (2 if prec else 1)
                raw = seg[p : p + n]
                p += n
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                q = np.zeros((8, 8), dtype=np.int64)
                q[_ZZ_ROWS, _ZZ_COLS] = vals
                qtables[tid] = q
        elif marker == 0xC4:  # DHT — may hold several tables
            p = 0
            while p < len(seg):
                tclass, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                bits = list(seg[p : p + 16])
                p += 16
                nvals = sum(bits)
                vals = list(seg[p : p + nvals])
                p += nvals
                table: dict[tuple[int, int], int] = {}
                code = 0
                k = 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tclass, tid)] = table
        elif marker == 0xC0 or marker == 0xC1:  # SOF0 / SOF1
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            if any(hs not in (1, 2) or vs not in (1, 2) for _, hs, vs, _ in comps):
                raise NotImplementedError(
                    "only sampling factors 1 and 2 (4:4:4 / 4:2:2 / 4:2:0) supported"
                )
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG not supported")
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/extended-sequential Huffman JPEG (SOF0/SOF1) is supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns < len(frame[2]):
                # A spec-legal sequential JPEG may split its components
                # across several scans (§B.2.3 allows ns < Nf); this
                # decoder handles the interleaved single-scan form only.
                # Raise the envelope error, not a KeyError, so
                # _decode_image_bytes routes to the PIL fallback when one
                # is installed (ADVICE r5).
                raise NotImplementedError(
                    "multi-scan sequential JPEG not supported"
                )
            scan_tbl = {}
            for i in range(ns):
                cid, tsel = seg[1 + 2 * i : 3 + 2 * i]
                scan_tbl[cid] = (tsel >> 4, tsel & 0x0F)
            return {
                "qtables": qtables,
                "huff": huff,
                "frame": frame,
                "restart_interval": restart_interval,
                "scan_tbl": scan_tbl,
                "entropy_start": pos + seglen,
            }
        pos += seglen
    raise ValueError("no SOS marker found (truncated JPEG)")


def _decode_block(br: _BitReader, dc_tab, ac_tab, q: np.ndarray, prev_dc: int):
    """Decode one entropy-coded block: returns (new DC predictor,
    reconstructed float pixel block before level shift)."""
    zz = np.zeros(64, dtype=np.int64)
    s = br.read_symbol(dc_tab)
    diff = _extend(br.get(s), s) if s else 0
    dc = prev_dc + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = br.read_symbol(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run overflows block")
        zz[k] = _extend(br.get(s), s)
        k += 1
    coef = np.zeros((8, 8), dtype=np.int64)
    coef[_ZZ_ROWS, _ZZ_COLS] = zz * q[_ZZ_ROWS, _ZZ_COLS]
    return dc, _idct_block(coef)


def decode_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline JPEG to (width, height, channels, uint8 array).

    Grayscale returns (h, w); color returns (h, w, 3) RGB (BT.601
    inverse, rounded half up, clamped). See module docstring for the
    supported envelope; anything outside raises NotImplementedError."""
    hdr = _parse_headers(data)
    qtables, huff = hdr["qtables"], hdr["huff"]
    h, w, comps = hdr["frame"]
    scan_tbl = hdr["scan_tbl"]
    restart_interval = hdr["restart_interval"]
    ncomp = len(comps)
    br = _BitReader(data, hdr["entropy_start"])
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcus_y * 8 * vs, mcus_x * 8 * hs), dtype=np.float64)
        for _, hs, vs, _ in comps
    ]
    prev_dc = [0] * ncomp
    mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.expect_rst(rst)
                rst = (rst + 1) % 8
                prev_dc = [0] * ncomp
            mcu += 1
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                td, ta = scan_tbl[cid]
                for byi in range(vs):
                    for bxi in range(hs):
                        prev_dc[ci], px = _decode_block(
                            br, huff[(0, td)], huff[(1, ta)], qtables[tq], prev_dc[ci]
                        )
                        r0 = (my * vs + byi) * 8
                        c0 = (mx * hs + bxi) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = px
    # upsample subsampled components to full resolution by replication
    # (§A.1.1 nearest-neighbor — self-consistent with the encoder's
    # box-mean downsample), then crop and level-shift
    up = []
    for p, (_, hs, vs, _) in zip(planes, comps):
        if hs != hmax:
            p = np.repeat(p, hmax // hs, axis=1)
        if vs != vmax:
            p = np.repeat(p, vmax // vs, axis=0)
        up.append(p)
    cropped = [np.clip(np.floor(p[:h, :w] + 0.5) + 128.0, 0, 255) for p in up]
    if ncomp == 1:
        return w, h, 1, cropped[0].astype(np.uint8)
    y, cb, cr = cropped
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.floor(ch + 0.5), 0, 255) for ch in (r, g, b)], axis=-1
    )
    return w, h, 3, rgb.astype(np.uint8)


# --------------------------------------------------------------------------
# Restart-segment APIs: the distributed-decode path
# --------------------------------------------------------------------------


def split_restart_segments(data: bytes) -> tuple[bytes, int, list[tuple[int, bytes]]]:
    """Split a restart-interval JPEG into independently decodable
    entropy segments (§E.2.4: each RSTm boundary byte-aligns and resets
    the DC predictors, so every segment decodes with zero upstream
    state — the property that makes one huge JPEG parallel-decodable).

    Returns ``(header_bytes, n_mcus_total, [(mcu_start, segment), ...])``
    where ``header_bytes`` is the marker stream through SOS (re-parsed
    once per worker, ~350 B) and each segment is raw entropy data with
    its RST markers stripped. Requires DRI > 0."""
    hdr = _parse_headers(data)
    ri = hdr["restart_interval"]
    if ri <= 0:
        raise ValueError("split_restart_segments requires a restart interval")
    h, w, comps = hdr["frame"]
    # MCU grid is sized by the MAX sampling factors (§A.2.3) — ceil(h/8)
    # *ceil(w/8) is only right for 1x1 sampling and silently miscounted
    # per-segment MCUs for subsampled color streams (ADVICE r5).
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    n_mcus = ((h + 8 * vmax - 1) // (8 * vmax)) * ((w + 8 * hmax - 1) // (8 * hmax))
    start = hdr["entropy_start"]
    header = data[:start]
    # scan entropy data for unstuffed markers
    bounds = []
    pos = start
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        nxt = data[pos + 1]
        if nxt == 0x00:
            pos += 2  # stuffed
        elif 0xD0 <= nxt <= 0xD7:
            bounds.append(pos)
            pos += 2
        else:
            bounds.append(pos)  # EOI / next marker: end of entropy data
            break
    else:
        raise ValueError("entropy data ran off the end of the stream")
    segments = []
    seg_start = start
    for i, b in enumerate(bounds):
        segments.append((i * ri, data[seg_start:b]))
        seg_start = b + 2
    return header, n_mcus, segments


#: Per-worker header-parse cache: every segment of an asset (and every
#: asset encoded with the same tables) shares one ~350 B header, so a
#: worker parses it once per distinct header, not once per segment —
#: at 16 segments/asset the parse was the kernel's dominant cost.
_HEADER_CACHE: dict[bytes, dict] = {}


def decode_segment_pixel_sum(
    header: bytes, segment: bytes, n_mcus: int
) -> tuple[int, int]:
    """Decode one restart segment of a GRAYSCALE baseline JPEG and
    return ``(n_blocks, sum_px)`` — the per-segment partial of the
    whole-image pixel sum. Workers call this with the shared ~350 B
    header and their own segment; no worker sees another segment's
    bits or DC state. Color segments would need the cross-component
    transform joined downstream — out of scope, loud raise."""
    hdr = _HEADER_CACHE.get(header)
    if hdr is None:
        hdr = _parse_headers(header + b"\xff\xd9")
        if len(_HEADER_CACHE) > 64:  # bound worker memory
            _HEADER_CACHE.clear()
        _HEADER_CACHE[header] = hdr
    comps = hdr["frame"][2]
    if len(comps) != 1:
        raise NotImplementedError("segment decode supports grayscale only")
    cid, _, _, tq = comps[0]
    td, ta = hdr["scan_tbl"][cid]
    dc_tab, ac_tab = hdr["huff"][(0, td)], hdr["huff"][(1, ta)]
    q = hdr["qtables"][tq]
    br = _BitReader(segment + b"\xff\xd9", 0)
    prev_dc = 0
    total = 0
    for _ in range(n_mcus):
        prev_dc, px = _decode_block(br, dc_tab, ac_tab, q, prev_dc)
        total += int(np.clip(np.floor(px + 0.5) + 128.0, 0, 255).sum())
    return n_mcus, total
