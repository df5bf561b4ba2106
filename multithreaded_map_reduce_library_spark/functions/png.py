"""Minimal, dependency-free PNG codec (stdlib ``zlib`` + ``struct``).

The container ships no image libraries, but PNG itself is just zlib over
filtered scanlines — so the engine carries a real decoder for the common
cases (8-bit greyscale / RGB / RGBA, non-interlaced, all five scanline
filters) and a matching encoder used by tests and the
``multimodal_png_roundtrip`` query to fabricate genuine PNG payloads.
``operators/multimodal._decode_image_bytes`` prefers PIL when available
and falls back to this decoder, replacing the round-1
``NotImplementedError`` stub with a working decode path.

Spec: https://www.w3.org/TR/png-3/ (chunk layout §5, filters §9).
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type (palette/16-bit/interlace unsupported).
_CHANNELS = {0: 1, 2: 3, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == _MAGIC


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: "list[list[int]] | object", channels: int = 1) -> bytes:
    """Encode 8-bit pixels to PNG. ``pixels`` is rows x (width*channels)
    ints 0-255 (or a NumPy array of shape (h, w) / (h, w, c)). Scanlines
    use filter 0 — a valid (if uncompressed-friendly) choice any decoder
    must accept."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 3:
        h, w, channels = arr.shape
        flat = arr.reshape(h, w * channels)
    elif arr.ndim == 2 and channels == 1:
        h, w = arr.shape
        flat = arr
    else:
        h = arr.shape[0]
        w = arr.shape[1] // channels
        flat = arr
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> "tuple[int, int, int, object]":
    """Decode a PNG to ``(width, height, channels, ndarray[h, w, c])``.

    Supports bit depth 8, color types 0/2/6, no interlace — the envelope
    every common tool emits for the sizes a data pipeline thumbnails at.
    Anything else raises ``NotImplementedError`` (the honest boundary of
    a stdlib decoder), and malformed streams raise ``ValueError``.
    """
    import numpy as np

    if not is_png(payload):
        raise ValueError("not a PNG byte stream")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0 or color_type not in _CHANNELS:
                raise NotImplementedError(
                    f"unsupported PNG: depth={depth} color_type={color_type} "
                    f"interlace={interlace}"
                )
            channels = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline payload has wrong length")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line
            for x in range(channels, stride):
                cur[x] = (int(cur[x]) + int(cur[x - channels])) & 0xFF
        elif ftype == 2:  # Up
            cur = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - channels]) if x >= channels else 0
                cur[x] = (int(cur[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                left = int(cur[x - channels]) if x >= channels else 0
                up_left = int(prev[x - channels]) if x >= channels else 0
                cur[x] = (int(cur[x]) + _paeth(left, int(prev[x]), up_left)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return width, height, channels, out.reshape(height, width, channels)
