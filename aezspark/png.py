"""Minimal pure-stdlib PNG codec (RGB8) for the thumbnail sink (S11).

The reference shells out to `gdal_translate -of png -expand rgb -outsize 1%`
(process_imagery.py:500-508). Neither GDAL nor PIL/matplotlib exists in this
container, so the engine writes the (public, RFC 2083) PNG format directly:
IHDR + one zlib-compressed IDAT of filter-0 scanlines + IEND. The reader
exists for round-trip tests only.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def write_rgb(path: str, rgb: "np.ndarray") -> str:
    """Write an (H, W, 3) uint8 array as an RGB8 PNG."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, c = rgb.shape
    assert c == 3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, truecolor
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    with open(path, "wb") as f:
        f.write(_SIG)
        f.write(_chunk(b"IHDR", ihdr))
        f.write(_chunk(b"IDAT", zlib.compress(raw, 9)))
        f.write(_chunk(b"IEND", b""))
    return path


def read_rgb(path: str) -> "np.ndarray":
    """Read back a PNG written by write_rgb (filter-0 RGB8 only)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == _SIG, "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and ctype == 2, "only RGB8 supported"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = []
    for y in range(h):
        line = raw[y * stride:(y + 1) * stride]
        assert line[0] == 0, "only filter 0 supported"
        rows.append(np.frombuffer(line[1:], dtype=np.uint8).reshape(w, 3))
    return np.stack(rows)
