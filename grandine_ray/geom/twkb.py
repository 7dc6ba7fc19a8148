"""TWKB (Tiny WKB) codec — zigzag-varint delta coding.

Reimplements the reference's partial TWKB support
(/root/reference/lib/spatial/twkb.go): 2-byte header
(type in bits 1-4, precision in 5-8; metadata flags in byte 2), signed
zigzag varints for coordinate deltas scaled by 10^precision. Like the
reference, only Point and LineString bodies are implemented; the format
is unused by the tiler pipelines and exists for codec-surface parity.

Note: the reference's twkbWriteLineString truncates the final byte of the
point-count uvarint (``buf[:bWritten-1]``, an upstream bug for counts
≥ 128); we write the count correctly and therefore only guarantee
byte-compat with reference-encoded lines shorter than 128 points (their
reader handles our output fine).
"""
from __future__ import annotations

import numpy as np

GEOM_POINT = 1
GEOM_LINESTRING = 2


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(n: int) -> int:
    return (n >> 1) if (n & 1) == 0 else -(n >> 1) - 1


def _write_uvarint(out: bytearray, v: int):
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _write_varint(out: bytearray, v: int):
    _write_uvarint(out, (v << 1) ^ (v >> 63) if v < 0 else v << 1)


def _read_uvarint(buf: bytes, pos: int):
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _read_varint(buf: bytes, pos: int):
    u, pos = _read_uvarint(buf, pos)
    return _unzigzag(u), pos


def encode_header(gtype: int, precision: int) -> bytes:
    """twkb.go:9-14: byte0 = precision<<4 ^ type; byte1 = flags (all 0)."""
    return bytes(((precision << 4) ^ gtype, 0))


def decode_header(buf: bytes):
    """twkb.go:70-93. Returns (type, precision, flags dict), consumed=2."""
    b0, b1 = buf[0], buf[1]
    return (
        b0 & 15,
        b0 >> 4,
        {
            "bbox": bool(b1 & 1),
            "size": bool(b1 & 2),
            "id_list": bool(b1 & 4),
            "extended_precision": bool(b1 & 8),
            "empty_geom": bool(b1 & 16),
        },
    )


def encode_point(x: float, y: float, precision: int = 6,
                 previous=(0.0, 0.0)) -> bytes:
    out = bytearray(encode_header(GEOM_POINT, precision))
    _encode_delta(out, x, y, previous, precision)
    return bytes(out)


def _encode_delta(out: bytearray, x: float, y: float, previous, precision: int):
    s = 10.0 ** precision
    xi = int(x * s)
    yi = int(y * s)
    xpi = int(previous[0] * s)
    ypi = int(previous[1] * s)
    _write_varint(out, xi - xpi)
    _write_varint(out, yi - ypi)


def encode_linestring(pts: np.ndarray, precision: int = 6) -> bytes:
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    out = bytearray(encode_header(GEOM_LINESTRING, precision))
    _write_uvarint(out, len(pts))
    prev = (0.0, 0.0)
    for x, y in pts:
        _encode_delta(out, float(x), float(y), prev, precision)
        prev = (float(x), float(y))
    return bytes(out)


def decode(buf: bytes):
    """TWKB blob → (gtype, coords ndarray [n,2])."""
    gtype, precision, flags = decode_header(buf)
    pos = 2
    s = 10.0 ** precision
    if gtype == GEOM_POINT:
        dx, pos = _read_varint(buf, pos)
        dy, pos = _read_varint(buf, pos)
        return gtype, np.array([[dx / s, dy / s]])
    if gtype == GEOM_LINESTRING:
        n, pos = _read_uvarint(buf, pos)
        pts = np.empty((n, 2))
        px = py = 0.0
        for i in range(n):
            dx, pos = _read_varint(buf, pos)
            dy, pos = _read_varint(buf, pos)
            px += dx / s
            py += dy / s
            pts[i] = (px, py)
        return gtype, pts
    raise ValueError(f"unsupported TWKB geometry type: {gtype}")
