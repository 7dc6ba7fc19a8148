"""WKT (Well-Known Text) codec — decoder + encoder.

The reference toolkit family reads/writes geometries as WKT alongside
GeoJSON/Spaten (OGC Simple Features §7 text form); this codec completes
the converter's format set. Input file contract (.wkt): one feature per
line, `WKT` optionally followed by a TAB and a JSON props object; blank
lines and `#` comments skipped. Multi* geometries explode into N
single-geometry features sharing the props (the GeoJSON codec's
semantics, geojson/codec.go:113-126); polygon rings are stored unclosed
(geom.go:140-143).
"""
from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa

from ..geom import wkb as wkbmod

_NUM = r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"
_TOKEN = re.compile(rf"\s*({_NUM}|[A-Za-z]+|\(|\)|,)")


def _tokenize(text: str):
    pos = 0
    out = []
    n = len(text)
    while pos < n:
        m = _TOKEN.match(text, pos)
        if not m:
            if text[pos:].strip():
                raise ValueError(f"WKT parse error at {text[pos:pos+20]!r}")
            break
        out.append(m.group(1))
        pos = m.end()
    return out


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, expect=None):
        t = self.peek()
        if t is None or (expect is not None and t != expect):
            raise ValueError(f"WKT: expected {expect!r}, got {t!r}")
        self.i += 1
        return t

    def point(self):
        x = float(self.take())
        y = float(self.take())
        # tolerate Z/M ordinates by dropping them (2-D engine)
        while self.peek() not in (",", ")", None):
            self.take()
        return (x, y)

    def point_list(self):
        self.take("(")
        pts = [self.point()]
        while self.peek() == ",":
            self.take(",")
            pts.append(self.point())
        self.take(")")
        return np.asarray(pts, dtype=np.float64)

    def ring_list(self):
        self.take("(")
        rings = [self.point_list()]
        while self.peek() == ",":
            self.take(",")
            rings.append(self.point_list())
        self.take(")")
        return rings


def _strip_close(r: np.ndarray) -> np.ndarray:
    if len(r) > 1 and (r[0] == r[-1]).all():
        return r[:-1]  # store unclosed (geom.go:140-143)
    return r


def parse_wkt(text: str) -> list[bytes]:
    """One WKT geometry string → 1..N WKB blobs (Multi* exploded)."""
    toks = _tokenize(text)
    p = _P(toks)
    kind = p.take().upper()
    if p.peek() and p.peek().upper() in ("Z", "M", "ZM"):
        p.take()  # dimensional modifier; extra ordinates drop in point()
    if p.peek() and p.peek().upper() == "EMPTY":
        raise ValueError(f"WKT: EMPTY {kind} not supported")
    if kind == "POINT":
        p.take("(")
        x, y = p.point()
        p.take(")")
        return [wkbmod.encode_point(x, y)]
    if kind == "LINESTRING":
        return [wkbmod.encode_linestring(p.point_list())]
    if kind == "POLYGON":
        return [wkbmod.encode_polygon(
            [_strip_close(r) for r in p.ring_list()])]
    if kind == "MULTIPOINT":
        # both "((1 2), (3 4))" and legacy "(1 2, 3 4)" forms
        p.take("(")
        pts = []
        while True:
            if p.peek() == "(":
                p.take("(")
                pts.append(p.point())
                p.take(")")
            else:
                pts.append(p.point())
            if p.peek() == ",":
                p.take(",")
                continue
            break
        p.take(")")
        return [wkbmod.encode_point(x, y) for x, y in pts]
    if kind == "MULTILINESTRING":
        return [wkbmod.encode_linestring(ls) for ls in p.ring_list()]
    if kind == "MULTIPOLYGON":
        p.take("(")
        polys = [p.ring_list()]
        while p.peek() == ",":
            p.take(",")
            polys.append(p.ring_list())
        p.take(")")
        return [wkbmod.encode_polygon([_strip_close(r) for r in rings])
                for rings in polys]
    raise ValueError(f"WKT: unsupported geometry type {kind}")


def parse_wkt_lines(payload: str, source: str = "") -> pa.Table:
    """A .wkt file (one `WKT[\\tjson-props]` per line) → features table
    (same schema/semantics as the GeoJSON codec)."""
    wkbs: list[bytes] = []
    props_json: list[str] = []
    layers: list[str] = []
    for line in payload.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        wkt_part, _, props_part = line.partition("\t")
        props = json.loads(props_part) if props_part.strip() else {}
        pj = json.dumps(props, sort_keys=True) if props else ""
        layer = str(props.get("@layer", "default"))
        for b in parse_wkt(wkt_part):
            wkbs.append(b)
            props_json.append(pj)
            layers.append(layer)
    gb = wkbmod.decode_wkb_batch(wkbs)
    bb = gb.bboxes()
    return pa.table({
        "doc_id": pa.array([source] * len(wkbs), pa.string()),
        "span_idx": pa.array(np.arange(len(wkbs), dtype=np.int32),
                             pa.int32()),
        "geom_type": pa.array(gb.types, pa.uint8()),
        "geom_wkb": pa.array(wkbs, pa.binary()),
        "bbox_minx": pa.array(bb[:, 0] if len(wkbs) else []),
        "bbox_miny": pa.array(bb[:, 1] if len(wkbs) else []),
        "bbox_maxx": pa.array(bb[:, 2] if len(wkbs) else []),
        "bbox_maxy": pa.array(bb[:, 3] if len(wkbs) else []),
        "layer": pa.array(layers, pa.string()),
        "props_json": pa.array(props_json, pa.string()),
    })


def _fmt(v: float) -> str:
    return f"{v:.17g}".rstrip("0").rstrip(".") if "." in f"{v:.17g}" \
        else f"{v:.17g}"


def _coords(r: np.ndarray, close: bool) -> str:
    pts = np.vstack([r, r[:1]]) if close and len(r) > 1 else r
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in pts)


def to_wkt(blob: bytes) -> str:
    """One WKB blob → canonical WKT (rings closed on marshal, matching
    the GeoJSON encoder's closing behaviour, geom.go:184-186)."""
    gb = wkbmod.decode_wkb_batch([blob])
    t = int(gb.types[0])
    rings = gb.rings_of(0)
    if t == wkbmod.GEOM_POINT:
        x, y = rings[0][0]
        return f"POINT ({_fmt(x)} {_fmt(y)})"
    if t == wkbmod.GEOM_LINESTRING:
        return f"LINESTRING ({_coords(rings[0], close=False)})"
    inner = ", ".join(f"({_coords(r, close=True)})" for r in rings)
    return f"POLYGON ({inner})"


def features_to_wkt(table: pa.Table) -> str:
    """features table → .wkt text (one line per feature, props as the
    TAB-separated JSON column when present)."""
    blobs = table["geom_wkb"].to_pylist()
    props = (table["props_json"].to_pylist()
             if "props_json" in table.column_names else [""] * len(blobs))
    lines = []
    for b, pj in zip(blobs, props):
        w = to_wkt(b)
        lines.append(f"{w}\t{pj}" if pj else w)
    return "\n".join(lines) + ("\n" if lines else "")
