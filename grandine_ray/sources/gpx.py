"""GPX (GPS Exchange Format) codec — decoder + encoder.

GPX is the ubiquitous GPS-track interchange XML (Topografix schema,
versions 1.0/1.1). Mapping onto the engine's feature model:

  wpt               → point feature, layer "waypoints"
  trk > trkseg      → one linestring feature PER SEGMENT (segments are
                      explicit gaps in a recording), layer "tracks",
                      props shared from the trk metadata
  rte > rtept...    → one linestring feature, layer "routes"

Child elements with simple text (name, desc, type, ele, time, …)
become props; lat/lon attributes map to (y, x). Namespace-agnostic
parse (local-name matching) so 1.0, 1.1 and extension-bearing files
all read. The encoder emits GPX 1.1: points → wpt, linestrings →
trk/trkseg (grouped by their layer into one trk each? no — one trk
per feature, name from props); polygons have no GPX representation
and raise. Whole-file codec, same per-file-parallel contract as the
other text formats (converter.py).
"""
from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from ..geom import wkb as wkbmod

_SCALAR_TAGS = ("name", "desc", "cmt", "type", "sym", "src",
                "ele", "time", "number")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _props_of(el) -> dict:
    props = {}
    for child in el:
        t = _local(child.tag)
        if t in _SCALAR_TAGS and child.text and child.text.strip():
            s = child.text.strip()
            if t in ("ele",):
                try:
                    props[t] = float(s)
                    continue
                except ValueError:
                    pass
            if t in ("number",):
                try:
                    props[t] = int(s)
                    continue
                except ValueError:
                    pass
            props[t] = s
    return props


def _pt(el) -> tuple[float, float]:
    return float(el.get("lon")), float(el.get("lat"))


def parse_gpx(text: str, source: str = "") -> pa.Table:
    """GPX 1.0/1.1 text → features table (same schema as the other
    codecs; layer ∈ {waypoints, tracks, routes})."""
    root = ET.fromstring(text)
    wkbs: list[bytes] = []
    props_json: list[str] = []
    layers: list[str] = []

    def emit(blob: bytes, props: dict, layer: str):
        wkbs.append(blob)
        props_json.append(json.dumps(props, sort_keys=True)
                          if props else "")
        layers.append(layer)

    for el in root:
        t = _local(el.tag)
        if t == "wpt":
            x, y = _pt(el)
            emit(wkbmod.encode_point(x, y), _props_of(el), "waypoints")
        elif t == "trk":
            props = _props_of(el)
            for seg in el:
                if _local(seg.tag) != "trkseg":
                    continue
                pts = [_pt(p) for p in seg if _local(p.tag) == "trkpt"]
                if len(pts) >= 2:
                    emit(wkbmod.encode_linestring(
                        np.asarray(pts, np.float64)), props, "tracks")
        elif t == "rte":
            props = _props_of(el)
            pts = [_pt(p) for p in el if _local(p.tag) == "rtept"]
            if len(pts) >= 2:
                emit(wkbmod.encode_linestring(
                    np.asarray(pts, np.float64)), props, "routes")
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
    s = f"{v:.17g}"
    return s


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _prop_tags(props: dict, indent: str) -> list[str]:
    out = []
    for k in sorted(props):
        if k in _SCALAR_TAGS:
            out.append(f"{indent}<{k}>{_esc(str(props[k]))}</{k}>")
    return out


def features_to_gpx(table: pa.Table) -> str:
    """features table → GPX 1.1 text (points → wpt, linestrings →
    one trk/trkseg each; polygons are not representable and raise)."""
    gb = wkbmod.decode_wkb_batch(table["geom_wkb"].to_pylist())
    pj = (table["props_json"].to_pylist()
          if "props_json" in table.column_names
          else [""] * table.num_rows)
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<gpx version="1.1" creator="grandine-ray" '
             'xmlns="http://www.topografix.com/GPX/1/1">']
    for i in range(len(gb.types)):
        t = int(gb.types[i])
        props = json.loads(pj[i]) if pj[i] else {}
        if t == wkbmod.GEOM_POINT:
            x, y = gb.rings_of(i)[0][0]
            lines.append(f'  <wpt lat="{_fmt(y)}" lon="{_fmt(x)}">')
            lines += _prop_tags(props, "    ")
            lines.append("  </wpt>")
        elif t == wkbmod.GEOM_LINESTRING:
            lines.append("  <trk>")
            lines += _prop_tags(props, "    ")
            lines.append("    <trkseg>")
            for x, y in gb.rings_of(i)[0]:
                lines.append(f'      <trkpt lat="{_fmt(y)}" '
                             f'lon="{_fmt(x)}"/>')
            lines.append("    </trkseg>")
            lines.append("  </trk>")
        else:
            raise ValueError("GPX cannot represent polygons; convert "
                             "to geojson/gpkg/shp instead")
    lines.append("</gpx>")
    return "\n".join(lines) + "\n"
