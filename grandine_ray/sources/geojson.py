"""GeoJSON / GeoJSONSeq / CSV codecs (reference lib/geojson, lib/geojsonseq,
lib/csv).

Semantics preserved:
  * Multi* geometries are exploded into N single-geometry features sharing
    one props map (geojson/codec.go:113-126); feature ``id`` moves into
    props (codec.go:87-92).
  * CRS name → SRID via the OGC URN map (geojson/ogc_srid.go:3-10).
  * GeoJSONSeq is an RS (0x1e) separated stream of single features
    (geojsonseq/codec.go:13).
  * CSV: header row gives prop keys; lat/lon columns become Point features;
    every cell is a string prop; default delimiter is TAB
    (csv/codec.go:12,54-93).
  * GeoJSON output fixes polygon winding on marshal (geom.go:188).
"""
from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..geom import wkb as wkbmod
from ..geom.ops import fix_winding

OGC_SRID = {"urn:ogc:def:crs:OGC:1.3:CRS84": "4326"}


def _geom_to_wkb_list(geom: dict) -> list[bytes]:
    """One GeoJSON geometry → 1..N WKB blobs (Multi* exploded)."""
    t = geom["type"]
    c = geom["coordinates"]
    if t == "Point":
        return [wkbmod.encode_point(c[0], c[1])]
    if t == "LineString":
        return [wkbmod.encode_linestring(np.asarray(c, dtype=float))]
    if t == "Polygon":
        return [_polygon_wkb(c)]
    if t == "MultiPoint":
        return [wkbmod.encode_point(p[0], p[1]) for p in c]
    if t == "MultiLineString":
        return [wkbmod.encode_linestring(np.asarray(l, dtype=float)) for l in c]
    if t == "MultiPolygon":
        return [_polygon_wkb(p) for p in c]
    raise ValueError(f"unsupported geometry type: {t}")


def _polygon_wkb(rings_coords) -> bytes:
    rings = []
    for ring in rings_coords:
        r = np.asarray(ring, dtype=float)
        if len(r) > 1 and (r[0] == r[-1]).all():
            r = r[:-1]  # store unclosed (geom.go:140-143)
        rings.append(r)
    return wkbmod.encode_polygon(rings)


def parse_feature_collection(text: str, source: str = "") -> pa.Table:
    doc = json.loads(text)
    srid = "4326"
    crs = doc.get("crs")
    if crs and crs.get("properties", {}).get("name") in OGC_SRID:
        srid = OGC_SRID[crs["properties"]["name"]]
    feats = doc.get("features", [])
    return _features_to_table(feats, source, srid)


def parse_feature_seq(payload: str, source: str = "") -> pa.Table:
    """RS-separated stream of single features (geojsonseq/codec.go:21-68)."""
    feats = []
    for chunk in payload.split("\x1e"):
        chunk = chunk.strip()
        if chunk:
            feats.append(json.loads(chunk))
    return _features_to_table(feats, source, "4326")


def _features_to_table(feats: list[dict], source: str, srid: str) -> pa.Table:
    wkbs: list[bytes] = []
    props_json: list[str] = []
    layers: list[str] = []
    for ft in feats:
        props = dict(ft.get("properties") or {})
        if "id" in ft and ft["id"] is not None:
            props["id"] = ft["id"]  # codec.go:87-92
        blobs = _geom_to_wkb_list(ft["geometry"])
        layer = str(props.get("@layer", "default"))
        pj = json.dumps({k: v for k, v in props.items()}, sort_keys=True) if props else ""
        for b in blobs:
            wkbs.append(b)
            props_json.append(pj)
            layers.append(layer)
    gb = wkbmod.decode_wkb_batch(wkbs)
    bb = gb.bboxes()
    return pa.table(
        {
            "doc_id": pa.array([source] * len(wkbs), pa.string()),
            "span_idx": pa.array(np.arange(len(wkbs), dtype=np.int32), pa.int32()),
            "geom_type": pa.array(gb.types, pa.uint8()),
            "geom_wkb": pa.array(wkbs, pa.binary()),
            "bbox_minx": pa.array(bb[:, 0] if len(wkbs) else []),
            "bbox_miny": pa.array(bb[:, 1] if len(wkbs) else []),
            "bbox_maxx": pa.array(bb[:, 2] if len(wkbs) else []),
            "bbox_maxy": pa.array(bb[:, 3] if len(wkbs) else []),
            "layer": pa.array(layers, pa.string()),
            "props_json": pa.array(props_json, pa.string()),
        }
    )


def features_to_geojson(table: pa.Table, srid: str = "4326") -> str:
    """features table → GeoJSON FeatureCollection (winding fixed on write)."""
    gb = wkbmod.decode_wkb_batch(table["geom_wkb"].to_pylist())
    props_json = (
        table["props_json"].to_pylist()
        if "props_json" in table.column_names
        else [""] * len(gb)
    )
    out = {"type": "FeatureCollection", "features": []}
    if srid != "4326":
        out["crs"] = {"type": "name", "properties": {"name": f"EPSG:{srid}"}}
    for i in range(len(gb)):
        t = int(gb.types[i])
        rings = gb.rings_of(i)
        if t == wkbmod.GEOM_POINT:
            geom = {"type": "Point", "coordinates": rings[0][0].tolist()}
        elif t == wkbmod.GEOM_LINESTRING:
            geom = {"type": "LineString", "coordinates": rings[0].tolist()}
        else:
            fixed = fix_winding(rings)
            coords = []
            for r in fixed:
                closed = np.vstack([r, r[:1]])  # close on marshal (geom.go:184-186)
                coords.append(closed.tolist())
            geom = {"type": "Polygon", "coordinates": coords}
        props = json.loads(props_json[i]) if props_json[i] else {}
        out["features"].append(
            {"type": "Feature", "properties": props, "geometry": geom}
        )
    return json.dumps(out)


# ----------------------------------------------------------------------- CSV


def parse_points_csv(text: str, lat_col: int, lon_col: int,
                     delim: str = "\t", source: str = "") -> pa.Table:
    """Header row = prop keys; rows = Point features (csv/codec.go:54-142)."""
    lines = text.splitlines()
    if not lines:
        raise ValueError("empty CSV")
    header = lines[0].split(delim)
    wkbs: list[bytes] = []
    props_json: list[str] = []
    for line in lines[1:]:
        if not line:
            continue
        cells = line.split(delim)
        lat = float(cells[lat_col])
        lon = float(cells[lon_col])
        wkbs.append(wkbmod.encode_point(lon, lat))
        props = {header[i]: cells[i] for i in range(min(len(header), len(cells)))}
        props_json.append(json.dumps(props, sort_keys=True))
    gb = wkbmod.decode_wkb_batch(wkbs)
    bb = gb.bboxes()
    return pa.table(
        {
            "doc_id": pa.array([source] * len(wkbs), pa.string()),
            "span_idx": pa.array(np.arange(len(wkbs), dtype=np.int32), pa.int32()),
            "geom_type": pa.array(gb.types, pa.uint8()),
            "geom_wkb": pa.array(wkbs, pa.binary()),
            "bbox_minx": pa.array(bb[:, 0]),
            "bbox_miny": pa.array(bb[:, 1]),
            "bbox_maxx": pa.array(bb[:, 2]),
            "bbox_maxy": pa.array(bb[:, 3]),
            "layer": pa.array(["default"] * len(wkbs), pa.string()),
            "props_json": pa.array(props_json, pa.string()),
        }
    )


# ------------------------------------------------------- codec dispatch


def guess_codec(filename: str):
    """Pick parser by extension (converter.go:220-230)."""
    fn = filename.lower()
    if fn.endswith(".geojson") or fn.endswith(".json"):
        return parse_feature_collection
    if fn.endswith(".geojsonseq"):
        return parse_feature_seq
    if fn.endswith(".csv") or fn.endswith(".tsv"):
        return parse_points_csv
    if fn.endswith(".spaten"):
        from .spaten import spaten_to_table

        return spaten_to_table
    if fn.endswith(".wkt"):
        from .wkt import parse_wkt_lines

        return parse_wkt_lines
    if fn.endswith(".shp"):
        from .shapefile import parse_shapefile

        return parse_shapefile
    if fn.endswith(".gpkg"):
        from .gpkg import parse_gpkg

        return parse_gpkg
    if fn.endswith(".gpx"):
        from .gpx import parse_gpx

        return parse_gpx
    raise ValueError(f"no codec for {filename}")
