"""ESRI Shapefile codec — decoder + encoder, from scratch.

Completes the converter's format set with the most common legacy GIS
interchange format (the reference family covers Spaten/GeoJSON/CSV/OSM;
real-world users of such a toolchain routinely hold .shp archives).
Implements the public ESRI Shapefile Technical Description (July 1998):

  .shp  main file — 100-byte header (file code 9994 BE, file length in
        16-bit words BE at byte 24, version 1000 LE, shape type LE,
        bbox 8 LE doubles), then records of (record number BE, content
        words BE) + little-endian shape content.
  .shx  index — same header, then (offset words BE, content words BE)
        per record.
  .dbf  dBase III attribute table — 32-byte header (record count LE
        u32 at 4, header size LE u16 at 8, record size LE u16 at 10),
        32-byte field descriptors terminated by 0x0D, fixed-width
        records each prefixed by a deletion flag.

Semantics mapped onto this engine's feature model (same contract as the
WKT codec, sources/wkt.py): Multi-part shapes explode into N
single-geometry features sharing the props (geojson/codec.go:113-126
semantics); polygon rings are stored unclosed (geom.go:140-143);
Z/M ordinates are dropped (2-D engine). Shapefile polygons arrive as a
flat ring list — clockwise rings are outers, counter-clockwise rings
are holes assigned to the innermost containing outer (spec p.8).
A DBF column literally named ``layer`` routes features to that layer.

Scale note: shapefiles are whole-file codecs here exactly like Spaten/
GeoJSON — each file parses inside one ``map_batches`` task off
``read_binary_files`` (converter.py), so a directory of thousands of
shapefiles parallelizes per file; a single multi-GB .shp does not split
(the format has no block structure — the reference's formats share this
contract). Sidecar .dbf/.shx are fetched next to the .shp by path.
"""
from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa

from ..geom import wkb as wkbmod
from ..geom.ops import ring_area
from ..geom.predicates import point_in_rings

SHP_NULL = 0
SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5
SHP_MULTIPOINT = 8

_POINT_TYPES = {1, 11, 21}
_POLYLINE_TYPES = {3, 13, 23}
_POLYGON_TYPES = {5, 15, 25}
_MULTIPOINT_TYPES = {8, 18, 28}


# ------------------------------------------------------------- decoder


def _rings_to_polygons(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Group a shapefile's flat ring list into polygons: clockwise
    rings are outers (spec p.8; in this engine's shoelace, ring_area
    == sum(x·yn − xn·y), so a y-up-clockwise spec outer has
    ring_area < 0); each counter-clockwise ring becomes a hole of the
    innermost (smallest |area|) outer containing its first vertex.
    Degenerate inputs (no CW ring) fall back to one polygon per ring."""
    outers: list[tuple[float, np.ndarray]] = []
    holes: list[np.ndarray] = []
    for r in rings:
        if len(r) < 3:
            continue
        a = ring_area(r)
        (outers if a < 0 else holes).append((abs(a), r) if a < 0 else r)
    if not outers:
        return [[r] for r in (holes or [])]
    polys: list[list[np.ndarray]] = [[r] for _, r in outers]
    areas = [a for a, _ in outers]
    for h in holes:
        px, py = float(h[0, 0]), float(h[0, 1])
        best = -1
        best_area = np.inf
        for i, (_, outer) in enumerate(outers):
            if areas[i] < best_area and point_in_rings(px, py, [outer]):
                best, best_area = i, areas[i]
        if best >= 0:
            polys[best].append(h)
        else:  # orphan hole: promote to its own polygon (tolerant read)
            polys.append([h])
    return polys


def _strip_close(r: np.ndarray) -> np.ndarray:
    if len(r) > 1 and (r[0] == r[-1]).all():
        return r[:-1]
    return r


def _parse_parts(body: bytes) -> list[np.ndarray]:
    """PolyLine/Polygon record body after the type word: bbox + part
    index array + XY points, split into per-part coordinate arrays."""
    n_parts, n_pts = struct.unpack_from("<ii", body, 36)
    parts = np.frombuffer(body, "<i4", n_parts, 44)
    off = 44 + 4 * n_parts
    xy = np.frombuffer(body, "<f8", 2 * n_pts, off).reshape(-1, 2)
    bounds = np.append(parts, n_pts)
    return [xy[bounds[i]:bounds[i + 1]].copy() for i in range(n_parts)]


def parse_shp(buf: bytes) -> list[bytes]:
    """.shp bytes → per-record lists of WKB blobs (Multi* exploded;
    entry i of the result belongs to DBF record i)."""
    if len(buf) < 100 or struct.unpack_from(">i", buf, 0)[0] != 9994:
        raise ValueError("not a shapefile: bad file code")
    file_words = struct.unpack_from(">i", buf, 24)[0]
    version = struct.unpack_from("<i", buf, 28)[0]
    if version != 1000:
        raise ValueError(f"unsupported shapefile version {version}")
    end = min(2 * file_words, len(buf))
    out: list[list[bytes]] = []
    pos = 100
    while pos + 8 <= end:
        _recno, words = struct.unpack_from(">ii", buf, pos)
        pos += 8
        body = buf[pos:pos + 2 * words]
        pos += 2 * words
        t = struct.unpack_from("<i", body, 0)[0]
        if t == SHP_NULL:
            out.append([])
        elif t in _POINT_TYPES:
            x, y = struct.unpack_from("<dd", body, 4)
            out.append([wkbmod.encode_point(x, y)])
        elif t in _MULTIPOINT_TYPES:
            n = struct.unpack_from("<i", body, 36)[0]
            xy = np.frombuffer(body, "<f8", 2 * n, 40).reshape(-1, 2)
            out.append([wkbmod.encode_point(float(px), float(py))
                        for px, py in xy])
        elif t in _POLYLINE_TYPES:
            out.append([wkbmod.encode_linestring(p)
                        for p in _parse_parts(body) if len(p) >= 2])
        elif t in _POLYGON_TYPES:
            rings = [_strip_close(r) for r in _parse_parts(body)]
            out.append([wkbmod.encode_polygon(p)
                        for p in _rings_to_polygons(rings)])
        else:
            raise ValueError(f"unsupported shape type {t}")
    return out


def parse_dbf(buf: bytes) -> list[dict]:
    """.dbf bytes → one props dict per (non-deleted) record.
    Types: C→str (trailing pad stripped), N/F→int or float, L→bool,
    D→'YYYYMMDD' string; empty values omitted."""
    if len(buf) < 32:
        return []
    n_rec, = struct.unpack_from("<I", buf, 4)
    hdr_size, rec_size = struct.unpack_from("<HH", buf, 8)
    fields = []
    pos = 32
    while pos + 32 <= hdr_size and buf[pos] != 0x0D:
        name = buf[pos:pos + 11].split(b"\x00", 1)[0].decode(
            "latin-1").strip()
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fdec = buf[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    out: list[dict] = []
    pos = hdr_size
    for _ in range(n_rec):
        if pos + rec_size > len(buf):
            break
        deleted = buf[pos:pos + 1] == b"*"
        cur = pos + 1
        props: dict = {}
        for name, ftype, flen, fdec in fields:
            raw = buf[cur:cur + flen]
            cur += flen
            s = raw.decode("latin-1").strip()
            if not s:
                continue
            if ftype in ("N", "F"):
                try:
                    props[name] = (float(s) if fdec or "." in s or
                                   ftype == "F" else int(s))
                except ValueError:
                    pass
            elif ftype == "L":
                if s in "TtYy":
                    props[name] = True
                elif s in "FfNn":
                    props[name] = False
            else:  # C, D, and anything exotic read as text
                props[name] = raw.decode("latin-1").rstrip()
        pos += rec_size
        if not deleted:
            out.append(props)
    return out


def parse_shapefile(shp: bytes, dbf: bytes | None = None,
                    source: str = "") -> pa.Table:
    """.shp (+ optional sidecar .dbf) → features table (same schema and
    explode semantics as the GeoJSON/WKT codecs)."""
    per_rec = parse_shp(shp)
    attrs = parse_dbf(dbf) if dbf else []
    wkbs: list[bytes] = []
    props_json: list[str] = []
    layers: list[str] = []
    for i, blobs in enumerate(per_rec):
        props = attrs[i] if i < len(attrs) else {}
        pj = json.dumps(props, sort_keys=True) if props else ""
        layer = str(props.get("layer", "default"))
        for b in blobs:
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


def read_sidecar_dbf(shp_path: str) -> bytes | None:
    """Best-effort fetch of the .dbf next to a local .shp (remote
    filesystems pass dbf= explicitly; the converter's per-file parse
    task calls this so the sidecar read happens on the worker)."""
    for ext in (".dbf", ".DBF"):
        try:
            with open(shp_path[:-4] + ext, "rb") as f:
                return f.read()
        except OSError:
            pass
    return None


# ------------------------------------------------------------- encoder


def _ensure_cw(r: np.ndarray) -> np.ndarray:
    """Spec outer orientation: y-up clockwise ⇔ ring_area < 0 (see
    _rings_to_polygons)."""
    return r if ring_area(r) < 0 else r[::-1]


def _ensure_ccw(r: np.ndarray) -> np.ndarray:
    return r if ring_area(r) >= 0 else r[::-1]


def _close(r: np.ndarray) -> np.ndarray:
    return np.vstack([r, r[:1]]) if len(r) > 1 and not \
        (r[0] == r[-1]).all() else r


def _shape_record(t: int, rings: list[np.ndarray]) -> bytes:
    """Little-endian record content for one feature."""
    if t == wkbmod.GEOM_POINT:
        x, y = rings[0][0]
        return struct.pack("<idd", SHP_POINT, float(x), float(y))
    if t == wkbmod.GEOM_LINESTRING:
        parts = [np.asarray(rings[0], np.float64)]
        stype = SHP_POLYLINE
    else:
        parts = [_close(_ensure_cw(np.asarray(rings[0], np.float64)))]
        parts += [_close(_ensure_ccw(np.asarray(r, np.float64)))
                  for r in rings[1:]]
        stype = SHP_POLYGON
    xy = np.concatenate(parts)
    offs = np.cumsum([0] + [len(p) for p in parts[:-1]]).astype("<i4")
    minx, miny = xy.min(axis=0)
    maxx, maxy = xy.max(axis=0)
    return (struct.pack("<i4d2i", stype, minx, miny, maxx, maxy,
                        len(parts), len(xy))
            + offs.tobytes() + xy.astype("<f8").tobytes())


def _dbf_bytes(props: list[dict]) -> bytes:
    """Attribute table: bool → L, int → N, everything else → C (floats
    as repr text — exact round-trip without fixed-decimal loss)."""
    keys = sorted({k for p in props for k in p})
    fields = []
    for k in keys:
        vals = [p[k] for p in props if k in p]
        if vals and all(isinstance(v, bool) for v in vals):
            ftype, flen = "L", 1
        elif vals and all(isinstance(v, int) and not isinstance(v, bool)
                          for v in vals):
            ftype = "N"
            flen = max(len(str(v)) for v in vals)
        elif vals and all(isinstance(v, (int, float))
                          and not isinstance(v, bool) for v in vals):
            # repr round-trips float64 exactly through float()
            ftype = "F"
            flen = max(len(repr(float(v))) for v in vals)
        else:
            ftype = "C"
            flen = min(254, max((len(_cstr(v)) for v in vals),
                                default=1) or 1)
        fields.append((k, ftype, flen))
    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack("<B3BIHH20x", 0x03, 98, 7, 26, len(props),
                       hdr_size, rec_size)
    for k, ftype, flen in fields:
        name = k.encode("latin-1", "replace")[:10]
        out += struct.pack("<11sc4xBB14x", name, ftype.encode(), flen, 0)
    out += b"\x0d"
    for p in props:
        out += b" "
        for k, ftype, flen in fields:
            if k not in p:
                out += (b" " * flen)
                continue
            v = p[k]
            if ftype == "L":
                out += b"T" if v else b"F"
            elif ftype == "N":
                out += str(v).rjust(flen).encode("latin-1")
            elif ftype == "F":
                out += repr(float(v)).rjust(flen).encode("latin-1")
            else:
                out += _cstr(v).ljust(flen).encode("latin-1",
                                                   "replace")[:flen]
    out += b"\x1a"
    return bytes(out)


def _cstr(v) -> str:
    return v if isinstance(v, str) else repr(v)


def features_to_shapefile(table: pa.Table) -> dict[str, bytes]:
    """features table → {'shp': ..., 'shx': ..., 'dbf': ...}.
    A shapefile holds ONE shape class (spec p.4): mixed point/line/
    polygon inputs raise — split by geom_type first (the reference-era
    toolchains share this constraint)."""
    gb = wkbmod.decode_wkb_batch(table["geom_wkb"].to_pylist())
    types = set(int(t) for t in gb.types)
    if len(types) > 1:
        raise ValueError(f"shapefile requires a single shape class, "
                         f"got geom types {sorted(types)}")
    stype = {wkbmod.GEOM_POINT: SHP_POINT,
             wkbmod.GEOM_LINESTRING: SHP_POLYLINE,
             wkbmod.GEOM_POLYGON: SHP_POLYGON}[next(iter(types))] \
        if types else SHP_POINT
    records = [_shape_record(int(gb.types[i]), gb.rings_of(i))
               for i in range(len(gb.types))]
    shp = bytearray(b"\x00" * 100)
    shx = bytearray(b"\x00" * 100)
    offset = 100
    for i, rec in enumerate(records):
        words = len(rec) // 2
        shx += struct.pack(">ii", offset // 2, words)
        shp += struct.pack(">ii", i + 1, words) + rec
        offset += 8 + len(rec)
    all_xy = (np.concatenate([np.concatenate(gb.rings_of(i))
                              for i in range(len(gb.types))])
              if len(gb.types) else np.zeros((1, 2)))
    bbox = (all_xy[:, 0].min(), all_xy[:, 1].min(),
            all_xy[:, 0].max(), all_xy[:, 1].max())
    for dst in (shp, shx):
        struct.pack_into(">i", dst, 0, 9994)
        struct.pack_into("<ii", dst, 28, 1000, stype)
        struct.pack_into("<4d", dst, 36, *bbox)
    struct.pack_into(">i", shp, 24, len(shp) // 2)
    struct.pack_into(">i", shx, 24, len(shx) // 2)
    props = []
    pj = (table["props_json"].to_pylist()
          if "props_json" in table.column_names
          else [""] * table.num_rows)
    for s in pj:
        props.append(json.loads(s) if s else {})
    return {"shp": bytes(shp), "shx": bytes(shx),
            "dbf": _dbf_bytes(props)}


def write_shapefile(table: pa.Table, out_path: str) -> int:
    """Write .shp/.shx/.dbf next to each other (out_path names the
    .shp; sidecars swap the extension). Returns the feature count."""
    base = out_path[:-4] if out_path.lower().endswith(".shp") else out_path
    parts = features_to_shapefile(table)
    for ext in ("shp", "shx", "dbf"):
        with open(f"{base}.{ext}", "wb") as f:
            f.write(parts[ext])
    return table.num_rows
