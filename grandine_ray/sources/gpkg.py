"""OGC GeoPackage codec — decoder + encoder over stdlib sqlite3.

GeoPackage (OGC 12-128r18) is the modern container format succeeding
shapefiles: an SQLite database with required metadata tables
(``gpkg_contents``, ``gpkg_geometry_columns``, ``gpkg_spatial_ref_sys``)
and one table per feature layer whose geometry column holds a
GeoPackageBinary blob — an 8-byte ``GP`` header (version, flags with an
envelope-size indicator, srs_id) + optional envelope + standard WKB.

Mapping onto this engine's feature model: each gpkg feature table IS a
layer (the ``layer`` column round-trips as the table name); attribute
columns become props_json; Multi*/GeometryCollection WKB explodes into
N single-geometry features sharing the props (the GeoJSON codec's
semantics); Z/M ordinates drop (2-D engine). Foreign WKB — big-endian,
ISO (type+1000·dim) or EWKB (flag bits + embedded SRID) — is
normalized to the engine's little-endian 2-D form on read.

The decoder works from bytes (``sqlite3.Connection.deserialize``), so
it plugs into the same ``read_binary_files → map_batches`` per-file
parse the other whole-file codecs use (converter.py): a directory of
gpkg files parallelizes per file; one file parses in one task (SQLite
has no remote-range-read story — same contract as Spaten/GeoJSON).
"""
from __future__ import annotations

import json
import sqlite3
import struct

import numpy as np
import pyarrow as pa

from ..geom import wkb as wkbmod

_ENVELOPE_BYTES = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


def _q(ident: str) -> str:
    """SQL identifier quoting (layer/table and column names come from
    user data — embedded double quotes must not break out)."""
    return '"' + ident.replace('"', '""') + '"'

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTI = {4, 5, 6, 7}  # multipoint/line/polygon + collection


# ---------------------------------------------------- foreign WKB read


def _parse_foreign_wkb(buf: bytes, pos: int, out: list[bytes]) -> int:
    """Parse ONE geometry at `pos` (any endianness, ISO or EWKB Z/M
    variants), append its normalized little-endian 2-D single-geometry
    WKB(s) to `out`, return the position after it."""
    fmt = "<" if buf[pos] == 1 else ">"
    (t_raw,) = struct.unpack_from(fmt + "I", buf, pos + 1)
    pos += 5
    dims = 2
    if t_raw & 0x80000000:
        dims += 1                                # EWKB Z
    if t_raw & 0x40000000:
        dims += 1                                # EWKB M
    if t_raw & 0x20000000:
        pos += 4                                 # EWKB embedded SRID
    base = t_raw & 0x0FFFFFFF
    if base >= 3000:
        dims, base = 4, base - 3000              # ISO ZM
    elif base >= 2000:
        dims, base = 3, base - 2000              # ISO M
    elif base >= 1000:
        dims, base = 3, base - 1000              # ISO Z

    def coords(n: int, p: int) -> tuple[np.ndarray, int]:
        xy = np.frombuffer(buf, fmt + "f8", n * dims, p) \
            .reshape(n, dims)[:, :2]
        return np.ascontiguousarray(xy, np.float64), p + 8 * n * dims

    if base == _WKB_POINT:
        xy, pos = coords(1, pos)
        out.append(wkbmod.encode_point(float(xy[0, 0]), float(xy[0, 1])))
        return pos
    if base == _WKB_LINESTRING:
        (n,) = struct.unpack_from(fmt + "I", buf, pos)
        xy, pos = coords(n, pos + 4)
        out.append(wkbmod.encode_linestring(xy))
        return pos
    if base == _WKB_POLYGON:
        (nr,) = struct.unpack_from(fmt + "I", buf, pos)
        pos += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(fmt + "I", buf, pos)
            xy, pos = coords(n, pos + 4)
            if len(xy) > 1 and (xy[0] == xy[-1]).all():
                xy = xy[:-1]                     # store unclosed
            rings.append(xy)
        out.append(wkbmod.encode_polygon(rings))
        return pos
    if base in _WKB_MULTI:
        (n,) = struct.unpack_from(fmt + "I", buf, pos)
        pos += 4
        for _ in range(n):
            pos = _parse_foreign_wkb(buf, pos, out)
        return pos
    raise wkbmod.WKBError(f"unsupported foreign WKB type {t_raw}")


def normalize_wkb(buf: bytes) -> list[bytes]:
    """Any standard/ISO/EWKB blob → 1..N engine-native WKB blobs."""
    out: list[bytes] = []
    _parse_foreign_wkb(buf, 0, out)
    return out


def _strip_gp_header(blob: bytes) -> bytes | None:
    """GeoPackageBinary → the WKB payload (None for empty geometry)."""
    if len(blob) < 8 or blob[:2] != b"GP":
        raise ValueError("not a GeoPackageBinary blob")
    flags = blob[3]
    if flags & 0x20:
        raise ValueError("extended GeoPackageBinary not supported")
    if flags & 0x10:
        return None                              # empty-geometry flag
    env = _ENVELOPE_BYTES[(flags >> 1) & 0x7]
    return blob[8 + env:]


# ------------------------------------------------------------- decoder


def parse_gpkg(buf: bytes, source: str = "") -> pa.Table:
    """.gpkg bytes → features table (layer = gpkg table name; same
    schema/explode semantics as the GeoJSON/WKT/shapefile codecs)."""
    con = sqlite3.connect(":memory:")
    con.deserialize(buf)
    try:
        layers = [r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_contents "
            "WHERE data_type = 'features' ORDER BY table_name")]
        gcol = dict(con.execute(
            "SELECT table_name, column_name FROM gpkg_geometry_columns"))
        wkbs: list[bytes] = []
        props_json: list[str] = []
        out_layers: list[str] = []
        for layer in layers:
            geom_col = gcol.get(layer, "geom")
            info = list(con.execute(f'PRAGMA table_info({_q(layer)})'))
            names = [r[1] for r in info]
            is_pk = {r[1] for r in info if r[5]}
            is_bool = {r[1] for r in info
                       if (r[2] or "").upper() == "BOOLEAN"}
            for row in con.execute(f'SELECT * FROM {_q(layer)}'):
                rec = dict(zip(names, row))
                blob = rec.get(geom_col)
                if blob is None:
                    continue
                payload = _strip_gp_header(bytes(blob))
                if payload is None:
                    continue
                props = {}
                for k, v in rec.items():
                    if k == geom_col or k in is_pk or v is None:
                        continue
                    props[k] = bool(v) if k in is_bool else v
                pj = json.dumps(props, sort_keys=True) if props else ""
                for b in normalize_wkb(payload):
                    wkbs.append(b)
                    props_json.append(pj)
                    out_layers.append(layer)
    finally:
        con.close()
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
        "layer": pa.array(out_layers, pa.string()),
        "props_json": pa.array(props_json, pa.string()),
    })


# ------------------------------------------------------------- encoder

_WGS84_WKT = ('GEOGCS["WGS 84",DATUM["WGS_1984",'
              'SPHEROID["WGS 84",6378137,298.257223563]],'
              'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]')


def _gp_blob(wkb: bytes, minx: float, maxx: float,
             miny: float, maxy: float) -> bytes:
    # flags 0x03: little-endian header (bit 0) + XY envelope (indicator
    # 1 in bits 3-1); envelope order per spec §2.1.3: minx maxx miny maxy
    return (b"GP\x00\x03" + struct.pack("<i", 4326)
            + struct.pack("<4d", minx, maxx, miny, maxy) + wkb)


def _sql_type(vals: list) -> str:
    if vals and all(isinstance(v, bool) for v in vals):
        return "BOOLEAN"
    if vals and all(isinstance(v, int) and not isinstance(v, bool)
                    for v in vals):
        return "INTEGER"
    if vals and all(isinstance(v, (int, float))
                    and not isinstance(v, bool) for v in vals):
        return "REAL"
    return "TEXT"


def write_gpkg(table: pa.Table, out_path: str) -> int:
    """features table → a valid GeoPackage (one feature table per
    layer, required metadata tables, XY-envelope GP blobs).
    Returns the feature count."""
    import os

    if os.path.exists(out_path):
        os.remove(out_path)
    con = sqlite3.connect(out_path)
    try:
        con.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
        con.execute("PRAGMA user_version = 10300")         # 1.3.0
        con.execute(
            "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL,"
            " srs_id INTEGER PRIMARY KEY, organization TEXT NOT NULL,"
            " organization_coordsys_id INTEGER NOT NULL,"
            " definition TEXT NOT NULL, description TEXT)")
        con.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [("WGS 84", 4326, "EPSG", 4326, _WGS84_WKT, None),
             ("Undefined Cartesian", -1, "NONE", -1, "undefined", None),
             ("Undefined Geographic", 0, "NONE", 0, "undefined", None)])
        con.execute(
            "CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY,"
            " data_type TEXT NOT NULL, identifier TEXT UNIQUE,"
            " description TEXT DEFAULT '', last_change DATETIME,"
            " min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,"
            " srs_id INTEGER)")
        con.execute(
            "CREATE TABLE gpkg_geometry_columns (table_name TEXT"
            " NOT NULL, column_name TEXT NOT NULL, geometry_type_name"
            " TEXT NOT NULL, srs_id INTEGER NOT NULL, z TINYINT"
            " NOT NULL, m TINYINT NOT NULL,"
            " CONSTRAINT pk_geom_cols PRIMARY KEY (table_name,"
            " column_name))")
        layers = (table["layer"].to_pylist()
                  if "layer" in table.column_names
                  else ["features"] * table.num_rows)
        blobs = table["geom_wkb"].to_pylist()
        pj = (table["props_json"].to_pylist()
              if "props_json" in table.column_names
              else [""] * table.num_rows)
        props = [json.loads(s) if s else {} for s in pj]
        gb = wkbmod.decode_wkb_batch(blobs)
        bb = gb.bboxes() if len(blobs) else np.zeros((0, 4))
        n = 0
        for layer in sorted(set(layers)):
            idx = [i for i, l in enumerate(layers) if l == layer]
            keys = sorted({k for i in idx for k in props[i]})
            cols = {k: _sql_type([props[i][k] for i in idx
                                  if k in props[i]]) for k in keys}
            col_sql = "".join(f", {_q(k)} {t}" for k, t in cols.items())
            con.execute(f'CREATE TABLE {_q(layer)} (fid INTEGER PRIMARY'
                        f' KEY AUTOINCREMENT, geom BLOB{col_sql})')
            lb = bb[idx]
            con.execute(
                "INSERT INTO gpkg_contents (table_name, data_type,"
                " identifier, min_x, min_y, max_x, max_y, srs_id)"
                " VALUES (?,?,?,?,?,?,?,4326)",
                (layer, "features", layer, float(lb[:, 0].min()),
                 float(lb[:, 1].min()), float(lb[:, 2].max()),
                 float(lb[:, 3].max())))
            con.execute("INSERT INTO gpkg_geometry_columns VALUES"
                        " (?,?,?,4326,0,0)", (layer, "geom", "GEOMETRY"))
            ph = ",".join(["?"] * (1 + len(keys)))
            ins = (f'INSERT INTO {_q(layer)} (geom'
                   + "".join(f", {_q(k)}" for k in keys)
                   + f") VALUES ({ph})")
            for i in idx:
                gp = _gp_blob(blobs[i], bb[i, 0], bb[i, 2],
                              bb[i, 1], bb[i, 3])
                vals = [props[i].get(k) for k in keys]
                con.execute(ins, [gp] + [
                    (int(v) if isinstance(v, bool) else v)
                    for v in vals])
                n += 1
        con.commit()
    finally:
        con.close()
    return n
