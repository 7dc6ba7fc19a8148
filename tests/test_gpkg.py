"""GeoPackage codec: spec-built golden file, foreign-WKB normalizer
vectors (big-endian / ISO Z / EWKB+SRID / Multi* explode), multi-layer
round-trip, converter integration.

The golden .gpkg is built with RAW sqlite SQL + hand-packed
GeoPackageBinary blobs per OGC 12-128r18 — independent of the encoder
under test.
"""
import json
import sqlite3
import struct

import numpy as np
import pyarrow as pa
import pytest

from grandine_ray.geom import wkb as wkbmod
from grandine_ray.sources.gpkg import (
    normalize_wkb,
    parse_gpkg,
    write_gpkg,
)


def _hand_gpkg() -> bytes:
    """A two-table gpkg written with raw SQL and hand-packed blobs."""
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE gpkg_contents (table_name TEXT, data_type"
                " TEXT, identifier TEXT)")
    con.execute("CREATE TABLE gpkg_geometry_columns (table_name TEXT,"
                " column_name TEXT, geometry_type_name TEXT)")
    con.execute("INSERT INTO gpkg_contents VALUES"
                " ('pts', 'features', 'pts')")
    con.execute("INSERT INTO gpkg_contents VALUES"
                " ('roads', 'features', 'roads')")
    con.execute("INSERT INTO gpkg_geometry_columns VALUES"
                " ('pts', 'the_geom', 'POINT')")
    con.execute("INSERT INTO gpkg_geometry_columns VALUES"
                " ('roads', 'g', 'LINESTRING')")
    con.execute("CREATE TABLE pts (id INTEGER PRIMARY KEY, the_geom"
                " BLOB, name TEXT, flag BOOLEAN)")
    con.execute("CREATE TABLE roads (fid INTEGER PRIMARY KEY, g BLOB,"
                " lanes INTEGER)")
    # point with NO envelope (indicator 0): GP, v0, flags 0x01
    wkb_pt = (b"\x01" + struct.pack("<I", 1)
              + struct.pack("<dd", 13.4, 52.52))
    gp_pt = b"GP\x00\x01" + struct.pack("<i", 4326) + wkb_pt
    con.execute("INSERT INTO pts VALUES (1, ?, 'berlin', 1)", (gp_pt,))
    # linestring WITH XY envelope (indicator 1): flags 0x03
    xy = np.array([[0.0, 0.0], [1.0, 2.0], [3.0, 1.0]])
    wkb_ls = (b"\x01" + struct.pack("<II", 2, 3)
              + xy.astype("<f8").tobytes())
    gp_ls = (b"GP\x00\x03" + struct.pack("<i", 4326)
             + struct.pack("<4d", 0.0, 3.0, 0.0, 2.0) + wkb_ls)
    con.execute("INSERT INTO roads VALUES (7, ?, 4)", (gp_ls,))
    con.commit()
    return bytes(con.serialize())


def test_golden_decode():
    t = parse_gpkg(_hand_gpkg(), source="g")
    assert t.num_rows == 2
    by_layer = dict(zip(t["layer"].to_pylist(),
                        zip(t["geom_wkb"].to_pylist(),
                            t["props_json"].to_pylist())))
    assert set(by_layer) == {"pts", "roads"}
    gb = wkbmod.decode_wkb_batch([by_layer["pts"][0]])
    assert gb.rings_of(0)[0][0] == pytest.approx([13.4, 52.52])
    # BOOLEAN column decodes as bool; pk column excluded from props
    assert json.loads(by_layer["pts"][1]) == {"flag": True,
                                              "name": "berlin"}
    assert json.loads(by_layer["roads"][1]) == {"lanes": 4}
    gb2 = wkbmod.decode_wkb_batch([by_layer["roads"][0]])
    np.testing.assert_allclose(gb2.rings_of(0)[0],
                               [[0, 0], [1, 2], [3, 1]])


def test_normalize_wkb_big_endian():
    blob = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 5.0, 6.0)
    out = normalize_wkb(blob)
    gb = wkbmod.decode_wkb_batch(out)
    assert gb.rings_of(0)[0][0] == pytest.approx([5.0, 6.0])


def test_normalize_wkb_iso_z_and_ewkb_srid():
    # ISO PointZ: type 1001, three ordinates, Z dropped
    iso = (b"\x01" + struct.pack("<I", 1001)
           + struct.pack("<3d", 1.0, 2.0, 9.0))
    gb = wkbmod.decode_wkb_batch(normalize_wkb(iso))
    assert gb.rings_of(0)[0][0] == pytest.approx([1.0, 2.0])
    # EWKB point with SRID flag + embedded srid
    ewkb = (b"\x01" + struct.pack("<I", 1 | 0x20000000)
            + struct.pack("<i", 4326) + struct.pack("<dd", 3.0, 4.0))
    gb = wkbmod.decode_wkb_batch(normalize_wkb(ewkb))
    assert gb.rings_of(0)[0][0] == pytest.approx([3.0, 4.0])


def test_normalize_wkb_multipolygon_explodes():
    sq = np.array([[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]], float)
    def poly(offset):
        r = sq + offset
        return (b"\x01" + struct.pack("<III", 3, 1, len(r))
                + r.astype("<f8").tobytes())
    mp = (b"\x01" + struct.pack("<II", 6, 2) + poly(0.0) + poly(10.0))
    out = normalize_wkb(mp)
    assert len(out) == 2
    gb = wkbmod.decode_wkb_batch(out)
    assert list(gb.types) == [wkbmod.GEOM_POLYGON] * 2
    # closing vertex stripped on normalize
    assert len(gb.rings_of(0)[0]) == 4
    assert gb.rings_of(1)[0][:, 0].min() == 10.0


def test_round_trip_multi_layer(tmp_path):
    rings = [np.array([[0, 0], [0, 4], [4, 4], [4, 0]], float),
             np.array([[1, 1], [2, 1], [2, 2], [1, 2]], float)]
    t = pa.table({
        "geom_wkb": pa.array([
            wkbmod.encode_point(13.4, 52.52),
            wkbmod.encode_linestring(np.array([[0., 0.], [5., 5.]])),
            wkbmod.encode_polygon(rings)], pa.binary()),
        "layer": pa.array(["cities", "roads", "parks"], pa.string()),
        "props_json": pa.array([
            json.dumps({"name": "berlin", "pop": 3_700_000,
                        "cap": True, "area": 891.68}, sort_keys=True),
            json.dumps({"lanes": 2}, sort_keys=True), ""], pa.string()),
    })
    path = str(tmp_path / "rt.gpkg")
    assert write_gpkg(t, path) == 3
    # file-level conformance: magic application_id + required tables
    con = sqlite3.connect(path)
    (app_id,) = con.execute("PRAGMA application_id").fetchone()
    assert app_id == 0x47504B47
    names = {r[0] for r in con.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    assert {"gpkg_contents", "gpkg_geometry_columns",
            "gpkg_spatial_ref_sys", "cities", "roads", "parks"} <= names
    con.close()
    back = parse_gpkg(open(path, "rb").read(), source="rt")
    assert back.num_rows == 3
    got = dict(zip(back["layer"].to_pylist(),
                   zip(back["geom_wkb"].to_pylist(),
                       back["props_json"].to_pylist())))
    assert json.loads(got["cities"][1]) == {
        "name": "berlin", "pop": 3_700_000, "cap": True, "area": 891.68}
    assert got["roads"][1] == '{"lanes": 2}'
    assert got["parks"][1] == ""
    # geometry byte-identical (both sides engine-native WKB)
    assert got["cities"][0] == t["geom_wkb"][0].as_py()
    assert got["roads"][0] == t["geom_wkb"][1].as_py()
    assert got["parks"][0] == t["geom_wkb"][2].as_py()


def test_converter_integration(ray_session, tmp_path):
    """geojson → convert() → .gpkg → read_features → props survive."""
    from grandine_ray.pipelines.converter import convert, read_features

    src = tmp_path / "in.geojson"
    src.write_text(json.dumps({
        "type": "FeatureCollection", "features": [
            {"type": "Feature",
             "geometry": {"type": "Point", "coordinates": [2.35, 48.86]},
             "properties": {"name": "paris"}}]}))
    out = str(tmp_path / "o.gpkg")
    assert convert([str(src)], out, out_format="gpkg") == 1
    rows = read_features([out]).take_all()
    assert len(rows) == 1
    assert json.loads(rows[0]["props_json"])["name"] == "paris"
    gb = wkbmod.decode_wkb_batch([rows[0]["geom_wkb"]])
    assert gb.rings_of(0)[0][0] == pytest.approx([2.35, 48.86])


def test_normalize_wkb_geometry_collection():
    """Type-7 collection recursion: point + linestring explode flat."""
    pt = b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", 1.0, 2.0)
    ls = (b"\x01" + struct.pack("<II", 2, 2)
          + np.array([[0., 0.], [3., 4.]]).astype("<f8").tobytes())
    gc = b"\x01" + struct.pack("<II", 7, 2) + pt + ls
    out = normalize_wkb(gc)
    gb = wkbmod.decode_wkb_batch(out)
    assert list(gb.types) == [wkbmod.GEOM_POINT, wkbmod.GEOM_LINESTRING]
