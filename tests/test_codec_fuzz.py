"""Property/fuzz tests for the round-5 codecs (shapefile, gpkg) —
same harness style as test_fuzz.py (which caught real bugs in the WKB
and clip paths in earlier rounds)."""
import json
import struct

import numpy as np
from hypothesis import given, settings, strategies as st

from grandine_ray.geom import wkb as wkbmod
from grandine_ray.sources.gpkg import normalize_wkb, parse_gpkg, write_gpkg
from grandine_ray.sources.shapefile import (
    features_to_shapefile,
    parse_shapefile,
)

import pyarrow as pa

coord = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                  allow_infinity=False, width=64)


@given(st.lists(st.tuples(coord, coord), min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_shapefile_points_roundtrip(pts):
    t = pa.table({"geom_wkb": pa.array(
        [wkbmod.encode_point(x, y) for x, y in pts], pa.binary())})
    parts = features_to_shapefile(t)
    back = parse_shapefile(parts["shp"], parts["dbf"])
    assert back["geom_wkb"].to_pylist() == t["geom_wkb"].to_pylist()


@given(st.lists(st.lists(st.tuples(coord, coord), min_size=2,
                         max_size=12), min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_shapefile_polylines_roundtrip(lines):
    blobs = [wkbmod.encode_linestring(np.asarray(l, np.float64))
             for l in lines]
    t = pa.table({"geom_wkb": pa.array(blobs, pa.binary())})
    parts = features_to_shapefile(t)
    back = parse_shapefile(parts["shp"], parts["dbf"])
    assert back["geom_wkb"].to_pylist() == blobs


@given(st.integers(0, 100), st.integers(0, 100),
       st.integers(5, 50), st.integers(5, 50))
@settings(max_examples=100, deadline=None)
def test_shapefile_polygon_hole_roundtrip(x0, y0, w, h):
    """Rectangle outer + strictly contained rectangle hole: the decode
    regrouping must reattach the hole to this outer (ring point-sets
    preserved; orientation normalization is allowed)."""
    outer = np.array([[x0, y0], [x0, y0 + h], [x0 + w, y0 + h],
                      [x0 + w, y0]], float)
    hole = np.array([[x0 + 1, y0 + 1], [x0 + w / 4 + 1, y0 + 1],
                     [x0 + w / 4 + 1, y0 + h / 4 + 1],
                     [x0 + 1, y0 + h / 4 + 1]], float)
    t = pa.table({"geom_wkb": pa.array(
        [wkbmod.encode_polygon([outer, hole])], pa.binary())})
    parts = features_to_shapefile(t)
    back = parse_shapefile(parts["shp"], parts["dbf"])
    assert back.num_rows == 1
    gb = wkbmod.decode_wkb_batch(back["geom_wkb"].to_pylist())
    rings = gb.rings_of(0)
    assert len(rings) == 2
    got = {frozenset(map(tuple, r)) for r in rings}
    assert got == {frozenset(map(tuple, outer)),
                   frozenset(map(tuple, hole))}


_ident = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N"),
                           whitelist_characters=' _-."\''),
    min_size=1, max_size=20).filter(
        lambda s: s.strip() and not s.upper().startswith("GPKG")
        and s.lower() not in ("fid", "geom") and "\x00" not in s)

_propval = st.one_of(
    st.integers(-2**40, 2**40), st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(min_size=0, max_size=30).filter(lambda s: "\x00" not in s))


@given(st.dictionaries(_ident, _propval, max_size=4), _ident,
       st.tuples(coord, coord))
@settings(max_examples=60, deadline=None)
def test_gpkg_roundtrip_hostile_identifiers(props, layer, pt):
    """Layer and property names with quotes/dots/spaces must survive a
    write→read cycle intact (SQL identifier quoting), and typed props
    (int/bool/float/text) must round-trip exactly."""
    import os
    import tempfile

    from hypothesis import assume

    # SQLite column names are case-insensitive — distinct keys that
    # collide case-insensitively are out of the round-trip contract
    assume(len({k.lower() for k in props}) == len(props))
    pj = json.dumps(props, sort_keys=True) if props else ""
    t = pa.table({
        "geom_wkb": pa.array([wkbmod.encode_point(*pt)], pa.binary()),
        "layer": pa.array([layer], pa.string()),
        "props_json": pa.array([pj], pa.string()),
    })
    fd, path = tempfile.mkstemp(suffix=".gpkg")
    os.close(fd)
    try:
        assert write_gpkg(t, path) == 1
        back = parse_gpkg(open(path, "rb").read())
    finally:
        os.unlink(path)
    assert back.num_rows == 1
    assert back["layer"][0].as_py() == layer
    got = (json.loads(back["props_json"][0].as_py())
           if back["props_json"][0].as_py() else {})
    assert got == props
    assert back["geom_wkb"][0].as_py() == t["geom_wkb"][0].as_py()


@given(st.lists(st.tuples(coord, coord), min_size=1, max_size=10),
       st.sampled_from([("<", 0), (">", 0), ("<", 1000),
                        ("<", 0x80000000)]))
@settings(max_examples=100, deadline=None)
def test_normalize_wkb_foreign_linestrings(pts, variant):
    """Builder fuzz: the same linestring in little/big endian, ISO-Z
    and EWKB-Z encodings normalizes to identical engine WKB."""
    fmt, zmode = variant
    dims = 3 if zmode else 2
    t_raw = (2 + 1000) if zmode == 1000 else (2 | zmode)
    arr = np.asarray(pts, np.float64)
    xyz = np.column_stack([arr] + ([np.zeros(len(arr))] * (dims - 2)))
    blob = ((b"\x01" if fmt == "<" else b"\x00")
            + struct.pack(fmt + "II", t_raw, len(arr))
            + xyz.astype(fmt + "f8").tobytes())
    out = normalize_wkb(blob)
    assert out == [wkbmod.encode_linestring(arr)]
