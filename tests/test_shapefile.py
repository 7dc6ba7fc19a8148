"""Shapefile codec: spec-golden bytes, round-trips, ring grouping,
Z/M tolerance, DBF typing, converter integration.

Golden vectors are built BY HAND from the ESRI Shapefile Technical
Description (July 1998) — independent struct.pack code in this file,
not the encoder under test.
"""
import json
import struct

import numpy as np
import pyarrow as pa
import pytest

from grandine_ray.geom import wkb as wkbmod
from grandine_ray.sources.shapefile import (
    features_to_shapefile,
    parse_dbf,
    parse_shapefile,
    parse_shp,
    write_shapefile,
)


def _golden_point_shp(pts):
    """Spec-built .shp of Point records (type 1)."""
    recs = b""
    for i, (x, y) in enumerate(pts):
        body = struct.pack("<idd", 1, x, y)
        recs += struct.pack(">ii", i + 1, len(body) // 2) + body
    total = 100 + len(recs)
    hdr = bytearray(100)
    struct.pack_into(">i", hdr, 0, 9994)
    struct.pack_into(">i", hdr, 24, total // 2)
    struct.pack_into("<ii", hdr, 28, 1000, 1)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    struct.pack_into("<4d", hdr, 36, min(xs), min(ys), max(xs), max(ys))
    return bytes(hdr) + recs


def test_point_golden_decode():
    shp = _golden_point_shp([(13.4, 52.52), (-71.06, 42.36)])
    per_rec = parse_shp(shp)
    assert len(per_rec) == 2 and all(len(r) == 1 for r in per_rec)
    gb = wkbmod.decode_wkb_batch([b for r in per_rec for b in r])
    assert list(gb.types) == [wkbmod.GEOM_POINT] * 2
    assert gb.rings_of(0)[0][0] == pytest.approx([13.4, 52.52])
    assert gb.rings_of(1)[0][0] == pytest.approx([-71.06, 42.36])


def test_point_golden_encode_matches_spec_bytes():
    """Encoder output is byte-identical to the independently built
    spec bytes for a point file (bbox, lengths, record framing)."""
    t = pa.table({
        "geom_wkb": pa.array([wkbmod.encode_point(13.4, 52.52),
                              wkbmod.encode_point(-71.06, 42.36)],
                             pa.binary()),
    })
    got = features_to_shapefile(t)
    assert got["shp"] == _golden_point_shp([(13.4, 52.52),
                                            (-71.06, 42.36)])
    # shx: one 8-byte entry per record, offsets in 16-bit words
    assert len(got["shx"]) == 100 + 16
    off0, words0 = struct.unpack_from(">ii", got["shx"], 100)
    off1, words1 = struct.unpack_from(">ii", got["shx"], 108)
    assert (off0, words0) == (50, 10)           # 100/2, 20-byte body
    assert (off1, words1) == ((100 + 8 + 20) // 2, 10)


def test_polyline_multipart_explodes():
    """A 2-part PolyLine record becomes 2 linestring features."""
    parts = [np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]]),
             np.array([[5.0, 5.0], [6.0, 6.0]])]
    xy = np.concatenate(parts)
    body = struct.pack("<i4d2i", 3, 0.0, 0.0, 6.0, 6.0, 2, len(xy))
    body += np.array([0, 3], "<i4").tobytes() + xy.astype("<f8").tobytes()
    shp = bytearray(100)
    struct.pack_into(">i", shp, 0, 9994)
    struct.pack_into("<ii", shp, 28, 1000, 3)
    rec = struct.pack(">ii", 1, len(body) // 2) + body
    struct.pack_into(">i", shp, 24, (100 + len(rec)) // 2)
    per_rec = parse_shp(bytes(shp) + rec)
    assert len(per_rec) == 1 and len(per_rec[0]) == 2
    gb = wkbmod.decode_wkb_batch(per_rec[0])
    assert list(gb.types) == [wkbmod.GEOM_LINESTRING] * 2
    np.testing.assert_allclose(gb.rings_of(0)[0], parts[0])
    np.testing.assert_allclose(gb.rings_of(1)[0], parts[1])


def test_polygon_hole_grouping_and_nesting():
    """CW rings are outers, CCW holes attach to the innermost
    containing outer; two disjoint outers + one hole each side."""
    big = np.array([[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]],
                   float)                        # CW (y-up shoelace > 0)
    hole = big[::-1] * 0.2 + 4                   # CCW, inside big
    far = big + 100                              # CW, disjoint
    # build a raw polygon record with rings in spec orientation
    rings = [big, hole, far]
    xy = np.concatenate(rings)
    offs = np.cumsum([0] + [len(r) for r in rings[:-1]])
    body = struct.pack("<i4d2i", 5, 0.0, 0.0, 110.0, 110.0,
                       len(rings), len(xy))
    body += offs.astype("<i4").tobytes() + xy.astype("<f8").tobytes()
    shp = bytearray(100)
    struct.pack_into(">i", shp, 0, 9994)
    struct.pack_into("<ii", shp, 28, 1000, 5)
    rec = struct.pack(">ii", 1, len(body) // 2) + body
    struct.pack_into(">i", shp, 24, (100 + len(rec)) // 2)
    per_rec = parse_shp(bytes(shp) + rec)
    assert len(per_rec[0]) == 2                  # two polygons
    gb = wkbmod.decode_wkb_batch(per_rec[0])
    n_rings = [len(gb.rings_of(i)) for i in range(2)]
    assert sorted(n_rings) == [1, 2]             # hole went to `big` only
    with_hole = n_rings.index(2)
    outer = gb.rings_of(with_hole)[0]
    assert outer[:, 0].max() <= 10.0             # it is the small outer


def test_pointz_drops_z():
    body = struct.pack("<iddd d", 11, 1.5, 2.5, 99.0, 0.0)  # PointZ + M
    shp = bytearray(100)
    struct.pack_into(">i", shp, 0, 9994)
    struct.pack_into("<ii", shp, 28, 1000, 11)
    rec = struct.pack(">ii", 1, len(body) // 2) + body
    struct.pack_into(">i", shp, 24, (100 + len(rec)) // 2)
    per_rec = parse_shp(bytes(shp) + rec)
    gb = wkbmod.decode_wkb_batch(per_rec[0])
    assert gb.rings_of(0)[0][0] == pytest.approx([1.5, 2.5])


def test_dbf_round_trip_typing():
    t = pa.table({
        "geom_wkb": pa.array([wkbmod.encode_point(0, 0),
                              wkbmod.encode_point(1, 1)], pa.binary()),
        "props_json": pa.array([
            json.dumps({"name": "alpha", "pop": 1234, "ok": True,
                        "score": 2.7182818284590451}, sort_keys=True),
            json.dumps({"name": "beta", "pop": -7, "ok": False,
                        "score": 0.1}, sort_keys=True),
        ], pa.string()),
    })
    parts = features_to_shapefile(t)
    props = parse_dbf(parts["dbf"])
    assert props == [
        {"name": "alpha", "pop": 1234, "ok": True,
         "score": 2.7182818284590451},
        {"name": "beta", "pop": -7, "ok": False, "score": 0.1},
    ]


def test_full_round_trip_polygons():
    rings_a = [np.array([[0, 0], [0, 4], [4, 4], [4, 0]], float),
               np.array([[1, 1], [2, 1], [2, 2], [1, 2]], float)]
    rings_b = [np.array([[10, 10], [10, 11], [11, 11]], float)]
    blobs = [wkbmod.encode_polygon(rings_a),
             wkbmod.encode_polygon(rings_b)]
    t = pa.table({"geom_wkb": pa.array(blobs, pa.binary()),
                  "props_json": pa.array(
                      [json.dumps({"layer": "water"}), ""], pa.string())})
    parts = features_to_shapefile(t)
    back = parse_shapefile(parts["shp"], parts["dbf"], source="rt")
    assert back.num_rows == 2
    assert back["layer"].to_pylist() == ["water", "default"]
    gb = wkbmod.decode_wkb_batch(back["geom_wkb"].to_pylist())
    # same ring count and identical point SETS per ring (orientation /
    # start vertex may legally rotate through the closed form)
    got = {frozenset(map(tuple, r)) for i in range(2)
           for r in gb.rings_of(i)}
    want = {frozenset(map(tuple, r)) for r in rings_a + rings_b}
    assert got == want


def test_mixed_types_rejected():
    t = pa.table({"geom_wkb": pa.array(
        [wkbmod.encode_point(0, 0),
         wkbmod.encode_linestring(np.array([[0, 0], [1, 1]]))],
        pa.binary())})
    with pytest.raises(ValueError, match="single shape class"):
        features_to_shapefile(t)


def test_converter_integration(ray_session, tmp_path):
    """.shp+.dbf on disk → convert() → geojson, props preserved."""
    from grandine_ray.pipelines.converter import convert, read_features

    t = pa.table({
        "geom_wkb": pa.array([wkbmod.encode_point(13.4, 52.52)],
                             pa.binary()),
        "props_json": pa.array([json.dumps({"name": "bbx"})], pa.string()),
    })
    shp_path = str(tmp_path / "cities.shp")
    assert write_shapefile(t, shp_path) == 1
    ds = read_features([shp_path])
    out = ds.take_all()
    assert len(out) == 1
    assert json.loads(out[0]["props_json"]) == {"name": "bbx"}
    out_gj = str(tmp_path / "o.geojson")
    n = convert([shp_path], out_gj, out_format="geojson")
    assert n == 1
    gj = json.load(open(out_gj))
    assert gj["features"][0]["properties"]["name"] == "bbx"
    assert gj["features"][0]["geometry"]["coordinates"] == \
        pytest.approx([13.4, 52.52])


def test_empty_shapefile_round_trip():
    t = pa.table({"geom_wkb": pa.array([], pa.binary())})
    parts = features_to_shapefile(t)
    assert parse_shp(parts["shp"]) == []
    back = parse_shapefile(parts["shp"], parts["dbf"], source="e")
    assert back.num_rows == 0
