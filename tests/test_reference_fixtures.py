"""Parity tests against the reference's own fixture files, read in place
from /root/reference (public test data; skipped if absent)."""
import os

import numpy as np
import pytest

from grandine_ray.geom import wkb
from grandine_ray.geom.ops import fix_winding, is_clockwise
from grandine_ray.sources import geojson as gj
from grandine_ray.stages.merge import merge_features

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(f"{REF}/lib/spatial/testfiles"),
    reason="reference fixtures not available",
)


def _load(path):
    return gj.parse_feature_collection(open(path).read())


def test_mergable_lines_collapse():
    # merge_test.go: the two mergable lines collapse to ONE feature >7 pts
    t = _load(f"{REF}/lib/spatial/testfiles/mergable_lines.geojson")
    gb = wkb.decode_wkb_batch(t["geom_wkb"].to_pylist())
    feats = [
        {"props": (), "type": int(gb.types[i]), "rings": gb.rings_of(i)}
        for i in range(len(gb))
    ]
    merged = merge_features(feats)
    assert len(merged) == 1
    assert len(merged[0]["rings"][0]) > 7


def test_winding_wild_fixture():
    # polygon_test.go:23-37: ring CW flags after FixWinding = [T,F,T,T,F]
    t = _load(f"{REF}/lib/spatial/testfiles/winding_wild.geojson")
    gb = wkb.decode_wkb_batch([t["geom_wkb"][0].as_py()])
    rings = gb.rings_of(0)
    fixed = fix_winding(rings)
    assert [is_clockwise(r) for r in fixed] == [True, False, True, True, False]


def test_polygon_wkb_fixture_roundtrip():
    # binary fixture: lib/spatial/testfiles/polygon.wkb decodes and
    # re-encodes byte-identically through our codec
    raw = open(f"{REF}/lib/spatial/testfiles/polygon.wkb", "rb").read()
    gb = wkb.decode_wkb_batch([raw])
    assert gb.types[0] == wkb.GEOM_POLYGON
    assert wkb.encode_wkb_batch(gb)[0] == raw


def test_polygon_with_holes_clip():
    # the reference benchmark's clip input (polygon_test.go:63-82): clipping
    # to its bbox interior produces a non-empty polygon with holes preserved
    t = _load(f"{REF}/lib/spatial/testfiles/polygon_with_holes.geojson")
    gb = wkb.decode_wkb_batch([t["geom_wkb"][0].as_py()])
    rings = gb.rings_of(0)
    assert len(rings) > 1
    from grandine_ray.geom.clip import clip_polygon

    out = clip_polygon(rings, 27.377929, 60.930432, 29.53125, 62.754725)
    assert len(out) == 1
    assert len(out[0]) >= 1


def test_self_intersect_clip_geos_parity():
    # clip_geos_test.go:19-30: GEOS (after the Buffer(0) repair retry,
    # clip_geos.go:25-33) clips the fixture into exactly 2 polygons. The
    # even-odd arrangement polygonizer (geom/arrangement.py) reproduces
    # that: the main region plus the ~44-unit-squared border sliver
    # (raster-cross-validated component count and area).
    t = _load(f"{REF}/lib/spatial/testfiles/self_intersect.geojson")
    gb = wkb.decode_wkb_batch([t["geom_wkb"][0].as_py()])
    from grandine_ray.geom.clip import clip_polygon

    out = clip_polygon(gb.rings_of(0), 0, 0, 2000, 2000)
    assert len(out) == 2  # exact GEOS parity

    def ring_area(r):
        x, y = r[:, 0], r[:, 1]
        return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))

    total = sum(ring_area(p[0]) - sum(ring_area(h) for h in p[1:])
                for p in out)
    # raster even-odd ground truth: 87.2% of the 2000x2000 window filled
    assert abs(total / 4e6 - 0.8725) < 0.005
    for poly in out:
        for ring in poly:
            assert (ring[:, 0] >= -1e-6).all() and (ring[:, 0] <= 2000 + 1e-6).all()
            assert (ring[:, 1] >= -1e-6).all() and (ring[:, 1] <= 2000 + 1e-6).all()


def test_geojson_testdata_files():
    # lib/geojson/testdata: 01 (collection), id (feature id → props),
    # multipolygon (exploded)
    t1 = _load(f"{REF}/lib/geojson/testdata/01.geojson")
    assert t1.num_rows >= 1
    tid = _load(f"{REF}/lib/geojson/testdata/id.geojson")
    import json

    props = json.loads(tid["props_json"][0].as_py())
    assert "id" in props
    tmp = _load(f"{REF}/lib/geojson/testdata/multipolygon.geojson")
    assert (np.asarray(tmp["geom_type"].to_pylist()) == 3).sum() >= 2


def test_csv_geonames_excerpt():
    # lib/csv/testfiles/gn_excerpt.csv: tab-delimited, lat col 4, lon col 5
    path = f"{REF}/lib/csv/testfiles/gn_excerpt.csv"
    text = open(path).read()
    t = gj.parse_points_csv(text, lat_col=4, lon_col=5)
    assert t.num_rows >= 1
    assert (np.abs(np.asarray(t["bbox_miny"].to_pylist())) <= 90).all()


def test_geojsonseq_testdata():
    path = f"{REF}/lib/geojsonseq/testdata/10_records.geojsonseq"
    if not os.path.exists(path):
        import glob

        cands = glob.glob(f"{REF}/lib/geojsonseq/testdata/*")
        assert cands, "no geojsonseq testdata"
        path = cands[0]
    t = gj.parse_feature_seq(open(path).read())
    assert t.num_rows >= 1


@pytest.mark.usefixtures("ray_session")
def test_featurecollection_roundtrip_via_converter(tmp_path):
    """Reference featurecollection.geojson → converter → Spaten → GeoJSON:
    geometry and props survive the full codec chain."""
    import json

    from grandine_ray.pipelines.converter import convert
    from grandine_ray.sources.spaten import spaten_to_table

    src = f"{REF}/lib/spatial/testfiles/featurecollection.geojson"
    t_in = _load(src)
    out = str(tmp_path / "fc.spaten")
    n = convert([src], out, out_format="spaten")
    assert n == t_in.num_rows
    t_out = spaten_to_table(open(out, "rb").read())
    assert t_out.num_rows == t_in.num_rows
    assert t_out["geom_wkb"].to_pylist() == t_in["geom_wkb"].to_pylist()
    for a, b in zip(t_in["props_json"].to_pylist(),
                    t_out["props_json"].to_pylist()):
        pa_ = json.loads(a) if a else {}
        pb = json.loads(b) if b else {}
        # Spaten typed tags preserve str/int/float; JSON round-trip equal
        assert {k: v for k, v in pa_.items() if not k.startswith("@")} == pb
