"""WKT codec (sources/wkt.py): golden vectors, roundtrips, the
converter integration, and parity with the GeoJSON codec's explode /
unclosed-ring semantics."""
import numpy as np
import pytest

from grandine_ray.geom import wkb as wkbmod
from grandine_ray.sources import wkt


def test_point_golden():
    [b] = wkt.parse_wkt("POINT (13.7363 51.05377)")
    assert b == wkbmod.encode_point(13.7363, 51.05377)
    assert wkt.to_wkt(b) == "POINT (13.7363 51.05377)"


def test_linestring_and_scientific_notation():
    [b] = wkt.parse_wkt("LINESTRING(0 0, 1e1 -2.5, .5 +3)")
    gb = wkbmod.decode_wkb_batch([b])
    assert np.allclose(gb.rings_of(0)[0], [[0, 0], [10, -2.5], [0.5, 3]])


def test_polygon_closing_vertex_stripped():
    [b] = wkt.parse_wkt(
        "POLYGON ((0 0, 3 0, 0 3, 0 0), (1 1, 1.5 1, 1 1.5, 1 1))")
    gb = wkbmod.decode_wkb_batch([b])
    rings = gb.rings_of(0)
    assert len(rings) == 2
    assert len(rings[0]) == 3 and len(rings[1]) == 3  # unclosed storage
    # marshal closes again
    s = wkt.to_wkt(b)
    assert s.startswith("POLYGON ((0 0, 3 0, 0 3, 0 0), (1 1,")


def test_multi_explode_matches_geojson_codec():
    blobs = wkt.parse_wkt("MULTIPOINT ((1 2), (3 4))")
    assert blobs == [wkbmod.encode_point(1, 2), wkbmod.encode_point(3, 4)]
    legacy = wkt.parse_wkt("MULTIPOINT (1 2, 3 4)")
    assert legacy == blobs
    mls = wkt.parse_wkt("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))")
    assert len(mls) == 2
    mp = wkt.parse_wkt(
        "MULTIPOLYGON (((0 0, 1 0, 0 1, 0 0)), ((5 5, 6 5, 5 6, 5 5)))")
    assert len(mp) == 2
    for b in mp:
        assert wkbmod.decode_wkb_batch([b]).types[0] == wkbmod.GEOM_POLYGON


def test_z_ordinate_dropped_and_errors():
    [b] = wkt.parse_wkt("POINT Z (1 2 99)") if True else None
    gb = wkbmod.decode_wkb_batch([b])
    assert np.allclose(gb.rings_of(0)[0][0], [1, 2])
    with pytest.raises(ValueError):
        wkt.parse_wkt("POINT EMPTY")
    with pytest.raises(ValueError):
        wkt.parse_wkt("CIRCLE (0 0, 1)")
    with pytest.raises(ValueError):
        wkt.parse_wkt("POINT (1)")


def test_wkt_lines_file_and_props():
    payload = (
        "# comment\n"
        "POINT (1 2)\t{\"name\": \"a\", \"@layer\": \"poi\"}\n"
        "\n"
        "MULTIPOINT ((3 4), (5 6))\t{\"name\": \"b\"}\n"
        "LINESTRING (0 0, 1 1)\n")
    t = wkt.parse_wkt_lines(payload, source="mem.wkt")
    assert t.num_rows == 4  # multipoint exploded into 2
    assert t["layer"].to_pylist() == ["poi", "default", "default",
                                      "default"]
    assert t["props_json"].to_pylist()[1] == '{"name": "b"}'
    assert t["doc_id"].to_pylist() == ["mem.wkt"] * 4
    assert t["span_idx"].to_pylist() == [0, 1, 2, 3]


def test_roundtrip_via_features_table():
    payload = ("POINT (1.5 -2.25)\n"
               "LINESTRING (0 0, 10 0, 10 10)\n"
               "POLYGON ((0 0, 4 0, 0 4, 0 0))\n")
    t = wkt.parse_wkt_lines(payload, source="x.wkt")
    out = wkt.features_to_wkt(t)
    t2 = wkt.parse_wkt_lines(out, source="x.wkt")
    assert t["geom_wkb"].to_pylist() == t2["geom_wkb"].to_pylist()


def test_converter_reads_and_writes_wkt(ray_session, tmp_path):
    from grandine_ray.pipelines import converter

    src = tmp_path / "in.wkt"
    src.write_text("POINT (7 8)\t{\"k\": 1}\n"
                   "POLYGON ((0 0, 2 0, 0 2, 0 0))\n")
    feats = converter.read_features([str(src)]).to_pandas()
    assert len(feats) == 2
    assert sorted(feats.geom_type) == [1, 3]

    out = tmp_path / "out.wkt"
    n = converter.convert([str(src)], str(out), out_format="wkt")
    assert n == 2
    reread = wkt.parse_wkt_lines(out.read_text(), source="r")
    assert sorted(reread["geom_type"].to_pylist()) == [1, 3]


def test_tiler_accepts_wkt_input(ray_session, tmp_path):
    from grandine_ray.pipelines.tiler import read_features_any
    from grandine_ray.stages.coverage import make_coverage_fn

    src = tmp_path / "geoms.wkt"
    src.write_text("POINT (13.7363 51.05377)\n"
                   "POLYGON ((13.7 51.0, 13.8 51.0, 13.7 51.1, 13.7 51.0))"
                   "\t{\"@layer\": \"building\"}\n")
    feats = read_features_any(str(src))
    tiled = feats.map_batches(make_coverage_fn([6]),
                              batch_format="pyarrow").to_pandas()
    assert len(tiled) >= 2
    assert set(tiled.layer) == {"default", "building"}
