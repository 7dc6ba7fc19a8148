"""Spaten / GeoJSON / GeoJSONSeq / CSV codec tests (reference lib/spaten,
lib/geojson, lib/geojsonseq, lib/csv test vectors)."""
import numpy as np
import pytest

from grandine_ray.geom import wkb
from grandine_ray.sources import geojson as gj
from grandine_ray.sources import spaten as sp


# ----------------------------------------------------------------- Spaten
def test_spaten_header():
    # lowlevel_test.go:17-25: "5350415400000000" parses as version 0
    assert sp.read_header(bytes.fromhex("5350415400000000")) == 0
    with pytest.raises(sp.SpatenError):
        sp.read_header(bytes.fromhex("53504154000000"))  # short
    with pytest.raises(sp.SpatenError):
        sp.read_header(b"XPAT" + b"\x00" * 4)  # bad cookie
    with pytest.raises(sp.SpatenError):
        sp.read_header(b"SPAT" + bytes.fromhex("01000000"))  # future version


def test_spaten_weird_files():
    # TestWeirdFiles (lowlevel_test.go:102-128): truncated block bodies error
    header = bytes.fromhex("5350415400000000")
    # block header says 100 bytes body, none present
    bad = header + bytes.fromhex("64000000") + bytes.fromhex("00000000")
    with pytest.raises(sp.SpatenError):
        list(sp.iter_blocks(bad))
    # compression byte set
    bad2 = header + bytes.fromhex("0100000000000100") + b"\x00"
    with pytest.raises(sp.SpatenError):
        list(sp.iter_blocks(bad2))
    # empty file after header is fine
    assert list(sp.iter_blocks(header)) == []


def test_spaten_roundtrip(tmp_path):
    feats = [
        {"geom_wkb": wkb.encode_point(1.5, -2.5), "props": {"name": "a", "n": 7}},
        {"geom_wkb": wkb.encode_linestring(np.array([[0, 0], [1, 1]], float)),
         "props": {"w": 2.5}},
        {"geom_wkb": wkb.encode_polygon([np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)]),
         "props": {}},
    ]
    path = str(tmp_path / "t.spaten")
    n = sp.write_spaten(path, iter(feats), block_size=2)
    assert n == 3
    buf = open(path, "rb").read()
    blocks = list(sp.iter_blocks(buf))
    assert len(blocks) == 2  # block_size=2 → 2 blocks
    assert blocks[0][1] == {"@srid": "4326"}  # block meta on first block
    got = [f for feats_, _ in blocks for f in feats_]
    assert got[0]["props"] == {"name": "a", "n": 7}
    assert got[1]["props"] == {"w": 2.5}
    assert [f["geom_wkb"] for f in got] == [f["geom_wkb"] for f in feats]

    table = sp.spaten_to_table(buf, source="t.spaten")
    assert table.num_rows == 3
    assert table["geom_type"].to_pylist() == [1, 2, 3]
    assert table["bbox_maxx"].to_pylist() == [1.5, 1.0, 4.0]


def test_spaten_tag_types():
    assert sp._decode_tag(sp._encode_tag("k", "v")) == ("k", "v")
    assert sp._decode_tag(sp._encode_tag("k", -42)) == ("k", -42)
    assert sp._decode_tag(sp._encode_tag("k", 2.75)) == ("k", 2.75)
    assert sp._decode_tag(sp._encode_tag("k", None)) == ("k", "")
    with pytest.raises(sp.SpatenError):
        sp._encode_tag("k", [1, 2])


# ---------------------------------------------------------------- GeoJSON
def test_geojson_multigeometry_exploded():
    doc = """{"type":"FeatureCollection","features":[
      {"type":"Feature","id":17,"properties":{"a":"b"},
       "geometry":{"type":"MultiPoint","coordinates":[[1,2],[3,4]]}},
      {"type":"Feature","properties":null,
       "geometry":{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,0]]]}}
    ]}"""
    t = gj.parse_feature_collection(doc)
    # MultiPoint exploded into 2 features sharing props (codec.go:113-126)
    assert t.num_rows == 3
    assert t["geom_type"].to_pylist() == [1, 1, 3]
    import json

    p0 = json.loads(t["props_json"][0].as_py())
    assert p0 == {"a": "b", "id": 17}  # id moved into props
    gb = wkb.decode_wkb_batch([t["geom_wkb"][2].as_py()])
    # closing vertex stripped on read
    assert gb.rings_of(0)[0].tolist() == [[0, 0], [4, 0], [4, 4]]


def test_geojson_roundtrip_winding():
    ring_ccw = [[0, 0], [0, 4], [4, 4], [4, 0]]  # counter-clockwise input
    doc = ('{"type":"FeatureCollection","features":[{"type":"Feature",'
           '"properties":{},"geometry":{"type":"Polygon","coordinates":[['
           + ",".join(str(p) for p in ring_ccw) + ',[0,0]]]}}]}')
    t = gj.parse_feature_collection(doc)
    out = gj.features_to_geojson(t)
    import json

    ring = json.loads(out)["features"][0]["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1]  # closed on marshal
    from grandine_ray.geom.ops import is_clockwise

    assert is_clockwise(np.asarray(ring[:-1], dtype=float))  # winding fixed


def test_geojsonseq():
    f = '{"type":"Feature","properties":{"n":"%d"},"geometry":{"type":"Point","coordinates":[%d,%d]}}'
    payload = "\x1e".join(f % (i, i, -i) for i in range(5))
    t = gj.parse_feature_seq(payload)
    assert t.num_rows == 5
    assert t["bbox_minx"].to_pylist() == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_csv_points():
    # csv/codec.go: tab default delim, header = keys, lat/lon cols
    text = "name\tcode\tlat\tlon\nBerlin\tB\t52.5\t13.4\nParis\tP\t48.85\t2.35"
    t = gj.parse_points_csv(text, lat_col=2, lon_col=3)
    assert t.num_rows == 2
    assert t["geom_type"].to_pylist() == [1, 1]
    assert t["bbox_minx"].to_pylist() == [13.4, 2.35]
    import json

    assert json.loads(t["props_json"][0].as_py())["name"] == "Berlin"


def test_guess_codec():
    assert gj.guess_codec("a.geojson") is gj.parse_feature_collection
    assert gj.guess_codec("a.geojsonseq") is gj.parse_feature_seq
    assert gj.guess_codec("a.csv") is gj.parse_points_csv
    with pytest.raises(ValueError):
        gj.guess_codec("a.xyz")


# ---------------------------------------------------------------- mapping
def test_mapping_dsl():
    from grandine_ray.stages.mapping import parse_mapping

    src = """
- src: {key: highway, value: primary}
  dest:
    - {key: "@layer", value: transportation}
    - {key: class, value: $highway}
- src: {key: building, value: "*"}
  dest:
    - {key: "@layer", value: building}
    - {key: "@zoom:min", value: 14}
- src: {key: railway, value: "*"}
  dest:
    - {key: maxspeed, value: $maxspeed, type: int}
  op: lines
- src: {key: foo, value: [a, b]}
  dest:
    - {key: bar, value: baz}
"""
    conds = parse_mapping(src)
    assert len(conds) == 4
    # file_test.go semantics
    assert conds[0].matches({"highway": "primary"})
    assert not conds[0].matches({"highway": "secondary"})
    assert conds[1].matches({"building": "anything"})  # wildcard
    assert conds[3].matches({"foo": "a"}) and conds[3].matches({"foo": "b"})
    assert not conds[3].matches({"foo": "c"})
    m = conds[0].map_props({"highway": "primary"})
    assert m == {"@layer": "transportation", "class": "primary"}
    # int coercion incl. yes/no (file.go:147-166)
    m = conds[2].map_props({"railway": "x", "maxspeed": "300"})
    assert m == {"maxspeed": 300}
    assert conds[2].map_props({"railway": "x", "maxspeed": "yes"}) == {"maxspeed": 1}
    assert conds[2].map_props({"railway": "x", "maxspeed": "no"}) == {"maxspeed": 0}


def test_mapping_batch_transform():
    import json

    import pyarrow as pa

    from grandine_ray.stages.mapping import make_mapping_fn

    src = """
- src: {key: highway, value: primary}
  dest:
    - {key: "@layer", value: transportation}
    - {key: class, value: $highway}
- src: {key: building, value: "*"}
  dest:
    - {key: "@layer", value: building}
    - {key: "@zoom:min", value: 14}
  op: lines
"""
    poly = wkb.encode_polygon([
        np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float),
        np.array([[1, 1], [2, 1], [2, 2], [1, 2]], float),
    ])
    line = wkb.encode_linestring(np.array([[0, 0], [1, 1]], float))
    batch = pa.table(
        {
            "doc_id": pa.array(["d0", "d1", "d2"]),
            "span_idx": pa.array([0, 0, 0], pa.int32()),
            "geom_type": pa.array([3, 2, 2], pa.uint8()),
            "geom_wkb": pa.array([poly, line, line], pa.binary()),
            "layer": pa.array(["default"] * 3),
            "props_json": pa.array(
                [json.dumps({"building": "yes"}),
                 json.dumps({"highway": "primary"}),
                 json.dumps({"highway": "service"})]
            ),
        }
    )
    out = make_mapping_fn(src)(batch)
    # building poly exploded to 2 ring lines; highway=primary mapped;
    # highway=service dropped (no condition matches)
    assert out.num_rows == 3
    assert out["doc_id"].to_pylist() == ["d0", "d0", "d1"]
    assert out["geom_type"].to_pylist() == [2, 2, 2]
    assert out["layer"].to_pylist() == ["building", "building", "transportation"]
    assert out["zoom_min"].to_pylist() == [14, 14, 0]
    p = json.loads(out["props_json"][2].as_py())
    assert p == {"@layer": "transportation", "class": "primary"}


@pytest.mark.usefixtures("ray_session")
def test_converter_end_to_end(tmp_path):
    from grandine_ray.pipelines.converter import convert, read_features

    # geojson + csv in → spaten out → read back
    gpath = tmp_path / "in.geojson"
    gpath.write_text(
        '{"type":"FeatureCollection","features":[{"type":"Feature",'
        '"properties":{"highway":"primary"},"geometry":{"type":"Point",'
        '"coordinates":[13.4,52.5]}}]}'
    )
    cpath = tmp_path / "in.csv"
    cpath.write_text("name\tlat\tlon\nX\t1.0\t2.0")
    out = tmp_path / "out.spaten"
    n = convert([str(gpath), str(cpath)], str(out), out_format="spaten",
                lat_col=1, lon_col=2)
    assert n == 2
    t = sp.spaten_to_table(out.read_bytes())
    assert t.num_rows == 2
    assert sorted(t["geom_type"].to_pylist()) == [1, 1]

    # with mapping: only highway=primary survives
    out2 = tmp_path / "out2.spaten"
    mapping = """
- src: {key: highway, value: primary}
  dest:
    - {key: "@layer", value: transportation}
"""
    n2 = convert([str(gpath), str(cpath)], str(out2), mapping_yaml=mapping,
                 out_format="spaten", lat_col=1, lon_col=2)
    assert n2 == 1


def test_reference_mapping_yml_parses():
    """Parse the reference's own YAML rule file in place (lib/mapping/mapping.yml)."""
    import os

    path = "/root/reference/lib/mapping/mapping.yml"
    if not os.path.exists(path):
        pytest.skip("reference mapping.yml unavailable")
    from grandine_ray.stages.mapping import parse_mapping

    conds = parse_mapping(open(path).read())
    assert len(conds) == 4
    assert conds[0].matches({"highway": "primary"})
    assert conds[1].matches({"building": "whatever"})      # "*" wildcard
    assert conds[2].map_props({"railway": "x", "maxspeed": "300"})["maxspeed"] == 300
    assert conds[2].op == "lines"
    assert conds[3].matches({"foo": "a"}) and not conds[3].matches({"foo": "c"})


def test_default_mapping_mirrors_reference():
    """DEFAULT_MAPPING reproduces lib/mapping/default.go:52-69 semantics."""
    from grandine_ray.stages.mapping import DEFAULT_MAPPING, parse_mapping

    conds = parse_mapping(DEFAULT_MAPPING)

    def apply(props):
        out = []
        for c in conds:
            if c.matches(props):
                out.append(c.map_props(props))
        return out

    assert apply({"highway": "motorway"}) == [
        {"@layer": "transportation", "class": "motorway"}]
    assert apply({"highway": "residential"}) == []          # not in list
    assert apply({"aeroway": "runway"}) == [
        {"@layer": "aeroway", "class": "runway"}]
    # building matches only the empty tag value (default.go quirk)
    assert apply({"building": ""}) == [{"@layer": "building", "@zoom:min": 14}]
    assert apply({"building": "yes"}) == []
    assert apply({"landuse": "forest"}) == [
        {"__type": "area", "@layer": "landcover", "class": "wood"}]
    # railway=rail maps through transportation with class "" (absent highway)
    assert apply({"railway": "rail"}) == [
        {"@layer": "transportation", "class": ""}]
    assert apply({"waterway": "river"}) == [
        {"@layer": "waterway", "class": "river"}]


@pytest.mark.usefixtures("ray_session")
def test_read_spaten_dataset_ray(tmp_path):
    """File-parallel Ray Spaten reader (S1 Ray integration)."""
    from grandine_ray.sources.spaten import read_spaten_dataset, write_spaten

    paths = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.spaten")
        write_spaten(p, iter([
            {"geom_wkb": wkb.encode_point(i, i), "props": {"f": i}},
            {"geom_wkb": wkb.encode_point(i + 0.5, i), "props": {}},
        ]))
        paths.append(p)
    ds = read_spaten_dataset(paths)
    rows = ds.take_all()
    assert len(rows) == 6
    assert {r["bbox_minx"] for r in rows} == {0.0, 0.5, 1.0, 1.5, 2.0, 2.5}
