"""GPX codec: hand-written 1.1/1.0 goldens, segment explode,
round-trip, polygon rejection, converter integration."""
import json

import numpy as np
import pyarrow as pa
import pytest

from grandine_ray.geom import wkb as wkbmod
from grandine_ray.sources.gpx import features_to_gpx, parse_gpx

GOLDEN_11 = """<?xml version="1.0" encoding="UTF-8"?>
<gpx version="1.1" creator="unit" xmlns="http://www.topografix.com/GPX/1/1">
  <wpt lat="52.52" lon="13.4"><name>berlin</name><ele>34.5</ele></wpt>
  <trk><name>run</name><number>7</number>
    <trkseg>
      <trkpt lat="0.0" lon="0.0"/><trkpt lat="1.0" lon="1.0"/>
    </trkseg>
    <trkseg>
      <trkpt lat="5.0" lon="5.0"/><trkpt lat="6.0" lon="5.5"/>
      <trkpt lat="7.0" lon="6.0"/>
    </trkseg>
  </trk>
  <rte><name>way</name>
    <rtept lat="10.0" lon="20.0"/><rtept lat="11.0" lon="21.0"/>
  </rte>
</gpx>
"""


def test_golden_decode_11():
    t = parse_gpx(GOLDEN_11, source="g")
    assert t.num_rows == 4            # wpt + 2 trksegs + rte
    assert t["layer"].to_pylist() == ["waypoints", "tracks", "tracks",
                                      "routes"]
    gb = wkbmod.decode_wkb_batch(t["geom_wkb"].to_pylist())
    assert gb.rings_of(0)[0][0] == pytest.approx([13.4, 52.52])
    assert json.loads(t["props_json"][0].as_py()) == {"name": "berlin",
                                                      "ele": 34.5}
    # both segments share the trk props (typed: number → int)
    for i in (1, 2):
        assert json.loads(t["props_json"][i].as_py()) == {"name": "run",
                                                          "number": 7}
    np.testing.assert_allclose(gb.rings_of(2)[0],
                               [[5.0, 5.0], [5.5, 6.0], [6.0, 7.0]])
    np.testing.assert_allclose(gb.rings_of(3)[0],
                               [[20.0, 10.0], [21.0, 11.0]])


def test_gpx10_namespace_reads():
    doc = GOLDEN_11.replace("GPX/1/1", "GPX/1/0").replace(
        'version="1.1"', 'version="1.0"')
    assert parse_gpx(doc).num_rows == 4


def test_round_trip():
    t = parse_gpx(GOLDEN_11, source="g")
    back = parse_gpx(features_to_gpx(t), source="g2")
    assert back["geom_wkb"].to_pylist() == t["geom_wkb"].to_pylist()
    assert back["props_json"].to_pylist() == t["props_json"].to_pylist()
    # trksegs were exploded on first read → come back as tracks
    assert back["layer"].to_pylist() == ["waypoints", "tracks",
                                         "tracks", "tracks"]


def test_polygon_rejected():
    t = pa.table({"geom_wkb": pa.array(
        [wkbmod.encode_polygon([np.array([[0, 0], [0, 1], [1, 1]],
                                         float)])], pa.binary())})
    with pytest.raises(ValueError, match="polygons"):
        features_to_gpx(t)


def test_converter_integration(ray_session, tmp_path):
    from grandine_ray.pipelines.converter import convert, read_features

    src = tmp_path / "in.gpx"
    src.write_text(GOLDEN_11)
    rows = read_features([str(src)]).take_all()
    assert len(rows) == 4
    out = str(tmp_path / "o.geojson")
    assert convert([str(src)], out, out_format="geojson") == 4
    gj = json.load(open(out))
    assert len(gj["features"]) == 4
    # and back out to gpx
    out2 = str(tmp_path / "o2.gpx")
    assert convert([str(src)], out2, out_format="gpx") == 4
    assert parse_gpx(open(out2).read()).num_rows == 4
