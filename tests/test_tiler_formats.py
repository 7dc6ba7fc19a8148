"""End-to-end: reference flow (converter output → tiler input) with props
flowing into MVT tags, and mapping applied inside the tiler."""
import json

import numpy as np
import pytest

from grandine_ray.geom import wkb
from grandine_ray.sources import spaten as sp
from grandine_ray.stages import mvt


@pytest.fixture()
def spaten_file(tmp_path):
    feats = [
        {"geom_wkb": wkb.encode_point(13.4, 52.5),
         "props": {"highway": "primary", "name": "a1"}},
        {"geom_wkb": wkb.encode_point(13.41, 52.51),
         "props": {"building": "yes"}},
        {"geom_wkb": wkb.encode_linestring(np.array([[13.4, 52.5], [13.5, 52.6]])),
         "props": {"highway": "primary", "maxspeed": "100"}},
        {"geom_wkb": wkb.encode_point(2.35, 48.85), "props": {}},
    ]
    path = str(tmp_path / "in.spaten")
    sp.write_spaten(path, iter(feats))
    return path


@pytest.mark.usefixtures("ray_session")
def test_spaten_to_tiles_with_props(spaten_file):
    from grandine_ray.pipelines.tiler import read_features_any, tile_dataset

    feats = read_features_any(spaten_file)
    tiles = tile_dataset(features=feats, zooms=[6]).take_all()
    assert tiles
    # the berlin-ish tile contains 3 features with their props as tags
    berlin = [t for t in tiles if (t["x"], t["y"]) == (34, 20)]
    assert berlin, [f"{t['z']}/{t['x']}/{t['y']}" for t in tiles]
    layers = mvt.decode_tile(berlin[0]["mvt"])
    lay = layers["default"]
    assert len(lay["features"]) == 3
    keys = set(lay["keys"])
    assert {"highway", "name"} <= keys
    # tag round-trip: find the named feature
    vals = lay["values"]
    assert "a1" in vals and "primary" in vals


@pytest.mark.usefixtures("ray_session")
def test_spaten_tiler_with_mapping(spaten_file):
    from grandine_ray.pipelines.tiler import read_features_any, tile_dataset

    mapping = """
- src: {key: highway, value: primary}
  dest:
    - {key: "@layer", value: transportation}
    - {key: class, value: $highway}
"""
    feats = read_features_any(spaten_file, mapping_yaml=mapping)
    tiles = tile_dataset(features=feats, zooms=[6]).take_all()
    berlin = [t for t in tiles if (t["x"], t["y"]) == (34, 20)]
    assert berlin
    layers = mvt.decode_tile(berlin[0]["mvt"])
    # only highway=primary features survive; routed to "transportation";
    # "@layer" itself is stripped from tags (skipAtKeys)
    assert list(layers) == ["transportation"]
    lay = layers["transportation"]
    assert len(lay["features"]) == 2
    assert lay["keys"] == ["class"]
    assert lay["values"] == ["primary"]
    # paris point (no highway) dropped entirely
    assert not [t for t in tiles if t["x"] == 32]
