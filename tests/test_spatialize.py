"""OSM PBF → features pipeline tests (reference cmd/spatialize semantics)."""
import json

import numpy as np
import pytest

from grandine_ray.geom import wkb
from grandine_ray.geom.ops import is_clockwise
from grandine_ray.sources import osm

MAPPING = """
- src: {key: highway, value: primary}
  dest:
    - {key: "@layer", value: transportation}
    - {key: class, value: $highway}
- src: {key: building, value: "*"}
  dest:
    - {key: "@layer", value: building}
    - {key: __type, value: area}
- src: {key: amenity, value: "*"}
  dest:
    - {key: "@layer", value: poi}
    - {key: kind, value: $amenity}
- src: {key: landuse, value: park}
  dest:
    - {key: "@layer", value: landuse}
"""


@pytest.fixture(scope="module")
def pbf_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("osm") / "test.pbf")
    # square building way 10 (closed, CW), road way 11 (open),
    # untagged helper ways 12/13 for the multipolygon relation
    nodes = [
        (1, 13.40, 52.50, {"amenity": "cafe"}),
        (2, 13.41, 52.50, {}),
        (3, 13.41, 52.51, {}),
        (4, 13.40, 52.51, {}),
        (5, 13.45, 52.55, {"tourism": "hotel"}),   # no matching cond
        (6, 13.50, 52.50, {}),
        (7, 13.60, 52.50, {}),
        # outer ring nodes of the relation
        (20, 13.70, 52.70, {}),
        (21, 13.80, 52.70, {}),
        (22, 13.80, 52.80, {}),
        (23, 13.70, 52.80, {}),
        # inner ring nodes
        (30, 13.73, 52.73, {}),
        (31, 13.77, 52.73, {}),
        (32, 13.77, 52.77, {}),
        (33, 13.73, 52.77, {}),
    ]
    ways = [
        (10, [1, 2, 3, 4, 1], {"building": "yes"}),
        (11, [6, 7], {"highway": "primary", "name": "A1"}),
        (12, [20, 21, 22, 23, 20], {}),              # relation outer
        (13, [30, 31, 32, 33, 30], {}),              # relation inner
    ]
    rels = [
        (40, [(12, osm.WAY, "outer"), (13, osm.WAY, "inner")],
         {"type": "multipolygon", "landuse": "park"}),
    ]
    osm.write_pbf(path, nodes, ways, rels)
    return path


def test_pbf_codec_roundtrip(pbf_file):
    d = osm.read_pbf(pbf_file)
    ids, lons, lats, tags = d["nodes"]
    assert len(ids) == 15
    assert tags[0] == {"amenity": "cafe"}
    assert len(d["ways"]) == 4
    assert d["ways"][0][1].tolist() == [1, 2, 3, 4, 1]
    assert d["relations"][0][1][0] == (12, osm.WAY, "outer")


@pytest.mark.usefixtures("ray_session")
def test_spatialize_assembly(pbf_file):
    from grandine_ray.pipelines.spatialize import spatialize

    feats = spatialize(pbf_file, MAPPING).take_all()
    by_layer = {}
    for r in feats:
        by_layer.setdefault(r["layer"], []).append(r)

    # cafe node matched amenity cond → point in poi layer; hotel dropped
    assert len(by_layer["poi"]) == 1
    p = by_layer["poi"][0]
    assert p["geom_type"] == 1
    assert json.loads(p["props_json"])["kind"] == "cafe"

    # road way → linestring, CCW-normalization is a no-op for open lines'
    # area sign but applied per reference; class mapped
    road = by_layer["transportation"][0]
    assert road["geom_type"] == 2
    gb = wkb.decode_wkb_batch([road["geom_wkb"]])
    assert len(gb.rings_of(0)[0]) == 2

    # building way (closed + __type=area) → polygon, __type consumed
    b = by_layer["building"][0]
    assert b["geom_type"] == 3
    props = json.loads(b["props_json"])
    assert "__type" not in props
    gb = wkb.decode_wkb_batch([b["geom_wkb"]])
    ring = gb.rings_of(0)[0]
    assert len(ring) == 4
    assert not is_clockwise(ring)  # ways normalized CCW (spatialize.go:283-285)

    # multipolygon relation → polygon with outer CCW + inner CW
    park = by_layer["landuse"][0]
    assert park["geom_type"] == 3
    gb = wkb.decode_wkb_batch([park["geom_wkb"]])
    rings = gb.rings_of(0)
    assert len(rings) == 2
    assert not is_clockwise(rings[0])   # outer forced counter-clockwise
    assert is_clockwise(rings[1])       # inner forced clockwise


@pytest.mark.usefixtures("ray_session")
def test_spatialize_missing_node_is_fatal(tmp_path):
    from grandine_ray.pipelines.spatialize import spatialize

    path = str(tmp_path / "bad.pbf")
    osm.write_pbf(path, [(1, 0.0, 0.0, {})],
                  [(10, [1, 99], {"highway": "primary"})], [])
    with pytest.raises(Exception):  # reference: log.Fatal (spatialize.go:152)
        spatialize(path, MAPPING).take_all()


@pytest.mark.usefixtures("ray_session")
def test_spatialize_scale_synthetic(tmp_path):
    """Distributed assembly at 1000x fixture node count: a multi-blob
    synthetic PBF (grid roads + building squares + ring relations) streams
    through the partitioned joins; feature counts match the analytically
    known ground truth."""
    rng = np.random.default_rng(11)
    n_grid = 100                     # 10k intersection nodes
    nodes = []
    nid = lambda r, c: r * n_grid + c + 1
    for r in range(n_grid):
        for c in range(n_grid):
            nodes.append((nid(r, c), c * 0.01, r * 0.01, {}))
    ways = []
    wid = 1
    for r in range(n_grid):         # horizontal roads
        ways.append((wid, [nid(r, c) for c in range(n_grid)],
                     {"highway": "primary"}))
        wid += 1
    # building squares on a separate id range
    base = n_grid * n_grid + 1
    bnodes = []
    bways = []
    n_bld = 500
    for b in range(n_bld):
        ids = [base + b * 4 + k for k in range(4)]
        x, y = rng.uniform(0, 1, 2)
        bnodes += [(ids[0], x, y, {}), (ids[1], x + .001, y, {}),
                   (ids[2], x + .001, y + .001, {}), (ids[3], x, y + .001, {})]
        bways.append((wid, ids + [ids[0]], {"building": "yes"}))
        wid += 1
    # multipolygon relations over untagged rings
    rbase = base + n_bld * 4
    rnodes, rways, rels = [], [], []
    n_rel = 40
    for i in range(n_rel):
        oids = [rbase + i * 8 + k for k in range(4)]
        iids = [rbase + i * 8 + 4 + k for k in range(4)]
        x, y = 2 + i * 0.1, 2.0
        rnodes += [(oids[0], x, y, {}), (oids[1], x + .05, y, {}),
                   (oids[2], x + .05, y + .05, {}), (oids[3], x, y + .05, {})]
        rnodes += [(iids[0], x + .01, y + .01, {}), (iids[1], x + .04, y + .01, {}),
                   (iids[2], x + .04, y + .04, {}), (iids[3], x + .01, y + .04, {})]
        rways.append((wid, oids + [oids[0]], {}))
        rways.append((wid + 1, iids + [iids[0]], {}))
        rels.append((1000000 + i,
                     [(wid, osm.WAY, "outer"), (wid + 1, osm.WAY, "inner")],
                     {"type": "multipolygon", "landuse": "park"}))
        wid += 2
    # tagged poi nodes
    pbase = rbase + n_rel * 8
    pnodes = [(pbase + i, rng.uniform(0, 1), rng.uniform(0, 1),
               {"amenity": "cafe"}) for i in range(200)]

    path = str(tmp_path / "big.pbf")
    osm.write_pbf(path, nodes + bnodes + rnodes + pnodes,
                  ways + bways + rways, rels)
    assert len([1 for *_, t in osm.scan_blob_index(path) if t == "OSMData"]) > 2

    from grandine_ray.pipelines.spatialize import spatialize

    feats = spatialize(path, MAPPING, num_partitions=16)
    df = feats.to_pandas()
    counts = df.groupby("layer").size().to_dict()
    assert counts["transportation"] == n_grid
    assert counts["building"] == n_bld
    assert counts["landuse"] == n_rel
    assert counts["poi"] == 200
    # span_idx unique + dense over the whole output
    si = np.sort(df["span_idx"].to_numpy())
    assert (si == np.arange(len(df))).all()
    # every relation polygon kept both rings
    park = df[df["layer"] == "landuse"].iloc[0]
    from grandine_ray.geom import wkb as wkbmod
    assert len(wkbmod.decode_wkb_batch([park["geom_wkb"]]).rings_of(0)) == 2
