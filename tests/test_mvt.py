"""MVT command stream / protobuf / tile assembly tests (lib/mvt tests)."""
import numpy as np
import pytest

from grandine_ray.geom import wkb
from grandine_ray.stages import mvt
from grandine_ray.stages.merge import merge_features


def test_command_stream_point_vectors():
    # codec_test.go:14-48: Point(1,1) → [9,2,2]; Point(25,17) → [9,50,34]
    got = mvt.encode_geometry_commands(wkb.GEOM_POINT, [np.array([[1.0, 1.0]])])
    assert got.tolist() == [9, 2, 2]
    got = mvt.encode_geometry_commands(wkb.GEOM_POINT, [np.array([[25.0, 17.0]])])
    assert got.tolist() == [9, 50, 34]


def test_command_stream_line_roundtrip():
    line = np.array([[2, 2], [2, 10], [10, 10]], float)
    cmds = mvt.encode_geometry_commands(wkb.GEOM_LINESTRING, [line])
    # MoveTo(1) + LineTo(2)
    assert cmds[0] == mvt.command_int(mvt.CMD_MOVETO, 1)
    assert cmds[3] == mvt.command_int(mvt.CMD_LINETO, 2)
    decoded = mvt.decode_geometry_commands(cmds.tolist())
    assert decoded[0] == (1, [(2, 2)])
    assert decoded[1] == (2, [(2, 10), (10, 10)])


def test_command_stream_polygon_closepath():
    ring = np.array([[0, 0], [10, 0], [10, 10]], float)
    cmds = mvt.encode_geometry_commands(wkb.GEOM_POLYGON, [ring])
    decoded = mvt.decode_geometry_commands(cmds.tolist())
    assert decoded[-1][0] == mvt.CMD_CLOSEPATH


def test_tile_local_projection():
    # project_test.go:11-32 with bbox (50,10)-(52,12), extent 4096
    from grandine_ray.geom.ops import proj_4326_to_3857

    sw_x, sw_y = proj_4326_to_3857(50.0, 10.0)
    ne_x, ne_y = proj_4326_to_3857(52.0, 12.0)
    tp = (float(sw_x), float(sw_y), abs(float(sw_x) - float(ne_x)),
          abs(float(sw_y) - float(ne_y)), 4096)
    pts = mvt.project_to_tile(np.array([[50.0, 10.0], [51.0, 10.0], [52.0, 12.0]]), tp)
    got = np.trunc(pts).astype(int).tolist()
    assert got[0] == [0, 4096]
    assert got[1] == [2048, 4096]
    assert got[2] == [4096, 0]


def test_varint_array_matches_scalar():
    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [rng.integers(0, 128, 50), rng.integers(128, 2**32, 50), [0, 127, 128, 2**32 - 1]]
    ).astype(np.uint64)
    got = mvt.varint_array(vals)
    expected = b"".join(mvt._varint(int(v)) for v in vals)
    assert got == expected
    assert mvt._unpack_varints(got) == vals.tolist()


def test_merge_features_vectors():
    # merge_test.go:11-67: two touching lines with same props merge into one
    l1 = np.array([[1, 0], [1, 1], [2, 3], [5, 6]], float)
    l2 = np.array([[5, 6], [7, 8], [6, 6], [4, 5]], float)
    merged = merge_features(
        [
            {"props": (), "type": 2, "rings": [l1]},
            {"props": (), "type": 2, "rings": [l2]},
        ]
    )
    assert len(merged) == 1
    assert merged[0]["rings"][0].tolist() == [
        [1, 0], [1, 1], [2, 3], [5, 6], [7, 8], [6, 6], [4, 5]
    ]
    # different props never merge
    merged = merge_features(
        [
            {"props": (("a", "1"),), "type": 2, "rings": [l1]},
            {"props": (("a", "2"),), "type": 2, "rings": [l2]},
        ]
    )
    assert len(merged) == 2


def test_encode_decode_tile_with_props():
    feats = {
        "roads": [
            {
                "props": (("@layer", "roads"), ("class", "primary"), ("lanes", 2)),
                "type": 2,
                "rings": [np.array([[13.0, 52.0], [13.2, 52.1]], float)],
            }
        ],
        "poi": [
            {"props": (), "type": 1, "rings": [np.array([[13.1, 52.05]], float)]}
        ],
    }
    buf = mvt.encode_tile(8, 137, 84, feats)
    assert buf
    tiles = mvt.decode_tile(buf)
    assert sorted(tiles) == ["poi", "roads"]
    roads = tiles["roads"]
    assert roads["version"] == 2 and roads["extent"] == 4096
    assert roads["features"][0]["type"] == 2
    # "@layer" skipped (skipAtKeys), class + lanes kept
    assert roads["keys"] == ["class", "lanes"]
    assert roads["values"] == ["primary", 2]
    assert tiles["poi"]["features"][0]["type"] == 1


def test_encode_tile_empty_outside():
    # feature far outside the tile clips away entirely → empty tile bytes
    feats = {"default": [{"props": (), "type": 1, "rings": [np.array([[100.0, 10.0]])]}]}
    buf = mvt.encode_tile(8, 137, 84, feats)  # tile is near Berlin
    assert buf == b""


def _go_merge_reference(lines):
    """Literal transcription of merge.go:6-113 (fixpoint + positional
    scan + mergeLines direction order) — the parity oracle."""
    fts = [ln.copy() for ln in lines]

    def search_and_merge(fts):
        ignore = set()
        for ref in range(len(fts)):
            if ref in ignore:
                continue
            for i in range(len(fts)):
                if i in ignore or i == ref:
                    continue
                l1, l2 = fts[ref], fts[i]
                if (l1[-1] == l2[0]).all():
                    fts[ref] = np.vstack([l1, l2[1:]])
                    ignore.add(i)
                elif (l2[-1] == l1[0]).all():
                    fts[ref] = np.vstack([l2, l1[1:]])
                    ignore.add(i)
        return [f for p, f in enumerate(fts) if p not in ignore]

    while len(fts) > 1:
        start = len(fts)
        fts = search_and_merge(fts)
        if len(fts) == start:
            break
    return fts


def test_merge_endpoint_collision_parity():
    """Hash-indexed merge must pick the SAME pairings as the Go loop when
    >=3 line endpoints collide (VERDICT r1 item 10)."""
    rng = np.random.default_rng(17)
    # a small pool of shared endpoints forces heavy collisions
    for trial in range(120):
        n_pts = int(rng.integers(3, 6))
        pool = [(float(x), float(y))
                for x, y in rng.integers(0, 4, (n_pts, 2))]
        n_lines = int(rng.integers(2, 9))
        lines = []
        for _ in range(n_lines):
            a, b = rng.integers(0, n_pts, 2)
            mid = rng.uniform(10, 20, (1, 2))  # unique interior vertex
            lines.append(np.vstack([np.array(pool[a]), mid,
                                    np.array(pool[b])]))
        expected = _go_merge_reference(lines)
        got = merge_features(
            [{"props": (), "type": 2, "rings": [ln]} for ln in lines]
        )
        got_rings = [f["rings"][0] for f in got]
        assert len(got_rings) == len(expected), trial
        for g, e in zip(got_rings, expected):
            assert g.shape == e.shape and (g == e).all(), trial
