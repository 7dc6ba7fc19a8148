"""TWKB codec tests (reference lib/spatial/twkb_test.go vectors)."""
import numpy as np

from grandine_ray.geom import twkb


def test_header_flags():
    # twkb_test.go:12-19: "24FF" → bbox flag set
    gtype, precision, flags = twkb.decode_header(bytes.fromhex("24ff"))
    assert flags["bbox"] is True
    assert gtype == 4 and precision == 2


def test_header_roundtrip():
    # twkb_test.go:21-30: type=LineString precision=4
    buf = twkb.encode_header(twkb.GEOM_LINESTRING, 4)
    gtype, precision, flags = twkb.decode_header(buf)
    assert gtype == twkb.GEOM_LINESTRING and precision == 4
    assert not any(flags.values())


def test_point_known_hex():
    # twkb_test.go:44-55: "01000204" → Point{1, 2} at precision 0
    gtype, pts = twkb.decode(bytes.fromhex("01000204"))
    assert gtype == twkb.GEOM_POINT
    assert pts.tolist() == [[1.0, 2.0]]


def test_line_known_hex():
    # twkb_test.go:57-67: "02000202020808" → [(1,1),(5,5)] at precision 0
    gtype, pts = twkb.decode(bytes.fromhex("02000202020808"))
    assert gtype == twkb.GEOM_LINESTRING
    assert pts.tolist() == [[1.0, 1.0], [5.0, 5.0]]


def test_point_roundtrip():
    # twkb_test.go:32-42: Point{-212, 12.3} precision 6
    buf = twkb.encode_point(-212.0, 12.3, precision=6)
    gtype, pts = twkb.decode(buf)
    assert pts[0].tolist() == [-212.0, 12.3]


def test_line_roundtrip_long():
    rng = np.random.default_rng(0)
    pts = np.round(rng.uniform(-180, 180, (300, 2)), 5)
    buf = twkb.encode_linestring(pts, precision=6)
    gtype, got = twkb.decode(buf)
    assert gtype == twkb.GEOM_LINESTRING
    assert np.allclose(got, pts, atol=1e-5)
