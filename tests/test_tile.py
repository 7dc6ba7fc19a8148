"""Parity anchors for XYZ tile math (reference lib/tile/tile_test.go)."""
import numpy as np
import pytest

from grandine_ray.index import xyz

# lib/tile/tile_test.go:13-76
TILE_VECTORS = [
    ((13.73630, 51.05377), 14, (8817, 5481)),
    ((18.39856, -33.90184), 14, (9029, 9833)),
    ((-54.59123, -25.59547), 14, (5707, 9397)),
    ((-21.94073, 64.14607), 14, (7193, 4354)),
    ((-31.16580, 83.65691), 14, (6773, 648)),
    ((-64.45649, -85.04438), 14, (5258, 16380)),
    ((180.0, -90.0), 1, (1, 1)),
    ((-180.0, 90.0), 1, (0, 0)),
]


@pytest.mark.parametrize("pt,zoom,expected", TILE_VECTORS)
def test_tile_name(pt, zoom, expected):
    x, y = xyz.tile_xy(np.array([pt[0]]), np.array([pt[1]]), zoom)
    assert (int(x[0]), int(y[0])) == expected


# lib/tile/tile_test.go:78-107 (8-decimal rounded)
BBOX_VECTORS = [
    ((0, 0, 0), (-180.0, -85.05112878, 180.0, 85.05112878)),
    ((0, 0, 1), (-180.0, 0.0, 0.0, 85.05112878)),
    ((0, 1, 1), (-180.0, -85.05112878, 0.0, 0.0)),
    ((1, 2, 2), (-90.0, -66.51326044, 0.0, 0.0)),
]


@pytest.mark.parametrize("tid,expected", BBOX_VECTORS)
def test_tile_bbox(tid, expected):
    x, y, z = tid
    minx, miny, maxx, maxy = xyz.tile_bbox(np.array([x]), np.array([y]), z)
    got = tuple(round(float(v[0]), 8) for v in (minx, miny, maxx, maxy))
    assert got == pytest.approx(expected, abs=1e-8)


def test_coverage_flatmap_matches_scalar():
    rng = np.random.default_rng(42)
    minx = rng.uniform(-170, 160, 50)
    miny = rng.uniform(-80, 70, 50)
    maxx = minx + rng.uniform(0, 10, 50)
    maxy = miny + rng.uniform(0, 10, 50)
    for zoom in (0, 3, 7):
        row, tx, ty = xyz.coverage_flatmap(minx, miny, maxx, maxy, zoom)
        # scalar mirror of lib/tile/bbox.go:5-21
        expected = []
        for i in range(50):
            x1, y1 = xyz.tile_xy(minx[i], maxy[i], zoom)
            x2, y2 = xyz.tile_xy(maxx[i], miny[i], zoom)
            for xx in range(int(x1), int(x2) + 1):
                for yy in range(int(y1), int(y2) + 1):
                    expected.append((i, xx, yy))
        got = sorted(zip(row.tolist(), tx.tolist(), ty.tolist()))
        assert got == sorted(expected)


def test_tile_key_roundtrip():
    z = np.array([0, 5, 14, 30])
    x = np.array([0, 31, 16383, 2**29 - 1])
    y = np.array([0, 17, 16380, 2**29 - 1])
    z2, x2, y2 = xyz.tile_key_unpack(xyz.tile_key(z, x, y))
    assert (z2 == z).all() and (x2 == x).all() and (y2 == y).all()


def test_resolution():
    assert xyz.resolution(0, 1) == 360.0
    assert xyz.resolution(1, 4096) == 360.0 / (2 * 4096)
