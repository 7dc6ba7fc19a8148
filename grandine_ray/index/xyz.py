"""Web-mercator slippy-map (XYZ) tile math, vectorized.

Parity-critical reimplementation of the reference's tile addressing
(/root/reference/lib/tile/tile.go:19-63, bbox.go:5-21). Golden vectors:
lib/tile/tile_test.go:13-107.
"""
from __future__ import annotations

import numpy as np

WGS84_LAT_MAX = 85.0511287
WGS84_LON_MAX = 180.0


def tile_xy(lon, lat, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Point → (x, y) tile indices at ``zoom`` (tile.go:37-49).

    lat is clamped to ±85.0511287 before the mercator formula; x/y are
    clamped to [0, 2^z - 1].
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = float(2 ** zoom)
    lat_rad = np.clip(lat, -WGS84_LAT_MAX, WGS84_LAT_MAX) * (np.pi / 180.0)
    x = np.floor((lon + 180.0) / 360.0 * n)
    y = np.floor((1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n)
    hi = n - 1.0
    x = np.clip(x, 0.0, hi).astype(np.int64)
    y = np.clip(y, 0.0, hi).astype(np.int64)
    return x, y


def tile_nw(x, y, zoom) -> tuple[np.ndarray, np.ndarray]:
    """North-west corner of tile (tile.go:25-31)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = np.exp2(np.asarray(zoom, dtype=np.float64))
    lon = x / n * 360.0 - 180.0
    lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * y / n))))
    return lon, lat


def tile_bbox(x, y, zoom) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tile → (minx, miny, maxx, maxy) in lon/lat (tile.go:19-23)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    nw_lon, nw_lat = tile_nw(x, y, zoom)
    se_lon, se_lat = tile_nw(x + 1, y + 1, zoom)
    return nw_lon, se_lat, se_lon, nw_lat


tile_bbox_z = tile_bbox  # alias: tile_bbox accepts per-element zoom arrays


def resolution(zoomlevel: int, extent: int) -> float:
    """Minimal representable value inside a tile (tile.go:52-54)."""
    return 360.0 / (2.0 ** zoomlevel * extent)


def coverage_ranges(minx, miny, maxx, maxy, zoom: int):
    """BBox → covered tile ranges, vectorized (bbox.go:5-21).

    Returns (x1, y1, x2, y2) int64 arrays: the covered tiles are the full
    cross product x1..x2 × y1..y2 (inclusive), counted from the top-left
    (x1 from the west edge, y1 from the *north* edge).
    """
    x1, y1 = tile_xy(minx, maxy, zoom)   # top-left
    x2, y2 = tile_xy(maxx, miny, zoom)   # bottom-right
    return x1, y1, x2, y2


def coverage_flatmap(minx, miny, maxx, maxy, zoom: int):
    """BBox arrays → flat (row_index, tile_x, tile_y) fan-out.

    One input bbox expands to (x2-x1+1)*(y2-y1+1) output rows, fully
    vectorized (no per-row Python loop).
    """
    x1, y1, x2, y2 = coverage_ranges(minx, miny, maxx, maxy, zoom)
    nx = x2 - x1 + 1
    ny = y2 - y1 + 1
    counts = nx * ny
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # local offset within each row's tile block: 0..counts[i]-1
    heads = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=heads[1:])
    local = np.arange(total, dtype=np.int64) - np.repeat(heads, counts)
    ny_r = np.repeat(ny, counts)
    tx = np.repeat(x1, counts) + local // ny_r
    ty = np.repeat(y1, counts) + local % ny_r
    return row_idx, tx, ty


def tile_key(z, x, y) -> np.ndarray:
    """Pack (z,x,y) into one uint64 shuffle key: z<<58 | x<<29 | y."""
    z = np.asarray(z, dtype=np.uint64)
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64)
    return (z << np.uint64(58)) | (x << np.uint64(29)) | y


def tile_key_unpack(key) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    key = np.asarray(key, dtype=np.uint64)
    z = (key >> np.uint64(58)).astype(np.int64)
    x = ((key >> np.uint64(29)) & np.uint64((1 << 29) - 1)).astype(np.int64)
    y = (key & np.uint64((1 << 29) - 1)).astype(np.int64)
    return z, x, y
