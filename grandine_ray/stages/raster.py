"""Raster ↔ vector conversion kernels (NORTH-RULE EXT; not in reference).

* ``rasterize_features``: per-tile occupancy/count grid — points via
  bincount, linestrings via Bresenham-style segment traversal, polygons via
  scanline fill (all numpy; no external raster lib).
* ``vectorize_grid``: marching-squares contouring of a binary mask back to
  polygon rings (pure numpy edge tracing).

Both run inside ``map_batches``/``map_groups``; the tile grid rides as a
fixed-size ``list<float>`` column so Arrow stays zero-copy.
"""
from __future__ import annotations

import numpy as np


def rasterize_points(xs, ys, size: int, extent: float) -> np.ndarray:
    """Point coords in [0, extent] → [size, size] count grid."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    m = (xs >= 0) & (xs <= extent) & (ys >= 0) & (ys <= extent)
    ix = np.clip((xs[m] / extent * size).astype(np.int64), 0, size - 1)
    iy = np.clip((ys[m] / extent * size).astype(np.int64), 0, size - 1)
    grid = np.bincount(iy * size + ix, minlength=size * size)
    return grid.reshape(size, size).astype(np.float64)


def rasterize_line(pts: np.ndarray, size: int, extent: float) -> np.ndarray:
    """LineString → binary hit grid (dense sampling per segment)."""
    grid = np.zeros((size, size), dtype=np.float64)
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    scale = size / extent
    for i in range(len(pts) - 1):
        a, b = pts[i] * scale, pts[i + 1] * scale
        n = max(2, int(np.ceil(np.abs(b - a).max())) * 2)
        t = np.linspace(0.0, 1.0, n)
        xs = np.clip((a[0] + (b[0] - a[0]) * t).astype(np.int64), 0, size - 1)
        ys = np.clip((a[1] + (b[1] - a[1]) * t).astype(np.int64), 0, size - 1)
        grid[ys, xs] = 1.0
    return grid


def rasterize_polygon(rings: list[np.ndarray], size: int, extent: float) -> np.ndarray:
    """Polygon → filled binary grid via even-odd scanline (holes handled)."""
    grid = np.zeros((size, size), dtype=np.float64)
    scale = size / extent
    ys_centers = (np.arange(size) + 0.5) / scale
    for row, ycv in enumerate(ys_centers):
        xs_cross: list[float] = []
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
            closed = np.vstack([r, r[:1]])
            y1 = closed[:-1, 1]
            y2 = closed[1:, 1]
            x1 = closed[:-1, 0]
            x2 = closed[1:, 0]
            m = ((y1 <= ycv) & (y2 > ycv)) | ((y2 <= ycv) & (y1 > ycv))
            if m.any():
                t = (ycv - y1[m]) / (y2[m] - y1[m])
                xs_cross.extend((x1[m] + t * (x2[m] - x1[m])).tolist())
        xs_cross.sort()
        for j in range(0, len(xs_cross) - 1, 2):
            lo = max(0, int(np.ceil(xs_cross[j] * scale - 0.5)))
            hi = min(size - 1, int(np.floor(xs_cross[j + 1] * scale - 0.5)))
            if hi >= lo:
                grid[row, lo:hi + 1] = 1.0
    return grid


def vectorize_grid(grid: np.ndarray, extent: float, threshold: float = 0.5):
    """Marching-squares: binary mask → list of closed rings (cell-edge
    polygons in [0, extent] coords). Pure numpy edge extraction + chaining."""
    size = grid.shape[0]
    mask = grid >= threshold
    fill = np.zeros((size + 2, size + 2), dtype=bool)
    fill[1:-1, 1:-1] = mask
    # boundary edges oriented with the filled region on the LEFT of travel
    # (y-up, row index = y): closed CCW outer rings, CW hole rings.
    segs: list[tuple[tuple[int, int], tuple[int, int]]] = []
    # horizontal boundaries between cell rows r and r+1 → lattice y = r+1
    rs, cs = np.nonzero(fill[1:, :] != fill[:-1, :])
    up = fill[rs + 1, cs]
    for r, c, u in zip(rs.tolist(), cs.tolist(), up.tolist()):
        y = r + 1
        if u:   # filled above → bottom edge, walk +x
            segs.append(((c, y), (c + 1, y)))
        else:   # filled below → top edge, walk -x
            segs.append(((c + 1, y), (c, y)))
    # vertical boundaries between cell cols c and c+1 → lattice x = c+1
    rs, cs = np.nonzero(fill[:, 1:] != fill[:, :-1])
    right = fill[rs, cs + 1]
    for r, c, rt in zip(rs.tolist(), cs.tolist(), right.tolist()):
        x = c + 1
        if rt:  # filled right → left edge, walk -y
            segs.append(((x, r + 1), (x, r)))
        else:   # filled left → right edge, walk +y
            segs.append(((x, r), (x, r + 1)))
    # chain edges into closed rings (≤2 outgoing per lattice point — saddles)
    nxt: dict[tuple, list[tuple]] = {}
    for a, b in segs:
        nxt.setdefault(a, []).append(b)
    rings = []
    used: set[tuple[tuple, tuple]] = set()
    for a0, bs in list(nxt.items()):
        for b0 in bs:
            if (a0, b0) in used:
                continue
            ring = [a0]
            used.add((a0, b0))
            cur = b0
            while cur != a0:
                ring.append(cur)
                outs = [b for b in nxt.get(cur, []) if (cur, b) not in used]
                if not outs:
                    break
                used.add((cur, outs[0]))
                cur = outs[0]
            if cur == a0 and len(ring) >= 4:
                pts = (np.asarray(ring, dtype=np.float64) - 1.0) / size * extent
                rings.append(_collapse_collinear(pts))
    return rings


def _collapse_collinear(pts: np.ndarray) -> np.ndarray:
    """Drop midpoints of straight runs (axis-aligned marching output)."""
    if len(pts) < 3:
        return pts
    prev = np.roll(pts, 1, axis=0)
    nxt = np.roll(pts, -1, axis=0)
    cross = (pts[:, 0] - prev[:, 0]) * (nxt[:, 1] - pts[:, 1]) - (
        pts[:, 1] - prev[:, 1]
    ) * (nxt[:, 0] - pts[:, 0])
    keep = cross != 0
    return pts[keep] if keep.any() else pts[:1]


def make_rasterize_fn(size: int = 64, extent: float = 4096.0):
    """map_batches fn: tile-space features → per-row raster grid column."""
    import pyarrow as pa

    from ..geom import wkb as wkbmod

    def fn(batch: pa.Table) -> pa.Table:
        gb = wkbmod.decode_wkb_batch(batch["geom_wkb"].to_pylist())
        grids = []
        for i in range(len(gb)):
            rings = gb.rings_of(i)
            t = int(gb.types[i])
            if t == wkbmod.GEOM_POINT:
                g = rasterize_points(rings[0][:, 0], rings[0][:, 1], size, extent)
            elif t == wkbmod.GEOM_LINESTRING:
                g = rasterize_line(rings[0], size, extent)
            else:
                g = rasterize_polygon(rings, size, extent)
            grids.append(g.reshape(-1))
        return batch.append_column(
            "raster",
            pa.array([g.tolist() for g in grids], pa.list_(pa.float64(), size * size)),
        )

    return fn
