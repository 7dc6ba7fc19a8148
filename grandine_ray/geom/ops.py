"""Scalar/vector geometry kernels.

Reimplements the reference's observable semantics:
  * rounding to 8 decimals   — lib/spatial/point.go:63-70,129-139
  * ring area / winding      — lib/spatial/line.go:149-169
  * winding fix              — lib/spatial/polygon.go:48-72
  * RDP simplification       — lib/spatial/line.go:171-200
  * haversine / bearing      — lib/spatial/point.go:107-123, line.go:383-392
  * EPSG:4326→3857           — lib/mvt/project.go:36-41
  * line center              — lib/spatial/line.go:35-50
"""
from __future__ import annotations

import numpy as np

POINT_PRECISION = 8
EARTH_RADIUS_3857 = 6378137.0
EARTH_RADIUS_M = 6371000.0


import math as _math


def round_half_away(v):
    """Go-style round: half away from zero (point.go:129-134)."""
    if isinstance(v, (float, int)):  # scalar fast path (hot in clip loops)
        if not _math.isfinite(v):
            return v  # match numpy: floor/ceil of ±inf/nan pass through
        return _math.floor(v + 0.5) if v >= 0 else _math.ceil(v - 0.5)
    v = np.asarray(v, dtype=np.float64)
    return np.where(v < 0, np.ceil(v - 0.5), np.floor(v + 0.5))


def rounded_coords(v, decimals: int = POINT_PRECISION):
    s = 10.0 ** decimals
    if isinstance(v, (float, int)):
        x = v * s
        if not _math.isfinite(x):
            return x
        return (_math.floor(x + 0.5) if x >= 0 else _math.ceil(x - 0.5)) / s
    return round_half_away(np.asarray(v, dtype=np.float64) * s) / s


def ring_area(pts: np.ndarray) -> float:
    """Signed 2x-area; positive ⇔ clockwise (line.go:156-169)."""
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    x = pts[:, 0]
    y = pts[:, 1]
    xn = np.roll(x, -1)
    yn = np.roll(y, -1)
    return float(np.sum((y + yn) * (x - xn)))


def is_clockwise(pts: np.ndarray) -> bool:
    return ring_area(pts) > 0


def fix_winding(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Outer ring clockwise; holes by odd containment count (polygon.go:48-72)."""
    from .predicates import point_in_rings

    out = [np.array(r, dtype=np.float64, copy=True) for r in rings]
    for n, ring in enumerate(out):
        if n == 0:
            if not is_clockwise(ring):
                out[0] = ring[::-1].copy()
            continue
        inrings = 0
        for ninner, cring in enumerate(out):
            if n == ninner:
                continue
            if point_in_rings(ring[0, 0], ring[0, 1], [cring]):
                inrings += 1
        cw = is_clockwise(ring)
        if (inrings % 2 == 0 and not cw) or (inrings % 2 == 1 and cw):
            out[n] = ring[::-1].copy()
    return out


def simplify_rdp(pts: np.ndarray, epsilon: float) -> np.ndarray:
    """Ramer-Douglas-Peucker, matching line.go:171-200 (iterative form)."""
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    if len(pts) < 3:
        return pts
    keep = np.zeros(len(pts), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(pts) - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        seg = pts[[lo, hi]]
        d = _seg_dist_to_pts(seg[0], seg[1], pts[lo + 1:hi])
        imax = int(np.argmax(d))
        if d[imax] > epsilon:
            mid = lo + 1 + imax
            keep[mid] = True
            stack.append((lo, mid))
            stack.append((mid, hi))
    return pts[keep]


def _seg_dist_to_pts(a: np.ndarray, b: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Perpendicular distance of pts to segment a-b (line.go:351-380)."""
    c = b - a
    len_sq = float(c @ c)
    d = pts - a
    if len_sq == 0:
        param = np.zeros(len(pts))
    else:
        param = (d @ c) / len_sq
    proj = a + np.clip(param, 0.0, 1.0)[:, None] * c
    diff = pts - proj
    return np.sqrt((diff * diff).sum(axis=1))


def haversine_m(lon1, lat1, lon2, lat2):
    """Distance in meters, R=6371000 (point.go:107-123). Vectorized."""
    lon1, lat1, lon2, lat2 = (np.asarray(v, dtype=np.float64) for v in (lon1, lat1, lon2, lat2))
    p1 = np.radians(lat1)
    p2 = np.radians(lat2)
    dlat = p2 - p1
    dlon = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dlat / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlon / 2) ** 2
    return 2 * np.arctan2(np.sqrt(a), np.sqrt(1 - a)) * EARTH_RADIUS_M


def bearing_deg(lon1, lat1, lon2, lat2):
    """Heading from first to second point in degrees (line.go:383-392)."""
    lon1, lat1, lon2, lat2 = (np.asarray(v, dtype=np.float64) for v in (lon1, lat1, lon2, lat2))
    dlon = np.radians(lon2 - lon1)
    la1 = np.radians(lat1)
    la2 = np.radians(lat2)
    y = np.sin(dlon) * np.cos(la2)
    x = np.cos(la1) * np.sin(la2) - np.sin(la1) * np.cos(la2) * np.cos(dlon)
    return np.mod(np.degrees(np.arctan2(y, x)) + 360.0, 360.0)


def proj_4326_to_3857(lon, lat):
    """Spherical-mercator forward projection (project.go:36-41). Vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.radians(lon) * EARTH_RADIUS_3857
    y = np.log(np.tan(np.radians(lat) / 2.0 + np.pi / 4.0)) * EARTH_RADIUS_3857
    return x, y


def line_center(pts: np.ndarray) -> tuple[float, float]:
    """Cross-product weighted center (line.go:35-50)."""
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    x = pts[:, 0]
    y = pts[:, 1]
    xn = np.roll(x, -1)
    yn = np.roll(y, -1)
    cross = x * yn - y * xn
    s = cross.sum()
    px = ((x + xn) * cross).sum()
    py = ((y + yn) * cross).sum()
    z = 1.0 / (3.0 * s)
    return px * z, py * z


def polygon_area2_micro(gb) -> tuple:
    """Per-geometry shoelace statistics in EXACT integer arithmetic.

    Coordinates are integer-ized per vertex (floor(v * 1e6 + 0.5) —
    micro-degrees, the repo's cross-engine float-parity rule) and the
    shoelace cross terms are summed as int64, so the result is
    bit-identical to any engine applying the same integer recipe (the
    DuckDB oracle mirrors it over the ground-truth vertex table).

    Returns ``(n_rings, n_vertices, area2_sum)`` int64 arrays per
    geometry, where ``area2_sum`` is the sum over the geometry's rings of
    ``abs(sum(x_i*y_{i+1} - x_{i+1}*y_i))`` with wraparound inside each
    (unclosed) ring — twice the absolute ring area in micro-deg².
    """
    n = len(gb.types)
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z.copy(), z.copy()
    xi = np.floor(gb.coords[:, 0] * 1e6 + 0.5).astype(np.int64)
    yi = np.floor(gb.coords[:, 1] * 1e6 + 0.5).astype(np.int64)
    # |xi| <= 180e6, |yi| <= 90e6 -> |cross term| <= 3.3e16; a ring of
    # up to ~2.8e2 vertices stays far below 2^63. Guard loudly anyway.
    ro = np.asarray(gb.ring_offsets, np.int64)
    go = np.asarray(gb.geom_offsets, np.int64)
    total = len(xi)
    if np.abs(xi).max(initial=0) > 200_000_000 or \
            np.abs(yi).max(initial=0) > 200_000_000:
        raise ValueError("polygon_area2_micro: coordinate out of range")
    nxt = np.arange(1, total + 1, dtype=np.int64)
    last = ro[1:] - 1          # last vertex index of each ring
    nxt[last] = ro[:-1]        # wraparound to ring start
    cross = xi * yi[nxt] - xi[nxt] * yi
    ring_area2 = np.add.reduceat(cross, ro[:-1])
    ring_area2[ro[:-1] == ro[1:]] = 0  # defensive: empty ring
    abs2 = np.abs(ring_area2)
    n_rings = (go[1:] - go[:-1]).astype(np.int64)
    area2 = np.zeros(n, np.int64)
    nz = n_rings > 0
    if nz.any():
        area2[nz] = np.add.reduceat(abs2, go[:-1][nz])
    starts = ro[go[:-1]]
    stops = ro[go[1:]]
    n_vertices = (stops - starts).astype(np.int64)
    return n_rings, n_vertices, area2


def polygon_edge_stats_micro(gb) -> tuple:
    """Per-geometry ring-edge statistics in EXACT integer micro-degrees.

    Vertices are micro-integerized like :func:`polygon_area2_micro`
    (floor(v·1e6 + 0.5) — the repo's cross-engine float-parity rule)
    and every ring edge including the wraparound closing edge of the
    (unclosed-stored) ring contributes

    - Manhattan length ``|dx| + |dy|`` (≤ 5.4e8 per edge), and
    - squared Euclidean length ``dx² + dy²`` (≤ 2.0e17 per edge,
      int64-safe).

    Returns ``(n_edges, manh_perim, max_edge2)`` int64 arrays per
    geometry: edge count (= vertex count over all rings), the Manhattan
    perimeter sum, and the longest edge's squared length. The per-
    geometry Manhattan sum is guarded loudly (a 10M-edge geometry is
    still < 5.4e15 ≪ 2^63; beyond the guard the caller must split).
    """
    n = len(gb.types)
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z.copy(), z.copy()
    xi = np.floor(gb.coords[:, 0] * 1e6 + 0.5).astype(np.int64)
    yi = np.floor(gb.coords[:, 1] * 1e6 + 0.5).astype(np.int64)
    if np.abs(xi).max(initial=0) > 200_000_000 or \
            np.abs(yi).max(initial=0) > 200_000_000:
        raise ValueError(
            "polygon_edge_stats_micro: coordinate out of range")
    ro = np.asarray(gb.ring_offsets, np.int64)
    go = np.asarray(gb.geom_offsets, np.int64)
    total = len(xi)
    if (ro[1:] == ro[:-1]).any():
        # An empty ring's `last` index (ro[k]-1) collides with the
        # previous ring's last vertex and would silently rewire that
        # ring's closing edge. Unreachable from the WKB decode path,
        # but this kernel takes arbitrary geometry batches.
        raise ValueError("polygon_edge_stats_micro: empty ring")
    nxt = np.arange(1, total + 1, dtype=np.int64)
    last = ro[1:] - 1          # last vertex index of each ring
    nxt[last] = ro[:-1]        # wraparound to ring start
    dx = np.abs(xi[nxt] - xi)
    dy = np.abs(yi[nxt] - yi)
    manh = dx + dy
    e2 = dx * dx + dy * dy
    starts = ro[go[:-1]]
    stops = ro[go[1:]]
    n_edges = (stops - starts).astype(np.int64)
    if int(n_edges.max(initial=0)) > 10_000_000:
        raise ValueError(
            "polygon_edge_stats_micro: per-geometry edge budget exceeded")
    manh_perim = np.zeros(n, np.int64)
    max_edge2 = np.zeros(n, np.int64)
    nz = n_edges > 0
    if nz.any():
        manh_perim[nz] = np.add.reduceat(manh, starts[nz])
        max_edge2[nz] = np.maximum.reduceat(e2, starts[nz])
    return n_edges, manh_perim, max_edge2


def polygon_centroid_micro(gb) -> tuple:
    """Outer-ring shoelace centroid per polygon in EXACT integer
    micro-degrees.

    centroid = Σ(v_i + v_{i+1})·cross_i / (3·Σcross_i) over the FIRST
    (outer) ring, with vertices micro-integerized like
    polygon_area2_micro. The per-edge products reach ~1.2e25 (beyond
    int64), so the cross terms are computed vectorized in int64 and
    only the bounded per-ring reduce runs on object dtype (Python
    ints — the DuckDB HUGEINT mirror); rings are ≤ a few hundred
    vertices so the object reduce is off the hot path. The final
    division truncates toward zero (DuckDB ``//`` parity). Both the
    sums and the ratio are invariant under ring rotation, and under
    reversal the numerators and denominator flip sign together, so the
    result is independent of the codec's vertex ordering.

    Returns ``(cx_micro, cy_micro, area2_outer, valid)`` — int64
    centroid coords, ABS of twice the signed outer-ring area
    (micro-deg², orientation-invariant), and a bool mask; zero-area or
    ringless polygons are ``valid=False`` with zeroed outputs.
    """
    n = len(gb.types)
    z = np.zeros(n, np.int64)
    if n == 0:
        return z, z.copy(), z.copy(), np.zeros(0, bool)
    xi = np.floor(gb.coords[:, 0] * 1e6 + 0.5).astype(np.int64)
    yi = np.floor(gb.coords[:, 1] * 1e6 + 0.5).astype(np.int64)
    if np.abs(xi).max(initial=0) > 200_000_000 or \
            np.abs(yi).max(initial=0) > 200_000_000:
        raise ValueError("polygon_centroid_micro: coordinate out of range")
    ro = np.asarray(gb.ring_offsets, np.int64)
    go = np.asarray(gb.geom_offsets, np.int64)
    total = len(xi)
    nxt = np.arange(1, total + 1, dtype=np.int64)
    last = ro[1:] - 1
    nxt[last] = ro[:-1]
    cross = xi * yi[nxt] - xi[nxt] * yi          # |cross| ≤ 3.3e16, safe
    sx = (xi + xi[nxt]).astype(object)           # int128 territory from
    sy = (yi + yi[nxt]).astype(object)           # here on: Python ints
    co = cross.astype(object)
    ring_a2 = np.add.reduceat(cross, ro[:-1]) if total else cross
    ring_nx = np.add.reduceat(sx * co, ro[:-1]) if total else co
    ring_ny = np.add.reduceat(sy * co, ro[:-1]) if total else co
    ring_a2[ro[:-1] == ro[1:]] = 0
    cx = z.copy()
    cy = z.copy()
    a2o = z.copy()
    valid = np.zeros(n, bool)
    has_ring = go[1:] > go[:-1]
    first = go[:-1][has_ring]                    # outer-ring index
    for g, r in zip(np.nonzero(has_ring)[0], first):
        a2 = int(ring_a2[r])
        if a2 == 0:
            continue
        nx, ny = int(ring_nx[r]), int(ring_ny[r])
        den = 3 * a2
        sgn_x = 1 if (nx >= 0) == (den > 0) else -1
        sgn_y = 1 if (ny >= 0) == (den > 0) else -1
        cx[g] = sgn_x * (abs(nx) // abs(den))    # trunc, DuckDB // parity
        cy[g] = sgn_y * (abs(ny) // abs(den))
        a2o[g] = abs(a2)
        valid[g] = True
    return cx, cy, a2o, valid


def linestring_length_mm(gb) -> tuple:
    """Per-geometry geodesic length: haversine per segment, floored to
    integer millimetres PER SEGMENT (the cross-engine contract used by
    knn/radius joins — floor(d*1000+0.5)), then integer-summed.

    Returns ``(n_segments, length_mm)`` int64 arrays per geometry. A
    geometry's segments are consecutive vertex pairs inside each ring
    (no wraparound — linestrings are open).
    """
    n = len(gb.types)
    z = np.zeros(n, np.int64)
    if n == 0:
        return z, z.copy()
    ro = np.asarray(gb.ring_offsets, np.int64)
    go = np.asarray(gb.geom_offsets, np.int64)
    total = len(gb.coords)
    if total < 2:
        return z, z.copy()
    # segment start index s is every vertex that is not the last of its ring
    is_last = np.zeros(total, bool)
    is_last[ro[1:] - 1] = True
    s = np.nonzero(~is_last)[0]
    if len(s) == 0:
        return z, z.copy()
    x, y = gb.coords[:, 0], gb.coords[:, 1]
    d = haversine_m(x[s], y[s], x[s + 1], y[s + 1])
    mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
    # ring of each segment -> geometry of each ring
    ring_of_seg = np.searchsorted(ro, s, side="right") - 1
    geom_of_ring = np.searchsorted(go, np.arange(len(ro) - 1),
                                   side="right") - 1
    geom_of_seg = geom_of_ring[ring_of_seg]
    n_segments = np.bincount(geom_of_seg, minlength=n).astype(np.int64)
    length = np.zeros(n, np.int64)
    np.add.at(length, geom_of_seg, mm)
    return n_segments, length
