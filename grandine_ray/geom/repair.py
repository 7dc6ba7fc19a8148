"""Self-intersecting-ring repair — a from-scratch GEOS ``Buffer(0)``
equivalent (reference lib/spatial/clip_geos.go:25-33 retries a failed clip
after Buffer(0); clip_geos_test.go:19-30 expects the repaired
self_intersect fixture to clip into 2 polygons).

Algorithm (the classic polygon "make-valid" decomposition):

1. node the ring: find every proper crossing between non-adjacent
   segments (vectorized chunked all-pairs) and insert the intersection
   points into the vertex sequence;
2. pinch-off walk: traverse the noded ring keeping a stack of open
   vertices; revisiting a point closes the loop since its first visit —
   that loop is emitted as its own simple ring;
3. reassemble: each simple ring with non-trivial area becomes either an
   outer shell or — when nested inside another piece with opposite
   traversal orientation (an annulus drawn as one self-touching ring) —
   a hole of its smallest encloser.

A figure-8 therefore yields two filled polygons (matching Buffer(0) /
MakeValid OGC semantics, where both lobes are filled regardless of
winding), and accidental pinches in messy OSM outlines split cleanly.
"""
from __future__ import annotations

import numpy as np

_EPS = 1e-9


def _ring_area2(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _find_crossings(pts: np.ndarray):
    """Proper crossings between non-adjacent segments of a closed ring.

    Returns list of (i, j, ti, tj, x, y): segments i and j (i < j) cross at
    parameter ti on i / tj on j, at point (x, y). Endpoint-touching within
    eps is ignored (handled by the revisit walk via vertex equality).
    """
    n = len(pts)
    a = pts
    b = np.roll(pts, -1, axis=0)
    d = b - a
    out = []
    # chunk the [n, n] pair grid to bound memory on huge rings
    chunk = max(1, 4_000_000 // max(n, 1))
    for i0 in range(0, n, chunk):
        i1 = min(n, i0 + chunk)
        ai = a[i0:i1, None, :]
        di = d[i0:i1, None, :]
        aj = a[None, :, :]
        dj = d[None, :, :]
        denom = di[:, :, 0] * dj[:, :, 1] - di[:, :, 1] * dj[:, :, 0]
        diff = aj - ai
        with np.errstate(divide="ignore", invalid="ignore"):
            ti = (diff[:, :, 0] * dj[:, :, 1] - diff[:, :, 1] * dj[:, :, 0]) / denom
            tj = (diff[:, :, 0] * di[:, :, 1] - diff[:, :, 1] * di[:, :, 0]) / denom
        ii, jj = np.nonzero(
            (np.abs(denom) > _EPS)
            & (ti > _EPS) & (ti < 1 - _EPS)
            & (tj > _EPS) & (tj < 1 - _EPS)
        )
        for k in range(len(ii)):
            gi = i0 + int(ii[k])
            gj = int(jj[k])
            if gj <= gi:
                continue
            if gj == gi + 1 or (gi == 0 and gj == n - 1):
                continue  # adjacent segments share an endpoint
            t_i = float(ti[ii[k], jj[k]])
            t_j = float(tj[ii[k], jj[k]])
            x = a[gi, 0] + t_i * d[gi, 0]
            y = a[gi, 1] + t_i * d[gi, 1]
            out.append((gi, gj, t_i, t_j, x, y))
    return out


def _node_ring(pts: np.ndarray) -> np.ndarray:
    """Insert crossing points into the vertex sequence (noded ring)."""
    crossings = _find_crossings(pts)
    if not crossings:
        return pts
    per_seg: dict[int, list[tuple[float, float, float]]] = {}
    for i, j, ti, tj, x, y in crossings:
        per_seg.setdefault(i, []).append((ti, x, y))
        per_seg.setdefault(j, []).append((tj, x, y))
    out = []
    n = len(pts)
    for i in range(n):
        out.append(pts[i])
        for _, x, y in sorted(per_seg.get(i, [])):
            out.append((x, y))
    return np.asarray(out, dtype=np.float64)


def split_ring(pts: np.ndarray) -> list[np.ndarray]:
    """Noded-ring pinch-off walk → simple rings (traversal order kept)."""
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    if len(pts) > 1 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]
    if len(pts) < 3:
        return []
    noded = _node_ring(pts)
    open_pos: dict[tuple[float, float], int] = {}
    stack: list[tuple[float, float]] = []
    rings: list[np.ndarray] = []

    def key(p):
        return (round(float(p[0]), 9), round(float(p[1]), 9))

    for p in noded:
        k = key(p)
        if k in open_pos:
            pos = open_pos[k]
            loop = stack[pos:]
            if len(loop) >= 3:
                rings.append(np.asarray(loop, dtype=np.float64))
            # unwind: points pinched off are no longer open
            for q in stack[pos + 1:]:
                open_pos.pop(key(q), None)
            del stack[pos + 1:]
        else:
            open_pos[k] = len(stack)
            stack.append((float(p[0]), float(p[1])))
    if len(stack) >= 3:
        rings.append(np.asarray(stack, dtype=np.float64))
    # drop degenerate slivers
    return [r for r in rings if abs(_ring_area2(r)) > _EPS]


def _point_in_ring(x: float, y: float, ring: np.ndarray) -> bool:
    rx, ry = ring[:, 0], ring[:, 1]
    nx, ny = np.roll(rx, -1), np.roll(ry, -1)
    cond = (ry > y) != (ny > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xin = rx + (y - ry) / (ny - ry) * (nx - rx)
    return bool(np.count_nonzero(cond & (x < xin)) % 2)


def repair_polygon(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Polygon (outer + holes, outer possibly self-intersecting) → list of
    valid polygons (each: outer ring first, holes after). Equivalent role
    to GEOS Buffer(0) in the reference clip (clip_geos.go:25-33)."""
    outer = np.asarray(rings[0], dtype=np.float64).reshape(-1, 2)
    pieces = split_ring(outer)
    if not pieces:
        return []
    # orientation sign in traversal order, |area| for nesting order
    signs = [1 if _ring_area2(p) > 0 else -1 for p in pieces]
    areas = [abs(_ring_area2(p)) for p in pieces]
    order = np.argsort(areas)[::-1]
    polys: list[list[np.ndarray]] = []
    piece_poly: dict[int, int] = {}
    for oi in order:
        p = pieces[oi]
        # smallest already-placed piece that contains this one
        host = None
        host_area = np.inf
        for pj, poly_idx in piece_poly.items():
            if areas[pj] >= host_area or areas[pj] <= areas[oi]:
                continue
            if _point_in_ring(p[0, 0], p[0, 1], pieces[pj]):
                host = pj
                host_area = areas[pj]
        if host is not None and signs[host] != signs[oi]:
            polys[piece_poly[host]].append(p)   # opposite winding → hole
            piece_poly[oi] = piece_poly[host]
        else:
            piece_poly[oi] = len(polys)
            polys.append([p])
    # original holes attach to whichever repaired outer contains them
    for hole in rings[1:]:
        h = np.asarray(hole, dtype=np.float64).reshape(-1, 2)
        for poly in polys:
            if _point_in_ring(h[0, 0], h[0, 1], poly[0]):
                poly.append(h)
                break
    return polys


def ring_self_intersects(pts: np.ndarray) -> bool:
    """True if the closed ring has a proper self-crossing or revisits a
    vertex (pinch)."""
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    if len(pts) > 1 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]
    if len(pts) < 4:
        return False
    keys = {(round(float(x), 9), round(float(y), 9)) for x, y in pts}
    if len(keys) < len(pts):
        return True
    return bool(_find_crossings(pts))
