"""Geometric predicates: segment intersection, point-in-polygon, bbox tests.

Parity notes (reference: /root/reference/lib/spatial):
  * Segment intersection via cartesian line form + determinant, with the
    result rounded to 8 decimals before the on-segment check
    (line.go:333-348, conversion.go:5-10, point.go:63).
  * Point-in-polygon casts a ray to a point just outside the outer ring's
    bbox and counts *distinct* intersection points (point.go:72-101 keeps
    them in a set); even count ⇒ outside unless one intersection equals the
    query point itself.
  * BBox overlap is the reference's corner-in-box test (bbox.go:15-21) —
    kept as `bbox_overlaps_ref` for parity; `bbox_overlaps` is the standard
    interval form used internally.
"""
from __future__ import annotations

import numpy as np

from .ops import rounded_coords


def segment_carthesian(x1, y1, x2, y2):
    """Line form (a, b, c) with a*x + b*y = c (conversion.go:5-10)."""
    a = np.asarray(y2, np.float64) - y1
    b = np.asarray(x1, np.float64) - x2
    c = a * x1 + b * y1
    return a, b, c


def segment_intersection(s1, s2):
    """Scalar: intersection point of two segments, or None (line.go:333-348)."""
    (x1, y1), (x2, y2) = s1
    (x3, y3), (x4, y4) = s2
    a1, b1, c1 = segment_carthesian(x1, y1, x2, y2)
    a2, b2, c2 = segment_carthesian(x3, y3, x4, y4)
    det = a1 * b2 - a2 * b1
    if det == 0:
        return None
    ix = float(rounded_coords((b2 * c1 - b1 * c2) / det))
    iy = float(rounded_coords((a1 * c2 - a2 * c1) / det))
    if _seg_has_point(s1, ix, iy) and _seg_has_point(s2, ix, iy):
        return (ix, iy)
    return None


def _seg_has_point(s, px, py) -> bool:
    """Bounding-interval test with rounded endpoints (line.go:240-253)."""
    (x1, y1), (x2, y2) = s
    x1, y1, x2, y2 = (float(rounded_coords(v)) for v in (x1, y1, x2, y2))
    return (
        min(x1, x2) <= px <= max(x1, x2) and min(y1, y2) <= py <= max(y1, y2)
    )


def ring_segments(ring: np.ndarray) -> np.ndarray:
    """All segments of an (unclosed) ring incl. the closing one → [n,2,2]."""
    ring = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    closed = np.vstack([ring, ring[:1]])
    return np.stack([closed[:-1], closed[1:]], axis=1)


def point_in_rings(px: float, py: float, rings) -> bool:
    """Scalar reference-parity PIP (point.go:72-101)."""
    outer = np.asarray(rings[0], dtype=np.float64).reshape(-1, 2)
    minx, miny = outer.min(axis=0)
    maxx, maxy = outer.max(axis=0)
    if not (minx <= px <= maxx and miny <= py <= maxy):
        return False
    ox, oy = minx - 1.0, miny - 1.0
    ray = ((px, py), (ox, oy))
    inters: set[tuple[float, float]] = set()
    for ring in rings:
        for seg in ring_segments(ring):
            ipt = segment_intersection(ray, ((seg[0, 0], seg[0, 1]), (seg[1, 0], seg[1, 1])))
            if ipt is not None:
                inters.add(ipt)
    if len(inters) % 2 == 0:
        return (px, py) in inters
    return True


class CompiledPolygon:
    """Per-polygon segment constants precomputed once (actor-state pattern):
    cartesian line forms + rounded bounds of every segment of every ring
    (incl. closing segments), so the PIP test is one [S, P] broadcast."""

    __slots__ = ("a2", "b2", "c2", "sminx", "smaxx", "sminy", "smaxy",
                 "minx", "miny", "maxx", "maxy")

    def __init__(self, rings):
        segs = np.concatenate([ring_segments(r) for r in rings])  # [S,2,2]
        x1 = segs[:, 0, 0]
        y1 = segs[:, 0, 1]
        x2 = segs[:, 1, 0]
        y2 = segs[:, 1, 1]
        self.a2 = y2 - y1
        self.b2 = x1 - x2
        self.c2 = self.a2 * x1 + self.b2 * y1
        rx1 = rounded_coords(x1)
        ry1 = rounded_coords(y1)
        rx2 = rounded_coords(x2)
        ry2 = rounded_coords(y2)
        self.sminx = np.minimum(rx1, rx2)[:, None]
        self.smaxx = np.maximum(rx1, rx2)[:, None]
        self.sminy = np.minimum(ry1, ry2)[:, None]
        self.smaxy = np.maximum(ry1, ry2)[:, None]
        outer = np.asarray(rings[0], dtype=np.float64).reshape(-1, 2)
        self.minx, self.miny = outer.min(axis=0)
        self.maxx, self.maxy = outer.max(axis=0)


def _compile_from_segments(x1, y1, x2, y2, off, pbounds) -> dict:
    a2 = y2 - y1
    b2 = x1 - x2
    rx1 = rounded_coords(x1)
    ry1 = rounded_coords(y1)
    rx2 = rounded_coords(x2)
    ry2 = rounded_coords(y2)
    return {
        "a2": a2, "b2": b2, "c2": a2 * x1 + b2 * y1,
        "sminx": np.minimum(rx1, rx2), "smaxx": np.maximum(rx1, rx2),
        "sminy": np.minimum(ry1, ry2), "smaxy": np.maximum(ry1, ry2),
        "off": off, "pbounds": pbounds,
    }


def compile_polygons(rings_list) -> dict:
    """Compile MANY polygons into flat numpy arrays (broadcast-friendly:
    one ray.put object, zero-copy views per polygon on the worker side)."""
    n = len(rings_list)
    seg_counts = np.empty(n, dtype=np.int64)
    parts = []
    pbounds = np.empty((n, 4), dtype=np.float64)
    for i, rings in enumerate(rings_list):
        segs = np.concatenate([ring_segments(r) for r in rings])
        parts.append(segs)
        seg_counts[i] = len(segs)
        outer = np.asarray(rings[0], dtype=np.float64).reshape(-1, 2)
        pbounds[i, :2] = outer.min(axis=0)
        pbounds[i, 2:] = outer.max(axis=0)
    segs = np.concatenate(parts) if parts else np.empty((0, 2, 2))
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(seg_counts, out=off[1:])
    return _compile_from_segments(
        segs[:, 0, 0], segs[:, 0, 1], segs[:, 1, 0], segs[:, 1, 1], off, pbounds
    )


def compile_polygons_ragged(coords, ring_offsets, geom_offsets) -> dict:
    """Fully vectorized compile from a GeomBatch-style ragged layout (no
    per-polygon Python loop — required for large broadcast polygon sets).

    Each ring of n (unclosed) vertices yields exactly n segments (incl. the
    closing one), so segment start = every vertex and segment end = the
    next vertex with ring-last wrapping to ring-first.
    """
    coords = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
    geom_offsets = np.asarray(geom_offsets, dtype=np.int64)
    total = len(coords)
    nxt = np.arange(1, total + 1, dtype=np.int64)
    ring_last = ring_offsets[1:] - 1
    nxt[ring_last] = ring_offsets[:-1]
    x1 = coords[:, 0]
    y1 = coords[:, 1]
    x2 = coords[nxt, 0]
    y2 = coords[nxt, 1]
    off = ring_offsets[geom_offsets]
    # outer-ring bbox per polygon (reference: poly[0].BBox(), point.go:73)
    o_starts = ring_offsets[geom_offsets[:-1]]
    o_stops = ring_offsets[geom_offsets[:-1] + 1]
    from .wkb import expand_ranges

    o_idx = expand_ranges(o_starts, o_stops)
    o_sizes = o_stops - o_starts
    o_off = np.zeros(len(o_sizes), dtype=np.int64)
    np.cumsum(o_sizes[:-1], out=o_off[1:])
    ox = coords[o_idx, 0]
    oy = coords[o_idx, 1]
    pbounds = np.stack(
        [
            np.minimum.reduceat(ox, o_off),
            np.minimum.reduceat(oy, o_off),
            np.maximum.reduceat(ox, o_off),
            np.maximum.reduceat(oy, o_off),
        ],
        axis=1,
    )
    return _compile_from_segments(x1, y1, x2, y2, off, pbounds)


def polygon_view(comp: dict, i: int) -> "CompiledPolygon":
    """Zero-copy per-polygon view into a compile_polygons() bundle."""
    cp = CompiledPolygon.__new__(CompiledPolygon)
    lo, hi = comp["off"][i], comp["off"][i + 1]
    cp.a2 = comp["a2"][lo:hi]
    cp.b2 = comp["b2"][lo:hi]
    cp.c2 = comp["c2"][lo:hi]
    cp.sminx = comp["sminx"][lo:hi, None]
    cp.smaxx = comp["smaxx"][lo:hi, None]
    cp.sminy = comp["sminy"][lo:hi, None]
    cp.smaxy = comp["smaxy"][lo:hi, None]
    cp.minx, cp.miny, cp.maxx, cp.maxy = comp["pbounds"][i]
    return cp


def points_in_polygon(px: np.ndarray, py: np.ndarray, rings,
                      compiled: CompiledPolygon | None = None) -> np.ndarray:
    """Vectorized over query points; same semantics as point_in_rings.

    One [S, P] broadcast over all segments × candidate points; pass a
    :class:`CompiledPolygon` to amortize segment constants across batches.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = len(px)
    result = np.zeros(n, dtype=bool)
    cp = compiled if compiled is not None else CompiledPolygon(rings)
    inbb = (px >= cp.minx) & (px <= cp.maxx) & (py >= cp.miny) & (py <= cp.maxy)
    if not inbb.any():
        return result
    idx = np.nonzero(inbb)[0]
    qx = px[idx]
    qy = py[idx]
    ox, oy = cp.minx - 1.0, cp.miny - 1.0

    # ray segment per query point: (qx,qy) -> (ox,oy)
    a1 = oy - qy
    b1 = qx - ox
    c1 = a1 * qx + b1 * qy
    rqx = rounded_coords(qx)
    rqy = rounded_coords(qy)
    rox = float(rounded_coords(ox))
    roy = float(rounded_coords(oy))
    rminx = np.minimum(rqx, rox)
    rmaxx = np.maximum(rqx, rox)
    rminy = np.minimum(rqy, roy)
    rmaxy = np.maximum(rqy, roy)

    a2 = cp.a2[:, None]
    b2 = cp.b2[:, None]
    c2 = cp.c2[:, None]
    det = a1[None, :] * b2 - a2 * b1[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        ix = rounded_coords((b2 * c1[None, :] - b1[None, :] * c2) / det)
        iy = rounded_coords((a1[None, :] * c2 - a2 * c1[None, :]) / det)
    valid = (
        (det != 0)
        & (ix >= rminx[None, :]) & (ix <= rmaxx[None, :])
        & (iy >= rminy[None, :]) & (iy <= rmaxy[None, :])
        & (ix >= cp.sminx) & (ix <= cp.smaxx)
        & (iy >= cp.sminy) & (iy <= cp.smaxy)
    )
    if not valid.any():
        return result
    sidx, pidx = np.nonzero(valid)
    ixs = ix[sidx, pidx]
    iys = iy[sidx, pidx]
    # distinct intersection points per query point
    rec = np.empty(len(pidx), dtype=[("p", np.int64), ("x", np.float64), ("y", np.float64)])
    rec["p"] = pidx
    rec["x"] = ixs
    rec["y"] = iys
    rec = np.unique(rec)
    counts = np.bincount(rec["p"], minlength=len(idx))
    odd = counts % 2 == 1
    # even count but intersection == the query point itself ⇒ inside
    eq_self = (rec["x"] == rqx[rec["p"]]) & (rec["y"] == rqy[rec["p"]])
    self_hit = np.zeros(len(idx), dtype=bool)
    if eq_self.any():
        self_hit[np.unique(rec["p"][eq_self])] = True
    result[idx] = odd | (~odd & self_hit)
    return result


def ring_intersects_rect(ring: np.ndarray, minx, miny, maxx, maxy) -> bool:
    """Any ring segment (incl. closing) intersects any rect border.

    Vectorized equivalent of Line.Intersections(bbox.Segments()) != [] —
    same determinant + 8-decimal rounding + HasPoint semantics as
    segment_intersection, evaluated over all segments at once.
    """
    ring = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    closed = np.vstack([ring, ring[:1]])
    x1 = closed[:-1, 0]
    y1 = closed[:-1, 1]
    x2 = closed[1:, 0]
    y2 = closed[1:, 1]
    a1 = y2 - y1
    b1 = x1 - x2
    c1 = a1 * x1 + b1 * y1
    rx1 = rounded_coords(x1)
    ry1 = rounded_coords(y1)
    rx2 = rounded_coords(x2)
    ry2 = rounded_coords(y2)
    sminx = np.minimum(rx1, rx2)
    smaxx = np.maximum(rx1, rx2)
    sminy = np.minimum(ry1, ry2)
    smaxy = np.maximum(ry1, ry2)
    borders = (
        (minx, miny, minx, maxy),
        (minx, maxy, maxx, maxy),
        (maxx, maxy, maxx, miny),
        (maxx, miny, minx, miny),
    )
    for bx1, by1, bx2, by2 in borders:
        a2 = by2 - by1
        b2 = bx1 - bx2
        c2 = a2 * bx1 + b2 * by1
        det = a1 * b2 - a2 * b1
        nz = det != 0
        if not nz.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            ix = rounded_coords((b2 * c1 - b1 * c2) / det)
            iy = rounded_coords((a1 * c2 - a2 * c1) / det)
        rbminx = min(round(bx1, 8), round(bx2, 8))
        rbmaxx = max(round(bx1, 8), round(bx2, 8))
        rbminy = min(round(by1, 8), round(by2, 8))
        rbmaxy = max(round(by1, 8), round(by2, 8))
        hit = (
            nz
            & (ix >= sminx) & (ix <= smaxx) & (iy >= sminy) & (iy <= smaxy)
            & (ix >= rbminx) & (ix <= rbmaxx) & (iy >= rbminy) & (iy <= rbmaxy)
        )
        if hit.any():
            return True
    return False


def rings_hit_rect_bulk(x1, y1, x2, y2, fid, nfeat,
                        minx, miny, maxx, maxy) -> np.ndarray:
    """Vectorized :func:`ring_intersects_rect` over MANY rings at once:
    identical determinant + 8-decimal-rounding + segment/border-bbox
    semantics, evaluated on flat segment arrays (one feature id per
    segment) → bool[nfeat]. Used by the tiler's prepare stage to classify
    every border-candidate polygon in one numpy pass instead of one
    Python call per (feature, tile) pair.
    """
    x1 = np.asarray(x1, np.float64)
    y1 = np.asarray(y1, np.float64)
    x2 = np.asarray(x2, np.float64)
    y2 = np.asarray(y2, np.float64)
    a1 = y2 - y1
    b1 = x1 - x2
    c1 = a1 * x1 + b1 * y1
    rx1 = rounded_coords(x1)
    ry1 = rounded_coords(y1)
    rx2 = rounded_coords(x2)
    ry2 = rounded_coords(y2)
    sminx = np.minimum(rx1, rx2)
    smaxx = np.maximum(rx1, rx2)
    sminy = np.minimum(ry1, ry2)
    smaxy = np.maximum(ry1, ry2)
    hit = np.zeros(len(x1), dtype=bool)
    borders = (
        (minx, miny, minx, maxy),
        (minx, maxy, maxx, maxy),
        (maxx, maxy, maxx, miny),
        (maxx, miny, minx, miny),
    )
    for bx1, by1, bx2, by2 in borders:
        a2 = by2 - by1
        b2 = bx1 - bx2
        c2 = a2 * bx1 + b2 * by1
        det = a1 * b2 - a2 * b1
        nz = det != 0
        with np.errstate(divide="ignore", invalid="ignore"):
            ix = rounded_coords((b2 * c1 - b1 * c2) / det)
            iy = rounded_coords((a1 * c2 - a2 * c1) / det)
        rbminx = min(round(bx1, 8), round(bx2, 8))
        rbmaxx = max(round(bx1, 8), round(bx2, 8))
        rbminy = min(round(by1, 8), round(by2, 8))
        rbmaxy = max(round(by1, 8), round(by2, 8))
        hit |= (
            nz
            & (ix >= sminx) & (ix <= smaxx) & (iy >= sminy) & (iy <= smaxy)
            & (ix >= rbminx) & (ix <= rbmaxx) & (iy >= rbminy) & (iy <= rbmaxy)
        )
    if not hit.any():
        return np.zeros(nfeat, dtype=bool)
    return np.bincount(np.asarray(fid)[hit], minlength=nfeat) > 0


def valid_topology(rings) -> bool:
    """Ring self-intersection scan (polygon.go:74-107): a polygon is invalid
    if any two non-identical segments of a ring (incl. closing segments)
    intersect at a point that is not a shared endpoint."""
    for ring in rings:
        segs = ring_segments(ring)
        n = len(segs)
        for i in range(n):
            s1 = ((segs[i, 0, 0], segs[i, 0, 1]), (segs[i, 1, 0], segs[i, 1, 1]))
            for j in range(n):
                if i == j:
                    continue
                s2 = ((segs[j, 0, 0], segs[j, 0, 1]), (segs[j, 1, 0], segs[j, 1, 1]))
                ipt = segment_intersection(s1, s2)
                if ipt is not None and ipt != s1[0] and ipt != s1[1]:
                    return False
    return True


def bbox_overlaps(aminx, aminy, amaxx, amaxy, bminx, bminy, bmaxx, bmaxy):
    """Standard interval-overlap mask (vectorized)."""
    return ~(
        (np.asarray(aminx) > bmaxx)
        | (np.asarray(amaxx) < bminx)
        | (np.asarray(aminy) > bmaxy)
        | (np.asarray(amaxy) < bminy)
    )


def bbox_overlaps_ref(a, b) -> bool:
    """Reference corner-in-box test, both directions (bbox.go:15-21)."""

    def corner_in(bb1, bb2):
        (minx, miny, maxx, maxy) = bb1
        for cx, cy in ((minx, miny), (minx, maxy), (maxx, miny), (maxx, maxy)):
            if bb2[0] <= cx <= bb2[2] and bb2[1] <= cy <= bb2[3]:
                return True
        return False

    return corner_in(a, b) or corner_in(b, a)


def bbox_fully_in(inner, outer) -> bool:
    """inner fully inside outer (bbox.go: FullyIn)."""
    return (
        outer[0] <= inner[0] <= outer[2]
        and outer[1] <= inner[1] <= outer[3]
        and outer[0] <= inner[2] <= outer[2]
        and outer[1] <= inner[3] <= outer[3]
    )
