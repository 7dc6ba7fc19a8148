"""Weiler–Atherton-style polygon ∩ rectangle with multi-part output.

Upgrades the Sutherland–Hodgman general case (geom/clip.py): S-H covers
the correct REGION but returns one ring connected by zero-width border
bridges when the intersection has several components; this tracer returns
one clean ring per component (what GEOS produces for the reference's
clip path, lib/spatial/clip_geos.go) for simple (non-self-intersecting)
subject rings. Degenerate configurations (vertices exactly on the border,
odd crossing structure) return ``None`` and the caller falls back to
Sutherland–Hodgman, which is always region-correct.

Method: the subject ring is unrolled into a marked sequence of vertices
and border crossings (in ring order); components are traced by walking
the sequence from an *entering* crossing to the next crossing, then along
the rectangle perimeter (CCW, inserting corners) to the next crossing,
alternating until the loop closes. Cross-validated against the
independent scanline rasterizer on randomized concave polygons
(tests/test_polyclip.py).
"""
from __future__ import annotations

import numpy as np


def _perimeter_pos(x: float, y: float, minx, miny, maxx, maxy) -> float:
    """Position along the rect perimeter, CCW from (minx,miny); -1 if off."""
    w = maxx - minx
    h = maxy - miny
    eps = 1e-9
    if abs(y - miny) < eps and minx - eps <= x <= maxx + eps:
        return min(max(x - minx, 0.0), w)
    if abs(x - maxx) < eps and miny - eps <= y <= maxy + eps:
        return w + min(max(y - miny, 0.0), h)
    if abs(y - maxy) < eps and minx - eps <= x <= maxx + eps:
        return w + h + min(max(maxx - x, 0.0), w)
    if abs(x - minx) < eps and miny - eps <= y <= maxy + eps:
        return 2 * w + h + min(max(maxy - y, 0.0), h)
    return -1.0


def _corners_between(p0: float, p1: float, minx, miny, maxx, maxy):
    """Rect corners strictly between perimeter positions p0→p1 (CCW)."""
    w = maxx - minx
    h = maxy - miny
    total = 2 * (w + h)
    span = (p1 - p0) % total
    cand = [
        (w, (maxx, miny)),
        (w + h, (maxx, maxy)),
        (2 * w + h, (minx, maxy)),
        (0.0, (minx, miny)),
    ]
    out = []
    for cp, c in cand:
        d = (cp - p0) % total
        if 1e-9 < d < span - 1e-9:
            out.append((d, c))
    out.sort()
    return [c for _, c in out]


def clip_ring_rect(ring: np.ndarray, minx, miny, maxx, maxy):
    """Simple ring ∩ rect → list of component rings, or None (degenerate).

    Output rings preserve the input ring's orientation.
    """
    pts = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    n = len(pts)
    if n < 3:
        return []
    # the perimeter walk below is CCW, which matches a CCW (positive
    # standard signed area) subject; normalize and flip back at the end
    x = pts[:, 0]
    y = pts[:, 1]
    signed2 = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    flipped = signed2 < 0
    if flipped:
        pts = pts[::-1].copy()
    strictly_in = (
        (pts[:, 0] > minx) & (pts[:, 0] < maxx)
        & (pts[:, 1] > miny) & (pts[:, 1] < maxy)
    )
    touches = (
        ((pts[:, 0] == minx) | (pts[:, 0] == maxx) | (pts[:, 1] == miny)
         | (pts[:, 1] == maxy))
        & (pts[:, 0] >= minx) & (pts[:, 0] <= maxx)
        & (pts[:, 1] >= miny) & (pts[:, 1] <= maxy)
    )
    if touches.any():
        return None
    if strictly_in.all():
        return [pts[::-1].copy() if flipped else pts]

    # marked sequence: ('v', x, y) vertices and ('x', x, y, entering)
    seq: list[tuple] = []
    n_crossings = 0
    state = bool(strictly_in[0])
    for i in range(n):
        a = pts[i]
        b = pts[(i + 1) % n]
        seq.append(("v", a[0], a[1], strictly_in[i]))
        seg_cross = []
        for axis, val in ((0, minx), (0, maxx), (1, miny), (1, maxy)):
            av, bv = a[axis], b[axis]
            if (av < val) == (bv < val):
                continue
            t = (val - av) / (bv - av)
            p = a + t * (b - a)
            o = 1 - axis
            lo_o, hi_o = (miny, maxy) if axis == 0 else (minx, maxx)
            if not (lo_o < p[o] < hi_o):
                continue
            seg_cross.append((t, p[0], p[1]))
        seg_cross.sort()
        for t, x, y in seg_cross:
            seq.append(("x", x, y, None))
            n_crossings += 1
    if n_crossings == 0 or n_crossings % 2 != 0:
        return None

    # classify entering/exiting by alternation from the start state
    cross_pos = []  # positions in seq
    for si, item in enumerate(seq):
        if item[0] == "x":
            entering = not state
            seq[si] = ("x", item[1], item[2], entering)
            cross_pos.append(si)
            state = not state
    if state != bool(strictly_in[0]):
        return None

    perim = {
        si: _perimeter_pos(seq[si][1], seq[si][2], minx, miny, maxx, maxy)
        for si in cross_pos
    }
    if any(p < 0 for p in perim.values()):
        return None
    by_perim = sorted(cross_pos, key=lambda si: perim[si])
    next_on_perim = {
        by_perim[k]: by_perim[(k + 1) % len(by_perim)]
        for k in range(len(by_perim))
    }
    seq_next_cross = {}
    for k in range(len(cross_pos)):
        seq_next_cross[cross_pos[k]] = cross_pos[(k + 1) % len(cross_pos)]

    L = len(seq)
    out_rings = []
    used: set[int] = set()
    for start in cross_pos:
        if not seq[start][3] or start in used:
            continue
        ringpts: list[tuple[float, float]] = []
        cur = start
        guard = 0
        while True:
            guard += 1
            if guard > 2 * len(cross_pos) + 4:
                return None
            # entering crossing at seq position cur
            used.add(cur)
            ringpts.append((seq[cur][1], seq[cur][2]))
            # walk seq forward to the next crossing, taking vertices
            exit_pos = seq_next_cross[cur]
            si = (cur + 1) % L
            while si != exit_pos:
                item = seq[si]
                if item[0] == "v":
                    ringpts.append((item[1], item[2]))
                si = (si + 1) % L
            if not used.isdisjoint({exit_pos}) and exit_pos != start:
                return None
            if seq[exit_pos][3]:
                return None  # expected an exiting crossing
            used.add(exit_pos)
            ringpts.append((seq[exit_pos][1], seq[exit_pos][2]))
            # walk rect perimeter CCW to the next crossing
            nxt = next_on_perim[exit_pos]
            for corner in _corners_between(perim[exit_pos], perim[nxt],
                                           minx, miny, maxx, maxy):
                ringpts.append(corner)
            if nxt == start:
                break
            if not seq[nxt][3] or nxt in used:
                return None  # must land on an unused entering crossing
            cur = nxt
        arr = np.asarray(ringpts, dtype=np.float64)
        if len(arr) > 1:
            keep = np.ones(len(arr), dtype=bool)
            keep[1:] = ~(arr[1:] == arr[:-1]).all(axis=1)
            arr = arr[keep]
            if len(arr) > 1 and (arr[0] == arr[-1]).all():
                arr = arr[:-1]
        if len(arr) >= 3:
            # a simple CCW subject yields CCW components; a mismatch means
            # the subject was self-intersecting (the reference repairs those
            # via GEOS Buffer(0)) — fall back to Sutherland–Hodgman
            ax = arr[:, 0]
            ay = arr[:, 1]
            if float(np.sum(ax * np.roll(ay, -1) - np.roll(ax, -1) * ay)) <= 0:
                return None
            out_rings.append(arr[::-1].copy() if flipped else arr)
    if not out_rings:
        return None
    return out_rings
