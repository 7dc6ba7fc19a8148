"""Weiler–Atherton-style polygon ∩ rectangle with multi-part output.

Upgrades the Sutherland–Hodgman general case (geom/clip.py): S-H covers
the correct REGION but returns one ring connected by zero-width border
bridges when the intersection has several components; this tracer returns
one clean ring per component (what GEOS produces for the reference's
clip path, lib/spatial/clip_geos.go) for simple (non-self-intersecting)
subject rings. Degenerate configurations (vertices exactly on the border,
odd crossing structure) return ``None`` and the caller falls back to the
exact even-odd arrangement polygonizer (geom/arrangement.py).

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

#: sentinel: the ring never crosses the rect border (and is not fully
#: inside it) — the box is wholly inside or wholly outside the ring's
#: region; the caller decides with one containment test. Distinct from
#: ``None`` (a genuinely degenerate configuration needing the exact
#: arrangement fallback).
NO_CROSSINGS = object()


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
    signed2 = float(
        np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]) + x[-1] * y[0] - x[0] * y[-1]
    )
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

    # crossings, vectorized over all segments × 4 border lines
    a = pts
    b = np.empty_like(pts)
    b[:-1] = pts[1:]
    b[-1] = pts[0]
    seg_idx_parts = []
    t_parts = []
    px_parts = []
    py_parts = []
    for axis, val in ((0, minx), (0, maxx), (1, miny), (1, maxy)):
        av = a[:, axis]
        bv = b[:, axis]
        m = (av < val) != (bv < val)
        if not m.any():
            continue
        w = np.nonzero(m)[0]
        t = (val - av[w]) / (bv[w] - av[w])
        o = 1 - axis
        po = a[w, o] + t * (b[w, o] - a[w, o])
        lo_o, hi_o = (miny, maxy) if axis == 0 else (minx, maxx)
        ok = (po > lo_o) & (po < hi_o)
        # a segment passing exactly THROUGH a box corner is invisible to
        # both borders' strict interval tests. Distinguish: a tangent graze
        # (both sides outside — correctly contributes no crossing) from a
        # genuine diagonal entry (one side strictly inside — must register
        # exactly once; corners are owned by the vertical borders).
        if axis == 0:
            corner = (po == lo_o) | (po == hi_o)
            if corner.any():
                ci = np.nonzero(corner)[0]
                eps = 1e-7
                for k in ci:
                    wi = w[k]
                    for tt in (t[k] - eps, t[k] + eps):
                        if 0.0 < tt < 1.0:
                            sx = a[wi, 0] + tt * (b[wi, 0] - a[wi, 0])
                            sy = a[wi, 1] + tt * (b[wi, 1] - a[wi, 1])
                            if minx < sx < maxx and miny < sy < maxy:
                                ok[k] = True
                                break
        if not ok.any():
            continue
        w = w[ok]
        t = t[ok]
        po = po[ok]
        seg_idx_parts.append(w)
        t_parts.append(t)
        if axis == 0:
            px_parts.append(np.full(len(w), float(val)))
            py_parts.append(po)
        else:
            px_parts.append(po)
            py_parts.append(np.full(len(w), float(val)))
    if not seg_idx_parts:
        return NO_CROSSINGS  # fully outside or rect inside ring
    seg_idx = np.concatenate(seg_idx_parts)
    ts = np.concatenate(t_parts)
    cxs = np.concatenate(px_parts)
    cys = np.concatenate(py_parts)
    order = np.lexsort((ts, seg_idx))  # ring order
    seg_idx = seg_idx[order]
    cxs = cxs[order]
    cys = cys[order]
    C = len(seg_idx)
    if C % 2 != 0:
        return None

    # entering/exiting by alternation from vertex-0 containment
    s0 = bool(strictly_in[0])
    entering = np.where(np.arange(C) % 2 == 0, not s0, s0)

    perim_arr = np.array([
        _perimeter_pos(cxs[k], cys[k], minx, miny, maxx, maxy)
        for k in range(C)
    ])
    if (perim_arr < 0).any():
        return None
    by_perim = np.argsort(perim_arr, kind="stable")
    next_on_perim = {}
    for k in range(C):
        next_on_perim[int(by_perim[k])] = int(by_perim[(k + 1) % C])

    out_rings = []
    used: set[int] = set()
    for start in range(C):
        if not entering[start] or start in used:
            continue
        ringpts: list[tuple[float, float]] = []
        cur = start
        guard = 0
        while True:
            guard += 1
            if guard > C + 2:
                return None
            used.add(cur)
            ringpts.append((cxs[cur], cys[cur]))
            # walk the subject to the next crossing in ring order
            ex = (cur + 1) % C
            if entering[ex]:
                return None  # expected an exit next
            si = int(seg_idx[cur])
            sj = int(seg_idx[ex])
            if not (si == sj and ex == cur + 1):
                v = (si + 1) % n
                stop = (sj + 1) % n
                while v != stop:
                    ringpts.append((pts[v, 0], pts[v, 1]))
                    v = (v + 1) % n
            if ex != start and ex in used:
                return None
            used.add(ex)
            ringpts.append((cxs[ex], cys[ex]))
            # walk the rect perimeter CCW to the next crossing
            nxt_c = next_on_perim[ex]
            for corner in _corners_between(perim_arr[ex], perim_arr[nxt_c],
                                           minx, miny, maxx, maxy):
                ringpts.append(corner)
            if nxt_c == start:
                break
            if not entering[nxt_c] or nxt_c in used:
                return None
            cur = nxt_c
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
            comp2 = (np.sum(ax[:-1] * ay[1:] - ax[1:] * ay[:-1])
                     + ax[-1] * ay[0] - ax[0] * ay[-1])
            if float(comp2) <= 0:
                return None
            out_rings.append(arr[::-1].copy() if flipped else arr)
    if not out_rings:
        return None
    return out_rings
