"""Even-odd planar-arrangement polygonizer: the exact-semantics fallback
for polygon ∩ box on arbitrarily invalid input (self-intersecting rings,
overlapping holes, border-touching vertices).

This is the from-scratch equivalent of what GEOS reaches through
``Buffer(0)`` + ``Intersection`` (reference lib/spatial/clip_geos.go:25-33):

1. clip every ring segment to a box shrunk by an infinitesimal δ (so no
   input vertex/edge lies exactly on the working border), plus the 4 box
   edges themselves;
2. node all segments pairwise (crossings split both), snap endpoints to a
   grid, drop duplicate undirected edges mod 2 (overlapping collinear
   edges flip parity twice — they are not boundary);
3. half-edge face walk (at each vertex the next half-edge is the
   clockwise-closest outgoing edge from the reversed incoming direction,
   keeping the face on the left): every directed cycle bounds one face;
4. keep CCW cycles whose interior point has odd crossing parity over the
   ORIGINAL rings and lies in the box; CW cycles become holes of their
   smallest enclosing kept cycle;
5. snap output coordinates on the shrunken border back to the true box.

Faces are uniform by construction, so the output polygon count equals the
true number of connected components of the even-odd region — the property
clip_geos_test.go:19-30 checks (2 components for the self_intersect
fixture).
"""
from __future__ import annotations

import numpy as np

_GRID = 1e-7


def _key(x: float, y: float):
    return (round(x / _GRID), round(y / _GRID))


def _seg_clip_box(p, q, minx, miny, maxx, maxy):
    """Liang-Barsky: portion of segment pq inside the box, or None."""
    x0, y0 = p
    x1, y1 = q
    dx, dy = x1 - x0, y1 - y0
    t0, t1 = 0.0, 1.0
    for pp, qq in ((-dx, x0 - minx), (dx, maxx - x0),
                   (-dy, y0 - miny), (dy, maxy - y0)):
        if pp == 0:
            if qq < 0:
                return None
            continue
        r = qq / pp
        if pp < 0:
            if r > t1:
                return None
            if r > t0:
                t0 = r
        else:
            if r < t0:
                return None
            if r < t1:
                t1 = r
    if t1 - t0 <= 1e-12:
        return None
    return ((x0 + t0 * dx, y0 + t0 * dy), (x0 + t1 * dx, y0 + t1 * dy))


def _node_segments(segs):
    """Split every segment at its intersections with all others.

    Chunked vectorized all-pairs; returns the noded segment list.
    """
    n = len(segs)
    if n == 0:
        return []
    a = np.asarray([s[0] for s in segs])
    b = np.asarray([s[1] for s in segs])
    d = b - a
    cut_ts: list[list[float]] = [[] for _ in range(n)]
    chunk = max(1, 2_000_000 // max(n, 1))
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
        hit = ((np.abs(denom) > 1e-12)
               & (ti > 1e-12) & (ti < 1 - 1e-12)
               & (tj > -1e-12) & (tj < 1 + 1e-12))
        ii, jj = np.nonzero(hit)
        for k in range(len(ii)):
            gi = i0 + int(ii[k])
            if gi == int(jj[k]):
                continue
            cut_ts[gi].append(float(ti[ii[k], jj[k]]))
        # T-touches: endpoints of j lying on segment i interior
        for ej in (a, b):
            diffe = ej[None, :, :] - ai
            cross = diffe[:, :, 0] * di[:, :, 1] - diffe[:, :, 1] * di[:, :, 0]
            lens2 = (di[:, :, 0] ** 2 + di[:, :, 1] ** 2)
            with np.errstate(divide="ignore", invalid="ignore"):
                te = (diffe[:, :, 0] * di[:, :, 0]
                      + diffe[:, :, 1] * di[:, :, 1]) / lens2
            scale = np.sqrt(np.maximum(lens2, 1e-30))
            on = ((np.abs(cross) / scale < _GRID)
                  & (te > 1e-9) & (te < 1 - 1e-9))
            ii, jj = np.nonzero(on)
            for k in range(len(ii)):
                gi = i0 + int(ii[k])
                cut_ts[gi].append(float(te[ii[k], jj[k]]))
    out = []
    for i in range(n):
        ts = sorted(set([0.0, 1.0] + cut_ts[i]))
        pts = [(a[i, 0] + t * d[i, 0], a[i, 1] + t * d[i, 1]) for t in ts]
        for u in range(len(pts) - 1):
            out.append((pts[u], pts[u + 1]))
    return out


def _parity_point(x, y, rings):
    cnt = 0
    for r in rings:
        rx, ry = r[:, 0], r[:, 1]
        nx_, ny_ = np.roll(rx, -1), np.roll(ry, -1)
        cond = (ry > y) != (ny_ > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xin = rx + (y - ry) / (ny_ - ry) * (nx_ - rx)
        cnt += int(np.count_nonzero(cond & (x < xin)))
    return cnt % 2 == 1


def _cycle_area2(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def clip_polygon_arrangement(rings, minx, miny, maxx, maxy):
    """Polygon (any validity) ∩ box → list of polygons (shell + holes),
    exact even-odd semantics. Expensive (O(E²) noding) — last-resort path.
    """
    rings = [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in rings]
    rings = [r[:-1] if len(r) > 1 and (r[0] == r[-1]).all() else r
             for r in rings]
    rings = [r for r in rings if len(r) >= 3]
    if not rings:
        return []
    d = max(maxx - minx, maxy - miny, 1.0) * 1e-9
    bx0, by0, bx1, by1 = minx + d, miny + d, maxx - d, maxy - d

    segs = []
    for r in rings:
        for i in range(len(r)):
            s = _seg_clip_box(tuple(r[i]), tuple(r[(i + 1) % len(r)]),
                              bx0, by0, bx1, by1)
            if s is not None:
                segs.append(s)
    segs.append(((bx0, by0), (bx1, by0)))
    segs.append(((bx1, by0), (bx1, by1)))
    segs.append(((bx1, by1), (bx0, by1)))
    segs.append(((bx0, by1), (bx0, by0)))

    noded = _node_segments(segs)

    # undirected edge multiset mod 2 (overlapping edges cancel in pairs);
    # the 4 box edges are kept unconditionally (they bound "inside box",
    # not ring parity) — ring edges collinear with the border can't exist
    # after the δ-shrink.
    counts: dict[tuple, int] = {}
    for (p, q) in noded:
        kp, kq = _key(*p), _key(*q)
        if kp == kq:
            continue
        ek = (kp, kq) if kp < kq else (kq, kp)
        counts[ek] = counts.get(ek, 0) + 1
    # which undirected edges lie on the working border
    def _on_b(k):
        x, y = k[0] * _GRID, k[1] * _GRID
        e = _GRID * 4
        return (abs(x - bx0) < e or abs(x - bx1) < e
                or abs(y - by0) < e or abs(y - by1) < e)

    edges = []
    for ek, c in counts.items():
        if c % 2 == 1 or (_on_b(ek[0]) and _on_b(ek[1])):
            edges.append(ek)

    # half-edge structures
    pts: dict[tuple, np.ndarray] = {}
    for (p, q) in noded:
        pts.setdefault(_key(*p), np.array(p))
        pts.setdefault(_key(*q), np.array(q))
    out_edges: dict[tuple, list[tuple]] = {}
    for (kp, kq) in edges:
        out_edges.setdefault(kp, []).append(kq)
        out_edges.setdefault(kq, []).append(kp)
    # sort outgoing by angle
    ang_order: dict[tuple, list[tuple]] = {}
    for v, nbrs in out_edges.items():
        pv = pts[v]
        uniq = list(dict.fromkeys(nbrs))
        uniq.sort(key=lambda w: np.arctan2(pts[w][1] - pv[1],
                                           pts[w][0] - pv[0]))
        ang_order[v] = uniq

    def next_half(u, v):
        """Arrive u→v; next is the clockwise-next neighbor of v after u."""
        nbrs = ang_order[v]
        i = nbrs.index(u)
        return v, nbrs[(i - 1) % len(nbrs)]

    visited = set()
    cycles = []
    for (kp, kq) in edges:
        for (u, v) in ((kp, kq), (kq, kp)):
            if (u, v) in visited:
                continue
            cyc = []
            cu, cv = u, v
            ok = True
            for _ in range(len(edges) * 2 + 4):
                visited.add((cu, cv))
                cyc.append(cu)
                cu, cv = next_half(cu, cv)
                if (cu, cv) == (u, v):
                    break
            else:
                ok = False
            if ok and len(cyc) >= 3:
                cycles.append(np.asarray([pts[k] for k in cyc]))

    # classify cycles
    def _in_cyc(x, y, cyc):
        return _parity_point(x, y, [cyc])

    def _face_point(cyc, side=1.0):
        """Point just inside the region the cycle encloses geometrically
        (side=+1 for CCW cycles / left of traversal, side=-1 for CW hole
        interiors). Skinny faces can defeat a fixed offset, so candidate
        points are validated against the cycle itself across edges and
        offset scales (fuzz-hardened)."""
        base = max(maxx - minx, maxy - miny)
        seglen = np.linalg.norm(np.diff(np.vstack([cyc, cyc[:1]]), axis=0),
                                axis=1)
        order = np.argsort(seglen)[::-1]
        want_inside = (side > 0) == (_cycle_area2(cyc) > 0)
        for li in order[: min(4, len(order))]:
            p0 = cyc[li]
            p1 = cyc[(li + 1) % len(cyc)]
            if seglen[li] <= 0:
                continue
            mid = (p0 + p1) / 2
            dvec = p1 - p0
            nrm = np.array([-dvec[1], dvec[0]]) / seglen[li]
            for scale in (1e-7, 1e-9, 1e-5):
                cand = mid + side * nrm * base * scale
                if _in_cyc(cand[0], cand[1], cyc) == want_inside:
                    return cand
        return (cyc[0] + cyc[len(cyc) // 2]) / 2  # last resort

    shells = []
    holes = []
    for cyc in cycles:
        a2 = _cycle_area2(cyc)
        if abs(a2) < 1e-12:
            continue
        tx, ty = _face_point(cyc, 1.0)
        left_kept = (bx0 < tx < bx1 and by0 < ty < by1
                     and _parity_point(tx, ty, rings))
        if a2 > 0:
            if left_kept:
                shells.append(cyc)
        elif left_kept:
            # a CW cycle is an inner boundary of the face on its LEFT; it
            # is a hole only when that face is kept (this also discards
            # the spurious reversed cycle of an outermost shell, whose
            # left side is outside the region)
            holes.append((cyc, tuple(_face_point(cyc, -1.0))))

    # snap working-border coordinates back to the true box
    def snap(c):
        c = c.copy()
        for axis, lo, hi in ((0, minx, maxx), (1, miny, maxy)):
            v = c[:, axis]
            v[np.abs(v - (lo + d)) <= 2 * d] = lo
            v[np.abs(v - (hi - d)) <= 2 * d] = hi
        return c

    polys = [[snap(s)] for s in shells]
    areas = [abs(_cycle_area2(s)) for s in shells]
    for h, (hx, hy) in holes:
        # smallest shell containing the hole's interior-side test point
        best = None
        best_area = np.inf
        for i, s in enumerate(shells):
            if areas[i] < best_area and abs(_cycle_area2(h)) < areas[i]:
                if _parity_point(hx, hy, [s]):
                    best = i
                    best_area = areas[i]
        if best is not None:
            polys[best].append(snap(h))
    return polys
