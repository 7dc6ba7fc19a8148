"""Rectangle clipping for points / linestrings / polygons.

Line clipping reproduces the reference's segment-split semantics exactly
(lib/spatial/line.go:101-136, 270-310, 10-23): per-segment clip against the
bbox borders, then re-chaining of contiguous segments into 1..N sublines.
Golden vectors: line_test.go:176-267.

Polygon clipping keeps the reference's shortcut paths (polygon.go:26-40) and
replaces the GEOS general case (clip_geos.go) from scratch: a
Weiler–Atherton-style tracer (geom/polyclip.py) splits multi-component
intersections into clean rings like GEOS; configurations it rejects
(border-touching vertices, self-intersecting rings, overlapping holes) go
to the exact even-odd planar-arrangement polygonizer (geom/arrangement.py)
— the from-scratch equivalent of the reference's GEOS Buffer(0) retry
(clip_geos.go:25-33), verified to clip the self_intersect fixture into
the same 2 polygons as clip_geos_test.go:19-30. Sutherland–Hodgman
remains as a last-resort region-correct safety net.
"""
from __future__ import annotations

import numpy as np

from .ops import rounded_coords
from .predicates import segment_intersection, bbox_fully_in

# --------------------------------------------------------------------- points


def clip_points_mask(px, py, minx, miny, maxx, maxy):
    """Inclusive-edge containment mask (point.go:18-29)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    return (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)


# ---------------------------------------------------------------------- lines


def _bbox_borders(sw, ne):
    """Counter-clockwise border segments (line.go:396-415)."""
    (sx, sy), (nx, ny) = sw, ne
    return [
        ((sx, sy), (sx, ny)),
        ((sx, ny), (nx, ny)),
        ((nx, ny), (nx, sy)),
        ((nx, sy), (sx, sy)),
    ]


def _seg_fully_in(s, sw, ne) -> bool:
    """line.go:312-320 — bounds rounded to 8 decimals."""
    sx, sy = (float(rounded_coords(sw[0])), float(rounded_coords(sw[1])))
    nx, ny = (float(rounded_coords(ne[0])), float(rounded_coords(ne[1])))
    (x1, y1), (x2, y2) = s
    return (
        x1 >= sx and y1 >= sy and x2 >= sx and y2 >= sy
        and x1 <= nx and y1 <= ny and x2 <= nx and y2 <= ny
    )


def _seg_clip(s, sw, ne):
    """Segment ∩ bbox → [] or [segment] (line.go:270-310)."""
    borders = _bbox_borders(sw, ne)
    inters = []
    for bseg in borders:
        ipt = segment_intersection(s, bseg)
        if ipt is not None:
            inters.append(ipt)

    def length_nonzero(a, b):
        return a != b

    for i, ipt in enumerate(inters):
        for cand in (((s[0]), ipt), (ipt, (s[1]))):
            if length_nonzero(*cand) and _seg_fully_in(cand, sw, ne):
                return [cand]
        s1 = (s[0], ipt)
        s2 = (ipt, s[1])
        for ii, iis in enumerate(inters):
            if i == ii:
                continue
            for base in (s1, s2):
                for cand in ((base[0], iis), (iis, base[1])):
                    if length_nonzero(*cand) and _seg_fully_in(cand, sw, ne):
                        return [cand]
    return []


def _lines_from_segments(segs):
    """Chain contiguous segments into lines (line.go:10-23)."""
    lines = [[]]
    for i, seg in enumerate(segs):
        if i != 0 and seg[0] != segs[i - 1][1]:
            lines[-1].append(segs[i - 1][1])
            lines.append([seg[0]])
            continue
        lines[-1].append(seg[0])
    lines[-1].append(segs[-1][1])
    return [np.asarray(ln, dtype=np.float64) for ln in lines]


def clip_line(pts: np.ndarray, minx, miny, maxx, maxy) -> list[np.ndarray]:
    """LineString ∩ bbox → 0..N sublines (line.go:101-136).

    Vectorized pre-pass classifies every segment as fully-in / clearly-out /
    crossing; only crossing segments take the scalar border-intersection
    path (reference Segment.ClipToBBox semantics).
    """
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    bminx, bminy = pts.min(axis=0)
    bmaxx, bmaxy = pts.max(axis=0)
    if minx <= bminx and maxx >= bmaxx and miny <= bminy and maxy >= bmaxy:
        return [pts]
    if bmaxx < minx or bmaxy < miny or bminx > maxx or bminy > maxy:
        return []
    sw = (float(minx), float(miny))
    ne = (float(maxx), float(maxy))
    rsx, rsy = (float(rounded_coords(minx)), float(rounded_coords(miny)))
    rnx, rny = (float(rounded_coords(maxx)), float(rounded_coords(maxy)))

    x1 = pts[:-1, 0]
    y1 = pts[:-1, 1]
    x2 = pts[1:, 0]
    y2 = pts[1:, 1]
    fully_in = (
        (x1 >= rsx) & (y1 >= rsy) & (x2 >= rsx) & (y2 >= rsy)
        & (x1 <= rnx) & (y1 <= rny) & (x2 <= rnx) & (y2 <= rny)
    )
    eps = 1e-7  # safety margin: only reject segments clearly outside
    clearly_out = (
        (np.maximum(x1, x2) < minx - eps) | (np.minimum(x1, x2) > maxx + eps)
        | (np.maximum(y1, y2) < miny - eps) | (np.minimum(y1, y2) > maxy + eps)
    )
    cutsegs = []
    for i in range(len(pts) - 1):
        if fully_in[i]:
            cutsegs.append(((float(x1[i]), float(y1[i])), (float(x2[i]), float(y2[i]))))
        elif not clearly_out[i]:
            s = ((float(x1[i]), float(y1[i])), (float(x2[i]), float(y2[i])))
            cutsegs.extend(_seg_clip(s, sw, ne))
    if not cutsegs:
        return []
    return _lines_from_segments(cutsegs)


# ------------------------------------------------------------------- polygons


def _sutherland_hodgman(ring: np.ndarray, minx, miny, maxx, maxy) -> np.ndarray:
    """Clip one ring against the rectangle; returns possibly-empty ring.

    Fully vectorized per clip edge: the output sequence (vertex-if-inside,
    crossing-if-transition per input vertex) is assembled with one boolean
    mask over a [n, 2, 2] slot array — no per-vertex Python loop.
    """
    pts = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    for edge in range(4):
        n = len(pts)
        if n == 0:
            break
        x = pts[:, 0]
        y = pts[:, 1]
        if edge == 0:
            inside = x >= minx
        elif edge == 1:
            inside = x <= maxx
        elif edge == 2:
            inside = y >= miny
        else:
            inside = y <= maxy
        nxt_inside = np.empty_like(inside)
        nxt_inside[:-1] = inside[1:]
        nxt_inside[-1] = inside[0]
        trans = inside != nxt_inside
        nx = np.empty_like(x)
        nx[:-1] = x[1:]
        nx[-1] = x[0]
        ny = np.empty_like(y)
        ny[:-1] = y[1:]
        ny[-1] = y[0]
        with np.errstate(divide="ignore", invalid="ignore"):
            if edge == 0:
                t = (minx - x) / (nx - x)
                cx = np.full(n, float(minx))
                cy = y + t * (ny - y)
            elif edge == 1:
                t = (maxx - x) / (nx - x)
                cx = np.full(n, float(maxx))
                cy = y + t * (ny - y)
            elif edge == 2:
                t = (miny - y) / (ny - y)
                cx = x + t * (nx - x)
                cy = np.full(n, float(miny))
            else:
                t = (maxy - y) / (ny - y)
                cx = x + t * (nx - x)
                cy = np.full(n, float(maxy))
        slots = np.empty((n, 2, 2), dtype=np.float64)
        slots[:, 0, 0] = x
        slots[:, 0, 1] = y
        slots[:, 1, 0] = cx
        slots[:, 1, 1] = cy
        valid = np.empty((n, 2), dtype=bool)
        valid[:, 0] = inside
        valid[:, 1] = trans
        pts = slots[valid]
    # drop consecutive duplicates (and closing duplicate)
    if len(pts) > 1:
        keep = np.ones(len(pts), dtype=bool)
        same = (pts[1:] == pts[:-1]).all(axis=1)
        keep[1:][same] = False
        pts = pts[keep]
        if len(pts) > 1 and (pts[0] == pts[-1]).all():
            pts = pts[:-1]
    return pts


def _edge_intersect(p, q, edge, minx, miny, maxx, maxy):
    px, py = p
    qx, qy = q
    if edge == 0:
        t = (minx - px) / (qx - px)
        return np.array([minx, py + t * (qy - py)])
    if edge == 1:
        t = (maxx - px) / (qx - px)
        return np.array([maxx, py + t * (qy - py)])
    if edge == 2:
        t = (miny - py) / (qy - py)
        return np.array([px + t * (qx - px), miny])
    t = (maxy - py) / (qy - py)
    return np.array([px + t * (qx - px), maxy])


def _no_cross_side(ring, minx, miny, maxx, maxy):
    """For a ring the tracer found to have NO border crossings (and no
    on-border vertices): the box interior lies entirely on one side of the
    ring's region — any interior↔exterior path would cross the border.
    Returns True (box inside the ring region), False (outside), or None
    when a vertex sits strictly inside the box (only reachable through
    corner-grazing degeneracies — the caller falls to the arrangement)."""
    from .predicates import point_in_rings

    inside_v = (
        (ring[:, 0] > minx) & (ring[:, 0] < maxx)
        & (ring[:, 1] > miny) & (ring[:, 1] < maxy)
    )
    if inside_v.any():
        return None
    return bool(point_in_rings((minx + maxx) / 2, (miny + maxy) / 2, [ring]))


def _wa_polygon(rings, minx, miny, maxx, maxy):
    """Weiler–Atherton clip of outer + holes; None on degenerate input."""
    from .polyclip import NO_CROSSINGS, clip_ring_rect
    from .predicates import point_in_rings

    wa = clip_ring_rect(rings[0], minx, miny, maxx, maxy)
    if wa is None:
        return None
    rect_shell = False
    if wa is NO_CROSSINGS:
        side = _no_cross_side(rings[0], minx, miny, maxx, maxy)
        if side is None:
            return None
        if not side:
            return []  # box wholly outside the outer region
        # box wholly inside the outer: shell is the full box rectangle
        rect_shell = True
        wa = [np.array([[minx, miny], [maxx, miny],
                        [maxx, maxy], [minx, maxy]])]
    hole_parts: list[np.ndarray] = []
    for hole in rings[1:]:
        hb = (hole[:, 0].min(), hole[:, 1].min(),
              hole[:, 0].max(), hole[:, 1].max())
        if (hb[2] < minx or hb[0] > maxx or hb[3] < miny or hb[1] > maxy):
            continue  # hole entirely outside the box
        hw = clip_ring_rect(hole, minx, miny, maxx, maxy)
        if hw is None:
            return None  # degenerate (border-touching) configuration
        if hw is NO_CROSSINGS:
            side = _no_cross_side(hole, minx, miny, maxx, maxy)
            if side is None:
                return None
            if side:
                return []  # hole swallows the whole box
            continue  # hole disjoint from the box
        if rect_shell:
            # the hole crosses the border while the synthesized rect shell
            # runs ALONG it: the clipped hole part would share boundary
            # with the shell — GEOS dissolves that into a single walked
            # ring, which only the arrangement reproduces
            return None
        hole_parts.extend(hw)
    if not wa:
        return []
    polys: list[list[np.ndarray]] = [[shell] for shell in wa]
    from .polyclip import _perimeter_pos

    for hp in hole_parts:
        # containment test point: a vertex OFF the clip border (a clipped
        # part's endpoints lie ON the border, where point-in-ring is
        # undefined); fall back to the part's centroid
        tx, ty = float(np.mean(hp[:, 0])), float(np.mean(hp[:, 1]))
        for x, y in hp:
            if _perimeter_pos(x, y, minx, miny, maxx, maxy) < 0:
                tx, ty = float(x), float(y)
                break
        for poly in polys:
            if point_in_rings(tx, ty, [poly[0]]):
                poly.append(hp)
                break
    return polys


def _vertices_in_ring(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd containment of every point in ``pts`` vs one
    ring: [P, S] crossing broadcast, one pass."""
    px = pts[:, 0][:, None]
    py = pts[:, 1][:, None]
    rx = ring[:, 0][None, :]
    ry = ring[:, 1][None, :]
    nx_ = np.roll(ring[:, 0], -1)[None, :]
    ny_ = np.roll(ring[:, 1], -1)[None, :]
    cond = (ry > py) != (ny_ > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xin = rx + (py - ry) / (ny_ - ry) * (nx_ - rx)
    return (np.where(cond, px < xin, False).sum(axis=1) % 2) == 1


def _corners_consistent(polys, outer, minx, miny, maxx, maxy) -> bool:
    """Exact sanity check on a W-A result: a box corner can only be part
    of the clipped boundary if the subject's even-odd region covers it.
    Self-intersecting subjects that slip past the tracer's orientation
    check produce perimeter walks through corners OUTSIDE the subject
    (fuzz-found) — four cheap ray casts reject those."""
    from .repair import _point_in_ring

    corners = ((minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy))
    for poly in polys:
        for ring in poly:
            for cx, cy in corners:
                if ((ring[:, 0] == cx) & (ring[:, 1] == cy)).any():
                    if not _point_in_ring(cx, cy, outer):
                        return False
    return True


def clip_polygon(rings: list[np.ndarray], minx, miny, maxx, maxy,
                 _allow_repair: bool = True,
                 _border_hit: bool | None = None) -> list[list[np.ndarray]]:
    """Polygon ∩ bbox → 0..n polygons (each a ring list).

    Shortcut paths follow polygon.go:26-40: a single-ring polygon whose
    outer ring does not intersect the bbox border either fully covers the
    bbox (→ the bbox rectangle) or lies fully inside it (→ unchanged).
    Self-intersecting outers are repaired (geom/repair.py — the
    reference's GEOS Buffer(0) retry, clip_geos.go:25-33) when the
    multi-part tracer rejects them.
    """
    rings = [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in rings]
    outer = rings[0]
    ominx, ominy = outer.min(axis=0)
    omaxx, omaxy = outer.max(axis=0)
    poly_bb = (ominx, ominy, omaxx, omaxy)
    clip_bb = (minx, miny, maxx, maxy)

    # cheap shortcut first: polygon bbox fully inside the clip box ⇒ no ring
    # segment can cross a border ⇒ reference returns the polygon unchanged
    # (polygon.go:34-36 with Intersections necessarily empty)
    if bbox_fully_in(poly_bb, clip_bb):
        return [rings]

    from .predicates import ring_intersects_rect

    # _border_hit: caller-precomputed ring_intersects_rect verdict (the
    # tiler's prepare stage classifies every candidate in one bulk numpy
    # pass — rings_hit_rect_bulk — instead of per-call scans here)
    if len(rings) == 1 and not (
        _border_hit if _border_hit is not None
        else ring_intersects_rect(outer, minx, miny, maxx, maxy)
    ):
        if bbox_fully_in(clip_bb, poly_bb):
            return [[np.array([[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy]])]]
        # no border crossing and neither bbox contains the other: any path
        # from inside the box to outside would cross the border, so the
        # ring region cannot reach the box — the reference's GEOS
        # Intersection (polygon.go:39 → clipToBBox) returns empty here;
        # previously this fell through W-A → retry → arrangement to reach
        # the same [] at ~1 ms per call
        return []

    # general case: Weiler–Atherton-style multi-part tracer first (clean
    # component splitting, what GEOS produces for the reference); fall back
    # to Sutherland–Hodgman (region-correct, single connected ring) on
    # degenerate configurations — border-touching vertices, corner-grazing
    # crossings, self-intersecting subjects
    # holes protruding past the outer ring make attach-by-containment
    # diverge from even-odd semantics (fuzz-found on invalid inputs) —
    # such polygons go straight to the arrangement
    holes_contained = all(
        _vertices_in_ring(h, outer).all() for h in rings[1:]
    ) if len(rings) > 1 else True

    polys = None
    if holes_contained:
        polys = _wa_polygon(rings, minx, miny, maxx, maxy)
    if polys is not None and _corners_consistent(polys, outer, minx, miny,
                                                 maxx, maxy):
        return polys

    # W-A rejected the configuration. The overwhelmingly common cause in
    # the tiler is vertices EXACTLY on the clip border (tile-space
    # quantization aligns coordinates with tile edges): retry against an
    # infinitesimally shrunken box — crossings become proper and
    # point-touching components separate — then snap border coordinates
    # back. Costs one more W-A pass, not the O(E²) arrangement.
    if _allow_repair:
        # a self-intersecting subject can slip through the shrunken retry's
        # orientation check and emit out-of-box garbage (hypothesis-found);
        # only simple rings may take the cheap path
        from .repair import ring_self_intersects

        if not holes_contained or ring_self_intersects(outer):
            try:
                from .arrangement import clip_polygon_arrangement

                return clip_polygon_arrangement(rings, minx, miny, maxx, maxy)
            except Exception:
                pass

        dx = max(abs(maxx - minx), 1.0) * 1e-9
        dy = max(abs(maxy - miny), 1.0) * 1e-9
        polys = _wa_polygon(rings, minx + dx, miny + dy, maxx - dx, maxy - dy)
        if polys is not None:
            border_hole = False
            for poly in polys:
                for ri, ring in enumerate(poly):
                    for axis, lo, hi, d in ((0, minx, maxx, dx),
                                            (1, miny, maxy, dy)):
                        v = ring[:, axis]
                        m_lo = np.abs(v - lo) <= 2 * d
                        m_hi = np.abs(v - hi) <= 2 * d
                        v[m_lo] = lo
                        v[m_hi] = hi
                        if ri > 0 and (m_lo.any() or m_hi.any()):
                            # a hole running along the clip border can cut
                            # its shell into several components — only the
                            # arrangement resolves that exactly
                            border_hole = True
            if not border_hole and _corners_consistent(polys, outer, minx,
                                                       miny, maxx, maxy):
                return polys

        # Still degenerate (self-intersecting rings, overlapping holes,
        # coincident geometry): exact even-odd planar-arrangement
        # polygonizer — our from-scratch Buffer(0)+Intersection
        # (clip_geos.go:25-33; clip_geos_test.go expects the
        # self_intersect fixture to clip into exactly 2 polygons).
        try:
            from .arrangement import clip_polygon_arrangement

            return clip_polygon_arrangement(rings, minx, miny, maxx, maxy)
        except Exception:
            pass  # safety net below stays region-correct

    out_rings = []
    for i, ring in enumerate(rings):
        clipped = _sutherland_hodgman(ring, minx, miny, maxx, maxy)
        if len(clipped) >= 3:
            out_rings.append(clipped)
        elif i == 0 and len(clipped) < 3:
            return []
    if not out_rings:
        return []
    return [out_rings]


