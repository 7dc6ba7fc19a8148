"""Brute-force cross-checks for queries_geo2 at sf0.001 — scalar
reimplementations over the PRE-WKB ground-truth vertex table (so the
checks also cover the WKB codec round-trip), plus hull_int unit tests
against a from-scratch O(n·h) membership test."""
import math

import numpy as np
import pyarrow.parquet as pq

from grandine_ray.index import xyz
from grandine_ray.pipelines import queries_geo2
from grandine_ray.pipelines.queries_geo2 import (KDE_D2MAX, KDE_R, KDE_Z,
                                                 hull_int)
from grandine_ray.sources import synth

SF = "/root/testdata/sf0.001"


def _geoms():
    corpus = synth.corpus_for_sf(SF)
    return pq.read_table(f"{corpus}/geoms.parquet").to_pydict()


# ------------------------------------------------------------- hull_int


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _is_strict_hull(pts, hull):
    """Every input point strictly inside or on the hull boundary, every
    hull vertex an input point, consecutive turns strictly left."""
    pts = {tuple(p) for p in pts}
    hv = [tuple(p) for p in hull]
    assert set(hv) <= pts
    n = len(hv)
    if n >= 3:
        for i in range(n):
            assert _cross(hv[i], hv[(i + 1) % n], hv[(i + 2) % n]) > 0
        for p in pts:
            for i in range(n):
                assert _cross(hv[i], hv[(i + 1) % n], p) >= 0
    return True


def test_hull_int_random():
    rng = np.random.default_rng(7)
    for trial in range(30):
        n = int(rng.integers(1, 60))
        pts = rng.integers(-50, 50, size=(n, 2)).astype(np.int64)
        h = hull_int(pts)
        _is_strict_hull(pts, h)


def test_hull_int_degenerate():
    one = np.array([[3, 4], [3, 4]], np.int64)
    assert hull_int(one).tolist() == [[3, 4]]
    col = np.array([[0, 0], [2, 2], [1, 1], [5, 5]], np.int64)
    assert hull_int(col).tolist() == [[0, 0], [5, 5]]
    vert = np.array([[1, 9], [1, 2], [1, 5]], np.int64)
    assert hull_int(vert).tolist() == [[1, 2], [1, 9]]
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [1, 0]],
                  np.int64)
    h = hull_int(sq)
    assert len(h) == 4 and _is_strict_hull(sq, h)


# ---------------------------------------------------------- kde_heatmap


def test_kde_heatmap_brute(ray_session):
    dens = _kde_brute()
    got = queries_geo2.q_kde_heatmap(SF).to_pandas()
    got_map = {(int(r.x), int(r.y)): int(r.density_ppm)
               for r in got.itertuples()}
    assert got_map == dens


# ---------------------------------------------------------- convex_hull


def test_convex_hull_brute(ray_session):
    g = _geoms()
    by_layer: dict[str, set] = {}
    for lay, xs, ys in zip(g["layer"], g["xs"], g["ys"]):
        s = by_layer.setdefault(lay, set())
        for x, y in zip(xs, ys):
            s.add((math.floor(x * 1e6 + 0.5), math.floor(y * 1e6 + 0.5)))
    got = queries_geo2.q_convex_hull(SF).to_pandas().sort_values("layer")
    assert list(got.layer) == sorted(by_layer)
    for r in got.itertuples():
        pts = np.array(sorted(by_layer[r.layer]), np.int64)
        h = hull_int(pts)
        _is_strict_hull(pts, h)
        assert r.n_hull == len(h)
        a2 = 0
        for i in range(len(h)):
            x1, y1 = int(h[i][0]), int(h[i][1])
            x2, y2 = int(h[(i + 1) % len(h)][0]), int(h[(i + 1) % len(h)][1])
            a2 += x1 * y2 - x2 * y1
        assert r.area2 == abs(a2)


# ------------------------------------------------------- contour_cells


def _kde_brute():
    g = _geoms()
    hi = (1 << KDE_Z) - 1
    dens: dict[tuple, int] = {}
    for gt, xs, ys in zip(g["geom_type"], g["xs"], g["ys"]):
        if gt != 1:
            continue
        tx, ty = xyz.tile_xy(np.array([xs[0]]), np.array([ys[0]]), KDE_Z)
        cx, cy = int(tx[0]), int(ty[0])
        for dx in range(-KDE_R, KDE_R + 1):
            for dy in range(-KDE_R, KDE_R + 1):
                d2 = dx * dx + dy * dy
                if d2 > KDE_R * KDE_R:
                    continue
                x, y = cx + dx, cy + dy
                if 0 <= x <= hi and 0 <= y <= hi:
                    w = (1_000_000 * (KDE_D2MAX - d2)) // KDE_D2MAX
                    dens[(x, y)] = dens.get((x, y), 0) + w
    return dens


def test_contour_cells_brute(ray_session):
    from grandine_ray.pipelines.queries_geo2 import CONTOUR_T

    dens = _kde_brute()
    hi = (1 << KDE_Z) - 1
    inside = {k for k, v in dens.items() if v >= CONTOUR_T}
    cases: dict[tuple, int] = {}
    for (x, y) in inside:
        for dx, dy, bit in ((0, 0, 1), (1, 0, 2), (0, 1, 4), (1, 1, 8)):
            nx, ny = x - dx, y - dy
            if 0 <= nx <= hi - 1 and 0 <= ny <= hi - 1:
                cases[(nx, ny)] = cases.get((nx, ny), 0) + bit
    want: dict[int, int] = {}
    for c in cases.values():
        want[c] = want.get(c, 0) + 1
    got = queries_geo2.q_contour_cells(SF).to_pandas()
    got_map = {int(r.case_id): int(r.n_cells) for r in got.itertuples()}
    assert got_map == want
    assert len(want) > 3  # the fixture must exercise several cases


# ---------------------------------------------------- bbox_overlap_area


def test_bbox_overlap_area_brute(ray_session):
    g = _geoms()
    feats = []
    for lay, xs, ys in zip(g["layer"], g["xs"], g["ys"]):
        mnx = min(math.floor(x * 1e6 + 0.5) for x in xs)
        mny = min(math.floor(y * 1e6 + 0.5) for y in ys)
        mxx = max(math.floor(x * 1e6 + 0.5) for x in xs)
        mxy = max(math.floor(y * 1e6 + 0.5) for y in ys)
        feats.append((lay, mnx, mny, mxx, mxy))
    want: dict[tuple, list] = {}
    for i, a in enumerate(feats):
        for b in feats[i + 1:]:
            if a[0] == b[0]:
                continue
            ox, oy = max(a[1], b[1]), max(a[2], b[2])
            ox2, oy2 = min(a[3], b[3]), min(a[4], b[4])
            if ox2 > ox and oy2 > oy:
                k = tuple(sorted((a[0], b[0])))
                e = want.setdefault(k, [0, 0])
                e[0] += 1
                e[1] += (ox2 - ox) * (oy2 - oy)
    got = queries_geo2.q_bbox_overlap_area(SF).to_pandas()
    got_map = {(r.layer_a, r.layer_b): (int(r.n_pairs), int(r.area_sum))
               for r in got.itertuples()}
    assert got_map == {k: tuple(v) for k, v in want.items()}
    assert len(want) >= 3


# ------------------------------------------------------- segment_octants


def test_segment_octants_brute(ray_session):
    g = _geoms()
    cnt: dict[tuple, int] = {}
    for gt, lay, xs, ys in zip(g["geom_type"], g["layer"], g["xs"],
                               g["ys"]):
        if gt != 2:
            continue
        xi = [math.floor(x * 1e6 + 0.5) for x in xs]
        yi = [math.floor(y * 1e6 + 0.5) for y in ys]
        for i in range(len(xi) - 1):
            dx, dy = xi[i + 1] - xi[i], yi[i + 1] - yi[i]
            if dx == 0 and dy == 0:
                o = 8
            else:
                if dx >= 0 and dy >= 0:
                    q = 0
                elif dx < 0 and dy >= 0:
                    q = 1
                elif dx < 0 and dy < 0:
                    q = 2
                else:
                    q = 3
                o = 2 * q + (1 if abs(dy) > abs(dx) else 0)
            cnt[(lay, o)] = cnt.get((lay, o), 0) + 1
    got = queries_geo2.q_segment_octants(SF).to_pandas()
    got_map = {(r.layer, int(r.octant)): int(r.n_segments)
               for r in got.itertuples()}
    assert got_map == cnt


def test_path_turn_count_brute(ray_session):
    """Turn counts == scalar octant-walk over ground-truth vertices."""
    g = _geoms()
    want = {}
    for did, sidx, gt, xs, ys, ring in zip(
            g["doc_id"], g["span_idx"], g["geom_type"], g["xs"],
            g["ys"], g["ring_of"]):
        if gt != 2:
            continue
        octs = []
        xi = [int(math.floor(x * 1e6 + 0.5)) for x in xs]
        yi = [int(math.floor(y * 1e6 + 0.5)) for y in ys]
        for i in range(len(xi) - 1):
            if ring[i] != ring[i + 1]:
                octs.append(None)  # ring break marker
                continue
            dx, dy = xi[i + 1] - xi[i], yi[i + 1] - yi[i]
            if dx == 0 and dy == 0:
                octs.append(8)
                continue
            q = (0 if dy >= 0 else 3) if dx >= 0 else \
                (1 if dy >= 0 else 2)
            octs.append(2 * q + (1 if abs(dy) > abs(dx) else 0))
        segs = [o for o in octs if o is not None]
        turns = 0
        prev = None
        for o in octs:
            if o is None:
                prev = None
                continue
            if prev is not None and o != prev:
                turns += 1
            prev = o
        if segs:
            want[(did, sidx)] = (len(segs), turns)
    got = queries_geo2.q_path_turn_count(SF).to_pandas()
    mine = {(r.doc_id, r.span_idx): (r.n_segments, r.n_turns)
            for r in got.itertuples()}
    assert mine == want
    assert len(mine) > 0
