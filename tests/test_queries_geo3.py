"""Brute-force cross-checks for queries_geo3 at sf0.001 — scalar
reimplementations over the PRE-WKB ground-truth vertex table, plus a
Fraction-parametric fuzz of the exact segment-intersection predicate
(an algebraically different formulation than the orientation tests)."""
import itertools
import math
from fractions import Fraction

import numpy as np
import pyarrow.parquet as pq

from grandine_ray.index import xyz
from grandine_ray.pipelines import queries_geo3
from grandine_ray.pipelines.queries_geo3 import (CROSS_CELL, _pair_indices,
                                                 segments_intersect_int)
from grandine_ray.pipelines.queries_ml import SMOOTH_Z
from grandine_ray.sources import synth

SF = "/root/testdata/sf0.001"


def _geoms():
    corpus = synth.corpus_for_sf(SF)
    return pq.read_table(f"{corpus}/geoms.parquet").to_pydict()


# ------------------------------------------------------- _pair_indices


def test_pair_indices_random():
    rng = np.random.default_rng(11)
    for _ in range(50):
        codes = np.sort(rng.integers(0, 8, size=int(rng.integers(0, 40))))
        li, ri = _pair_indices(codes)
        got = sorted(zip(li.tolist(), ri.tolist()))
        want = []
        for v in np.unique(codes):
            idx = np.nonzero(codes == v)[0].tolist()
            want.extend(itertools.combinations(idx, 2))
        assert got == sorted(want)
        assert all(codes[a] == codes[b] for a, b in got)


# ---------------------------------------- segment intersection predicate


def _seg_int_ref(p1, p2, p3, p4):
    """Independent parametric reference: rational line-line solve with
    inclusive [0,1] parameter bounds; collinear/degenerate cases via
    exact 1-D interval overlap."""
    d1 = (p2[0] - p1[0], p2[1] - p1[1])
    d2 = (p4[0] - p3[0], p4[1] - p3[1])
    den = d1[0] * d2[1] - d1[1] * d2[0]
    if den != 0:
        t = Fraction((p3[0] - p1[0]) * d2[1] - (p3[1] - p1[1]) * d2[0], den)
        u = Fraction((p3[0] - p1[0]) * d1[1] - (p3[1] - p1[1]) * d1[0], den)
        return 0 <= t <= 1 and 0 <= u <= 1
    # parallel (or degenerate): must be collinear to touch
    ref = d1 if d1 != (0, 0) else d2
    if ref == (0, 0):
        return p1 == p3
    anchor = p1 if d1 != (0, 0) else p3
    for p in (p1, p2, p3, p4):
        if (p[0] - anchor[0]) * ref[1] - (p[1] - anchor[1]) * ref[0] != 0:
            return False
    axis = 0 if abs(ref[0]) >= abs(ref[1]) else 1
    lo1, hi1 = sorted((p1[axis], p2[axis]))
    lo2, hi2 = sorted((p3[axis], p4[axis]))
    return max(lo1, lo2) <= min(hi1, hi2)


def test_segments_intersect_fuzz():
    rng = np.random.default_rng(23)
    n = 4000
    pts = rng.integers(-5, 6, size=(n, 8)).astype(np.int64)
    got = segments_intersect_int(*[pts[:, i] for i in range(8)])
    for i in range(n):
        p = [int(v) for v in pts[i]]
        want = _seg_int_ref((p[0], p[1]), (p[2], p[3]),
                            (p[4], p[5]), (p[6], p[7]))
        assert bool(got[i]) == want, f"case {p}: got {got[i]} want {want}"


# ------------------------------------------------------ segment_crossings


def _segments_by_layer():
    g = _geoms()
    segs = []
    for gt, lay, xs, ys in zip(g["geom_type"], g["layer"], g["xs"],
                               g["ys"]):
        if gt != 2:
            continue
        xi = [math.floor(x * 1e6 + 0.5) for x in xs]
        yi = [math.floor(y * 1e6 + 0.5) for y in ys]
        for i in range(len(xi) - 1):
            segs.append((lay, (xi[i], yi[i]), (xi[i + 1], yi[i + 1])))
    return segs


def test_segment_crossings_brute(ray_session):
    segs = _segments_by_layer()
    counts: dict[tuple, int] = {}
    for i in range(len(segs)):
        li, a, b = segs[i]
        for j in range(i + 1, len(segs)):
            lj, c, d = segs[j]
            if li == lj:
                continue
            if max(a[0], b[0]) < min(c[0], d[0]) \
                    or max(c[0], d[0]) < min(a[0], b[0]) \
                    or max(a[1], b[1]) < min(c[1], d[1]) \
                    or max(c[1], d[1]) < min(a[1], b[1]):
                continue
            if _seg_int_ref(a, b, c, d):
                k = (min(li, lj), max(li, lj))
                counts[k] = counts.get(k, 0) + 1
    got = queries_geo3.q_segment_crossings(SF).to_pandas()
    got_map = {(r.layer_a, r.layer_b): int(r.n_crossings)
               for r in got.itertuples()}
    assert got_map == counts
    assert all(a < b for a, b in got_map)


# -------------------------------------------------------- layer_diameter


def test_layer_diameter_brute(ray_session):
    g = _geoms()
    by_layer: dict[str, list] = {}
    for lay, xs, ys in zip(g["layer"], g["xs"], g["ys"]):
        lst = by_layer.setdefault(lay, [])
        for x, y in zip(xs, ys):
            lst.append((math.floor(x * 1e6 + 0.5),
                        math.floor(y * 1e6 + 0.5)))
    got = queries_geo3.q_layer_diameter(SF).to_pandas()
    assert sorted(got.layer) == sorted(by_layer)
    for r in got.itertuples():
        P = np.array(by_layer[r.layer], np.int64)
        dx = P[:, 0][:, None] - P[:, 0][None, :]
        dy = P[:, 1][:, None] - P[:, 1][None, :]
        want = int((dx * dx + dy * dy).max())
        assert int(r.diam2_udeg2) == want
        assert int(r.diam_udeg) == math.isqrt(want)


# ------------------------------------------------------ common_neighbors


def test_common_neighbors_brute(ray_session):
    g = _geoms()
    occ = set()
    z = SMOOTH_Z
    for gt, xs, ys in zip(g["geom_type"], g["xs"], g["ys"]):
        if gt != 1:
            continue
        tx, ty = xyz.tile_xy(np.array([xs[0]]), np.array([ys[0]]), z)
        occ.add((int(tx[0]), int(ty[0])))
    pair_common: dict[tuple, int] = {}
    for (cx, cy) in occ:
        members = sorted(
            (cx + dx, cy + dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0) and (cx + dx, cy + dy) in occ)
        for a, b in itertools.combinations(members, 2):
            pair_common[(a, b)] = pair_common.get((a, b), 0) + 1
    hist: dict[tuple, int] = {}
    for (a, b), c in pair_common.items():
        adj = 1 if max(abs(a[0] - b[0]), abs(a[1] - b[1])) == 1 else 0
        hist[(c, adj)] = hist.get((c, adj), 0) + 1
    got = queries_geo3.q_common_neighbors(SF).to_pandas()
    got_map = {(int(r.n_common), int(r.adjacent)): int(r.n_pairs)
               for r in got.itertuples()}
    assert got_map == hist


def test_crossings_fan_cell_consistency():
    """A segment is fanned to every cell its bbox covers, and the
    canonical cell of any bbox-overlapping pair is among the fanned
    cells of BOTH segments (the ownership invariant the dedup-free
    counting relies on)."""
    rng = np.random.default_rng(5)
    for _ in range(200):
        a = rng.integers(-400_000, 400_000, size=4).astype(np.int64)
        b = rng.integers(-400_000, 400_000, size=4).astype(np.int64)
        mn1 = (min(a[0], a[2]), min(a[1], a[3]))
        mn2 = (min(b[0], b[2]), min(b[1], b[3]))
        mx1 = (max(a[0], a[2]), max(a[1], a[3]))
        mx2 = (max(b[0], b[2]), max(b[1], b[3]))
        if min(mx1[0], mx2[0]) < max(mn1[0], mn2[0]) \
                or min(mx1[1], mx2[1]) < max(mn1[1], mn2[1]):
            continue
        ix, iy = max(mn1[0], mn2[0]), max(mn1[1], mn2[1])
        own = (ix // CROSS_CELL, iy // CROSS_CELL)

        def cells(mn, mx):
            return {(cx, cy)
                    for cx in range(mn[0] // CROSS_CELL,
                                    mx[0] // CROSS_CELL + 1)
                    for cy in range(mn[1] // CROSS_CELL,
                                    mx[1] // CROSS_CELL + 1)}

        assert own in cells(mn1, mx1) and own in cells(mn2, mx2)
