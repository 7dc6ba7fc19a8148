"""Weiler–Atherton rect clip: cross-validation against the independent
scanline rasterizer + explicit multi-component cases."""
import numpy as np
import pytest

from grandine_ray.geom.polyclip import NO_CROSSINGS, clip_ring_rect
from grandine_ray.stages.raster import rasterize_polygon


def _mask(rings, size=160, extent=100.0):
    if not rings:
        return np.zeros((size, size), bool)
    m = np.zeros((size, size), bool)
    for r in rings:
        m |= rasterize_polygon([r], size, extent) > 0
    return m


def _box_mask(minx, miny, maxx, maxy, size=160, extent=100.0):
    g = np.zeros((size, size), bool)
    ys = (np.arange(size) + 0.5) * extent / size
    xs = (np.arange(size) + 0.5) * extent / size
    g[np.ix_((ys >= miny) & (ys <= maxy), (xs >= minx) & (xs <= maxx))] = True
    return g


def _iou(a, b):
    u = (a | b).sum()
    return 1.0 if u == 0 else (a & b).sum() / u


def test_u_shape_splits_into_two():
    # U-shaped subject; box covers the two prongs but not the base
    u = np.array([
        [10, 10], [90, 10], [90, 90], [70, 90], [70, 30],
        [30, 30], [30, 90], [10, 90],
    ], dtype=float)
    parts = clip_ring_rect(u, 0, 50, 100, 100)
    assert parts is not None
    assert len(parts) == 2
    # each part within the box
    for p in parts:
        assert (p[:, 1] >= 50 - 1e-9).all()
    got = _mask(parts)
    exp = _mask([u]) & _box_mask(0, 50, 100, 100)
    assert _iou(got, exp) > 0.97


def test_comb_three_teeth():
    comb = np.array([
        [0, 0], [100, 0], [100, 80], [85, 80], [85, 20], [70, 20],
        [70, 80], [55, 80], [55, 20], [40, 20], [40, 80], [25, 80],
        [25, 20], [10, 20], [10, 80], [0, 80],
    ], dtype=float)
    parts = clip_ring_rect(comb, 5, 50, 95, 100)
    assert parts is not None and len(parts) == 4  # 4 teeth above y=50
    got = _mask(parts)
    exp = _mask([comb]) & _box_mask(5, 50, 95, 100)
    assert _iou(got, exp) > 0.97


def test_orientation_preserved():
    tri_ccw = np.array([[20, 20], [80, 20], [50, 80]], float)
    from grandine_ray.geom.ops import ring_area

    for ring in (tri_ccw, tri_ccw[::-1].copy()):
        parts = clip_ring_rect(ring, 0, 0, 60, 60)
        assert parts is not None and len(parts) == 1
        assert np.sign(ring_area(parts[0])) == np.sign(ring_area(ring))


def test_random_concave_cross_validated():
    rng = np.random.default_rng(11)
    checked = 0
    degenerate = 0
    for trial in range(200):
        n = int(rng.integers(5, 14))
        # stratified angles keep every gap < π ⇒ guaranteed-simple star ring
        ang = (np.arange(n) + rng.uniform(0.05, 0.95, n)) / n * 2 * np.pi
        rad = rng.uniform(8, 46, n)        # spiky → concave
        cx, cy = rng.uniform(30, 70, 2)
        ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        bx = rng.uniform(0, 50)
        by = rng.uniform(0, 50)
        parts = clip_ring_rect(ring, bx, by, bx + 40, by + 40)
        if parts is None:
            degenerate += 1
            continue
        if parts is NO_CROSSINGS:
            # resolve like clip._wa_polygon: box on one side of the region
            from grandine_ray.geom.predicates import point_in_rings

            if point_in_rings(bx + 20, by + 20, [ring]):
                parts = [np.array([[bx, by], [bx + 40, by],
                                   [bx + 40, by + 40], [bx, by + 40]])]
            else:
                parts = []
        checked += 1
        got = _mask(parts)
        exp = _mask([ring]) & _box_mask(bx, by, bx + 40, by + 40)
        iou = _iou(got, exp)
        assert iou > 0.93, (trial, iou, len(parts))
    assert checked > 150  # WA path handles the vast majority
    assert degenerate < 40


def test_fully_inside_outside():
    tri = np.array([[10, 10], [20, 10], [15, 20]], float)
    parts = clip_ring_rect(tri, 0, 0, 100, 100)
    assert len(parts) == 1 and np.array_equal(parts[0], tri)
    out = clip_ring_rect(tri, 50, 50, 90, 90)
    assert out is NO_CROSSINGS  # no crossings + not inside → caller decides


def test_clip_polygon_multipart_integration():
    from grandine_ray.geom.clip import clip_polygon

    u = np.array([
        [10, 10], [90, 10], [90, 90], [70, 90], [70, 30],
        [30, 30], [30, 90], [10, 90],
    ], dtype=float)
    polys = clip_polygon([u], 5, 50, 95, 100)
    assert len(polys) == 2          # two clean components, GEOS-like
    # with a hole that survives in one component
    sq = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], float)
    hole = np.array([[20, 60], [40, 60], [40, 80], [20, 80]], float)
    polys = clip_polygon([sq, hole], 5, 50, 95, 95)
    assert len(polys) == 1
    assert len(polys[0]) == 2       # shell + assigned hole


def test_arrangement_cross_validated_on_self_intersecting():
    """The even-odd arrangement polygonizer vs the scanline rasterizer on
    randomized SELF-INTERSECTING rings (the inputs W-A rejects and GEOS
    repairs with Buffer(0))."""
    from grandine_ray.geom.arrangement import clip_polygon_arrangement

    rng = np.random.default_rng(23)
    checked = 0
    for trial in range(60):
        n = int(rng.integers(6, 12))
        # random walk ring — frequently self-intersecting
        ring = rng.uniform(5, 95, (n, 2))
        bx, by = rng.uniform(0, 50, 2)
        polys = clip_polygon_arrangement([ring], bx, by, bx + 45, by + 45)
        checked += 1
        got = np.zeros((160, 160), bool)
        for p in polys:
            m = _mask([p[0]])
            for h in p[1:]:
                m &= ~_mask([h])
            got |= m
        # even-odd raster ground truth
        size, extent = 160, 100.0
        ys = (np.arange(size) + 0.5) * extent / size
        xs = (np.arange(size) + 0.5) * extent / size
        X, Y = np.meshgrid(xs, ys)
        rx, ry = ring[:, 0], ring[:, 1]
        nx_, ny_ = np.roll(rx, -1), np.roll(ry, -1)
        cnt = np.zeros(X.shape, np.int64)
        for k in range(n):
            cond = (ry[k] > Y) != (ny_[k] > Y)
            with np.errstate(divide="ignore", invalid="ignore"):
                xin = rx[k] + (Y - ry[k]) / (ny_[k] - ry[k]) * (nx_[k] - rx[k])
            cnt += cond & (X < xin)
        exp = ((cnt % 2) == 1) & _box_mask(bx, by, bx + 45, by + 45)
        iou = _iou(got, exp)
        assert iou > 0.88, (trial, iou, len(polys))
    assert checked == 60


def test_arrangement_bowtie_and_annulus():
    from grandine_ray.geom.arrangement import clip_polygon_arrangement

    bow = np.array([[10, 10], [60, 60], [60, 10], [10, 60]], float)
    out = clip_polygon_arrangement([bow], 0, 0, 100, 100)
    assert len(out) == 2  # two filled lobes (Buffer(0)/MakeValid semantics)
    # self-touching annulus drawn as one ring -> polygon with hole
    ann = np.array([[0, 0], [40, 0], [40, 40], [0, 40], [0, 0],
                    [10, 10], [10, 30], [30, 30], [30, 10], [10, 10]], float)
    out = clip_polygon_arrangement([ann], -5, -5, 50, 50)
    assert len(out) == 1 and len(out[0]) == 2


def test_clip_polygon_region_agreement_fuzz():
    """clip_polygon output region (even-odd over emitted polys) must match
    the raster even-odd truth for random rings — catches fast paths
    accepting inputs outside their validity premise (e.g. the W-A tracer
    on self-intersecting subjects, fixed via the corner-consistency
    check)."""
    from grandine_ray.geom.clip import clip_polygon

    rng = np.random.default_rng(7)

    def inside_cnt(ring, X, Y):
        rx, ry = ring[:, 0], ring[:, 1]
        nx_, ny_ = np.roll(rx, -1), np.roll(ry, -1)
        cnt = np.zeros(X.shape, np.int64)
        for k in range(len(rx)):
            cond = (ry[k] > Y) != (ny_[k] > Y)
            with np.errstate(divide="ignore", invalid="ignore"):
                xin = rx[k] + (Y - ry[k]) / (ny_[k] - ry[k]) * (nx_[k] - rx[k])
            cnt += cond & (X < xin)
        return cnt

    size = 60
    xs = np.linspace(-10 + 1 / 6, 10 - 1 / 6, size)
    X, Y = np.meshgrid(xs, xs)
    for trial in range(120):
        n = int(rng.integers(3, 10))
        ring = rng.uniform(-14, 14, (n, 2)).round(1)
        out = clip_polygon([ring], -10, -10, 10, 10)
        got = np.zeros(X.shape, bool)
        for p in out:
            cnt = np.zeros(X.shape, np.int64)
            for r in p:
                cnt += inside_cnt(r, X, Y)
            got |= (cnt % 2) == 1
        exp = (inside_cnt(ring, X, Y) % 2) == 1
        diff = int((got != exp).sum())
        assert diff <= max(12, 0.08 * exp.sum()), (trial, diff, int(exp.sum()))
