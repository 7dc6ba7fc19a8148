"""Round-4 geospatial extension #2: density surfaces, hulls, bearings.

Three operators a geo analytics stack needs beyond the tiler:

* ``kde_heatmap`` — kernel density over the tile grid with an
  Epanechnikov kernel evaluated in EXACT integer arithmetic
  (weight_ppm = 1e6·(D2MAX − d²) // D2MAX with integer cell distances),
  so the Ray side and the DuckDB oracle agree bit-for-bit — no float
  kernel crosses the engine boundary (repo float-parity rule).
* ``convex_hull`` — per-layer strict convex hull as a MERGEABLE
  aggregate: hull(A ∪ B) = hull(hull(A) ∪ hull(B)), so each block emits
  its partial hull (bounded by the hull size, not the block size) and
  one small per-layer reduce finishes the job — the shuffle carries
  hull vertices only. Exact integer cross products (micro-degrees).
* ``segment_octants`` — per-layer compass-octant histogram of
  linestring segment directions, classified purely by integer sign /
  magnitude comparisons (no atan2 crosses engines).

Reference parity notes: the tile addressing reuses the parity-proven
xyz math (lib/tile/tile.go:37-49 semantics); hull/segment vertices come
from the engine's own WKB decode path so the oracle checks the codec
round-trip too (geoms.parquet carries the pre-WKB coordinates).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geom import wkb as wkbmod
from ..index import xyz

# ------------------------------------------------------------ kde_heatmap

KDE_Z = 6          # grid zoom level (64×64 world grid at the bench scales)
KDE_R = 2          # kernel radius in cells (Chebyshev window, circular mask)
KDE_D2MAX = KDE_R * KDE_R + 1   # Epanechnikov support: d² < D2MAX

# precomputed circular offset stencil: (dx, dy, weight_ppm) with
# dx²+dy² ≤ R² — 13 cells at R=2. Integer weights exact on both engines.
_KDE_OFFS = [
    (dx, dy, (1_000_000 * (KDE_D2MAX - (dx * dx + dy * dy))) // KDE_D2MAX)
    for dx in range(-KDE_R, KDE_R + 1)
    for dy in range(-KDE_R, KDE_R + 1)
    if dx * dx + dy * dy <= KDE_R * KDE_R
]


def _kde_cells(sf_dir: str):
    """Shared KDE cell aggregate: Dataset of (k = x<<32|y, w = summed
    integer-ppm density) on the zoom-KDE_Z grid. Each point splats onto
    the ≤13 grid cells within 2 cells of its own cell; per-block partial
    sums reduce the shuffle to the occupied-cell domain (≤13× occupied
    cells, corpus-size-independent), then one groupby-sum finishes.
    At 100 TB the stencil fan-out stays O(13) rows per point *before*
    the block-local combine, so the exchange is tiny."""
    from ray.data.aggregate import Sum

    from .queries import _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")
    hi = (1 << KDE_Z) - 1
    dxs = np.array([o[0] for o in _KDE_OFFS], np.int64)
    dys = np.array([o[1] for o in _KDE_OFFS], np.int64)
    ws = np.array([o[2] for o in _KDE_OFFS], np.int64)

    def splat(b: pa.Table) -> pa.Table:
        lon = b["bbox_minx"].to_numpy(zero_copy_only=False)
        lat = b["bbox_miny"].to_numpy(zero_copy_only=False)
        tx, ty = xyz.tile_xy(lon, lat, KDE_Z)
        # stencil fan-out, vectorized: [n_pts, 13]
        cx = tx[:, None] + dxs[None, :]
        cy = ty[:, None] + dys[None, :]
        w = np.broadcast_to(ws[None, :], cx.shape)
        ok = (cx >= 0) & (cx <= hi) & (cy >= 0) & (cy <= hi)
        key = (cx[ok] << 32) | cy[ok]
        uk, inv = np.unique(key, return_inverse=True)
        dens = np.zeros(len(uk), np.int64)
        np.add.at(dens, inv, w[ok])
        return pa.table({"k": pa.array(uk, pa.int64()),
                         "w": pa.array(dens, pa.int64())})

    return pts.map_batches(splat, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("w", alias_name="w"))


def q_kde_heatmap(sf_dir: str):
    """Epanechnikov kernel-density heatmap of the point features on the
    zoom-6 tile grid (see _kde_cells for the scale shape)."""

    def unpack(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        return pa.table({
            "x": pa.array(k >> 32, pa.int64()),
            "y": pa.array(k & 0xFFFFFFFF, pa.int64()),
            "density_ppm": pc.cast(b["w"], pa.int64()),
        })

    return _kde_cells(sf_dir).map_batches(unpack, batch_format="pyarrow")


# ------------------------------------------------------------ convex_hull


def hull_int(pts: np.ndarray) -> np.ndarray:
    """Strict convex hull of int64 [n, 2] points (Andrew monotone chain,
    exact integer cross products; collinear boundary points EXCLUDED).

    Returns hull vertices in CCW order starting at the lexicographic
    minimum. Degenerate inputs follow the shared cross-engine spec:
    all-collinear → the two lexicographic extremes; single distinct
    point → that point.

    Scale shape: a vectorized staircase prefilter (per distinct x keep
    only min/max y) bounds the sequential chain walk to ≤ 2·distinct_x
    candidates, so blocks of millions of vertices don't pay a Python
    loop per vertex.
    """
    pts = np.unique(pts, axis=0)          # lexicographic sort + dedup
    if len(pts) <= 2:
        return pts
    # staircase prefilter: only per-x extremes can be hull vertices
    x = pts[:, 0]
    starts = np.nonzero(np.r_[True, x[1:] != x[:-1]])[0]
    ends = np.r_[starts[1:], len(pts)] - 1
    cand_idx = np.unique(np.concatenate([starts, ends]))
    P = pts[cand_idx]
    px, py = P[:, 0], P[:, 1]

    def chain(order):
        out: list[int] = []
        for i in order:
            while len(out) >= 2:
                ax, ay = px[out[-2]], py[out[-2]]
                bx, by = px[out[-1]], py[out[-1]]
                if (int(bx - ax) * int(py[i] - ay)
                        - int(by - ay) * int(px[i] - ax)) > 0:
                    break
                out.pop()
            out.append(i)
        return out

    idx = range(len(P))
    lower = chain(idx)
    upper = chain(reversed(range(len(P))))
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 2:                      # all points identical (defensive)
        return P[:1]
    return P[np.array(hull, np.int64)]


def _shoelace2_abs(hull: np.ndarray) -> int:
    """|2·area| of an ordered hull, exact (Python ints, no overflow)."""
    if len(hull) < 3:
        return 0
    s = 0
    xs = [int(v) for v in hull[:, 0]]
    ys = [int(v) for v in hull[:, 1]]
    n = len(xs)
    for i in range(n):
        j = (i + 1) % n
        s += xs[i] * ys[j] - xs[j] * ys[i]
    return abs(s)


def hull_partial(b: pa.Table) -> pa.Table:
    """Block-level mergeable hull partial: per-layer local hull
    vertices as (layer, hx, hy) rows — the shuffle payload is bounded
    by hull sizes, not block sizes. Shared by q_convex_hull and
    queries_geo3.q_layer_diameter (hull(A∪B) = hull(hull(A)∪hull(B)),
    and the farthest pair of a point set is a pair of hull vertices,
    so both reduce over the same partial)."""
    blobs = [v.as_py() for v in b["geom_wkb"]]
    gb = wkbmod.decode_wkb_batch(blobs)
    xi = np.floor(gb.coords[:, 0] * 1e6 + 0.5).astype(np.int64)
    yi = np.floor(gb.coords[:, 1] * 1e6 + 0.5).astype(np.int64)
    starts, stops = gb.geom_point_ranges()
    nv = stops - starts
    layer = b["layer"]
    if isinstance(layer, pa.ChunkedArray):
        layer = layer.combine_chunks()
    lay_codes, inv = np.unique(
        np.asarray(layer.to_pylist(), dtype=object), return_inverse=True)
    vert_lay = np.repeat(inv, nv)      # layer code per vertex
    out_lay: list[str] = []
    out_x: list[np.ndarray] = []
    out_y: list[np.ndarray] = []
    for code, name in enumerate(lay_codes):
        m = vert_lay == code
        if not m.any():
            continue
        h = hull_int(np.column_stack([xi[m], yi[m]]))
        out_lay.extend([str(name)] * len(h))
        out_x.append(h[:, 0])
        out_y.append(h[:, 1])
    return pa.table({
        "layer": pa.array(out_lay, pa.string()),
        "hx": pa.array(np.concatenate(out_x) if out_x
                       else np.empty(0, np.int64), pa.int64()),
        "hy": pa.array(np.concatenate(out_y) if out_y
                       else np.empty(0, np.int64), pa.int64()),
    })


def q_convex_hull(sf_dir: str):
    """Per-layer strict convex hull of every geometry vertex: hull
    vertex count + exact |2·area| in micro-deg² (integer shoelace).
    Mergeable-aggregate shape: block partials emit only their local
    hull vertices; the per-layer reduce re-hulls the union."""
    from .queries import _features_ds

    feats = _features_ds(sf_dir)

    def finish(t: pa.Table) -> pa.Table:
        pts = np.column_stack([
            t["hx"].to_numpy(zero_copy_only=False),
            t["hy"].to_numpy(zero_copy_only=False)])
        h = hull_int(pts)
        return pa.table({
            "layer": pa.array([t["layer"][0].as_py()], pa.string()),
            "n_hull": pa.array([len(h)], pa.int64()),
            "area2": pa.array([_shoelace2_abs(h)], pa.int64()),
        })

    return feats.map_batches(hull_partial, batch_format="pyarrow") \
        .groupby("layer").map_groups(finish, batch_format="pyarrow")


# --------------------------------------------------------- segment_octants

# Shared cross-engine octant spec (pure integer comparisons):
#   quadrant q: 0 = dx≥0,dy≥0   1 = dx<0,dy≥0   2 = dx<0,dy<0   3 = dx≥0,dy<0
#   octant = 2q + (1 if |dy| > |dx| else 0);  zero-length segment → 8.


def q_segment_octants(sf_dir: str):
    """Per-layer histogram of linestring segment directions in 8 compass
    octants (+ bucket 8 for zero-length segments after micro-degree
    integer-ization). Direction class is decided by integer sign and
    |dy| vs |dx| comparisons only — exact on both engines. One combine
    per block, then a groupby over ≤ 9·layers keys."""
    from ray.data.aggregate import Sum

    from .queries import _features_ds

    lines = _features_ds(sf_dir).filter(expr="geom_type == 2")

    def partial(b: pa.Table) -> pa.Table:
        blobs = [v.as_py() for v in b["geom_wkb"]]
        gb = wkbmod.decode_wkb_batch(blobs)
        ro = np.asarray(gb.ring_offsets, np.int64)
        go = np.asarray(gb.geom_offsets, np.int64)
        total = len(gb.coords)
        xi = np.floor(gb.coords[:, 0] * 1e6 + 0.5).astype(np.int64)
        yi = np.floor(gb.coords[:, 1] * 1e6 + 0.5).astype(np.int64)
        is_last = np.zeros(total, bool)
        is_last[ro[1:] - 1] = True
        s = np.nonzero(~is_last)[0]
        dx = xi[s + 1] - xi[s]
        dy = yi[s + 1] - yi[s]
        q = np.where(dx >= 0, np.where(dy >= 0, 0, 3),
                     np.where(dy >= 0, 1, 2))
        octant = 2 * q + (np.abs(dy) > np.abs(dx)).astype(np.int64)
        octant[(dx == 0) & (dy == 0)] = 8
        # segment → geometry → layer
        ring_of_seg = np.searchsorted(ro, s, side="right") - 1
        geom_of_ring = np.searchsorted(go, np.arange(len(ro) - 1),
                                       side="right") - 1
        geom_of_seg = geom_of_ring[ring_of_seg]
        layer = b["layer"]
        if isinstance(layer, pa.ChunkedArray):
            layer = layer.combine_chunks()
        lay = pa.array(np.asarray(layer.to_pylist(),
                                  dtype=object)[geom_of_seg].tolist(),
                       pa.string())
        fused = pc.binary_join_element_wise(
            lay, pa.array(octant.astype("U"), pa.string()), "\x1f")
        uk, counts = np.unique(
            fused.to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({
            "lo": pa.array(uk.tolist(), pa.string()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })

    agg = lines.map_batches(partial, batch_format="pyarrow") \
        .groupby("lo").aggregate(Sum("n", alias_name="n_segments"))

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["lo"], "\x1f")
        return pa.table({
            "layer": pc.list_element(parts, 0),
            "octant": pc.cast(pc.list_element(parts, 1), pa.int64()),
            "n_segments": pc.cast(b["n_segments"], pa.int64()),
        })

    return agg.map_batches(split, batch_format="pyarrow")


# ---------------------------------------------------------- contour_cells

CONTOUR_T = 1_000_000   # density threshold defining the "inside" region


def q_contour_cells(sf_dir: str):
    """Marching-squares case histogram of the KDE density surface at
    threshold CONTOUR_T: every 2×2 neighborhood of grid cells is
    classified by which corners are inside (bit dy·2+dx), and the
    histogram over the 15 non-empty cases profiles the contour
    geometry (how much boundary, how many saddles) without ever
    building line segments. Exact integers end-to-end. Scale shape:
    inside-cells fan out ×4 and the neighborhood groupby sums disjoint
    corner bits — the exchange is the inside-cell domain."""
    from ray.data.aggregate import Sum

    hi = (1 << KDE_Z) - 1

    def corners(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        ins = w >= CONTOUR_T
        x = (k[ins] >> 32).astype(np.int64)
        y = (k[ins] & 0xFFFFFFFF).astype(np.int64)
        dxs = np.array([0, 1, 0, 1], np.int64)
        dys = np.array([0, 0, 1, 1], np.int64)
        bits = np.array([1, 2, 4, 8], np.int64)   # 1 << (dy*2 + dx)
        nx = x[:, None] - dxs[None, :]
        ny = y[:, None] - dys[None, :]
        bt = np.broadcast_to(bits[None, :], nx.shape)
        ok = (nx >= 0) & (nx <= hi - 1) & (ny >= 0) & (ny <= hi - 1)
        key = (nx[ok] << 32) | ny[ok]
        return pa.table({"nk": pa.array(key, pa.int64()),
                         "bit": pa.array(bt[ok], pa.int64())})

    cases = _kde_cells(sf_dir) \
        .map_batches(corners, batch_format="pyarrow") \
        .groupby("nk").aggregate(Sum("bit", alias_name="cs"))

    def hist(b: pa.Table) -> pa.Table:
        cs = b["cs"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, counts = np.unique(cs, return_counts=True)
        return pa.table({"case_id": pa.array(uk, pa.int64()),
                         "pn": pa.array(counts.astype(np.int64),
                                        pa.int64())})

    from ray.data.aggregate import Sum as _Sum

    agg = cases.map_batches(hist, batch_format="pyarrow") \
        .groupby("case_id").aggregate(_Sum("pn", alias_name="n_cells"))

    def cast(b: pa.Table) -> pa.Table:
        return pa.table({"case_id": pc.cast(b["case_id"], pa.int64()),
                         "n_cells": pc.cast(b["n_cells"], pa.int64())})

    return agg.map_batches(cast, batch_format="pyarrow")


# ------------------------------------------------------- bbox_overlap_area

OVERLAP_Z = 6


def _pair_indices(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All a<b row-index pairs within equal-code runs of a SORTED int64
    code array, fully vectorized (the numeric sibling of
    queries_cstats.pairs_within_groups)."""
    n = len(codes)
    if n == 0:
        e = np.empty(0, np.int64)
        return e, e.copy()
    new = np.ones(n, bool)
    new[1:] = codes[1:] != codes[:-1]
    idx = np.arange(n, dtype=np.int64)
    run_start = np.maximum.accumulate(np.where(new, idx, 0))
    starts = np.nonzero(new)[0]
    run_len_per_run = np.r_[starts[1:], n] - starts
    run_len = np.repeat(run_len_per_run, run_len_per_run)
    rem = run_len - 1 - (idx - run_start)
    total = int(rem.sum())
    offs = np.cumsum(rem) - rem
    seq = np.arange(total, dtype=np.int64) - np.repeat(offs, rem)
    left = np.repeat(idx, rem)
    right = left + 1 + seq
    return left, right


def q_bbox_overlap_area(sf_dir: str):
    """Cross-layer all-pairs bbox intersection join: for every layer
    pair, the count of strictly-overlapping bbox pairs and the exact
    integer sum of overlap areas in micro-deg². The self-join is
    tile-bucketed at zoom OVERLAP_Z with an OWNERSHIP rule (a pair is
    counted only in the tile containing its overlap's min corner, which
    both coverages provably contain) so each pair materializes exactly
    once and no post-shuffle dedup is needed — the interval-join
    pattern lifted to 2-D. The DuckDB oracle runs the naive O(N²)
    join. Bbox corners are integer-ized ONCE (micro-deg) and every
    derived quantity — coverage, ownership, predicate, area — uses the
    same integers, so no cross-engine float crosses the boundary."""
    from ray.data.aggregate import Sum

    from .queries import _features_ds

    feats = _features_ds(sf_dir)

    def prep(b: pa.Table) -> pa.Table:
        mnx = np.floor(
            b["bbox_minx"].to_numpy(zero_copy_only=False) * 1e6 + 0.5
        ).astype(np.int64)
        mny = np.floor(
            b["bbox_miny"].to_numpy(zero_copy_only=False) * 1e6 + 0.5
        ).astype(np.int64)
        mxx = np.floor(
            b["bbox_maxx"].to_numpy(zero_copy_only=False) * 1e6 + 0.5
        ).astype(np.int64)
        mxy = np.floor(
            b["bbox_maxy"].to_numpy(zero_copy_only=False) * 1e6 + 0.5
        ).astype(np.int64)
        # coverage over the SAME integers the predicate uses
        row, tx, ty = xyz.coverage_flatmap(
            mnx / 1e6, mny / 1e6, mxx / 1e6, mxy / 1e6, OVERLAP_Z)
        layer = b["layer"]
        if isinstance(layer, pa.ChunkedArray):
            layer = layer.combine_chunks()
        tk = (tx << 32) | ty
        return pa.table({
            "tk": pa.array(tk, pa.int64()),
            "layer": layer.take(pa.array(row)),
            "mnx": pa.array(mnx[row], pa.int64()),
            "mny": pa.array(mny[row], pa.int64()),
            "mxx": pa.array(mxx[row], pa.int64()),
            "mxy": pa.array(mxy[row], pa.int64()),
        })

    def addpart(b: pa.Table) -> pa.Table:
        tk = b["tk"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "_part", pa.array((tk % 32).astype(np.int32), pa.int32()))

    def pairs(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("tk", "ascending")])
        ts = t.take(order)
        tk = ts["tk"].to_numpy(zero_copy_only=False)
        left, right = _pair_indices(tk)
        lay = np.asarray(ts["layer"].to_pylist(), dtype=object)
        la, lb = lay[left], lay[right]
        cross = la != lb
        left, right = left[cross], right[cross]
        la, lb = la[cross], lb[cross]
        mnx = ts["mnx"].to_numpy(zero_copy_only=False)
        mny = ts["mny"].to_numpy(zero_copy_only=False)
        mxx = ts["mxx"].to_numpy(zero_copy_only=False)
        mxy = ts["mxy"].to_numpy(zero_copy_only=False)
        ox = np.maximum(mnx[left], mnx[right])
        oy = np.maximum(mny[left], mny[right])
        ox2 = np.minimum(mxx[left], mxx[right])
        oy2 = np.minimum(mxy[left], mxy[right])
        hit = (ox2 > ox) & (oy2 > oy)
        # ownership: the tile containing the overlap's min corner
        otx, oty = xyz.tile_xy(ox[hit] / 1e6, oy[hit] / 1e6, OVERLAP_Z)
        own = ((otx << 32) | oty) == tk[left[hit]]
        sel = np.nonzero(hit)[0][own]
        if len(sel) == 0:
            return pa.table({"pair": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "area": pa.array([], pa.int64())})
        area = (ox2[sel] - ox[sel]) * (oy2[sel] - oy[sel])
        a_first = la[sel] < lb[sel]
        pa_lay = np.where(a_first, la[sel], lb[sel])
        pb_lay = np.where(a_first, lb[sel], la[sel])
        fused = np.char.add(np.char.add(pa_lay.astype("U"), "\x1f"),
                            pb_lay.astype("U"))
        uk, inv = np.unique(fused, return_inverse=True)
        n_out = np.zeros(len(uk), np.int64)
        np.add.at(n_out, inv, 1)
        # vectorized partial area sums with a float-shadow overflow
        # guard: if the float image stays under 2^62 the int64 sum
        # cannot have wrapped (wrap requires |true| ≥ 2^63)
        a_out = np.zeros(len(uk), np.int64)
        np.add.at(a_out, inv, area)
        chk = np.zeros(len(uk), np.float64)
        np.add.at(chk, inv, area.astype(np.float64))
        if np.any(np.abs(chk) >= 2.0 ** 62):
            raise ValueError("bbox_overlap_area: partial sum overflow")
        return pa.table({"pair": pa.array(uk.tolist(), pa.string()),
                         "n": pa.array(n_out, pa.int64()),
                         "area": pa.array(a_out, pa.int64())})

    agg = feats.map_batches(prep, batch_format="pyarrow") \
        .map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(pairs, batch_format="pyarrow") \
        .groupby("pair").aggregate(Sum("n", alias_name="n_pairs"),
                                   Sum("area", alias_name="area_sum"))

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["pair"], "\x1f")
        return pa.table({
            "layer_a": pc.list_element(parts, 0),
            "layer_b": pc.list_element(parts, 1),
            "n_pairs": pc.cast(b["n_pairs"], pa.int64()),
            "area_sum": pc.cast(b["area_sum"], pa.int64()),
        })

    return agg.map_batches(split, batch_format="pyarrow")


def q_path_turn_count(sf_dir: str):
    """Per-trajectory direction-change count: the number of consecutive
    linestring segment pairs whose compass OCTANT class differs — an
    exact integer sinuosity signal (straight GPS traces ≈ 0 turns,
    wandering ones ≈ n_segments) using the same sign/|Δ| octant
    classifier as segment_octants, so no angle float ever crosses
    engines. Pure map_batches over the WKB decode path, no shuffle;
    DuckDB mirror is LAG(octant) per (doc, span)."""
    from .queries import _features_ds

    lines = _features_ds(sf_dir).filter(expr="geom_type == 2")

    def turns(b: pa.Table) -> pa.Table:
        blobs = [v.as_py() for v in b["geom_wkb"]]
        gb = wkbmod.decode_wkb_batch(blobs)
        ro = np.asarray(gb.ring_offsets, np.int64)
        go = np.asarray(gb.geom_offsets, np.int64)
        total = len(gb.coords)
        m = len(go) - 1
        xi = np.floor(gb.coords[:, 0] * 1e6 + 0.5).astype(np.int64)
        yi = np.floor(gb.coords[:, 1] * 1e6 + 0.5).astype(np.int64)
        is_last = np.zeros(total, bool)
        if total:
            is_last[ro[1:] - 1] = True
        s = np.nonzero(~is_last)[0]
        dx = xi[s + 1] - xi[s]
        dy = yi[s + 1] - yi[s]
        q = np.where(dx >= 0, np.where(dy >= 0, 0, 3),
                     np.where(dy >= 0, 1, 2))
        octant = 2 * q + (np.abs(dy) > np.abs(dx)).astype(np.int64)
        octant[(dx == 0) & (dy == 0)] = 8
        ring_of_seg = np.searchsorted(ro, s, side="right") - 1
        geom_of_ring = np.searchsorted(go, np.arange(len(ro) - 1),
                                       side="right") - 1
        geom_of_seg = geom_of_ring[ring_of_seg]
        n_segs = np.bincount(geom_of_seg, minlength=m).astype(np.int64)
        # a turn: consecutive segments in the SAME ring with different
        # octant classes
        same_ring = np.zeros(len(s), bool)
        if len(s) > 1:
            same_ring[1:] = (ring_of_seg[1:] == ring_of_seg[:-1]) & \
                (s[1:] == s[:-1] + 1)
        turn = np.zeros(len(s), bool)
        if len(s) > 1:
            turn[1:] = same_ring[1:] & (octant[1:] != octant[:-1])
        n_turns = np.bincount(geom_of_seg[turn], minlength=m) \
            .astype(np.int64)
        keep = n_segs > 0
        sel = pa.array(np.nonzero(keep)[0])
        return pa.table({
            "doc_id": b["doc_id"].take(sel),
            "span_idx": pc.cast(b["span_idx"], pa.int64()).take(sel),
            "n_segments": pa.array(n_segs[keep], pa.int64()),
            "n_turns": pa.array(n_turns[keep], pa.int64()),
        })

    return lines.map_batches(turns, batch_format="pyarrow")


QUERIES_GEO2 = {
    "kde_heatmap": q_kde_heatmap,
    "path_turn_count": q_path_turn_count,
    "convex_hull": q_convex_hull,
    "segment_octants": q_segment_octants,
    "contour_cells": q_contour_cells,
    "bbox_overlap_area": q_bbox_overlap_area,
}


def _oracle_sql_geo2() -> dict[str, str]:
    from .queries import _BBOX_CTE, _GEOMS, _TILE_XY, _TILE_Y

    hi = (1 << KDE_Z) - 1
    kde_cte = _BBOX_CTE + f"""
, zz AS (SELECT {KDE_Z} AS z)
, pts AS (
  SELECT """ + _TILE_XY.format(lon="g.bbox_minx") + """ AS cx,
         """ + _TILE_Y.format(lat="g.bbox_miny") + f""" AS cy
  FROM g CROSS JOIN zz WHERE g.geom_type = 1
)
, offs AS (
  SELECT dx.dx, dy.dy,
         (1000000 * ({KDE_D2MAX} - (dx.dx*dx.dx + dy.dy*dy.dy)))
           // {KDE_D2MAX} AS w
  FROM (SELECT UNNEST(generate_series(-{KDE_R}, {KDE_R})) AS dx) dx
  CROSS JOIN (SELECT UNNEST(generate_series(-{KDE_R}, {KDE_R})) AS dy) dy
  WHERE dx.dx*dx.dx + dy.dy*dy.dy <= {KDE_R * KDE_R}
)
, kde AS (
  SELECT CAST(pts.cx + offs.dx AS BIGINT) AS x,
         CAST(pts.cy + offs.dy AS BIGINT) AS y,
         CAST(SUM(offs.w) AS BIGINT) AS density_ppm
  FROM pts CROSS JOIN offs
  WHERE pts.cx + offs.dx BETWEEN 0 AND {hi}
    AND pts.cy + offs.dy BETWEEN 0 AND {hi}
  GROUP BY 1, 2
)
"""
    kde_sql = kde_cte + "SELECT x, y, density_ppm FROM kde"

    contour_sql = kde_cte + f"""
, inside AS (SELECT x, y FROM kde WHERE density_ppm >= {CONTOUR_T})
, corners AS (
  SELECT inside.x - o.dx AS nx, inside.y - o.dy AS ny, o.bit
  FROM inside
  CROSS JOIN (VALUES (0, 0, 1), (1, 0, 2), (0, 1, 4), (1, 1, 8))
       AS o(dx, dy, bit)
  WHERE inside.x - o.dx BETWEEN 0 AND {hi - 1}
    AND inside.y - o.dy BETWEEN 0 AND {hi - 1}
)
, cases AS (SELECT nx, ny, SUM(bit) AS cs FROM corners GROUP BY 1, 2)
SELECT CAST(cs AS BIGINT) AS case_id, CAST(COUNT(*) AS BIGINT) AS n_cells
FROM cases GROUP BY cs"""

    overlap_sql = f"""
WITH gb AS (
  SELECT layer,
         CAST(FLOOR(list_aggregate(xs, 'min') * 1000000 + 0.5) AS BIGINT)
           AS mnx,
         CAST(FLOOR(list_aggregate(ys, 'min') * 1000000 + 0.5) AS BIGINT)
           AS mny,
         CAST(FLOOR(list_aggregate(xs, 'max') * 1000000 + 0.5) AS BIGINT)
           AS mxx,
         CAST(FLOOR(list_aggregate(ys, 'max') * 1000000 + 0.5) AS BIGINT)
           AS mxy
  FROM {_GEOMS}
)
SELECT a.layer AS layer_a, b.layer AS layer_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM((LEAST(a.mxx, b.mxx) - GREATEST(a.mnx, b.mnx))
                * (LEAST(a.mxy, b.mxy) - GREATEST(a.mny, b.mny)))
            AS BIGINT) AS area_sum
FROM gb a JOIN gb b
  ON a.layer < b.layer
 AND LEAST(a.mxx, b.mxx) > GREATEST(a.mnx, b.mnx)
 AND LEAST(a.mxy, b.mxy) > GREATEST(a.mny, b.mny)
GROUP BY 1, 2"""

    octants_sql = f"""
WITH lb AS (
  SELECT doc_id, span_idx, layer, xs, ys FROM {_GEOMS} WHERE geom_type = 2
),
verts AS (
  SELECT doc_id, span_idx, layer,
         CAST(FLOOR(UNNEST(xs) * 1000000 + 0.5) AS BIGINT) AS xi,
         CAST(FLOOR(UNNEST(ys) * 1000000 + 0.5) AS BIGINT) AS yi,
         UNNEST(generate_series(1, len(xs))) AS pos
  FROM lb
),
segs AS (
  SELECT v.layer, w.xi - v.xi AS dx, w.yi - v.yi AS dy
  FROM verts v
  JOIN verts w ON w.doc_id = v.doc_id AND w.span_idx = v.span_idx
              AND w.pos = v.pos + 1
),
cls AS (
  SELECT layer,
         CASE WHEN dx = 0 AND dy = 0 THEN 8
              ELSE 2 * (CASE WHEN dx >= 0 AND dy >= 0 THEN 0
                             WHEN dx < 0 AND dy >= 0 THEN 1
                             WHEN dx < 0 AND dy < 0 THEN 2
                             ELSE 3 END)
                   + (CASE WHEN ABS(dy) > ABS(dx) THEN 1 ELSE 0 END)
         END AS octant
  FROM segs
)
SELECT layer, CAST(octant AS BIGINT) AS octant,
       CAST(COUNT(*) AS BIGINT) AS n_segments
FROM cls GROUP BY layer, octant"""

    turn_sql = f"""
WITH lb AS (
  SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx, xs, ys
  FROM {_GEOMS} WHERE geom_type = 2
),
verts AS (
  SELECT doc_id, span_idx,
         CAST(FLOOR(UNNEST(xs) * 1000000 + 0.5) AS BIGINT) AS xi,
         CAST(FLOOR(UNNEST(ys) * 1000000 + 0.5) AS BIGINT) AS yi,
         UNNEST(generate_series(1, len(xs))) AS pos
  FROM lb
),
segs AS (
  SELECT v.doc_id, v.span_idx, v.pos,
         w.xi - v.xi AS dx, w.yi - v.yi AS dy
  FROM verts v
  JOIN verts w ON w.doc_id = v.doc_id AND w.span_idx = v.span_idx
              AND w.pos = v.pos + 1
),
cls AS (
  SELECT doc_id, span_idx, pos,
         CASE WHEN dx = 0 AND dy = 0 THEN 8
              ELSE 2 * (CASE WHEN dx >= 0 AND dy >= 0 THEN 0
                             WHEN dx < 0 AND dy >= 0 THEN 1
                             WHEN dx < 0 AND dy < 0 THEN 2
                             ELSE 3 END)
                   + (CASE WHEN ABS(dy) > ABS(dx) THEN 1 ELSE 0 END)
         END AS octant
  FROM segs
),
lagd AS (
  SELECT doc_id, span_idx, octant,
         LAG(octant) OVER (PARTITION BY doc_id, span_idx
                           ORDER BY pos) AS prev
  FROM cls
)
SELECT doc_id, span_idx,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(COUNT(*) FILTER (prev IS NOT NULL AND octant <> prev)
            AS BIGINT) AS n_turns
FROM lagd GROUP BY doc_id, span_idx"""

    return {
        "kde_heatmap": kde_sql,
        "path_turn_count": turn_sql,
        "segment_octants": octants_sql,
        "contour_cells": contour_sql,
        "bbox_overlap_area": overlap_sql,
        "convex_hull":
            "SELECT * FROM read_parquet('/tmp/graft_expected/convex_hull.parquet')",
    }
