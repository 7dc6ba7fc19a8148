"""Round-4 geospatial extension #3: diameters, overlay crossings,
link prediction.

Three operators rounding out the spatial-analytics family:

* ``layer_diameter`` — per-layer farthest vertex pair (squared
  micro-degree distance, exact int64). The farthest pair of a point
  set is always a pair of convex-hull vertices, so this reuses the
  MERGEABLE hull partial from queries_geo2 (hull-of-hulls): each block
  ships only its local hull, the per-layer reduce re-hulls the union
  and brute-forces the O(h²) pairs on the tiny final hull. Oracle: an
  independent chunked all-pairs scan in oracle/expected.py.
* ``segment_crossings`` — cross-layer line-segment intersection census
  (the counting core of a map overlay / conflation stage). Segments
  fan out to the fixed CROSS_CELL µdeg grid cells their bbox covers;
  a hash-partitioned per-cell kernel tests all cross-layer candidate
  pairs with EXACT int64 orientation predicates (touching and
  collinear-overlap count as crossings); each intersecting pair is
  counted exactly once with zero dedup shuffle via canonical-cell
  ownership: only the cell containing the min-corner of the two
  bboxes' intersection reports the pair (that corner lies in both
  bboxes, so both segments were fanned to it). Oracle: independent
  bbox-sweep brute force in oracle/expected.py.
* ``common_neighbors`` — link-prediction census on the occupied-tile
  8-adjacency graph at SMOOTH_Z: for every pair of occupied tiles
  sharing ≥1 common occupied neighbor, the number of shared neighbors
  (1..8) crossed with whether the pair is itself adjacent — the
  common-neighbors score histogram (the baseline edge predictor).
  Fully distributed: occupied-cell groupby → 8-way fan-out
  (center=neighbor, member=cell) → hash-partitioned within-center
  pair expansion (≤ C(8,2)=28 pairs per center) → pair-count groupby
  → tiny histogram. Oracle: DuckDB adjacency self-joins on the same
  parity-proven tile math.

Reference parity notes: vertices come from the engine's own WKB
decode (lib/spatial geometry semantics); tile addressing reuses the
parity-proven xyz math (lib/tile/tile.go:37-49 semantics).
"""
from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geom import wkb as wkbmod
from ..index.xyz import tile_xy
from .queries_geo2 import hull_int, hull_partial
from .queries_ml import SMOOTH_Z

# ------------------------------------------------------------ layer_diameter


def q_layer_diameter(sf_dir: str):
    """Per-layer farthest vertex pair: exact squared distance in
    micro-deg² (int64; |dx| ≤ 3.6e8 ⇒ dx²+dy² ≤ 2.6e17 < 2⁶³) plus its
    integer square root. Planar micro-degree metric by contract (the
    extent diameter of the layer's bounding shape, not a geodesic —
    documented divergence from the haversine family)."""
    from .queries import _features_ds

    feats = _features_ds(sf_dir)

    def finish(t: pa.Table) -> pa.Table:
        pts = np.column_stack([
            t["hx"].to_numpy(zero_copy_only=False),
            t["hy"].to_numpy(zero_copy_only=False)])
        h = hull_int(pts)
        if len(h) >= 2:
            dx = h[:, 0][:, None] - h[:, 0][None, :]
            dy = h[:, 1][:, None] - h[:, 1][None, :]
            diam2 = int((dx * dx + dy * dy).max())
        else:
            diam2 = 0
        return pa.table({
            "layer": pa.array([t["layer"][0].as_py()], pa.string()),
            "diam2_udeg2": pa.array([diam2], pa.int64()),
            "diam_udeg": pa.array([math.isqrt(diam2)], pa.int64()),
        })

    return feats.map_batches(hull_partial, batch_format="pyarrow") \
        .groupby("layer").map_groups(finish, batch_format="pyarrow")


# --------------------------------------------------------- segment_crossings

CROSS_CELL = 125_000      # grid pitch in µdeg (0.125°)
CROSS_FAN_CAP = 8192      # max grid cells one segment's bbox may cover
_CX_OFF, _CY_OFF = 1441, 681          # shift world cells non-negative
_CK_YBITS = 11                        # cy+681 ≤ 1361 < 2^11


def _pair_indices(sorted_codes: np.ndarray):
    """All a<b index pairs within runs of equal values in a SORTED
    int array, fully vectorized (the numeric twin of
    queries_cstats.pairs_within_groups). Returns (left, right) row
    index arrays into the sorted order."""
    n = len(sorted_codes)
    if n == 0:
        return (np.empty(0, np.int64),) * 2
    new = np.ones(n, bool)
    new[1:] = sorted_codes[1:] != sorted_codes[:-1]
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


def segments_intersect_int(ax, ay, bx, by, cx, cy, dx, dy):
    """Vectorized EXACT segment-intersection predicate on int64
    micro-degree endpoints (proper crossings, endpoint touches, and
    collinear overlaps all count). Orientation cross products stay
    below 2⁵⁷ for world-range µdeg coordinates."""
    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    def onseg(px, py, qx, qy, rx, ry):
        return ((np.minimum(px, qx) <= rx) & (rx <= np.maximum(px, qx))
                & (np.minimum(py, qy) <= ry) & (ry <= np.maximum(py, qy)))

    d1 = orient(cx, cy, dx, dy, ax, ay)
    d2 = orient(cx, cy, dx, dy, bx, by)
    d3 = orient(ax, ay, bx, by, cx, cy)
    d4 = orient(ax, ay, bx, by, dx, dy)
    proper = ((((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0)))
              & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))))
    touch = (((d1 == 0) & onseg(cx, cy, dx, dy, ax, ay))
             | ((d2 == 0) & onseg(cx, cy, dx, dy, bx, by))
             | ((d3 == 0) & onseg(ax, ay, bx, by, cx, cy))
             | ((d4 == 0) & onseg(ax, ay, bx, by, dx, dy)))
    return proper | touch


def _line_segments_int(b: pa.Table):
    """Decode a linestring-feature block into per-segment int64
    µdeg endpoint arrays + the segment's layer (object array)."""
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
    ring_of_seg = np.searchsorted(ro, s, side="right") - 1
    geom_of_ring = np.searchsorted(go, np.arange(len(ro) - 1),
                                   side="right") - 1
    geom_of_seg = geom_of_ring[ring_of_seg]
    layer = b["layer"]
    if isinstance(layer, pa.ChunkedArray):
        layer = layer.combine_chunks()
    lay = np.asarray(layer.to_pylist(), dtype=object)[geom_of_seg]
    return xi[s], yi[s], xi[s + 1], yi[s + 1], lay


def q_segment_crossings(sf_dir: str):
    """Cross-layer segment intersection census: for every layer pair
    (a < b), the number of unordered linestring-segment pairs — one
    segment per layer — whose segments intersect (touch / collinear
    overlap included; exact int64 predicates). Scale shape: the
    fan-out is bounded by bbox cell coverage (loud CROSS_FAN_CAP
    guard for degenerate whale segments), the per-cell kernel is
    O(k²) in cell occupancy k (pitch CROSS_CELL chosen ≈ p99 segment
    extent so k stays small; a persistent hot cell is a salting
    candidate, documented), and canonical-cell ownership removes the
    dedup exchange entirely."""
    from ray.data.aggregate import Sum

    from .queries import _features_ds
    from .queries_cstats import pairs_within_groups  # noqa: F401 (spec twin)

    lines = _features_ds(sf_dir).filter(expr="geom_type == 2")

    def fan(b: pa.Table) -> pa.Table:
        ax, ay, bx, by, lay = _line_segments_int(b)
        mnx, mxx = np.minimum(ax, bx), np.maximum(ax, bx)
        mny, mxy = np.minimum(ay, by), np.maximum(ay, by)
        cx0 = np.floor_divide(mnx, CROSS_CELL)
        cx1 = np.floor_divide(mxx, CROSS_CELL)
        cy0 = np.floor_divide(mny, CROSS_CELL)
        cy1 = np.floor_divide(mxy, CROSS_CELL)
        ncx, ncy = cx1 - cx0 + 1, cy1 - cy0 + 1
        ncell = ncx * ncy
        if len(ncell) and int(ncell.max()) > CROSS_FAN_CAP:
            raise ValueError(
                "segment_crossings: a segment bbox covers "
                f"{int(ncell.max())} grid cells (> {CROSS_FAN_CAP}); "
                "raise CROSS_CELL for this corpus")
        rep = np.repeat(np.arange(len(ax), dtype=np.int64), ncell)
        offs = np.cumsum(ncell) - ncell
        within = np.arange(int(ncell.sum()), dtype=np.int64) \
            - np.repeat(offs, ncell)
        ncy_r = np.repeat(ncy, ncell)
        cxs = np.repeat(cx0, ncell) + within // ncy_r + _CX_OFF
        cys = np.repeat(cy0, ncell) + within % ncy_r + _CY_OFF
        ck = (cxs << _CK_YBITS) | cys
        return pa.table({
            "ck": pa.array(ck, pa.int64()),
            "_part": pa.array((ck * 0x9E3779B1) % 32, pa.int64()),
            "ax": pa.array(ax[rep], pa.int64()),
            "ay": pa.array(ay[rep], pa.int64()),
            "bx": pa.array(bx[rep], pa.int64()),
            "by": pa.array(by[rep], pa.int64()),
            "layer": pa.array(lay[rep].tolist(), pa.string()),
        })

    def cell_kernel(t: pa.Table) -> pa.Table:
        ck = t["ck"].to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        ck = ck[order]
        cols = {c: t[c].to_numpy(zero_copy_only=False)[order]
                for c in ("ax", "ay", "bx", "by")}
        lay = np.asarray(t["layer"].to_pylist(), dtype=object)[order]
        li, ri = _pair_indices(ck)
        if not len(li):
            return pa.table({"pair": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        cross = lay[li] != lay[ri]
        li, ri = li[cross], ri[cross]
        ax, ay = cols["ax"][li], cols["ay"][li]
        bx, by = cols["bx"][li], cols["by"][li]
        cx, cy = cols["ax"][ri], cols["ay"][ri]
        dx, dy = cols["bx"][ri], cols["by"][ri]
        # canonical-cell ownership: min corner of the bbox intersection
        ix = np.maximum(np.minimum(ax, bx), np.minimum(cx, dx))
        iy = np.maximum(np.minimum(ay, by), np.minimum(cy, dy))
        own_ck = ((np.floor_divide(ix, CROSS_CELL) + _CX_OFF)
                  << _CK_YBITS) \
            | (np.floor_divide(iy, CROSS_CELL) + _CY_OFF)
        hit = (own_ck == ck[li]) \
            & segments_intersect_int(ax, ay, bx, by, cx, cy, dx, dy)
        la, lb = lay[li[hit]], lay[ri[hit]]
        swap = la > lb
        la2 = np.where(swap, lb, la)
        lb2 = np.where(swap, la, lb)
        fused = np.char.add(np.char.add(la2.astype(str), "\x1f"),
                            lb2.astype(str))
        uk, counts = np.unique(fused, return_counts=True)
        return pa.table({
            "pair": pa.array(uk.tolist(), pa.string()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })

    agg = lines.map_batches(fan, batch_format="pyarrow") \
        .groupby("_part").map_groups(cell_kernel, batch_format="pyarrow") \
        .groupby("pair").aggregate(Sum("n", alias_name="n_crossings"))

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["pair"], "\x1f")
        return pa.table({
            "layer_a": pc.list_element(parts, 0),
            "layer_b": pc.list_element(parts, 1),
            "n_crossings": pc.cast(b["n_crossings"], pa.int64()),
        })

    return agg.map_batches(split, batch_format="pyarrow")


# ---------------------------------------------------------- common_neighbors


def q_common_neighbors(sf_dir: str):
    """Common-neighbors link-prediction census on the occupied-tile
    8-adjacency graph at SMOOTH_Z: (n_common ∈ 1..8, adjacent ∈ 0/1)
    → number of unordered occupied-tile pairs. Pairs sharing a
    common neighbor but not yet adjacent are the predicted links;
    the histogram is the score distribution. Every stage's exchange
    is bounded by the occupied-cell domain (8-way fan-out, ≤28 pairs
    per center)."""
    from ray.data.aggregate import Sum

    from .queries import _features_ds

    z = SMOOTH_Z
    hi = (1 << z) - 1
    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")

    def cells(b: pa.Table) -> pa.Table:
        lon = b["bbox_minx"].to_numpy(zero_copy_only=False)
        lat = b["bbox_miny"].to_numpy(zero_copy_only=False)
        x, y = tile_xy(lon, lat, z)
        k = (x.astype(np.int64) << z) | y.astype(np.int64)
        return pa.table({"k": pa.array(np.unique(k), pa.int64()),
                         "one": pa.array(
                             np.ones(len(np.unique(k)), np.int64),
                             pa.int64())})

    occ = pts.map_batches(cells, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("one", alias_name="one"))

    offs = np.array([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                     if (dx, dy) != (0, 0)], np.int64)

    def fan(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        x, y = k >> z, k & hi
        nx = (x[:, None] + offs[:, 0][None, :]).ravel()
        ny = (y[:, None] + offs[:, 1][None, :]).ravel()
        member = np.repeat(k, 8)
        okm = (nx >= 0) & (nx <= hi) & (ny >= 0) & (ny <= hi)
        center = (nx[okm] << z) | ny[okm]
        # a shared neighbor only counts if that tile is itself
        # occupied: each cell also ships one occupancy-marker row
        # (flag=1) so the kernel can drop unoccupied centers without
        # a join.
        center = np.concatenate([center, k])
        memb = np.concatenate([member[okm], k])
        flag = np.zeros(len(center), np.int64)
        flag[len(center) - len(k):] = 1
        return pa.table({
            "center": pa.array(center, pa.int64()),
            "member": pa.array(memb, pa.int64()),
            "flag": pa.array(flag, pa.int64()),
            "_part": pa.array((center * 0x9E3779B1) % 32, pa.int64()),
        })

    def pair_kernel(t: pa.Table) -> pa.Table:
        c = t["center"].to_numpy(zero_copy_only=False)
        m = t["member"].to_numpy(zero_copy_only=False)
        flag = t["flag"].to_numpy(zero_copy_only=False)
        occ_centers = c[flag == 1]
        keep = flag == 0
        hitc = np.isin(c[keep], occ_centers)
        c = c[keep][hitc]
        m = m[keep][hitc]
        order = np.lexsort((m, c))
        c, m = c[order], m[order]
        li, ri = _pair_indices(c)
        pk = (m[li] << (2 * z)) | m[ri]     # m[li] < m[ri] within a run
        uk, counts = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(uk, pa.int64()),
                         "n": pa.array(counts.astype(np.int64),
                                       pa.int64())})

    cn = occ.map_batches(fan, batch_format="pyarrow") \
        .groupby("_part").map_groups(pair_kernel, batch_format="pyarrow") \
        .groupby("pk").aggregate(Sum("n", alias_name="c"))

    def hist_partial(b: pa.Table) -> pa.Table:
        pk = b["pk"].to_numpy(zero_copy_only=False)
        cc = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        a, bb = pk >> (2 * z), pk & ((1 << (2 * z)) - 1)
        axc, ayc = a >> z, a & hi
        bxc, byc = bb >> z, bb & hi
        adj = (np.maximum(np.abs(axc - bxc), np.abs(ayc - byc)) == 1) \
            .astype(np.int64)
        hk = cc * 2 + adj
        uk, counts = np.unique(hk, return_counts=True)
        return pa.table({"hk": pa.array(uk, pa.int64()),
                         "n": pa.array(counts.astype(np.int64),
                                       pa.int64())})

    hist = cn.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("hk").aggregate(Sum("n", alias_name="n_pairs"))

    def unpack(b: pa.Table) -> pa.Table:
        hk = b["hk"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_common": pa.array(hk >> 1, pa.int64()),
            "adjacent": pa.array(hk & 1, pa.int64()),
            "n_pairs": pc.cast(b["n_pairs"], pa.int64()),
        })

    return hist.map_batches(unpack, batch_format="pyarrow")


QUERIES_GEO3 = {
    "layer_diameter": q_layer_diameter,
    "segment_crossings": q_segment_crossings,
    "common_neighbors": q_common_neighbors,
}


def _oracle_sql_geo3() -> dict[str, str]:
    from .queries import _TILE_XY, _TILE_Y, _BBOX_CTE

    cn_sql = _BBOX_CTE + f"""
, zz AS (SELECT {SMOOTH_Z} AS z)
, occ AS (
  SELECT DISTINCT
         """ + _TILE_XY.format(lon="g.bbox_minx") + """ AS x,
         """ + _TILE_Y.format(lat="g.bbox_miny") + """ AS y
  FROM g CROSS JOIN zz WHERE g.geom_type = 1
)
, nbrs AS (
  SELECT c.x AS cx, c.y AS cy, m.x AS mx, m.y AS my
  FROM occ c JOIN occ m
    ON GREATEST(ABS(c.x - m.x), ABS(c.y - m.y)) = 1
)
, pairs AS (
  SELECT n1.mx AS ax, n1.my AS ay, n2.mx AS bx, n2.my AS by,
         COUNT(*) AS c
  FROM nbrs n1 JOIN nbrs n2
    ON n1.cx = n2.cx AND n1.cy = n2.cy
   AND (n1.mx * 10000000 + n1.my) < (n2.mx * 10000000 + n2.my)
  GROUP BY 1, 2, 3, 4
)
SELECT CAST(c AS BIGINT) AS n_common,
       CAST(CASE WHEN GREATEST(ABS(ax - bx), ABS(ay - by)) = 1
            THEN 1 ELSE 0 END AS BIGINT) AS adjacent,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1, 2"""

    return {
        "common_neighbors": cn_sql,
        "layer_diameter":
            "SELECT * FROM read_parquet("
            "'/tmp/graft_expected/layer_diameter.parquet')",
        "segment_crossings":
            "SELECT * FROM read_parquet("
            "'/tmp/graft_expected/segment_crossings.parquet')",
    }
