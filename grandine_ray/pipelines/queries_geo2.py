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


def q_kde_heatmap(sf_dir: str):
    """Epanechnikov kernel-density heatmap of the point features on the
    zoom-6 tile grid. Each point splats an integer-ppm weight onto the
    ≤13 grid cells within 2 cells of its own cell; per-block partial
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

    agg = pts.map_batches(splat, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("w", alias_name="w"))

    def unpack(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        return pa.table({
            "x": pa.array(k >> 32, pa.int64()),
            "y": pa.array(k & 0xFFFFFFFF, pa.int64()),
            "density_ppm": pc.cast(b["w"], pa.int64()),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


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


def q_convex_hull(sf_dir: str):
    """Per-layer strict convex hull of every geometry vertex: hull
    vertex count + exact |2·area| in micro-deg² (integer shoelace).
    Mergeable-aggregate shape: block partials emit only their local
    hull vertices; the per-layer reduce re-hulls the union."""
    from .queries import _features_ds

    feats = _features_ds(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
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

    return feats.map_batches(partial, batch_format="pyarrow") \
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


QUERIES_GEO2 = {
    "kde_heatmap": q_kde_heatmap,
    "convex_hull": q_convex_hull,
    "segment_octants": q_segment_octants,
}


def _oracle_sql_geo2() -> dict[str, str]:
    from .queries import _BBOX_CTE, _GEOMS, _TILE_XY, _TILE_Y

    hi = (1 << KDE_Z) - 1
    kde_sql = _BBOX_CTE + f"""
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
SELECT CAST(pts.cx + offs.dx AS BIGINT) AS x,
       CAST(pts.cy + offs.dy AS BIGINT) AS y,
       CAST(SUM(offs.w) AS BIGINT) AS density_ppm
FROM pts CROSS JOIN offs
WHERE pts.cx + offs.dx BETWEEN 0 AND {hi}
  AND pts.cy + offs.dy BETWEEN 0 AND {hi}
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

    return {
        "kde_heatmap": kde_sql,
        "segment_octants": octants_sql,
        "convex_hull":
            "SELECT * FROM read_parquet('/tmp/graft_expected/convex_hull.parquet')",
    }
