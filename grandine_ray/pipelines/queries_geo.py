"""Round-3 geospatial extension: tile pyramid rollup.

The aggregation pyramid every tile heatmap needs: counts at a base zoom
roll up to all ancestor tiles by integer coordinate halving (x >> d,
y >> d — exact, no float tile math in the rollup itself). One
vectorized fan-out (base row → Z+1 ancestor rows) feeds fused-key
partial counts, so the shuffle carries the tile-domain aggregate; at a
deeper base zoom the fan-out stays Z+1 rows per base assignment and the
groupby output is bounded by the occupied-tile count per level (a
quadtree: ≤ 4× the base level, summed ≈ 4/3 of it).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ROLLUP_BASE_Z = 6


def q_tile_rollup(sf_dir: str):
    """Feature-assignment counts per tile at EVERY zoom 0..6, derived by
    rolling the base-zoom coverage up the pyramid (parent = coords >> 1
    per level). Matches tile_counts at z=6 by construction; ancestors
    count each base assignment once."""
    from ray.data.aggregate import Sum

    from ..index import xyz
    from ..stages.coverage import make_coverage_fn
    from .queries import _features_ds

    Z = ROLLUP_BASE_Z
    tiled = _features_ds(sf_dir).map_batches(
        make_coverage_fn([Z]), batch_format="pyarrow")

    def ancestors(b: pa.Table) -> pa.Table:
        _, x, y = xyz.tile_key_unpack(
            b["tile_key"].to_numpy(zero_copy_only=False))
        n = len(x)
        d = np.tile(np.arange(Z + 1, dtype=np.int64), n)  # Z-k shifts
        xr = np.repeat(x, Z + 1) >> d
        yr = np.repeat(y, Z + 1) >> d
        zr = Z - d
        key = xyz.tile_key(zr, xr, yr).view(np.int64)  # z ≤ 6 ⇒ < 2^62
        keys, counts = np.unique(key, return_counts=True)
        return pa.table({
            "k": pa.array(keys, pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })

    agg = tiled.map_batches(ancestors, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n", alias_name="n"))

    def unpack(b: pa.Table) -> pa.Table:
        z, x, y = xyz.tile_key_unpack(
            b["k"].to_numpy(zero_copy_only=False).view(np.uint64))
        return pa.table({
            "z": pa.array(z, pa.int64()),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
            "n": pc.cast(b["n"], pa.int64()),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


def q_layer_tile_overlap(sf_dir: str):
    """Spatial joinability profile: for every layer pair, how many
    base-zoom tiles BOTH layers occupy (the overlap/coverage signal a
    multi-source spatial catalog uses to rank joinable datasets — the
    tile grid is the common quantization). Stage 1 dedups (layer, tile)
    per block then globally (the shuffle is the occupied-tile domain);
    stage 2 hash-partitions tiles and expands each tile's layer pairs
    with the vectorized pairs_within_groups kernel (C(L,2) per tile, no
    per-tile Python call — occupied tiles are unbounded at scale);
    stage 3 sums. The same shape as the corpus source_overlap — one is
    vocabulary overlap, this is grid overlap."""
    from ray.data.aggregate import Sum

    from ..stages.coverage import make_coverage_fn
    from .queries import _features_ds

    Z = ROLLUP_BASE_Z
    tiled = _features_ds(sf_dir).map_batches(
        make_coverage_fn([Z]), batch_format="pyarrow")

    def lt_partial(b: pa.Table) -> pa.Table:
        key = b["tile_key"].to_numpy(zero_copy_only=False).view(np.int64)
        layer = b["layer"]
        if isinstance(layer, pa.ChunkedArray):
            layer = layer.combine_chunks()
        fused = pc.binary_join_element_wise(
            layer, pa.array(key.astype("U"), pa.string()), "\x1f")
        uniq = pc.unique(fused)
        return pa.table({"lt": uniq,
                         "one": pa.array(np.ones(len(uniq), np.int64),
                                         pa.int64())})

    lt = tiled.map_batches(lt_partial, batch_format="pyarrow") \
        .groupby("lt").aggregate(Sum("one", alias_name="one"))

    def to_rows(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["lt"], "\x1f")
        return pa.table({"layer": pc.list_element(parts, 0),
                         "tile": pc.list_element(parts, 1)})

    from .queries_cstats import _crc_part, pairs_within_groups

    def addpart(b: pa.Table) -> pa.Table:
        return b.append_column("_part", _crc_part(b["tile"], 32))

    pr = lt.map_batches(to_rows, batch_format="pyarrow") \
        .map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(
            lambda t: pairs_within_groups(t, "tile", "layer"),
            batch_format="pyarrow") \
        .groupby("pair").aggregate(Sum("n", alias_name="n_shared_tiles"))

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["pair"], "\x1f")
        return pa.table({
            "layer_a": pc.list_element(parts, 0),
            "layer_b": pc.list_element(parts, 1),
            "n_shared_tiles": pc.cast(b["n_shared_tiles"], pa.int64()),
        })

    return pr.map_batches(split, batch_format="pyarrow")


def q_layer_tile_jaccard(sf_dir: str):
    """Layer joinability score: Jaccard similarity of every layer
    pair's occupied base-zoom tile SETS, in exact ppm
    (|A∩B|·1e6 // (|A|+|B|−|A∩B|)) — the normalized version of
    layer_tile_overlap a spatial catalog actually ranks by.
    Composition: the same (layer, tile) dedup + pair expansion, plus a
    per-layer tile count that is layer-domain sized and broadcast into
    the final ratio map (layers are bounded; tiles are not)."""
    got = q_layer_tile_overlap(sf_dir).take_all()

    from ray.data.aggregate import Sum

    from ..stages.coverage import make_coverage_fn
    from .queries import _features_ds

    Z = ROLLUP_BASE_Z

    def lt_partial(b: pa.Table) -> pa.Table:
        key = b["tile_key"].to_numpy(zero_copy_only=False).view(np.int64)
        layer = b["layer"]
        if isinstance(layer, pa.ChunkedArray):
            layer = layer.combine_chunks()
        fused = pc.binary_join_element_wise(
            layer, pa.array(key.astype("U"), pa.string()), "\x1f")
        uniq = pc.unique(fused)
        return pa.table({"lt": uniq,
                         "one": pa.array(np.ones(len(uniq), np.int64),
                                         pa.int64())})

    def to_layer(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["lt"], "\x1f")
        lay = pc.list_element(parts, 0)
        if isinstance(lay, pa.ChunkedArray):
            lay = lay.combine_chunks()
        enc = pc.dictionary_encode(lay)
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "layer": enc.dictionary,
            "n": pa.array(np.bincount(codes,
                                      minlength=len(enc.dictionary))
                          .astype(np.int64), pa.int64()),
        })

    per_layer = {
        r["layer"]: r["n"]
        for r in _features_ds(sf_dir).map_batches(
            make_coverage_fn([Z]), batch_format="pyarrow")
        .map_batches(lt_partial, batch_format="pyarrow")
        .groupby("lt").aggregate(Sum("one", alias_name="one"))
        .map_batches(to_layer, batch_format="pyarrow")
        .groupby("layer").aggregate(Sum("n", alias_name="n"))
        .take_all()}
    la, lb, inter, jac = [], [], [], []
    for r in sorted(got, key=lambda r: (r["layer_a"], r["layer_b"])):
        a, b, i = r["layer_a"], r["layer_b"], r["n_shared_tiles"]
        union = per_layer[a] + per_layer[b] - i
        la.append(a)
        lb.append(b)
        inter.append(i)
        jac.append(i * 1_000_000 // union)
    return pa.table({
        "layer_a": pa.array(la, pa.string()),
        "layer_b": pa.array(lb, pa.string()),
        "n_shared_tiles": pa.array(inter, pa.int64()),
        "jaccard_ppm": pa.array(jac, pa.int64()),
    })


def q_layer_contact(sf_dir: str):
    """Cross-layer contact surface: for every ORDERED layer pair
    (A, B), how many of A's occupied base-zoom tiles have at least one
    B-occupied tile in their 3×3 neighborhood (self cell included) —
    the raster boundary-adjacency statistic ('how much of the building
    layer touches water'). Distributed shape: the (layer, tile)
    distinct domain fans out 9 influence cells per (B, tile), dedups,
    and one tile-hash-partitioned join against the same domain counts
    (A-tile, B) hits — both sides are the occupied-tile domain, the
    corpus never moves twice."""
    from ray.data.aggregate import Sum

    from ..index import xyz
    from ..stages.coverage import make_coverage_fn
    from .queries import _features_ds

    Z = ROLLUP_BASE_Z
    tiled = _features_ds(sf_dir).map_batches(
        make_coverage_fn([Z]), batch_format="pyarrow")

    def lt_partial(b: pa.Table) -> pa.Table:
        key = b["tile_key"].to_numpy(zero_copy_only=False).view(np.int64)
        layer = b["layer"]
        if isinstance(layer, pa.ChunkedArray):
            layer = layer.combine_chunks()
        fused = pc.binary_join_element_wise(
            layer, pa.array(key.astype("U"), pa.string()), "\x1f")
        uniq = pc.unique(fused)
        return pa.table({"lt": uniq,
                         "one": pa.array(np.ones(len(uniq), np.int64),
                                         pa.int64())})

    lt = tiled.map_batches(lt_partial, batch_format="pyarrow") \
        .groupby("lt").aggregate(Sum("one", alias_name="one"))

    def expand(b: pa.Table) -> pa.Table:
        """Each (layer, tile) row → 1 'own' row at its cell + 9
        'influence' rows over the neighborhood (shifted +1 to stay
        non-negative at grid edges)."""
        parts = pc.split_pattern(b["lt"], "\x1f")
        lay = pc.list_element(parts, 0)
        if isinstance(lay, pa.ChunkedArray):
            lay = lay.combine_chunks()
        key = np.asarray(
            _col(pc.list_element(parts, 1)).to_pylist(), "U") \
            .astype(np.int64)
        _, x, y = xyz.tile_key_unpack(key.view(np.uint64))
        n = len(key)
        ks, sides = [], []
        own = ((x + 1) << 32) | (y + 1)
        ks.append(own)
        sides.append(np.zeros(n, np.int8))
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                ks.append(((x + dx) << 32) | (y + dy))
                sides.append(np.ones(n, np.int8))
        rep = pa.array(np.tile(np.arange(n), 10))
        return pa.table({
            "cell": pa.array(np.concatenate(ks), pa.int64()),
            "side": pa.array(np.concatenate(sides), pa.int8()),
            "layer": pa.concat_arrays([lay] + [lay.take(
                pa.array(np.arange(n)))] * 9),
        })

    def addpart(b: pa.Table) -> pa.Table:
        c = b["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = ((c * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(48)) \
            % np.uint64(32)
        return b.append_column("_part", pa.array(p.astype(np.int32),
                                                 pa.int32()))

    def contact(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        lay = np.asarray(_col(t["layer"]).to_pylist(), object)
        order = np.lexsort((side, cell))
        cell, side, lay = cell[order], side[order], lay[order]
        starts = np.searchsorted(cell, np.unique(cell), "left")
        bounds = np.append(starts, len(cell))
        cnt: dict = {}
        for s, e in zip(bounds[:-1], bounds[1:]):
            nl = int(np.searchsorted(side[s:e], 1, "left"))
            if nl == 0 or nl == e - s:
                continue
            owns = lay[s:s + nl]
            infl = set(lay[s + nl:e])
            for a in owns:
                for b2 in infl:
                    if a != b2:
                        k = (a, b2)
                        cnt[k] = cnt.get(k, 0) + 1
        items = sorted(cnt.items())
        return pa.table({
            "layer_a": pa.array([a for (a, _), _ in items], pa.string()),
            "layer_b": pa.array([b2 for (_, b2), _ in items],
                                pa.string()),
            "n": pa.array([v for _, v in items], pa.int64()),
        })

    return lt.map_batches(expand, batch_format="pyarrow") \
        .map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(contact, batch_format="pyarrow") \
        .groupby(["layer_a", "layer_b"]) \
        .aggregate(Sum("n", alias_name="n_contact_tiles"))


def q_tile_skew(sf_dir: str):
    """Tile-occupancy skew profile: per zoom level, exact quartiles and
    max of the per-tile feature count — the statistic that DECIDES the
    tiler's hot-cell salting (a p75≪max profile means whale tiles).
    Composition: the coverage fan-out reduces to (z, tile, n) exactly as
    tile_counts, then the value-count histogram quantile path runs with
    z as the group — rows never move twice."""
    from ray.data.aggregate import Sum

    from ..index import xyz
    from ..stages import stats as stats_stage
    from ..stages.coverage import make_coverage_fn
    from .queries import COVERAGE_ZOOMS, _features_ds

    tiled = _features_ds(sf_dir).map_batches(
        make_coverage_fn(COVERAGE_ZOOMS), batch_format="pyarrow")

    def count_keys(b: pa.Table) -> pa.Table:
        keys, counts = np.unique(
            b["tile_key"].to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"tile_key": pa.array(keys.view(np.int64),
                                              pa.int64()),
                         "n": pa.array(counts.astype(np.int64),
                                       pa.int64())})

    per_tile = tiled.map_batches(count_keys, batch_format="pyarrow") \
        .groupby("tile_key").aggregate(Sum("n", alias_name="n"))

    def to_zn(b: pa.Table) -> pa.Table:
        z, _, _ = xyz.tile_key_unpack(
            b["tile_key"].to_numpy(zero_copy_only=False)
            .view(np.uint64))
        # value column must NOT be named "n" — group_quantiles uses
        # "n" for its internal histogram counts
        return pa.table({"z": pa.array(z, pa.int64()),
                         "cnt": pc.cast(b["n"], pa.int64())})

    return stats_stage.group_quantiles(
        per_tile.map_batches(to_zn, batch_format="pyarrow"),
        "z", "cnt", [0.25, 0.5, 0.75, 1.0],
        ["p25_n", "p50_n", "p75_n", "max_n"])


RADIUS_M = 300_000.0
# membership + output are integer millimetres (floor(d·1000 + 0.5)) on BOTH
# engines, per the repo float-parity rule: a single integer boundary instead
# of two float comparisons that could flip on a cross-library ulp. A point
# whose true distance sits within ~0.5 µm of the 300 km boundary could still
# integer-ize differently across math libraries — documented tolerance.
RADIUS_MM = 300_000_000


def q_radius_join(sf_dir: str):
    """Within-radius spatial join: every point feature within 300 km of
    each fixture query point (the range-query sibling of knn_points —
    retrieval by distance THRESHOLD instead of count). Pure streaming:
    the tiny query set broadcasts in the closure and each batch does one
    vectorized Haversine per query, emitting only matches — no shuffle
    at all. At scale the pre-filter is the cell grid (probe only tiles
    intersecting the query circle), the same pruning pip_join uses."""
    from ..geom.ops import haversine_m
    from .queries import KNN_QUERIES, _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")

    def within(b: pa.Table) -> pa.Table:
        px = b["bbox_minx"].to_numpy(zero_copy_only=False)
        py = b["bbox_miny"].to_numpy(zero_copy_only=False)
        out_q, out_d, out_s, out_m = [], [], [], []
        for qid, qx, qy in KNN_QUERIES:
            d = haversine_m(np.full(len(px), qx),
                            np.full(len(px), qy), px, py)
            mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
            sel = np.nonzero(mm <= RADIUS_MM)[0]
            out_q.extend([qid] * len(sel))
            out_d.append(b["doc_id"].take(pa.array(sel)))
            out_s.append(pc.cast(b["span_idx"].take(pa.array(sel)),
                                 pa.int64()))
            out_m.extend(mm[sel].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.string()),
            "doc_id": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in out_d]) if out_d else
            pa.array([], pa.string()),
            "span_idx": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in out_s]) if out_s else
            pa.array([], pa.int64()),
            "dist_mm": pa.array(out_m, pa.int64()),
        })

    return pts.map_batches(within, batch_format="pyarrow")


RIPLEY_RADII_MM = (50_000_000, 100_000_000, 200_000_000)
# 3-D chord-grid cell edge: any two points with haversine distance
# ≤ r_max have unit-sphere chord ≤ 2R·sin(r_max/2R), so bucketing the
# R-scaled xyz coordinates on a grid of that edge guarantees every
# qualifying pair sits within a 3×3×3 cell neighborhood — at EVERY
# latitude (a Mercator tile grid shrinks in ground meters near the
# poles and would need an unbounded neighbor ring there). The margin
# absorbs float ulps in the lonlat→xyz mapping plus the 0.5 mm
# integer-rounding allowance of the membership test.
_RIPLEY_EDGE_M = (2.0 * 6371000.0
                  * np.sin((RIPLEY_RADII_MM[-1] / 1000.0 + 0.001)
                           / (2.0 * 6371000.0)) * (1.0 + 1e-9))
_RIPLEY_P = 64  # pair-count hash partitions


def _chord_fan_out(b: pa.Table) -> pa.Table:
    """Shared chord-grid bucketing for the pair statistics (ripley_k,
    pair_octants): one LEFT row in the point's own cell, 27 RIGHT
    replicas across the neighborhood."""
    R = 6371000.0
    edge = _RIPLEY_EDGE_M
    lon = b["bbox_minx"].to_numpy(zero_copy_only=False)
    lat = b["bbox_miny"].to_numpy(zero_copy_only=False)
    lam, phi = np.radians(lon), np.radians(lat)
    cp = np.cos(phi)
    ix = np.floor(R * cp * np.cos(lam) / edge).astype(np.int64)
    iy = np.floor(R * cp * np.sin(lam) / edge).astype(np.int64)
    iz = np.floor(R * np.sin(phi) / edge).astype(np.int64)
    n = len(lon)
    offs = np.array([(dx, dy, dz) for dx in (-1, 0, 1)
                     for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
                    np.int64)
    jx = np.repeat(ix, 27) + np.tile(offs[:, 0], n)
    jy = np.repeat(iy, 27) + np.tile(offs[:, 1], n)
    jz = np.repeat(iz, 27) + np.tile(offs[:, 2], n)
    own = ((ix + 64) << 40) | ((iy + 64) << 20) | (iz + 64)
    nbr = ((jx + 64) << 40) | ((jy + 64) << 20) | (jz + 64)
    return pa.table({
        "cell": pa.array(np.concatenate([own, nbr]), pa.int64()),
        "side": pa.array(np.concatenate(
            [np.zeros(n, np.int8), np.ones(27 * n, np.int8)]),
            pa.int8()),
        "lon": pa.array(np.concatenate([lon, np.repeat(lon, 27)]),
                        pa.float64()),
        "lat": pa.array(np.concatenate([lat, np.repeat(lat, 27)]),
                        pa.float64()),
    })


def _chord_addpart(b: pa.Table) -> pa.Table:
    c = b["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
    p = ((c * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(48)) \
        % np.uint64(_RIPLEY_P)
    return b.append_column("_part", pa.array(p.astype(np.int32),
                                             pa.int32()))


def q_ripley_k(sf_dir: str):
    """Ripley's K pair counts: for each radius r, the number of ORDERED
    point pairs (i≠j) with haversine distance ≤ r — the sufficient
    statistic of the classic point-pattern clustering function
    K(r) = A·pairs(r)/(n(n−1)). Distributed shape: each point lands in
    one unit-sphere chord-grid cell as a LEFT row and replicates to the
    27-cell neighborhood as RIGHT rows (so every ordered pair is
    counted in the left point's cell exactly once); cells hash into
    {_RIPLEY_P} partitions and each partition pair-counts its cells
    with chunked vectorized haversine (self-pairs included, subtracted
    globally as n afterwards). The shuffle carries 28 rows/point; the
    reduce output is 4 rows/partition. Membership is integer
    millimetres (floor(d·1000+0.5) ≤ r) on both engines per the repo
    float-parity rule. Whale cells bound the per-partition matrix; at
    scale the same sub-grid salting as pip_join's hot cells applies
    (the cell edge can drop to r_max/2 with a 5³ neighborhood)."""
    from ray.data.aggregate import Sum

    from ..geom.ops import haversine_m
    from .queries import _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")

    def pair_count(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, cell))
        cell, side = cell[order], side[order]
        lon, lat = lon[order], lat[order]
        starts = np.searchsorted(cell, np.unique(cell), "left")
        bounds = np.append(starts, len(cell))
        radii = np.asarray(RIPLEY_RADII_MM, np.int64)
        counts = np.zeros(len(radii), np.int64)
        n_left = 0
        for s, e in zip(bounds[:-1], bounds[1:]):
            nl = int(np.searchsorted(side[s:e], 1, "left"))
            if nl == 0 or nl == e - s:
                n_left += nl
                continue
            n_left += nl
            llon, llat = lon[s:s + nl], lat[s:s + nl]
            rlon, rlat = lon[s + nl:e], lat[s + nl:e]
            nr = len(rlon)
            chunk = max(1, (1 << 21) // nr)
            for c0 in range(0, nl, chunk):
                c1 = min(nl, c0 + chunk)
                d = haversine_m(np.repeat(llon[c0:c1], nr),
                                np.repeat(llat[c0:c1], nr),
                                np.tile(rlon, c1 - c0),
                                np.tile(rlat, c1 - c0))
                mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
                counts += np.searchsorted(np.sort(mm), radii, "right")
        return pa.table({
            "radius_mm": pa.array(np.append(radii, 0), pa.int64()),
            "n": pa.array(np.append(counts, n_left), pa.int64()),
        })

    agg = pts.map_batches(_chord_fan_out, batch_format="pyarrow") \
        .map_batches(_chord_addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(pair_count, batch_format="pyarrow") \
        .groupby("radius_mm").aggregate(Sum("n", alias_name="n"))

    rows = {r["radius_mm"]: r["n"] for r in agg.take_all()}
    n_pts = rows.get(0, 0)  # sentinel: total left points
    return pa.table({
        "radius_mm": pa.array(list(RIPLEY_RADII_MM), pa.int64()),
        "n_pairs": pa.array([rows.get(r, 0) - n_pts
                             for r in RIPLEY_RADII_MM], pa.int64()),
    })


def q_pair_octants(sf_dir: str):
    """Anisotropy fingerprint of the point pattern: every ORDERED close
    pair (haversine ≤ 200 km, i≠j) classified into the 8 compass
    octants of its micro-degree lon/lat delta (the segment_octants
    direction classes — integer sign and |Δy| vs |Δx| comparisons only,
    exact on both engines; octant 8 = coincident points). An isotropic
    process gives a flat histogram; ridges/coastlines skew it. Same
    chord-grid pair machinery as ripley_k, with each point's self
    replica removed from octant 8 as the global point count."""
    from ray.data.aggregate import Sum

    from ..geom.ops import haversine_m
    from .queries import _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")
    cap = RIPLEY_RADII_MM[-1]

    def octant_count(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, cell))
        cell, side = cell[order], side[order]
        lon, lat = lon[order], lat[order]
        xm = np.floor(lon * 1e6 + 0.5).astype(np.int64)
        ym = np.floor(lat * 1e6 + 0.5).astype(np.int64)
        starts = np.searchsorted(cell, np.unique(cell), "left")
        bounds = np.append(starts, len(cell))
        counts = np.zeros(9, np.int64)
        n_left = 0
        for s, e in zip(bounds[:-1], bounds[1:]):
            nl = int(np.searchsorted(side[s:e], 1, "left"))
            n_left += nl
            if nl == 0 or nl == e - s:
                continue
            nr = e - s - nl
            chunk = max(1, (1 << 21) // nr)
            for c0 in range(0, nl, chunk):
                c1 = min(nl, c0 + chunk)
                m = c1 - c0
                d = haversine_m(np.repeat(lon[s + c0:s + c1], nr),
                                np.repeat(lat[s + c0:s + c1], nr),
                                np.tile(lon[s + nl:e], m),
                                np.tile(lat[s + nl:e], m))
                mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
                keep = mm <= cap
                dx = (np.tile(xm[s + nl:e], m)
                      - np.repeat(xm[s + c0:s + c1], nr))[keep]
                dy = (np.tile(ym[s + nl:e], m)
                      - np.repeat(ym[s + c0:s + c1], nr))[keep]
                q = np.where(dx >= 0, np.where(dy >= 0, 0, 3),
                             np.where(dy >= 0, 1, 2))
                octant = 2 * q + (np.abs(dy) > np.abs(dx)).astype(
                    np.int64)
                octant[(dx == 0) & (dy == 0)] = 8
                counts += np.bincount(octant, minlength=9)
        return pa.table({
            "octant": pa.array(np.append(np.arange(9), -1), pa.int64()),
            "n": pa.array(np.append(counts, n_left), pa.int64()),
        })

    agg = pts.map_batches(_chord_fan_out, batch_format="pyarrow") \
        .map_batches(_chord_addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(octant_count,
                                     batch_format="pyarrow") \
        .groupby("octant").aggregate(Sum("n", alias_name="n"))

    rows = {r["octant"]: r["n"] for r in agg.take_all()}
    n_pts = rows.get(-1, 0)
    out = [(o, rows.get(o, 0) - (n_pts if o == 8 else 0))
           for o in range(9)]
    out = [(o, n) for o, n in out if n > 0]
    return pa.table({
        "octant": pa.array([o for o, _ in out], pa.int64()),
        "n_pairs": pa.array([n for _, n in out], pa.int64()),
    })


def q_min_cross_layer_dist(sf_dir: str):
    """Layer-proximity matrix: for every layer pair, the MINIMUM
    haversine distance (integer mm) between their point features, when
    it is within the 200 km chord-grid cap — the "how close do these
    two datasets get" signal that complements layer_tile_overlap's
    coarse grid overlap. Same chord-grid machinery; a qualifying pair
    is seen in both endpoint cells but MIN is idempotent so no
    dedup pass is needed. Pairs whose true minimum exceeds the cap are
    omitted on both engines (the chord bound makes the grid-local min
    equal to the global min whenever it qualifies)."""
    from ray.data.aggregate import Min

    from ..geom.ops import haversine_m
    from .queries import _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")
    cap = RIPLEY_RADII_MM[-1]

    def fan_out(b: pa.Table) -> pa.Table:
        core = _chord_fan_out(b)
        layer = b["layer"]
        if isinstance(layer, pa.ChunkedArray):
            layer = layer.combine_chunks()
        n = len(layer)
        rep = pa.array(np.repeat(np.arange(n), 27))
        return core.append_column(
            "layer", pa.concat_arrays([layer, layer.take(rep)]))

    def pair_min(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lay = t["layer"]
        if isinstance(lay, pa.ChunkedArray):
            lay = lay.combine_chunks()
        vocab, codes = np.unique(
            np.asarray(lay.to_pylist(), object), return_inverse=True)
        order = np.lexsort((side, cell))
        cell, side, codes = cell[order], side[order], codes[order]
        lon, lat = lon[order], lat[order]
        starts = np.searchsorted(cell, np.unique(cell), "left")
        bounds = np.append(starts, len(cell))
        best: dict = {}
        for s, e in zip(bounds[:-1], bounds[1:]):
            nl = int(np.searchsorted(side[s:e], 1, "left"))
            if nl == 0 or nl == e - s:
                continue
            nr = e - s - nl
            rcode = codes[s + nl:e]
            chunk = max(1, (1 << 21) // nr)
            for c0 in range(0, nl, chunk):
                c1 = min(nl, c0 + chunk)
                m = c1 - c0
                d = haversine_m(np.repeat(lon[s + c0:s + c1], nr),
                                np.repeat(lat[s + c0:s + c1], nr),
                                np.tile(lon[s + nl:e], m),
                                np.tile(lat[s + nl:e], m))
                mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
                lc = np.repeat(codes[s + c0:s + c1], nr)
                rc = np.tile(rcode, m)
                keep = (mm <= cap) & (lc != rc)
                if not keep.any():
                    continue
                kmin = np.minimum(lc[keep], rc[keep])
                kmax = np.maximum(lc[keep], rc[keep])
                fused = kmin * len(vocab) + kmax
                uf = np.unique(fused)
                mins = np.full(len(uf), 1 << 62, np.int64)
                np.minimum.at(mins, np.searchsorted(uf, fused), mm[keep])
                for k, v in zip(uf, mins):  # ≤ C(layers,2) iterations
                    key = (int(k) // len(vocab), int(k) % len(vocab))
                    if int(v) < best.get(key, 1 << 62):
                        best[key] = int(v)
        items = sorted(best.items())
        return pa.table({
            "layer_a": pa.array([str(vocab[a]) for (a, _), _ in items],
                                pa.string()),
            "layer_b": pa.array([str(vocab[b2]) for (_, b2), _ in items],
                                pa.string()),
            "min_mm": pa.array([v for _, v in items], pa.int64()),
        })

    return pts.map_batches(fan_out, batch_format="pyarrow") \
        .map_batches(_chord_addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(pair_min, batch_format="pyarrow") \
        .groupby(["layer_a", "layer_b"]) \
        .aggregate(Min("min_mm", alias_name="min_mm"))


NN_CAP_MM = RIPLEY_RADII_MM[-1]


def q_nn_dist(sf_dir: str):
    """Per-point nearest-neighbor distance (integer mm), capped at
    200 km — the Clark-Evans / spatial-randomness statistic's raw
    input. Same unit-sphere chord grid as ripley_k: a point's own cell
    plus the 27-neighborhood provably contains every candidate within
    the cap, so each point's min is FINAL inside its own cell group (no
    cross-cell reduce). Identity (doc_id, span_idx) — not distance-0 —
    excludes the self-replica, so coincident distinct points correctly
    report nn_mm = 0. Points with no neighbor within the cap are
    omitted (the DuckDB mirror is a full O(n²) min with
    HAVING min ≤ cap, which is equivalent by the chord bound)."""
    from ..geom.ops import haversine_m
    from .queries import _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")
    edge = _RIPLEY_EDGE_M
    R = 6371000.0

    def fan_out(b: pa.Table) -> pa.Table:
        lon = b["bbox_minx"].to_numpy(zero_copy_only=False)
        lat = b["bbox_miny"].to_numpy(zero_copy_only=False)
        doc = _col(b["doc_id"])
        span = b["span_idx"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lam, phi = np.radians(lon), np.radians(lat)
        cp = np.cos(phi)
        ix = np.floor(R * cp * np.cos(lam) / edge).astype(np.int64)
        iy = np.floor(R * cp * np.sin(lam) / edge).astype(np.int64)
        iz = np.floor(R * np.sin(phi) / edge).astype(np.int64)
        n = len(lon)
        offs = np.array([(dx, dy, dz) for dx in (-1, 0, 1)
                         for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
                        np.int64)
        jx = np.repeat(ix, 27) + np.tile(offs[:, 0], n)
        jy = np.repeat(iy, 27) + np.tile(offs[:, 1], n)
        jz = np.repeat(iz, 27) + np.tile(offs[:, 2], n)
        own = ((ix + 64) << 40) | ((iy + 64) << 20) | (iz + 64)
        nbr = ((jx + 64) << 40) | ((jy + 64) << 20) | (jz + 64)
        rep = pa.array(np.repeat(np.arange(n), 27))
        return pa.table({
            "cell": pa.array(np.concatenate([own, nbr]), pa.int64()),
            "side": pa.array(np.concatenate(
                [np.zeros(n, np.int8), np.ones(27 * n, np.int8)]),
                pa.int8()),
            "doc_id": pa.concat_arrays([doc, doc.take(rep)]),
            "span_idx": pa.array(
                np.concatenate([span, np.repeat(span, 27)]), pa.int64()),
            "lon": pa.array(np.concatenate([lon, np.repeat(lon, 27)]),
                            pa.float64()),
            "lat": pa.array(np.concatenate([lat, np.repeat(lat, 27)]),
                            pa.float64()),
        })

    def addpart(b: pa.Table) -> pa.Table:
        c = b["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = ((c * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(48)) \
            % np.uint64(_RIPLEY_P)
        return b.append_column("_part", pa.array(p.astype(np.int32),
                                                 pa.int32()))

    def nn_min(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        doc = _col(t["doc_id"])
        span = t["span_idx"].to_numpy(zero_copy_only=False)
        fused = pc.binary_join_element_wise(
            doc, pa.array(span.astype("U"), pa.string()), "\x1f")
        _, ident = np.unique(np.asarray(fused.to_pylist(), object),
                             return_inverse=True)
        order = np.lexsort((side, cell))
        cell, side, ident = cell[order], side[order], ident[order]
        lon, lat = lon[order], lat[order]
        doc = doc.take(pa.array(order))
        span = span[order]
        starts = np.searchsorted(cell, np.unique(cell), "left")
        bounds = np.append(starts, len(cell))
        out_doc, out_span, out_mm = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            nl = int(np.searchsorted(side[s:e], 1, "left"))
            if nl == 0:
                continue
            llon, llat = lon[s:s + nl], lat[s:s + nl]
            rlon, rlat = lon[s + nl:e], lat[s + nl:e]
            lid, rid = ident[s:s + nl], ident[s + nl:e]
            nr = len(rlon)
            chunk = max(1, (1 << 21) // max(nr, 1))
            for c0 in range(0, nl, chunk):
                c1 = min(nl, c0 + chunk)
                m = c1 - c0
                d = haversine_m(np.repeat(llon[c0:c1], nr),
                                np.repeat(llat[c0:c1], nr),
                                np.tile(rlon, m), np.tile(rlat, m))
                mm = np.floor(d * 1000.0 + 0.5).astype(np.int64) \
                    .reshape(m, nr)
                mm[lid[c0:c1, None] == rid[None, :]] = np.iinfo(
                    np.int64).max  # mask self-replicas
                best = mm.min(axis=1)
                keep = best <= NN_CAP_MM
                if keep.any():
                    sel = np.nonzero(keep)[0] + s + c0
                    out_doc.append(doc.take(pa.array(sel)))
                    out_span.extend(span[sel].tolist())
                    out_mm.extend(best[keep].tolist())
        return pa.table({
            "doc_id": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in out_doc]) if out_doc
            else pa.array([], pa.string()),
            "span_idx": pa.array(out_span, pa.int64()),
            "nn_mm": pa.array(out_mm, pa.int64()),
        })

    return pts.map_batches(fan_out, batch_format="pyarrow") \
        .map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(nn_min, batch_format="pyarrow")


def _col(a):
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


QUERIES_GEO = {
    "tile_rollup": q_tile_rollup,
    "layer_tile_overlap": q_layer_tile_overlap,
    "tile_skew": q_tile_skew,
    "radius_join": q_radius_join,
    "ripley_k": q_ripley_k,
    "nn_dist": q_nn_dist,
    "pair_octants": q_pair_octants,
    "min_cross_layer_dist": q_min_cross_layer_dist,
    "layer_tile_jaccard": q_layer_tile_jaccard,
    "layer_contact": q_layer_contact,
}


def _oracle_sql_geo() -> dict[str, str]:
    # built lazily: the coverage CTE pieces live in queries.py (circular
    # at module load — queries.py imports this module at its tail)
    from .queries import (_BBOX_CTE, _COVERAGE_CTE, _HAVERSINE,
                          _KNN_QUERY_VALUES, _TILE_XY, _TILE_Y)

    hav = _HAVERSINE.format(lat1="q.qlat", lon1="q.qlon",
                            lat2="pts.lat", lon2="pts.lon")
    radius_sql = _BBOX_CTE + f"""
, q(query_id, qlon, qlat) AS (VALUES {_KNN_QUERY_VALUES})
, pts AS (SELECT doc_id, span_idx, bbox_minx AS lon, bbox_miny AS lat
          FROM g WHERE geom_type = 1)
SELECT q.query_id, pts.doc_id, pts.span_idx,
       CAST(FLOOR({hav} * 1000.0 + 0.5) AS BIGINT) AS dist_mm
FROM q CROSS JOIN pts
WHERE CAST(FLOOR({hav} * 1000.0 + 0.5) AS BIGINT) <= {RADIUS_MM}"""

    layer_overlap_sql = (
        _BBOX_CTE
        + f"""
, zz AS (SELECT UNNEST([{ROLLUP_BASE_Z}]) AS z)
, ranges AS (
  SELECT g.layer,
         """
        + _TILE_XY.format(lon="g.bbox_minx") + " AS x1,\n         "
        + _TILE_XY.format(lon="g.bbox_maxx") + " AS x2,\n         "
        + _TILE_Y.format(lat="g.bbox_maxy") + " AS y1,\n         "
        + _TILE_Y.format(lat="g.bbox_miny") + """ AS y2
  FROM g CROSS JOIN zz
)
, xs AS (
  SELECT layer, UNNEST(generate_series(x1, x2)) AS x, y1, y2 FROM ranges
)
, cov AS (
  SELECT layer, x, UNNEST(generate_series(y1, y2)) AS y FROM xs
)
, lt AS (SELECT DISTINCT layer, x, y FROM cov)
SELECT a.layer AS layer_a, b.layer AS layer_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_tiles
FROM lt a JOIN lt b ON a.x = b.x AND a.y = b.y AND a.layer < b.layer
GROUP BY a.layer, b.layer"""
    )

    _lt_cte = (
        _BBOX_CTE
        + f"""
, zz AS (SELECT UNNEST([{ROLLUP_BASE_Z}]) AS z)
, ranges AS (
  SELECT g.layer,
         """
        + _TILE_XY.format(lon="g.bbox_minx") + " AS x1,\n         "
        + _TILE_XY.format(lon="g.bbox_maxx") + " AS x2,\n         "
        + _TILE_Y.format(lat="g.bbox_maxy") + " AS y1,\n         "
        + _TILE_Y.format(lat="g.bbox_miny") + """ AS y2
  FROM g CROSS JOIN zz
)
, xs AS (
  SELECT layer, UNNEST(generate_series(x1, x2)) AS x, y1, y2 FROM ranges
)
, cov AS (
  SELECT layer, x, UNNEST(generate_series(y1, y2)) AS y FROM xs
)
, lt AS (SELECT DISTINCT layer, x, y FROM cov)"""
    )

    jaccard_sql = _lt_cte + """
, lc AS (SELECT layer, CAST(COUNT(*) AS BIGINT) AS n
         FROM lt GROUP BY 1)
SELECT a.layer AS layer_a, b.layer AS layer_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_tiles,
       CAST(COUNT(*) * 1000000 // (la.n + lb.n - COUNT(*)) AS BIGINT)
         AS jaccard_ppm
FROM lt a JOIN lt b ON a.x = b.x AND a.y = b.y AND a.layer < b.layer
JOIN lc la ON la.layer = a.layer
JOIN lc lb ON lb.layer = b.layer
GROUP BY a.layer, b.layer, la.n, lb.n"""

    tile_skew_sql = _COVERAGE_CTE + """
, per AS (SELECT z, x, y, CAST(COUNT(*) AS BIGINT) AS n
          FROM cov GROUP BY z, x, y)
SELECT z, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(quantile_disc(n, 0.25) AS BIGINT) AS p25_n,
       CAST(quantile_disc(n, 0.50) AS BIGINT) AS p50_n,
       CAST(quantile_disc(n, 0.75) AS BIGINT) AS p75_n,
       CAST(MAX(n) AS BIGINT) AS max_n
FROM per GROUP BY z"""

    hav_ab = _HAVERSINE.format(lat1="a.lat", lon1="a.lon",
                               lat2="b.lat", lon2="b.lon")
    ripley_sql = _BBOX_CTE + f"""
, pts AS (SELECT ROW_NUMBER() OVER () AS id,
                 bbox_minx AS lon, bbox_miny AS lat
          FROM g WHERE geom_type = 1)
, rr(radius_mm) AS (VALUES {", ".join(f"({r})" for r in RIPLEY_RADII_MM)})
, d AS (SELECT CAST(FLOOR({hav_ab} * 1000.0 + 0.5) AS BIGINT) AS mm
        FROM pts a JOIN pts b ON a.id <> b.id)
SELECT rr.radius_mm, CAST(COUNT(d.mm) AS BIGINT) AS n_pairs
FROM rr LEFT JOIN d ON d.mm <= rr.radius_mm
GROUP BY rr.radius_mm"""

    nn_sql = _BBOX_CTE + f"""
, pts AS (SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
                 bbox_minx AS lon, bbox_miny AS lat
          FROM g WHERE geom_type = 1)
SELECT a.doc_id, a.span_idx,
       MIN(CAST(FLOOR({hav_ab} * 1000.0 + 0.5) AS BIGINT)) AS nn_mm
FROM pts a JOIN pts b
  ON NOT (a.doc_id = b.doc_id AND a.span_idx = b.span_idx)
GROUP BY a.doc_id, a.span_idx
HAVING MIN(CAST(FLOOR({hav_ab} * 1000.0 + 0.5) AS BIGINT))
       <= {NN_CAP_MM}"""

    return {
        "layer_tile_overlap": layer_overlap_sql,
        "layer_tile_jaccard": jaccard_sql,
        "layer_contact": _lt_cte + """
SELECT a.layer AS layer_a, b.layer AS layer_b,
       CAST(COUNT(DISTINCT a.x * 4294967296 + a.y) AS BIGINT)
         AS n_contact_tiles
FROM lt a JOIN lt b
  ON b.x BETWEEN a.x - 1 AND a.x + 1
 AND b.y BETWEEN a.y - 1 AND a.y + 1
 AND a.layer <> b.layer
GROUP BY 1, 2""",
        "tile_skew": tile_skew_sql,
        "radius_join": radius_sql,
        "ripley_k": ripley_sql,
        "nn_dist": nn_sql,
        "min_cross_layer_dist": _BBOX_CTE + f"""
, pts AS (SELECT layer, bbox_minx AS lon, bbox_miny AS lat
          FROM g WHERE geom_type = 1)
SELECT a.layer AS layer_a, b.layer AS layer_b,
       MIN(CAST(FLOOR({hav_ab} * 1000.0 + 0.5) AS BIGINT)) AS min_mm
FROM pts a JOIN pts b ON a.layer < b.layer
GROUP BY 1, 2
HAVING MIN(CAST(FLOOR({hav_ab} * 1000.0 + 0.5) AS BIGINT))
       <= {RIPLEY_RADII_MM[-1]}""",
        "pair_octants": _BBOX_CTE + f"""
, pts AS (SELECT ROW_NUMBER() OVER () AS id,
                 bbox_minx AS lon, bbox_miny AS lat,
                 CAST(FLOOR(bbox_minx * 1000000 + 0.5) AS BIGINT) AS xm,
                 CAST(FLOOR(bbox_miny * 1000000 + 0.5) AS BIGINT) AS ym
          FROM g WHERE geom_type = 1)
, pr AS (SELECT b.xm - a.xm AS dx, b.ym - a.ym AS dy
         FROM pts a JOIN pts b ON a.id <> b.id
         WHERE CAST(FLOOR({hav_ab} * 1000.0 + 0.5) AS BIGINT)
               <= {RIPLEY_RADII_MM[-1]})
SELECT CAST(CASE WHEN dx = 0 AND dy = 0 THEN 8
            ELSE 2 * (CASE WHEN dx >= 0
                           THEN CASE WHEN dy >= 0 THEN 0 ELSE 3 END
                           ELSE CASE WHEN dy >= 0 THEN 1 ELSE 2 END END)
                 + (CASE WHEN ABS(dy) > ABS(dx) THEN 1 ELSE 0 END)
            END AS BIGINT) AS octant,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pr GROUP BY 1""",
        "tile_rollup": _COVERAGE_CTE + f"""
, base AS (SELECT x, y FROM cov WHERE z = {ROLLUP_BASE_Z})
, lv AS (SELECT UNNEST(generate_series(0, {ROLLUP_BASE_Z})) AS z)
SELECT CAST(lv.z AS BIGINT) AS z,
       CAST(base.x >> ({ROLLUP_BASE_Z} - lv.z) AS BIGINT) AS x,
       CAST(base.y >> ({ROLLUP_BASE_Z} - lv.z) AS BIGINT) AS y,
       CAST(COUNT(*) AS BIGINT) AS n
FROM base CROSS JOIN lv
GROUP BY 1, 2, 3""",
    }
