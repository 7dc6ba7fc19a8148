"""Tile pyramid rollup (queries_geo.py): pyramid invariants plus
consistency with tile_counts at the base zoom."""
import numpy as np

from grandine_ray.pipelines import queries, queries_geo

SF = "/root/testdata/sf0.001"


def test_tile_rollup_pyramid_invariants(ray_session):
    got = queries_geo.q_tile_rollup(SF).to_pandas()
    Z = queries_geo.ROLLUP_BASE_Z
    by_z = {z: g for z, g in got.groupby("z")}
    assert set(by_z) == set(range(Z + 1))
    # every level's total equals the base level's total (each base
    # assignment counted once per level)
    totals = {z: int(g.n.sum()) for z, g in by_z.items()}
    assert len(set(totals.values())) == 1
    # z=0 is the single world tile
    assert len(by_z[0]) == 1 and by_z[0].iloc[0].x == 0
    # every tile's count equals the sum of its children one level down
    for z in range(Z):
        parent = {(r.x, r.y): r.n for r in by_z[z].itertuples()}
        child_sum = {}
        for r in by_z[z + 1].itertuples():
            k = (r.x >> 1, r.y >> 1)
            child_sum[k] = child_sum.get(k, 0) + r.n
        assert parent == child_sum


def test_tile_rollup_base_matches_tile_counts(ray_session):
    Z = queries_geo.ROLLUP_BASE_Z
    roll = queries_geo.q_tile_rollup(SF).to_pandas()
    base = roll[roll.z == Z]
    counts = queries.q_tile_counts(SF).to_pandas()
    counts = counts[counts.z == Z]
    a = sorted(map(tuple, base[["x", "y", "n"]].values.tolist()))
    b = sorted(map(tuple,
                   counts[["x", "y", "n_features"]].values.tolist()))
    assert a == b


def test_layer_tile_overlap_brute_force(ray_session):
    # independent oracle: python set intersections per layer pair over
    # the engine's own tile assignments at the base zoom
    from grandine_ray.pipelines.queries import _features_ds
    from grandine_ray.stages.coverage import make_coverage_fn

    Z = queries_geo.ROLLUP_BASE_Z
    tiled = _features_ds(SF).map_batches(
        make_coverage_fn([Z]), batch_format="pyarrow").to_pandas()
    occ = {}
    for layer, key in zip(tiled["layer"], tiled["tile_key"]):
        occ.setdefault(layer, set()).add(int(key))
    layers = sorted(occ)
    want = {}
    for i, a in enumerate(layers):
        for b in layers[i + 1:]:
            n = len(occ[a] & occ[b])
            if n:
                want[(a, b)] = n
    got = queries_geo.q_layer_tile_overlap(SF).to_pandas()
    got_map = {(r.layer_a, r.layer_b): r.n_shared_tiles
               for r in got.itertuples()}
    assert got_map == want


def test_tile_skew_consistent_with_tile_counts(ray_session):
    skew = queries_geo.q_tile_skew(SF).to_pandas().set_index("z")
    counts = queries.q_tile_counts(SF).to_pandas()
    for z, g in counts.groupby("z"):
        row = skew.loc[z]
        assert row.n_rows == len(g)
        assert row.max_n == g.n_features.max()
        assert row.p25_n <= row.p50_n <= row.p75_n <= row.max_n


def test_radius_join_brute_force(ray_session):
    import numpy as np
    import duckdb

    from grandine_ray.geom.ops import haversine_m
    from grandine_ray.pipelines.queries import KNN_QUERIES
    from grandine_ray.sources import synth

    corpus = synth.corpus_for_sf(SF)
    con = duckdb.connect()
    g = con.execute(f"""
        SELECT doc_id, span_idx, list_aggregate(xs,'min') x,
               list_aggregate(ys,'min') y
        FROM read_parquet('{corpus}/geoms.parquet')
        WHERE geom_type = 1""").df()
    got = queries_geo.q_radius_join(SF).to_pandas()
    for qid, qx, qy in KNN_QUERIES:
        d = haversine_m(np.full(len(g), qx), np.full(len(g), qy),
                        g.x.values, g.y.values)
        mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
        want = {(r.doc_id, int(r.span_idx))
                for r, keep in zip(g.itertuples(),
                                   mm <= queries_geo.RADIUS_MM) if keep}
        mine = {(r.doc_id, int(r.span_idx))
                for r in got[got.query_id == qid].itertuples()}
        assert mine == want


def test_ripley_k_brute_force(ray_session):
    """Pair counts == full O(n²) numpy haversine over the ground-truth
    point set, plus K-function monotonicity."""
    import duckdb

    from grandine_ray.geom.ops import haversine_m
    from grandine_ray.sources import synth

    corpus = synth.corpus_for_sf(SF)
    con = duckdb.connect()
    g = con.execute(f"""
        SELECT list_aggregate(xs,'min') x, list_aggregate(ys,'min') y
        FROM read_parquet('{corpus}/geoms.parquet')
        WHERE geom_type = 1""").df()
    n = len(g)
    d = haversine_m(np.repeat(g.x.values, n), np.repeat(g.y.values, n),
                    np.tile(g.x.values, n), np.tile(g.y.values, n))
    mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
    got = queries_geo.q_ripley_k(SF).to_pandas()
    assert list(got.radius_mm) == list(queries_geo.RIPLEY_RADII_MM)
    for r, np_ in zip(got.radius_mm, got.n_pairs):
        assert np_ == int((mm <= r).sum()) - n  # minus n self-pairs
    assert got.n_pairs.is_monotonic_increasing
    assert got.n_pairs.iloc[0] > 0  # clusters ⇒ close pairs exist


def test_ripley_chord_grid_containment():
    """The chord-grid edge really bounds every qualifying pair to a
    3×3×3 neighborhood: random points at extreme latitudes whose
    haversine distance ≤ r_max must land within 1 cell on each axis
    (this is the property a Mercator tile grid lacks near the poles)."""
    from grandine_ray.geom.ops import haversine_m

    rng = np.random.default_rng(11)
    R, edge = 6371000.0, queries_geo._RIPLEY_EDGE_M
    lon = rng.uniform(-180, 180, 4000)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 4000)))  # incl poles
    # pair each point with a perturbed twin ≤ ~r_max away
    dlat = rng.uniform(-1.7, 1.7, 4000)
    dlon = rng.uniform(-60, 60, 4000) * rng.choice([1.0, 0.02], 4000)
    lon2 = (lon + dlon + 180) % 360 - 180
    lat2 = np.clip(lat + dlat, -90, 90)
    d = haversine_m(lon, lat, lon2, lat2)
    keep = np.floor(d * 1000.0 + 0.5) <= queries_geo.RIPLEY_RADII_MM[-1]

    def cells(lo, la):
        lam, phi = np.radians(lo), np.radians(la)
        cp = np.cos(phi)
        return (np.floor(R * cp * np.cos(lam) / edge).astype(np.int64),
                np.floor(R * cp * np.sin(lam) / edge).astype(np.int64),
                np.floor(R * np.sin(phi) / edge).astype(np.int64))

    a, b = cells(lon[keep], lat[keep]), cells(lon2[keep], lat2[keep])
    assert keep.sum() > 500  # mixed scales keep enough pairs in range
    for ax, bx in zip(a, b):
        assert np.abs(ax - bx).max(initial=0) <= 1


def test_nn_dist_brute_force(ray_session):
    """Per-point NN distance == O(n²) numpy recompute with identity
    (not distance-0) self-exclusion and the 200 km cap."""
    import duckdb

    from grandine_ray.geom.ops import haversine_m
    from grandine_ray.sources import synth

    corpus = synth.corpus_for_sf(SF)
    con = duckdb.connect()
    g = con.execute(f"""
        SELECT doc_id, CAST(span_idx AS BIGINT) s,
               list_aggregate(xs,'min') x, list_aggregate(ys,'min') y
        FROM read_parquet('{corpus}/geoms.parquet')
        WHERE geom_type = 1""").df()
    n = len(g)
    d = haversine_m(np.repeat(g.x.values, n), np.repeat(g.y.values, n),
                    np.tile(g.x.values, n), np.tile(g.y.values, n))
    mm = np.floor(d * 1000.0 + 0.5).astype(np.int64).reshape(n, n)
    np.fill_diagonal(mm, np.iinfo(np.int64).max)
    best = mm.min(axis=1)
    want = {(r.doc_id, r.s): b for r, b in zip(g.itertuples(), best)
            if b <= queries_geo.NN_CAP_MM}
    got = queries_geo.q_nn_dist(SF).to_pandas()
    mine = {(r.doc_id, r.span_idx): r.nn_mm for r in got.itertuples()}
    assert mine == want
    assert len(mine) > 0


def test_pair_octants_brute_force(ray_session):
    """Octant census == O(n²) numpy recompute (cap + integer octant)."""
    import duckdb

    from grandine_ray.geom.ops import haversine_m
    from grandine_ray.sources import synth

    corpus = synth.corpus_for_sf(SF)
    con = duckdb.connect()
    g = con.execute(f"""
        SELECT list_aggregate(xs,'min') x, list_aggregate(ys,'min') y
        FROM read_parquet('{corpus}/geoms.parquet')
        WHERE geom_type = 1""").df()
    n = len(g)
    d = haversine_m(np.repeat(g.x.values, n), np.repeat(g.y.values, n),
                    np.tile(g.x.values, n), np.tile(g.y.values, n))
    mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
    xm = np.floor(g.x.values * 1e6 + 0.5).astype(np.int64)
    ym = np.floor(g.y.values * 1e6 + 0.5).astype(np.int64)
    ii, jj = np.divmod(np.arange(n * n), n)
    keep = (mm <= queries_geo.RIPLEY_RADII_MM[-1]) & (ii != jj)
    dx = xm[jj[keep]] - xm[ii[keep]]
    dy = ym[jj[keep]] - ym[ii[keep]]
    q = np.where(dx >= 0, np.where(dy >= 0, 0, 3),
                 np.where(dy >= 0, 1, 2))
    octant = 2 * q + (np.abs(dy) > np.abs(dx)).astype(np.int64)
    octant[(dx == 0) & (dy == 0)] = 8
    want = {int(o): int(c) for o, c in
            zip(*np.unique(octant, return_counts=True))}
    got = queries_geo.q_pair_octants(SF).to_pandas()
    assert dict(zip(got.octant, got.n_pairs)) == want
    # ordered pairs: opposite octants (o, o XOR... (q+2)%4) balance —
    # each unordered pair appears once in each direction
    total = sum(want.values())
    assert total % 2 == 0 and total > 0


def test_min_cross_layer_dist_brute_force(ray_session):
    """Layer-pair minimum == O(n²) recompute with the cap filter."""
    import duckdb

    from grandine_ray.geom.ops import haversine_m
    from grandine_ray.sources import synth

    corpus = synth.corpus_for_sf(SF)
    con = duckdb.connect()
    g = con.execute(f"""
        SELECT layer, xs[1] x, ys[1] y
        FROM read_parquet('{corpus}/geoms.parquet')
        WHERE geom_type = 1""").df()
    n = len(g)
    d = haversine_m(np.repeat(g.x.values, n), np.repeat(g.y.values, n),
                    np.tile(g.x.values, n), np.tile(g.y.values, n))
    mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
    lays = g.layer.values
    la = np.repeat(lays, n)
    lb = np.tile(lays, n)
    want: dict = {}
    keep = la < lb
    for a, b, v in zip(la[keep], lb[keep], mm[keep]):
        if v < want.get((a, b), 1 << 62):
            want[(a, b)] = int(v)
    want = {k: v for k, v in want.items()
            if v <= queries_geo.RIPLEY_RADII_MM[-1]}
    got = queries_geo.q_min_cross_layer_dist(SF).to_pandas()
    mine = {(r.layer_a, r.layer_b): r.min_mm for r in got.itertuples()}
    assert mine == want
    assert len(mine) > 0


def test_layer_tile_jaccard_consistency(ray_session):
    """Jaccard row set == overlap row set; ratio recomputed from the
    per-layer occupied-tile sets built brute-force."""
    from grandine_ray.pipelines.queries import _features_ds
    from grandine_ray.stages.coverage import make_coverage_fn

    Z = queries_geo.ROLLUP_BASE_Z
    tiled = _features_ds(SF).map_batches(
        make_coverage_fn([Z]), batch_format="pyarrow").to_pandas()
    occ: dict[str, set] = {}
    for layer, key in zip(tiled["layer"], tiled["tile_key"]):
        occ.setdefault(layer, set()).add(int(key))
    got = queries_geo.q_layer_tile_jaccard(SF).to_pandas()
    assert len(got) > 0
    for r in got.itertuples():
        inter = len(occ[r.layer_a] & occ[r.layer_b])
        union = len(occ[r.layer_a] | occ[r.layer_b])
        assert r.n_shared_tiles == inter
        assert r.jaccard_ppm == inter * 1_000_000 // union
        assert 0 < r.jaccard_ppm <= 1_000_000


def test_layer_contact_brute_force(ray_session):
    """Contact counts == set recompute over engine tile assignments."""
    from grandine_ray.index import xyz
    from grandine_ray.pipelines.queries import _features_ds
    from grandine_ray.stages.coverage import make_coverage_fn

    Z = queries_geo.ROLLUP_BASE_Z
    tiled = _features_ds(SF).map_batches(
        make_coverage_fn([Z]), batch_format="pyarrow").to_pandas()
    occ: dict[str, set] = {}
    for layer, key in zip(tiled["layer"], tiled["tile_key"]):
        _, x, y = xyz.tile_key_unpack(np.array([key], np.uint64))
        occ.setdefault(layer, set()).add((int(x[0]), int(y[0])))
    want = {}
    for a, ta in occ.items():
        for b, tb in occ.items():
            if a == b:
                continue
            n = sum(1 for (x, y) in ta
                    if any((x + dx, y + dy) in tb
                           for dx in (-1, 0, 1) for dy in (-1, 0, 1)))
            if n:
                want[(a, b)] = n
    got = queries_geo.q_layer_contact(SF).to_pandas()
    mine = {(r.layer_a, r.layer_b): r.n_contact_tiles
            for r in got.itertuples()}
    assert mine == want
    assert len(mine) > 0
