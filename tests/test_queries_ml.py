"""Round-4 ML/curation queries (queries_ml.py): hashed-BoW quality
scoring, DSIR-style target affinity, cosine range search, polygon
areas — kernel unit tests plus end-to-end invariants at sf0.001."""
import numpy as np
import pyarrow as pa

from grandine_ray.geom import ops as geo_ops
from grandine_ray.pipelines import queries_ml
from grandine_ray.stages import corpus as corpus_stage

SF = "/root/testdata/sf0.001"


def test_polygon_area2_micro_known_values():
    class GB:
        pass

    gb = GB()
    gb.types = np.array([3, 3], np.uint8)
    # unit square; triangle with a small triangular hole
    gb.coords = np.array(
        [[0, 0], [1, 0], [1, 1], [0, 1],
         [0, 0], [3, 0], [0, 3], [1, 1], [1.5, 1], [1, 1.5]], float)
    gb.ring_offsets = np.array([0, 4, 7, 10])
    gb.geom_offsets = np.array([0, 1, 3])
    n_rings, n_vertices, area2 = geo_ops.polygon_area2_micro(gb)
    assert n_rings.tolist() == [1, 2]
    assert n_vertices.tolist() == [4, 6]
    # 2*area of the unit square in micro-deg^2
    assert area2[0] == 2 * 10**12
    # outer 2*area 9e12 plus the hole ring's absolute 2*area 0.25e12
    assert area2[1] == 9 * 10**12 + 250_000_000_000


def test_polygon_area2_micro_winding_invariant():
    class GB:
        pass

    for reverse in (False, True):
        gb = GB()
        gb.types = np.array([3], np.uint8)
        ring = [[0, 0], [2, 0], [2, 2], [0, 2]]
        if reverse:
            ring = ring[::-1]
        gb.coords = np.array(ring, float)
        gb.ring_offsets = np.array([0, 4])
        gb.geom_offsets = np.array([0, 1])
        _, _, area2 = geo_ops.polygon_area2_micro(gb)
        assert area2[0] == 8 * 10**12  # |2*area| independent of winding


def _gb_of(rings):
    class GB:
        pass

    gb = GB()
    gb.types = np.array([3], np.uint8)
    gb.coords = np.array([v for r in rings for v in r], float)
    offs = np.cumsum([0] + [len(r) for r in rings])
    gb.ring_offsets = offs
    gb.geom_offsets = np.array([0, len(rings)])
    return gb


def test_polygon_centroid_micro_known_and_invariant():
    from fractions import Fraction

    rng = np.random.default_rng(5)
    # unit square centroid = (0.5, 0.5) exactly
    cx, cy, a2, ok = geo_ops.polygon_centroid_micro(
        _gb_of([[[0, 0], [1, 0], [1, 1], [0, 1]]]))
    assert ok[0] and (cx[0], cy[0], a2[0]) == (500_000, 500_000, 2 * 10**12)
    for trial in range(25):
        n = int(rng.integers(3, 12))
        ring = np.cumsum(rng.uniform(-2, 2, (n, 2)), axis=0) \
            + rng.uniform(-170, 170, 2)
        base = [r.tolist() for r in ring]
        ref = None
        for variant in (base, base[3:] + base[:3], base[::-1]):
            cx, cy, a2, ok = geo_ops.polygon_centroid_micro(
                _gb_of([variant]))
            if not ok[0]:
                ref = "degenerate"
                continue
            got = (int(cx[0]), int(cy[0]), int(a2[0]))
            if ref is None:
                # Fraction ground truth with trunc division
                xi = [int(np.floor(x * 1e6 + 0.5)) for x, _ in variant]
                yi = [int(np.floor(y * 1e6 + 0.5)) for _, y in variant]
                m = len(xi)
                cr = [xi[i] * yi[(i + 1) % m] - xi[(i + 1) % m] * yi[i]
                      for i in range(m)]
                A2 = sum(cr)
                nx = sum((xi[i] + xi[(i + 1) % m]) * cr[i]
                         for i in range(m))
                ny = sum((yi[i] + yi[(i + 1) % m]) * cr[i]
                         for i in range(m))

                def trunc(f):
                    return int(f) if f >= 0 else -int(-f)

                ref = (trunc(Fraction(nx, 3 * A2)),
                       trunc(Fraction(ny, 3 * A2)), abs(A2))
            if ref != "degenerate":
                # rotation/reversal invariance of the exact result
                assert got == ref, (trial, variant)


def test_polygon_centroid_end_to_end(ray_session):
    """Every centroid lies inside its polygon's bbox; area matches the
    polygon_area outer-ring component for single-ring polygons."""
    got = queries_ml.q_polygon_centroid(SF).to_pandas()
    assert len(got) > 0
    area = queries_ml.q_polygon_area(SF).to_pandas()
    a = area.set_index(["doc_id", "span_idx"])
    single = a[a.n_rings == 1]
    merged = got.set_index(["doc_id", "span_idx"]).join(
        single, how="inner")
    assert len(merged) > 0
    assert (merged.area2_outer == merged.area2_sum).all()


def test_quality_weights_deterministic_and_bounded():
    w = corpus_stage.quality_weights()
    assert len(w) == corpus_stage.QS_BUCKETS
    assert w.min() >= -1000 and w.max() <= 1000
    # scalar mirror (oracle/expected.py recomputes this independently)
    from grandine_ray.oracle.expected import _qs_weight

    for b in (0, 1, 17, 4095):
        assert w[b] == _qs_weight(b)


def test_hashed_bow_quality_kernel_scalar_parity():
    from grandine_ray.oracle.expected import _poly, _qs_weight

    texts = ["hello world hello", "", "  one  two ", "solo"]
    batch = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                      "text": pa.array(texts, pa.string())})
    out = corpus_stage.hashed_bow_quality(batch).to_pydict()
    for i, t in enumerate(texts):
        words = t.lower().split()
        want = sum(_qs_weight(_poly(w) % 4096) for w in words)
        assert out["n_words"][i] == len(words)
        assert out["score"][i] == want
        assert out["keep"][i] == int(want > 0)


def test_quality_score_end_to_end(ray_session):
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    got = queries_ml.q_quality_score(SF).to_pandas()
    assert len(got) == n_docs
    assert ((got.keep == 1) == (got.score > 0)).all()
    assert (got.n_words >= 0).all()


def test_target_affinity_end_to_end(ray_session):
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    got = queries_ml.q_target_affinity(SF).to_pandas()
    assert len(got) == n_docs
    assert (got.affinity >= 0).all()
    # en docs score strictly positive (they contribute to the target
    # distribution themselves); affinity bounded by n_words * 1e6
    assert (got.affinity <= got.n_words * 1_000_000).all()
    import pyarrow.parquet as pq

    langs = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "lang"]).to_pandas()
    m = got.merge(langs, on="doc_id")
    en = m[(m.lang == "en") & (m.n_words > 0)]
    assert (en.affinity > 0).all()


def test_ann_range_matches_brute_force(ray_session):
    import pyarrow.parquet as pq

    got = queries_ml.q_ann_range(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet")
    E = np.asarray(t["embedding"].to_pylist(), np.float64)
    ids = t["vec_id"].to_numpy()
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    Q = En[ids < 4]
    S = Q @ En.T
    qi, bi = np.nonzero(S >= queries_ml.ANN_RANGE_THRESHOLD)
    want = sorted(zip(ids[ids < 4][qi].tolist(), ids[bi].tolist()))
    assert sorted(zip(got.query_id, got.vec_id)) == want
    # self-pairs present with score 1.0
    self_rows = got[got.query_id == got.vec_id]
    assert len(self_rows) == 4 and (self_rows.score == 1.0).all()


def test_polygon_area_end_to_end(ray_session):
    got = queries_ml.q_polygon_area(SF).to_pandas()
    assert len(got) > 0
    assert (got.n_rings >= 1).all()
    assert (got.n_vertices >= 3).all()
    assert (got.area2_sum > 0).all()


def test_bloom_filter_no_false_negatives_and_low_fp():
    from grandine_ray.stages.relational import (_bloom_build_task,
                                                _bloom_positions)

    keys = np.arange(1000, dtype=np.int64) * 7 + 3
    t = pa.table({"k": pa.array(keys, pa.int64())})
    bm = _bloom_build_task(20, 4, t)

    def probe(ks):
        pos = _bloom_positions(ks, 20, 4)
        hit = np.ones(len(ks), bool)
        for i in range(4):
            p = pos[i]
            hit &= (bm[p >> np.uint64(6)]
                    >> (p & np.uint64(63))) & np.uint64(1) != 0
        return hit

    assert probe(keys).all()  # no false negatives, ever
    others = np.arange(100_000, 200_000, dtype=np.int64)
    assert probe(others).mean() < 1e-3  # 1k keys in 2^20 bits, k=4


def test_bloom_semi_join_equals_plain_semi(ray_session):
    """The Bloom pre-filter must not change the answer — compare against
    the same semi join without the pre-filter."""
    import pyarrow.compute as pc
    import ray.data as rd

    from grandine_ray.stages import relational

    got = queries_ml.q_bloom_semi_join(SF).to_pandas()

    li = rd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    lo = np.datetime64(queries_ml.BLOOM_SHIP_LO, "us").astype(np.int64)
    hi = np.datetime64(queries_ml.BLOOM_SHIP_HI, "us").astype(np.int64)

    def li_keys(b):
        sd = relational._ts_us(b["l_shipdate"])
        keep = (sd >= lo) & (sd < hi)
        keys = np.unique(
            relational._np(b["l_orderkey"]).astype(np.int64)[keep])
        return pa.table({"o_orderkey": pa.array(keys, pa.int64())})

    orders = rd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    slim = orders.map_batches(
        lambda b: pa.table({
            "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
            "o_orderpriority": b["o_orderpriority"]}),
        batch_format="pyarrow")
    plain = relational.hash_join_i64(
        slim, li.map_batches(li_keys, batch_format="pyarrow"),
        key="o_orderkey", left_carry={"o_orderpriority": pa.string()},
        right_carry={}, how="semi", P=4).to_pandas()

    a = sorted(map(tuple, got[["o_orderkey", "o_orderpriority"]].values))
    b = sorted(map(tuple, plain[["o_orderkey", "o_orderpriority"]].values))
    assert a == b and len(a) > 0


def test_linestring_length_kernel_known_values():
    from grandine_ray.geom import ops as gops

    class GB:
        pass

    gb = GB()
    gb.types = np.array([2, 2], np.uint8)
    gb.coords = np.array([[0, 0], [1, 0], [1, 1], [10, 10], [10, 11]],
                         float)
    gb.ring_offsets = np.array([0, 3, 5])
    gb.geom_offsets = np.array([0, 1, 2])
    ns, L = gops.linestring_length_mm(gb)
    assert ns.tolist() == [2, 1]
    d1 = (int(np.floor(gops.haversine_m(0, 0, 1, 0) * 1000 + 0.5))
          + int(np.floor(gops.haversine_m(1, 0, 1, 1) * 1000 + 0.5)))
    d2 = int(np.floor(gops.haversine_m(10, 10, 10, 11) * 1000 + 0.5))
    assert L.tolist() == [d1, d2]


def test_line_length_end_to_end(ray_session):
    got = queries_ml.q_line_length(SF).to_pandas()
    assert len(got) > 0
    assert (got.n_segments >= 1).all()
    assert (got.length_mm > 0).all()


def test_bigram_pmi_scalar_spot_check(ray_session):
    """Recompute PMI for every returned bigram from raw python Counters
    on the same corpus and compare exactly."""
    import pyarrow.parquet as pq
    from collections import Counter

    got = queries_ml.q_bigram_pmi(SF).to_pandas()
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    uni, big = Counter(), Counter()
    for t in texts:
        ws = t.lower().split()
        uni.update(ws)
        big.update(a + " " + b for a, b in zip(ws, ws[1:]))
    nu, nb = sum(uni.values()), sum(big.values())
    top = sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    want = {bg: (c, c * nu * nu * 1_000_000
                 // (nb * uni[bg.split(" ")[0]] * uni[bg.split(" ")[1]]))
            for bg, c in top}
    assert len(got) == len(want)
    for r in got.itertuples():
        assert (r.n, r.pmi_micro) == want[r.bigram]


def test_type_pagerank_invariants(ray_session):
    got = queries_ml.q_type_pagerank(SF).to_pandas()
    assert len(got) > 0
    assert (got.rank_micro > 0).all()
    # total rank mass stays within the damped fixed-point bounds:
    # at least the teleport mass, at most the initial mass (floor
    # division only loses mass)
    total = int(got.rank_micro.sum())
    n = len(got)
    assert n * (15 * 1_000_000 // (100 * n)) <= total <= 1_000_000


def test_type_pagerank_uniform_two_cycle():
    """A 2-node cycle with equal weights must converge to equal ranks —
    exercised through the same integer kernel the query uses."""
    import pyarrow.parquet as pq
    import tempfile, os

    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([7, 7, 7, 7], pa.int64()),
        "ts": pa.array([ts0 + np.timedelta64(i, "s") for i in range(4)],
                       pa.timestamp("us")),
        "event_type": pa.array(["a", "b", "a", "b"], pa.string()),
        "value": pa.array([0.0] * 4, pa.float64()),
        "props": pa.array(["{}"] * 4, pa.string()),
    })
    from grandine_ray.oracle.expected import expected_type_pagerank

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "events.parquet")
        pq.write_table(tbl, p)
        out = expected_type_pagerank(p).to_pydict()
    # a->b twice, b->a once: asymmetric counts but every edge is each
    # node's only out-edge, so the cycle equalizes
    assert out["event_type"] == ["a", "b"]
    assert abs(out["rank_micro"][0] - out["rank_micro"][1]) < 2000


def test_cell_smooth_brute_force(ray_session):
    """Independent oracle: python dict focal sums over the engine's own
    tile counts."""
    got = queries_ml.q_cell_smooth(SF).to_pandas()
    occ = {(r.x, r.y): r.n for r in got.itertuples()}
    assert len(occ) == len(got)
    for r in got.itertuples():
        want = sum(occ.get((r.x + dx, r.y + dy), 0)
                   for dx in (-1, 0, 1) for dy in (-1, 0, 1))
        assert r.smoothed == want
        assert r.smoothed >= r.n >= 1
    assert (got.z == queries_ml.SMOOTH_Z).all()


def test_basket_pairs_scalar_spot_check(ray_session):
    """Recompute pair counts + lift from python sets on raw lineitem."""
    import pyarrow.parquet as pq
    from collections import Counter
    from itertools import combinations

    got = queries_ml.q_basket_pairs(SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"])
    orders = {}
    for ok, pk in zip(li["l_orderkey"].to_pylist(),
                      li["l_partkey"].to_pylist()):
        orders.setdefault(ok, set()).add(pk)
    pc_, ic = Counter(), Counter()
    for parts in orders.values():
        for a, b in combinations(sorted(parts), 2):
            pc_[(a, b)] += 1
        ic.update(parts)
    n_orders = pq.read_metadata(f"{SF}/orders.parquet").num_rows
    top = sorted(pc_.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    want = {ab: (c, c * n_orders * 1_000_000 // (ic[ab[0]] * ic[ab[1]]))
            for ab, c in top}
    assert len(got) == len(want)
    for r in got.itertuples():
        assert (r.n, r.lift_micro) == want[(r.pa, r.pb)]


def test_skyline2d_kernel_brute_force():
    from grandine_ray.pipelines.queries_ml import _skyline2d

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 60))
        price = rng.integers(0, 10, n).astype(np.int64)
        size = rng.integers(0, 10, n).astype(np.int64)
        idx = set(_skyline2d(price, size).tolist())
        for a in range(n):
            dominated = any(
                price[b] <= price[a] and size[b] >= size[a]
                and (price[b] < price[a] or size[b] > size[a])
                for b in range(n))
            assert (a in idx) == (not dominated), (trial, a)


def test_part_skyline_closure_property(ray_session):
    """Global frontier == frontier computed on the full table at once."""
    import pyarrow.parquet as pq

    from grandine_ray.pipelines.queries_ml import _skyline2d

    got = queries_ml.q_part_skyline(SF).to_pandas()
    t = pq.read_table(f"{SF}/part.parquet",
                      columns=["p_partkey", "p_retailprice", "p_size"])
    price = np.floor(np.asarray(t["p_retailprice"].to_pylist()) * 100.0
                     + 0.5).astype(np.int64)
    size = np.asarray(t["p_size"].to_pylist(), np.int64)
    pk = np.asarray(t["p_partkey"].to_pylist(), np.int64)
    idx = _skyline2d(price, size)
    want = sorted(zip(pk[idx], price[idx], size[idx]))
    assert sorted(zip(got.p_partkey, got.price_cents, got.p_size)) == want
    assert len(got) > 0


def test_moran_i_brute_force(ray_session):
    """Recompute Moran's I from cell_smooth's occupied-tile counts with
    a python dict (8-neighborhood, occupied tiles only)."""
    got = queries_ml.q_moran_i(SF).to_pandas()
    assert len(got) == 1
    grid = queries_ml.q_cell_smooth(SF).to_pandas()
    occ = {(r.x, r.y): r.n for r in grid.itertuples()}
    N, S = len(occ), sum(occ.values())
    num = den = W = 0
    for (x, y), n in occ.items():
        d = N * n - S
        den += d * d
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                nj = occ.get((x + dx, y + dy))
                if nj is not None:
                    num += d * (N * nj - S)
                    W += 1
    q = abs(N * num * 1_000_000) // (W * den)
    want = q if num >= 0 else -q
    r = got.iloc[0]
    assert (r.n_tiles, r.w_pairs, r.moran_micro) == (N, W, want)
    # point clusters exist in the synth corpus: expect positive
    # autocorrelation
    assert r.moran_micro != 0


def test_geary_c_brute_force(ray_session):
    """Recompute Geary's C from cell_smooth's occupied-tile counts with
    a python dict (8-neighborhood, occupied tiles only)."""
    got = queries_ml.q_geary_c(SF).to_pandas()
    assert len(got) == 1
    grid = queries_ml.q_cell_smooth(SF).to_pandas()
    occ = {(r.x, r.y): r.n for r in grid.itertuples()}
    N, S = len(occ), sum(occ.values())
    num2 = den = W = 0
    for (x, y), n in occ.items():
        d = N * n - S
        den += d * d
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                nj = occ.get((x + dx, y + dy))
                if nj is not None:
                    num2 += (n - nj) * (n - nj)
                    W += 1
    want = ((N - 1) * N * N * num2 * 1_000_000) // (2 * W * den)
    r = got.iloc[0]
    assert (r.n_tiles, r.w_pairs, r.geary_micro) == (N, W, want)
    # with irregular weights and whale-tile skew C is unbounded above;
    # just require a non-degenerate positive statistic
    assert r.geary_micro > 0


def _occ_neighbor_terms():
    """Occupied-tile counts + 8-neighborhood sums from cell_smooth, as
    a python dict — shared ground truth for the local statistics."""
    grid = queries_ml.q_cell_smooth(SF).to_pandas()
    occ = {(r.x, r.y): r.n for r in grid.itertuples()}
    N, S = len(occ), sum(occ.values())
    terms = {}
    for (x, y), n in occ.items():
        nb = deg = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                nj = occ.get((x + dx, y + dy))
                if nj is not None:
                    nb += nj
                    deg += 1
        terms[(x, y)] = (n, nb, deg)
    return N, S, terms


def test_getis_hotspots_brute_force(ray_session):
    """Top-k excess ranking == brute-force recompute from cell_smooth's
    occupied grid (self-inclusive neighborhood mass vs expectation)."""
    got = queries_ml.q_getis_hotspots(SF).to_pandas()
    N, S, terms = _occ_neighbor_terms()
    rows = sorted(
        ((x, y, n, N * (n + nb) - (deg + 1) * S)
         for (x, y), (n, nb, deg) in terms.items()),
        key=lambda r: (-r[3], r[0], r[1]))[:queries_ml.HOTSPOT_K]
    assert list(zip(got.tile_x, got.tile_y, got.n, got.excess)) == rows
    assert len(got) == min(queries_ml.HOTSPOT_K, N)
    # clusters exist in the synth corpus: the top hotspot beats uniform
    assert got.excess.iloc[0] > 0


def test_lisa_quadrants_brute_force(ray_session):
    """Quadrant census == brute-force sign classification over the
    occupied grid (HH/LL/HL/LH/NS on exact integer deviations)."""
    got = queries_ml.q_lisa_quadrants(SF).to_pandas()
    N, S, terms = _occ_neighbor_terms()
    want: dict[str, int] = {}
    for (x, y), (n, nb, deg) in terms.items():
        d = N * n - S
        dn = N * nb - deg * S
        lab = ("HH" if d > 0 and dn > 0 else
               "LL" if d < 0 and dn < 0 else
               "HL" if d > 0 and dn < 0 else
               "LH" if d < 0 and dn > 0 else "NS")
        want[lab] = want.get(lab, 0) + 1
    assert dict(zip(got.quadrant, got.n_tiles)) == want
    assert int(got.n_tiles.sum()) == N
    # skewed point clusters: most tiles sit below the mean next to
    # below-mean neighborhoods
    assert want.get("LL", 0) > 0


def test_flow_directions_brute_force(ray_session):
    """Direction census == dict recompute: argmax neighbor count in
    (dx,dy) code order, flow only on strict increase, −1 = local mode."""
    got = queries_ml.q_flow_directions(SF).to_pandas()
    grid = queries_ml.q_cell_smooth(SF).to_pandas()
    occ = {(r.x, r.y): r.n for r in grid.itertuples()}
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)]
    want: dict[int, int] = {}
    for (x, y), n in occ.items():
        best, bdir = 0, -1
        for d, (dx, dy) in enumerate(offs):
            nj = occ.get((x + dx, y + dy), 0)
            if nj > best:
                best, bdir = nj, d
        flow = bdir if best > n else -1
        want[flow] = want.get(flow, 0) + 1
    assert dict(zip(got.direction, got.n_tiles)) == want
    assert int(got.n_tiles.sum()) == len(occ)
    assert want.get(-1, 0) >= 1  # at least one local mode exists


def test_degree_census_brute_force(ray_session):
    """Degree histogram == dict recompute over the occupied grid; sums
    to N and matches grid_morphology's erosion count at degree 8."""
    got = queries_ml.q_degree_census(SF).to_pandas()
    N, _S, terms = _occ_neighbor_terms()
    want: dict[int, int] = {}
    for (_n, _nb, deg) in terms.values():
        want[deg] = want.get(deg, 0) + 1
    assert dict(zip(got.degree, got.n_tiles)) == want
    assert int(got.n_tiles.sum()) == N
    morph = queries_ml.q_grid_morphology(SF).to_pandas().iloc[0]
    full = dict(zip(got.degree, got.n_tiles)).get(8, 0)
    assert full == morph.n_eroded


def test_layer_centroids_brute_force(ray_session):
    """Per-layer integer mean == Counter recompute from ground truth."""
    import duckdb

    from grandine_ray.sources import synth

    corpus = synth.corpus_for_sf(SF)
    con = duckdb.connect()
    g = con.execute(f"""
        SELECT layer, xs[1] x, ys[1] y
        FROM read_parquet('{corpus}/geoms.parquet')
        WHERE geom_type = 1""").df()
    got = queries_ml.q_layer_centroids(SF).to_pandas() \
        .set_index("layer")
    acc: dict[str, list[int]] = {}
    for r in g.itertuples():
        a = acc.setdefault(r.layer, [0, 0, 0])
        a[0] += 1
        a[1] += int(np.floor(r.x * 1e6 + 0.5))
        a[2] += int(np.floor(r.y * 1e6 + 0.5))
    assert sorted(got.index) == sorted(acc)
    for lay, (n, sx, sy) in acc.items():
        r = got.loc[lay]
        tr = (lambda v: abs(v) // n if v >= 0 else -(abs(v) // n))
        assert (r.n_points, r.cx_micro, r.cy_micro) == (n, tr(sx), tr(sy))


def test_k_core_brute_force(ray_session):
    """Core-number histogram == textbook peeling over the cell_smooth
    occupied grid, plus hierarchy invariants (cores nest; max ≤ 8)."""
    got = queries_ml.q_k_core(SF).to_pandas()
    grid = queries_ml.q_cell_smooth(SF).to_pandas()
    occ = {(r.x, r.y) for r in grid.itertuples()}
    nbrs = {v: [(v[0] + dx, v[1] + dy) for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0) and (v[0] + dx, v[1] + dy) in occ]
            for v in occ}
    deg = {v: len(ns) for v, ns in nbrs.items()}
    alive, core = set(occ), {}
    for k in range(1, 9):
        while True:
            rm = [v for v in alive if deg[v] < k]
            if not rm:
                break
            for v in rm:
                core[v] = k - 1
                alive.discard(v)
                for u in nbrs[v]:
                    if u in alive:
                        deg[u] -= 1
        for v in alive:
            core[v] = k
        if not alive:
            break
    want: dict[int, int] = {}
    for c in core.values():
        want[c] = want.get(c, 0) + 1
    assert dict(zip(got.core_k, got.n_tiles)) == want
    assert int(got.n_tiles.sum()) == len(occ)
    assert got.core_k.max() <= 8


def test_grid_distance_transform_brute_force(ray_session):
    """Distance histogram == dict BFS from the max-count tiles."""
    from collections import deque

    got = queries_ml.q_grid_distance_transform(SF).to_pandas()
    grid = queries_ml.q_cell_smooth(SF).to_pandas()
    occ = {(r.x, r.y): r.n for r in grid.itertuples()}
    mx = max(occ.values())
    dist = {v: 0 for v, n in occ.items() if n == mx}
    dq = deque(dist)
    while dq:
        v = dq.popleft()
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                u = (v[0] + dx, v[1] + dy)
                if u in occ and u not in dist:
                    dist[u] = dist[v] + 1
                    dq.append(u)
    want: dict[int, int] = {}
    for v in occ:
        d = dist.get(v, -1)
        want[d] = want.get(d, 0) + 1
    assert dict(zip(got.dist, got.n_tiles)) == want
    assert int(got.n_tiles.sum()) == len(occ)
    assert 0 in want  # sources exist


def test_tile_clusters_bfs_brute_force(ray_session):
    """Independent BFS connected-components oracle over the engine's
    own occupied-tile counts."""
    grid = queries_ml.q_cell_smooth(SF).to_pandas()
    occ = {(r.x, r.y): r.n for r in grid.itertuples()}
    core = {k for k, n in occ.items() if n >= queries_ml.CLUSTER_MINPTS}
    seen, want = set(), {}
    for start in core:
        if start in seen:
            continue
        stack, comp = [start], []
        seen.add(start)
        while stack:
            c = stack.pop()
            comp.append(c)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (c[0] + dx, c[1] + dy)
                    if nb in core and nb not in seen:
                        seen.add(nb)
                        stack.append(nb)
        root = min((x << 32) | y for x, y in comp)
        want[(root >> 32, root & 0xFFFFFFFF)] = (
            len(comp), sum(occ[c] for c in comp))
    got = queries_ml.q_tile_clusters(SF).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.cluster_x, r.cluster_y)] == (r.n_tiles, r.n_points)


def test_quadkey_prefix_property(ray_session):
    """Quadkey ancestor containment: a point's z-12 quadkey truncated
    to k chars equals the quadkey of its z-k tile; digits are valid
    base-4."""
    from grandine_ray.index.xyz import tile_xy
    import pyarrow.parquet as pq

    got = queries_ml.q_quadkey_cells(SF).to_pandas()
    assert len(got) > 0
    assert got.quadkey.str.len().eq(queries_ml.QUADKEY_Z).all()
    assert got.quadkey.str.match(r"^[0-3]+$").all()
    # recompute one digit level independently: first char = z-1 tile id
    from grandine_ray.pipelines.queries import _features_ds
    feats = _features_ds(SF).filter(expr="geom_type == 1").to_pandas()
    feats["span_idx"] = feats.span_idx.astype("int64")
    feats = feats.merge(got, on=["doc_id", "span_idx"])
    assert len(feats) == len(got)
    lon = feats.bbox_minx.to_numpy()
    lat = feats.bbox_miny.to_numpy()
    for k in (1, 5):
        x, y = tile_xy(lon, lat, k)
        digits_ok = 0
        for qk, xi, yi in zip(feats.quadkey, x.astype(int),
                              y.astype(int)):
            # decode prefix of length k back to (x, y) at zoom k
            px = py = 0
            for ch in qk[:k]:
                d = int(ch)
                px = (px << 1) | (d & 1)
                py = (py << 1) | (d >> 1)
            digits_ok += (px == xi and py == yi)
        assert digits_ok == len(feats)


def test_grid_morphology_brute_force(ray_session):
    got = queries_ml.q_grid_morphology(SF).to_pandas()
    assert len(got) == 1
    grid = queries_ml.q_cell_smooth(SF).to_pandas()
    occ = {(r.x, r.y) for r in grid.itertuples()}
    dil = {(x + dx, y + dy) for (x, y) in occ
           for dx in (-1, 0, 1) for dy in (-1, 0, 1)}
    ero = {c for c in occ
           if all((c[0] + dx, c[1] + dy) in occ
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                  if (dx, dy) != (0, 0))}
    r = got.iloc[0]
    assert (r.n_occupied, r.n_dilated, r.n_eroded) == \
        (len(occ), len(dil), len(ero))


def test_sliding_distinct_brute_force(ray_session):
    import pyarrow.parquet as pq

    got = queries_ml.q_sliding_distinct(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "user_id"]).to_pandas()
    epoch = ev.ts.values.astype("datetime64[s]").astype("int64")
    want = {}
    for e, u in zip(epoch, ev.user_id):
        ws0 = e // 1800 * 1800
        for ws in (ws0, ws0 - 1800):
            want.setdefault(ws, set()).add(u)
    got_map = {int(r.window_start.timestamp()): r.n_users
               for r in got.itertuples()}
    assert got_map == {ws: len(s) for ws, s in want.items()}


def test_conversion_latency_brute_force(ray_session):
    import pyarrow.parquet as pq

    got = queries_ml.q_conversion_latency(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["us"] = ev.ts.values.astype("datetime64[us]").astype("int64")
    want = {}
    for uid, g in ev.groupby("user_id"):
        views = g[g.event_type == "view"].sort_values(["us", "event_id"])
        lats = []
        for r in g[g.event_type == "click"].itertuples():
            prior = views[views.us <= r.us]
            if len(prior):
                lats.append((r.us - prior.us.max()) // 1_000_000)
        if lats:
            want[uid] = (len(lats), min(lats), max(lats), sum(lats))
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.user_id] == (r.n_conv, r.min_s, r.max_s, r.sum_s)


def test_span_path_length_brute_force(ray_session):
    """Dict brute force over the engine's own point features — and the
    span-ORDER dependence: the path through spans in order differs from
    a sorted-by-coordinate path for some doc (sequence is load-bearing)."""
    from grandine_ray.geom.ops import haversine_m
    from grandine_ray.pipelines.queries import _features_ds

    got = queries_ml.q_span_path_length(SF).to_pandas()
    feats = _features_ds(SF).filter(expr="geom_type == 1").to_pandas()
    want = {}
    for doc, g in feats.groupby("doc_id"):
        g = g.sort_values("span_idx")
        if len(g) < 2:
            continue
        lon = g.bbox_minx.to_numpy()
        lat = g.bbox_miny.to_numpy()
        mm = np.floor(haversine_m(lon[:-1], lat[:-1], lon[1:], lat[1:])
                      * 1000.0 + 0.5).astype(np.int64)
        want[doc] = (len(g), int(mm.sum()))
    assert len(got) == len(want)
    order_matters = 0
    for r in got.itertuples():
        assert want[r.doc_id] == (r.n_pts, r.path_mm)
    # sequence dependence: permuting spans changes some path
    for doc, g in feats.groupby("doc_id"):
        if len(g) < 3:
            continue
        g = g.sort_values("span_idx")
        lon = g.bbox_minx.to_numpy()
        lat = g.bbox_miny.to_numpy()
        base = np.floor(haversine_m(lon[:-1], lat[:-1], lon[1:], lat[1:])
                        * 1000.0 + 0.5).sum()
        lon2, lat2 = lon[::-1].copy(), lat[::-1].copy()
        lon2[0], lon2[1] = lon2[1], lon2[0]
        lat2[0], lat2[1] = lat2[1], lat2[0]
        alt = np.floor(haversine_m(lon2[:-1], lat2[:-1], lon2[1:],
                                   lat2[1:]) * 1000.0 + 0.5).sum()
        if base != alt:
            order_matters += 1
    assert order_matters > 0


def test_pip_counts_matches_pip_join(ray_session):
    """pip_counts must equal a dict-count of the pip_join pairs."""
    from grandine_ray.pipelines.queries import q_pip_join

    pairs = q_pip_join(SF).to_pandas()
    want = pairs.groupby("polygon_id").size().to_dict()
    got = queries_ml.q_pip_counts(SF).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.polygon_id] == r.n_points


def test_revenue_concentration_brute_force(ray_session):
    import pyarrow.parquet as pq
    from collections import defaultdict

    got = queries_ml.q_revenue_concentration(SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey", "o_totalprice"]) \
        .to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = pq.read_table(f"{SF}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    nk_of = dict(zip(cust.c_custkey, cust.c_nationkey))
    cents = defaultdict(int)
    for r in orders.itertuples():
        cents[r.o_custkey] += int(np.floor(r.o_totalprice * 100 + 0.5))
    per_nk = defaultdict(list)
    for ck, c in cents.items():
        per_nk[nk_of[ck]].append((-c, ck, c))
    names = dict(zip(nation.n_nationkey, nation.n_name))
    want = {}
    for nk, rows in per_nk.items():
        rows.sort()
        total = sum(c for _, _, c in rows)
        top = sum(c for _, _, c in rows[:queries_ml.CONC_TOPK])
        want[names[nk]] = (total, top, top * 1_000_000 // total)
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.n_name] == (r.total_cents, r.top10_cents,
                                  r.share_ppm)


def test_revenue_gini_brute_force(ray_session):
    import pyarrow.parquet as pq
    from collections import defaultdict

    got = queries_ml.q_revenue_gini(SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey", "o_totalprice"]) \
        .to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    nk_of = dict(zip(cust.c_custkey, cust.c_nationkey))
    cents = defaultdict(int)
    for r in orders.itertuples():
        cents[r.o_custkey] += int(np.floor(r.o_totalprice * 100 + 0.5))
    per_nk = defaultdict(list)
    for ck, c in cents.items():
        per_nk[nk_of[ck]].append((c, ck))
    names = dict(zip(nation.n_nationkey, nation.n_name))
    want = {}
    for nk, rows in per_nk.items():
        rows.sort()
        n = len(rows)
        sx = sum(c for c, _ in rows)
        ix = sum((i + 1) * c for i, (c, _) in enumerate(rows))
        want[names[nk]] = (n, (2 * ix - (n + 1) * sx) * 1_000_000
                           // (n * sx))
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.n_name] == (r.n_customers, r.gini_ppm)
        assert 0 <= r.gini_ppm < 1_000_000


def test_tile_hhi_brute_force(ray_session):
    got = queries_ml.q_tile_hhi(SF).to_pandas()
    grid = queries_ml.q_cell_smooth(SF).to_pandas()
    s = int(grid.n.sum())
    sq = int((grid.n ** 2).sum())
    r = got.iloc[0]
    assert (r.n_tiles, r.n_points) == (len(grid), s)
    assert r.hhi_ppm == sq * 1_000_000 // (s * s)
    # bounds: 1e6/n_tiles <= hhi <= 1e6
    assert 1_000_000 // len(grid) <= r.hhi_ppm <= 1_000_000


def test_tile_triangles_brute_force(ray_session):
    from itertools import combinations

    got = queries_ml.q_tile_triangles(SF).to_pandas()
    grid = queries_ml.q_cell_smooth(SF).to_pandas()
    occ = {(r.x, r.y) for r in grid.itertuples()}

    def adj(a, b):
        return a != b and abs(a[0] - b[0]) <= 1 and abs(a[1] - b[1]) <= 1

    edges = 0
    tris = 0
    cells = sorted(occ)
    nbrs = {c: [d for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0)
                and (d := (c[0] + dx, c[1] + dy)) in occ]
            for c in cells}
    for c in cells:
        edges += len(nbrs[c])
        for a, b in combinations(nbrs[c], 2):
            if adj(a, b):
                tris += 1
    r = got.iloc[0]
    assert (r.n_tiles, r.n_edges, r.n_triangles) == \
        (len(occ), edges // 2, tris // 3)


def test_trending_parts_brute_force(ray_session):
    import pyarrow.parquet as pq
    from collections import Counter, defaultdict

    got = queries_ml.q_trending_parts(SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_partkey", "l_shipdate"]).to_pandas()
    day = li.l_shipdate.values.astype("datetime64[D]")
    cnt = Counter(zip(day, li.l_partkey))
    per_day = defaultdict(list)
    for (d, pk), n in cnt.items():
        per_day[d].append((-n, pk, n))
    want = {}
    for d, rows in per_day.items():
        rows.sort()
        for rank, (_, pk, n) in enumerate(rows[:queries_ml.TREND_TOPK],
                                          start=1):
            want[(np.datetime64(d, "us"), pk)] = (n, rank)
    assert len(got) == len(want)
    for r in got.itertuples():
        key = (np.datetime64(r.ship_day, "us"), r.l_partkey)
        assert want[key] == (r.n, r.rank)


def test_daily_value_median_brute_force(ray_session):
    import pyarrow.parquet as pq
    from collections import defaultdict

    got = queries_ml.q_daily_value_median(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type", "value"]).to_pandas()
    day = ev.ts.values.astype("datetime64[D]")
    vm = np.floor(ev.value.values * 1000 + 0.5).astype(np.int64)
    groups = defaultdict(list)
    for d, t, v in zip(day, ev.event_type, vm):
        groups[(t, np.datetime64(d, "us"))].append(v)
    assert len(got) == len(groups)
    for r in got.itertuples():
        vals = sorted(groups[(r.event_type, np.datetime64(r.day, "us"))])
        # quantile_disc(0.5): the value at ceil(0.5*n)-th position
        want = vals[max(0, -(-len(vals) // 2) - 1)]
        assert (r.n_rows, r.p50_milli) == (len(vals), want)


def test_winsorized_sum_brute_force(ray_session):
    import pyarrow.parquet as pq
    from collections import defaultdict

    got = queries_ml.q_winsorized_sum(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    vm = np.floor(ev.value.values * 1000 + 0.5).astype(np.int64)
    groups = defaultdict(list)
    for t, v in zip(ev.event_type, vm):
        groups[t].append(int(v))
    assert len(got) == len(groups)
    for r in got.itertuples():
        vals = sorted(groups[r.event_type])
        n = len(vals)
        p05 = vals[max(0, -(-n * 5 // 100) - 1)]   # quantile_disc
        p95 = vals[max(0, -(-n * 95 // 100) - 1)]
        wsum = sum(min(max(v, p05), p95) for v in vals)
        assert (r.n, r.p05_milli, r.p95_milli,
                r.winsorized_sum_milli) == (n, p05, p95, wsum)
        assert r.p05_milli <= r.p95_milli


def test_arrival_dispersion_brute_force(ray_session):
    import pyarrow.parquet as pq
    from collections import defaultdict

    got = queries_ml.q_arrival_dispersion(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "ts", "event_type"]) \
        .to_pandas()
    ev["us"] = ev.ts.values.astype("datetime64[us]").astype("int64")
    want = {}
    for t, g in ev.groupby("event_type"):
        g = g.sort_values(["us", "event_id"])
        d = (np.diff(g.us.values) // 1_000_000).astype(np.int64)
        n = len(d)
        sd = int(d.sum())
        sq = sum(int(v) * int(v) for v in d)
        fano = ((n * sq - sd * sd) * 1_000_000 // ((n - 1) * sd)
                if n > 1 and sd else 0)
        want[t] = (n, sd, fano)
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.event_type] == (r.n_gaps, r.sum_gap_s, r.fano_ppm)


def test_lang_centroids_brute_force(ray_session):
    import pyarrow.parquet as pq
    from collections import defaultdict

    got = queries_ml.q_lang_centroids(SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    lang_of = dict(zip(docs.doc_id, docs.lang))
    sums = defaultdict(lambda: None)
    counts = defaultdict(int)
    for r in emb.itertuples():
        lg = lang_of[r.vec_id]
        v = np.asarray(r.embedding, np.float64)
        sums[lg] = v if sums[lg] is None else sums[lg] + v
        counts[lg] += 1
    assert set(got.lang) == set(counts)
    for lg, g in got.groupby("lang"):
        g = g.sort_values("dim")
        mean = sums[lg] / counts[lg]
        want = np.floor(mean * 1e6 + 0.5).astype(np.int64)
        assert (g.n == counts[lg]).all()
        # final-scalar micro rounding: allow 1 ulp-induced off-by-one
        assert (np.abs(g.centroid_micro.values - want) <= 1).all()
        assert (g.centroid_micro.values == want).mean() > 0.95


def test_component_diameters_vs_expected(ray_session):
    """Engine census == independent scalar BFS at sf0.001, plus shape
    invariants (diameter < size; singletons have diameter 0)."""
    from grandine_ray.oracle.expected import expected_component_diameters
    from grandine_ray.sources import synth

    corpus = synth.corpus_for_sf(SF)
    want = expected_component_diameters(corpus).to_pandas()
    got = queries_ml.q_component_diameters(SF).to_pandas()
    g = sorted(map(tuple, got.values.tolist()))
    w = sorted(map(tuple, want.values.tolist()))
    assert g == w and len(g) > 0
    for r in got.itertuples():
        assert r.diameter < max(r.n_tiles, 1) or r.n_tiles == 1
        if r.n_tiles == 1:
            assert r.diameter == 0


def test_polygon_edge_stats_micro_known_values():
    class GB:
        pass

    gb = GB()
    gb.types = np.array([3, 3], np.uint8)
    # unit square; triangle with a small triangular hole
    gb.coords = np.array(
        [[0, 0], [1, 0], [1, 1], [0, 1],
         [0, 0], [3, 0], [0, 3], [1, 1], [1.5, 1], [1, 1.5]], float)
    gb.ring_offsets = np.array([0, 4, 7, 10])
    gb.geom_offsets = np.array([0, 1, 3])
    n_edges, manh, max2 = geo_ops.polygon_edge_stats_micro(gb)
    assert n_edges.tolist() == [4, 6]
    # square: 4 axis edges of 1e6 micro each
    assert manh[0] == 4_000_000 and max2[0] == 10**12
    # outer 3+6+3 Mmicro, hole 0.5+1+0.5 Mmicro; hypotenuse dx=dy=3e6
    assert manh[1] == 14_000_000
    assert max2[1] == 18 * 10**12


def test_local_clustering_brute_force(ray_session):
    from itertools import combinations

    got = queries_ml.q_local_clustering(SF).to_pandas()
    grid = queries_ml.q_cell_smooth(SF).to_pandas()
    occ = {(r.x, r.y) for r in grid.itertuples()}
    census: dict = {}
    for c in occ:
        nbrs = [d for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0)
                and (d := (c[0] + dx, c[1] + dy)) in occ]
        tp = sum(1 for a, b in combinations(nbrs, 2)
                 if abs(a[0] - b[0]) <= 1 and abs(a[1] - b[1]) <= 1)
        k = (len(nbrs), tp)
        census[k] = census.get(k, 0) + 1
    want = sorted((d, t, n) for (d, t), n in census.items())
    have = sorted(zip(got.degree, got.tri_pairs, got.n_tiles))
    assert [tuple(map(int, r)) for r in have] == want
    # every census row satisfies the wedge bound tp <= C(deg, 2)
    assert all(t <= d * (d - 1) // 2 for d, t, _ in have)


def test_polygon_edge_stats_micro_random_vs_scalar():
    rng = np.random.default_rng(7)
    for _ in range(50):
        n_geoms = int(rng.integers(1, 5))
        rings_per = [int(rng.integers(1, 4)) for _ in range(n_geoms)]
        coords, ro, go = [], [0], [0]
        for nr in rings_per:
            for _ in range(nr):
                nv = int(rng.integers(3, 9))
                pts = rng.uniform(-50, 50, (nv, 2))
                coords.extend(pts.tolist())
                ro.append(ro[-1] + nv)
            go.append(go[-1] + nr)

        class GB:
            pass

        gb = GB()
        gb.types = np.full(n_geoms, 3, np.uint8)
        gb.coords = np.array(coords, float)
        gb.ring_offsets = np.array(ro)
        gb.geom_offsets = np.array(go)
        n_edges, manh, max2 = geo_ops.polygon_edge_stats_micro(gb)
        # scalar re-implementation over the same micro-integerization
        xi = np.floor(gb.coords[:, 0] * 1e6 + 0.5).astype(np.int64)
        yi = np.floor(gb.coords[:, 1] * 1e6 + 0.5).astype(np.int64)
        for g in range(n_geoms):
            ne = ms = mx = 0
            for r in range(go[g], go[g + 1]):
                lo, hi = ro[r], ro[r + 1]
                for i in range(lo, hi):
                    j = i + 1 if i + 1 < hi else lo
                    dx = abs(int(xi[j]) - int(xi[i]))
                    dy = abs(int(yi[j]) - int(yi[i]))
                    ne += 1
                    ms += dx + dy
                    mx = max(mx, dx * dx + dy * dy)
            assert (n_edges[g], manh[g], max2[g]) == (ne, ms, mx)


def test_polygon_fill_invariants(ray_session):
    got = queries_ml.q_polygon_fill(SF).to_pandas()
    area = queries_ml.q_polygon_area(SF).to_pandas()
    assert len(got) == len(area) > 0
    j = got.merge(area, on=["doc_id", "span_idx"])
    # shoelace |2A| of each ring ≤ bbox 2A; holes add, so ≤ 2× bbox
    assert (j.fill_ppm >= 0).all()
    assert (j.fill_ppm <= 2_000_000).all()
    # exact ratio re-derivation on Python ints
    for r in j.sample(min(50, len(j)), random_state=0).itertuples():
        want = 0 if r.bbox_area2 == 0 else \
            int(r.area2_sum) * 1_000_000 // int(r.bbox_area2)
        assert r.fill_ppm == want


def test_hard_negatives_matches_brute_force(ray_session):
    import pyarrow.parquet as pq

    got = queries_ml.q_hard_negatives(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet")
    E = np.asarray(t["embedding"].to_pylist(), np.float64)
    ids = t["vec_id"].to_numpy()
    lab = t["label"].to_numpy()
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    qm = ids < 6
    S = En[qm] @ En.T
    K = queries_ml.HARD_K
    want = []
    for qi, (qid, ql) in enumerate(zip(ids[qm], lab[qm])):
        for pol, keep, key in (
                ("neg", lab != ql, lambda s, v: (-s, v)),
                ("pos", lab == ql, lambda s, v: (s, v))):
            cand = [(key(S[qi, j], int(ids[j])), int(ids[j]))
                    for j in np.nonzero(keep & (ids != qid))[0]]
            for rank, (_, vid) in enumerate(sorted(cand)[:K], 1):
                want.append((int(qid), pol, vid, rank))
    got_rows = sorted(zip(got.query_id, got.polarity, got.vec_id,
                          got["rank"]))
    assert got_rows == sorted(want) and len(want) == 6 * 2 * K
    # every neg scores a different label, every pos the same label
    lab_of = dict(zip(ids.tolist(), lab.tolist()))
    for r in got.itertuples():
        same = lab_of[r.vec_id] == lab_of[r.query_id]
        assert same == (r.polarity == "pos")
