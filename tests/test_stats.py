"""Statistics stages: exact group quantiles (DuckDB quantile_disc
semantics), exact + HLL distinct counts, generic hash join, interval join."""
import duckdb
import numpy as np
import pyarrow as pa
import pytest

from grandine_ray.stages import relational
from grandine_ray.stages import stats


# ------------------------------------------------ quantile_disc semantics


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 10, 97])
@pytest.mark.parametrize("q", [0.0, 0.25, 0.5, 0.75, 0.95, 1.0])
def test_quantile_disc_matches_duckdb(n, q):
    rng = np.random.default_rng(n * 1000 + int(q * 100))
    vals = rng.integers(0, 20, n).astype(np.int64)
    got = stats.quantile_disc_sorted(*_hist(vals), q)
    want = duckdb.sql(
        f"SELECT quantile_disc(x, {q}) FROM (SELECT UNNEST({vals.tolist()}) x)"
    ).fetchone()[0]
    assert got == want


def _hist(vals):
    u, c = np.unique(vals, return_counts=True)
    return u, c


def test_group_quantiles_dataset(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    g = rng.choice(["a", "b", "c"], 5000)
    v = rng.integers(0, 300, 5000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "v": v})).repartition(8)
    out = stats.group_quantiles(ds, "g", "v", [0.5, 0.9], ["p50", "p90"])
    got = {r["g"]: (r["n_rows"], r["p50"], r["p90"]) for r in out.take_all()}
    for grp in "abc":
        sel = np.sort(v[g == grp])
        n = len(sel)
        exp = tuple(int(sel[min(max(int(np.ceil(q * n)), 1), n) - 1])
                    for q in (0.5, 0.9))
        assert got[grp] == (n, *exp)


# ------------------------------------------------------- distinct counts


def test_distinct_exact_and_hll(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    g = rng.choice(["x", "y"], 20000)
    v = rng.integers(0, 2500, 20000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "v": v})).repartition(6)
    exact = {r["g"]: r["n_distinct"]
             for r in stats.distinct_count_exact(ds, "g", "v").take_all()}
    truth = {grp: len(np.unique(v[g == grp])) for grp in "xy"}
    assert exact == truth
    est = {r["g"]: r["n_distinct_est"]
           for r in stats.distinct_count_hll(ds, "g", "v").take_all()}
    for grp in "xy":
        assert abs(est[grp] - truth[grp]) / truth[grp] < 0.06


def test_hll_merge_equals_single_pass():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 10**12, 5000)
    b = rng.integers(0, 10**12, 5000)
    merged = np.maximum(stats.hll_partial(a), stats.hll_partial(b))
    single = stats.hll_partial(np.concatenate([a, b]))
    assert np.array_equal(merged, single)


# ------------------------------------------------------------- hash join


def _join_fixture():
    rng = np.random.default_rng(5)
    lk = rng.integers(0, 50, 400).astype(np.int64)
    lval = rng.integers(0, 1000, 400).astype(np.int64)
    rk = np.unique(rng.integers(0, 60, 45)).astype(np.int64)
    rval = (rk * 7 + 1).astype(np.int64)
    return lk, lval, rk, rval


@pytest.mark.parametrize("how", ["inner", "left"])
def test_hash_join_vs_duckdb(ray_session, how):
    import ray.data as rd

    lk, lval, rk, rval = _join_fixture()
    left = rd.from_arrow(pa.table({"k": lk, "lv": lval})).repartition(4)
    right = rd.from_arrow(pa.table({"k": rk, "rv": rval})).repartition(3)
    out = relational.hash_join_i64(
        left, right, "k", {"lv": pa.int64()}, {"rv": pa.int64()},
        P=7, how=how).take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
    con = duckdb.connect()
    con.register("l", pa.table({"k": lk, "lv": lval}))
    con.register("r", pa.table({"k": rk, "rv": rval}))
    kw = "JOIN" if how == "inner" else "LEFT JOIN"
    want = sorted(con.execute(
        f"SELECT l.k, lv, rv FROM l {kw} r ON l.k = r.k").fetchall())
    assert got == want


def test_hash_join_full_vs_duckdb(ray_session):
    import ray.data as rd

    lk, lval, rk, rval = _join_fixture()
    left = rd.from_arrow(pa.table({"k": lk, "lv": lval})).repartition(4)
    right = rd.from_arrow(pa.table({"k": rk, "rv": rval})).repartition(3)
    out = relational.hash_join_i64(
        left, right, "k", {"lv": pa.int64()}, {"rv": pa.int64()},
        P=7, how="full").take_all()
    got = sorted(((r["k"], r["lv"], r["rv"]) for r in out),
                 key=lambda t: tuple(-2 if v is None else v for v in t))
    con = duckdb.connect()
    con.register("l", pa.table({"k": lk, "lv": lval}))
    con.register("r", pa.table({"k": rk, "rv": rval}))
    want = sorted(con.execute(
        "SELECT COALESCE(l.k, r.k), lv, rv "
        "FROM l FULL OUTER JOIN r ON l.k = r.k").fetchall(),
        key=lambda t: tuple(-2 if v is None else v for v in t))
    assert got == want
    # keys 50..59 exist only on the right: they must appear exactly once
    right_only = [r for r in want if r[1] is None]
    assert len(right_only) > 0


def test_hash_join_full_rejects_salt(ray_session):
    import ray.data as rd

    left = rd.from_arrow(pa.table({"k": [1], "lv": [0]}))
    right = rd.from_arrow(pa.table({"k": [2], "rv": [3]}))
    with pytest.raises(ValueError, match="salt"):
        relational.hash_join_i64(
            left, right, "k", {"lv": pa.int64()}, {"rv": pa.int64()},
            P=2, how="full", salt=2)


def test_hash_join_rejects_dup_right(ray_session):
    import ray.data as rd

    left = rd.from_arrow(pa.table({"k": [1], "lv": [0]}))
    right = rd.from_arrow(pa.table({"k": [1, 1], "rv": [2, 3]}))
    with pytest.raises(Exception, match="not unique"):
        relational.hash_join_i64(
            left, right, "k", {"lv": pa.int64()}, {"rv": pa.int64()},
            P=2).take_all()


# --------------------------------------------------------- interval join


@pytest.mark.parametrize("bucket_us", [500, 1700, 10_000])
def test_interval_join_bruteforce(ray_session, bucket_us):
    import ray.data as rd

    rng = np.random.default_rng(13)
    ts = np.sort(rng.integers(0, 100_000, 800)).astype(np.int64)
    eid = np.arange(800, dtype=np.int64)
    t0 = rng.integers(0, 100_000, 30).astype(np.int64)
    ln = rng.integers(1, 9_000, 30).astype(np.int64)
    t1 = t0 + ln
    iid = np.arange(30, dtype=np.int64)
    left = rd.from_arrow(pa.table({"ts": ts, "event_id": eid})).repartition(5)
    iv = rd.from_arrow(pa.table({"iid": iid, "t0": t0, "t1": t1}))
    out = relational.interval_join(
        left, "ts", {"event_id": pa.int64()},
        iv, "iid", "t0", "t1", bucket_us=bucket_us).take_all()
    got = sorted((r["iid"], r["event_id"]) for r in out)
    want = sorted((int(i), int(e))
                  for i in iid for e in eid
                  if t0[i] <= ts[e] < t1[i])
    assert got == want


def test_label_centroids_bruteforce(ray_session):
    import ray.data as rd

    from grandine_ray.stages.ann import label_centroids

    rng = np.random.default_rng(21)
    lab = rng.integers(0, 4, 300).astype(np.int64)
    vecs = rng.normal(0, 1, (300, 8)).astype(np.float32)
    tbl = pa.table({
        "label": lab,
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(5)
    out = label_centroids(ds).take_all()
    got = {(r["label"], r["dim"]): (r["n"], r["centroid_micro"])
           for r in out}
    assert len(got) == 4 * 8
    for l in range(4):
        sel = vecs[lab == l].astype(np.float64)
        for d in range(8):
            mean = sel[:, d].sum() / len(sel)
            want = int(np.floor(mean * 1e6 + 0.5))
            n, cm = got[(l, d)]
            assert n == len(sel)
            assert abs(cm - want) <= 1  # summation-order ulp at the grid edge


def test_misra_gries_bounds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(17)
    # zipf-ish: item i has weight ~ 1/(i+1)
    ranks = rng.zipf(1.3, 30000)
    items = np.array([f"t{min(int(r), 500)}" for r in ranks])
    ds = rd.from_arrow(pa.table({"item": items})).repartition(8)
    out = stats.heavy_hitters_mg(ds, "item", k=32).take_all()
    est = {r["item"]: r["est"] for r in out}
    assert len(est) <= 32
    vals, cnts = np.unique(items, return_counts=True)
    true = dict(zip(vals.tolist(), cnts.tolist()))
    n = len(items)
    err = n // (32 + 1)
    for it, e in est.items():
        assert true[it] - err * 3 <= e <= true[it]   # merged-summary bound
    # every truly heavy item must be present
    for it, c in true.items():
        if c > 3 * err:
            assert it in est, (it, c)


def test_mg_merge_properties():
    a = {"x": 10, "y": 4, "z": 2}
    b = {"x": 3, "w": 9, "y": 1}
    m = stats.mg_merge(a, b, k=2)
    assert len(m) <= 2
    assert m["x"] <= 13 and m.get("w", 0) <= 9
    full = stats.mg_compress({"x": 13, "y": 5, "z": 2, "w": 9}, 2)
    assert m == full


@pytest.mark.parametrize("how", ["semi", "anti"])
def test_hash_join_semi_anti(ray_session, how):
    import duckdb
    import ray.data as rd

    lk, lval, rk, _ = _join_fixture()
    rk_dup = np.concatenate([rk, rk[:10]])  # membership: dups allowed
    left = rd.from_arrow(pa.table({"k": lk, "lv": lval})).repartition(4)
    right = rd.from_arrow(pa.table({"k": rk_dup})).repartition(3)
    out = relational.hash_join_i64(
        left, right, "k", {"lv": pa.int64()}, {}, P=5, how=how).take_all()
    got = sorted((r["k"], r["lv"]) for r in out)
    con = duckdb.connect()
    con.register("l", pa.table({"k": lk, "lv": lval}))
    con.register("r", pa.table({"k": rk_dup}))
    op = "" if how == "semi" else "NOT"
    want = sorted(con.execute(
        f"SELECT k, lv FROM l WHERE {op} EXISTS "
        f"(SELECT 1 FROM r WHERE r.k = l.k)").fetchall())
    assert got == want


# ------------------------------------------------------ property tests


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_interval_join_kernel_property(data):
    """Partition-level kernel property: bucket-replicated interval join
    equals brute force for random intervals/timestamps/bucket widths
    (pure-numpy mirror of relational.interval_join's tag+resolve maths,
    so hypothesis can drive it without a Ray round trip per example)."""
    rng_seed = data.draw(st.integers(0, 2**31 - 1))
    bucket = data.draw(st.sampled_from([7, 50, 333, 1000]))
    rng = np.random.default_rng(rng_seed)
    n_ev = int(rng.integers(1, 120))
    n_iv = int(rng.integers(1, 25))
    ts = rng.integers(0, 2000, n_ev).astype(np.int64)
    t0 = rng.integers(-50, 2000, n_iv).astype(np.int64)
    t1 = t0 + rng.integers(1, 400, n_iv).astype(np.int64)
    got = set()
    # replicate intervals to buckets, join per bucket (the kernel)
    for i in range(n_iv):
        b0, b1 = t0[i] // bucket, max((t1[i] - 1) // bucket, t0[i] // bucket)
        for b in range(b0, b1 + 1):
            ct0 = max(t0[i], b * bucket)
            ct1 = min(t1[i], (b + 1) * bucket)
            for e in range(n_ev):
                if ts[e] // bucket == b and ct0 <= ts[e] < ct1:
                    got.add((i, e))
    want = {(i, e) for i in range(n_iv) for e in range(n_ev)
            if t0[i] <= ts[e] < t1[i]}
    assert got == want


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(1, 500), min_size=1, max_size=60),
       st.integers(8, 300))
def test_pack_greedy_kernel_property(tokens, budget):
    """The per-PACK searchsorted loop in pack_sequences equals the
    doc-by-doc greedy walk for arbitrary token sequences."""
    toks = np.asarray(tokens, np.int64)
    cs = np.cumsum(toks)
    n = len(toks)
    pack_id = np.empty(n, np.int64)
    start, local = 0, 0
    while start < n:
        base = cs[start - 1] if start else 0
        end = int(np.searchsorted(cs, base + budget, side="right"))
        if end == start:
            end = start + 1
        pack_id[start:end] = local
        local += 1
        start = end
    # scalar greedy reference
    ref = []
    acc, pos, cur = 0, 0, 0
    for t in tokens:
        if pos > 0 and acc + t > budget:
            cur += 1
            acc, pos = 0, 0
        ref.append(cur)
        acc += t
        pos += 1
    assert pack_id.tolist() == ref


def test_tdigest_accuracy_and_merge(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    g = rng.choice(["a", "b"], 60000)
    v = np.where(g == "a", rng.normal(100, 15, 60000),
                 rng.lognormal(3, 1, 60000))
    ds = rd.from_arrow(pa.table({"g": g, "v": v})).repartition(12)
    out = stats.group_quantiles_tdigest(
        ds, "g", "v", [0.01, 0.25, 0.5, 0.75, 0.99],
        ["p01", "p25", "p50", "p75", "p99"])
    got = {r["g"]: r for r in out.take_all()}
    for grp in "ab":
        sel = np.sort(v[g == grp])
        n = len(sel)
        assert got[grp]["n_rows"] == n
        for q, name in [(0.01, "p01"), (0.25, "p25"), (0.5, "p50"),
                        (0.75, "p75"), (0.99, "p99")]:
            est = got[grp][name]
            # rank error: where does the estimate land in the true CDF?
            rank = np.searchsorted(sel, est) / n
            assert abs(rank - q) < 0.02, (grp, q, est, rank)


def test_tdigest_centroid_bound():
    rng = np.random.default_rng(10)
    m, w = stats.tdigest_build(rng.normal(0, 1, 50000), np.ones(50000),
                               delta=100)
    assert len(m) <= 200          # ~delta centroids after merge
    assert np.all(np.diff(m) >= 0)
    assert int(w.sum()) == 50000


def test_kmeans_distributed(ray_session):
    import ray.data as rd

    from grandine_ray.stages.ann import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(5)
    centers = rng.normal(0, 10, (4, 6))
    lab = rng.integers(0, 4, 2000)
    vecs = centers[lab] + rng.normal(0, 0.5, (2000, 6))
    tbl = pa.table({
        "vec_id": np.arange(2000, dtype=np.int64),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(6)
    C, hist = kmeans_fit(ds, k=4, iters=10)
    # inertia non-increasing across Lloyd iterations
    assert all(b <= a + 1e-6 for a, b in zip(hist, hist[1:])), hist
    out = kmeans_assign(ds, C).take_all()
    assign = {r["vec_id"]: r["cluster"] for r in out}
    # cluster purity vs planted labels
    from collections import Counter
    purity = 0
    for c in range(4):
        members = [lab[i] for i in range(2000) if assign[i] == c]
        if members:
            purity += Counter(members).most_common(1)[0][1]
    assert purity / 2000 > 0.98


def test_hash_join_negative_keys(ray_session):
    """Pin int64-view hash keys (blake2b > 2^63 becomes negative):
    partitioning and matching must work across the sign boundary."""
    import duckdb
    import ray.data as rd

    rng = np.random.default_rng(6)
    lk = rng.integers(-2**62, 2**62, 300).astype(np.int64)
    lk[:50] = lk[50:100]  # guarantee matches
    rk = np.unique(lk[50:120])
    left = rd.from_arrow(pa.table({"k": lk, "lv": np.arange(300,
                                                            dtype=np.int64)}))
    right = rd.from_arrow(pa.table({"k": rk,
                                    "rv": rk * 2})).repartition(3)
    out = relational.hash_join_i64(
        left.repartition(4), right, "k",
        {"lv": pa.int64()}, {"rv": pa.int64()}, P=7).take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
    con = duckdb.connect()
    con.register("l", pa.table({"k": lk, "lv": np.arange(300,
                                                         dtype=np.int64)}))
    con.register("r", pa.table({"k": rk, "rv": rk * 2}))
    want = sorted(con.execute(
        "SELECT l.k, lv, rv FROM l JOIN r ON l.k = r.k").fetchall())
    assert got == want


# ------------------------------------------------------ string-key join


def test_hash_join_str_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(13)
    keys = [f"src{i}" for i in range(20)]
    lk = [keys[i] for i in rng.integers(0, 20, 200)]
    lv = np.arange(200, dtype=np.int64)
    rk = keys[:15]  # some left keys have no match
    rv = (np.arange(15, dtype=np.int64) * 11 + 3)
    left = rd.from_arrow(pa.table({"s": lk, "lv": lv})).repartition(4)
    right = rd.from_arrow(pa.table({"s": rk, "rv": rv})).repartition(3)
    out = relational.hash_join_str(
        left, right, "s", {"lv": pa.int64()}, {"rv": pa.int64()},
        P=5).take_all()
    got = sorted((r["s"], r["lv"], r["rv"]) for r in out)
    con = duckdb.connect()
    con.register("l", pa.table({"s": lk, "lv": lv}))
    con.register("r", pa.table({"s": rk, "rv": rv}))
    want = sorted(con.execute(
        "SELECT l.s, lv, rv FROM l JOIN r ON l.s = r.s").fetchall())
    assert got == want


def test_hash_join_str_collision_filtered(ray_session, monkeypatch):
    # force a WEAK hash (string length) so 'ab' collides with 'xy':
    # the post-join string verification must drop the false match
    import ray.data as rd

    def weak_hash(col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return np.array([len(s) for s in col.to_pylist()], np.int64)

    monkeypatch.setattr(relational, "_str_hash_i64", weak_hash)
    left = rd.from_arrow(pa.table({"s": ["ab", "xy", "zzz"],
                                   "lv": [1, 2, 3]}))
    right = rd.from_arrow(pa.table({"s": ["ab", "zzz"],
                                    "rv": [10, 30]}))
    out = relational.hash_join_str(
        left, right, "s", {"lv": pa.int64()}, {"rv": pa.int64()},
        P=2).take_all()
    got = sorted((r["s"], r["lv"], r["rv"]) for r in out)
    assert got == [("ab", 1, 10), ("zzz", 3, 30)]  # 'xy' dropped


def test_hash_join_str_collision_on_right_raises(ray_session, monkeypatch):
    import ray.data as rd

    monkeypatch.setattr(
        relational, "_str_hash_i64",
        lambda col: np.zeros(len(col), np.int64))
    left = rd.from_arrow(pa.table({"s": ["a"], "lv": [1]}))
    right = rd.from_arrow(pa.table({"s": ["a", "b"], "rv": [1, 2]}))
    with pytest.raises(Exception, match="not unique"):
        relational.hash_join_str(
            left, right, "s", {"lv": pa.int64()}, {"rv": pa.int64()},
            P=1).take_all()


# ----------------------------------------------------- salted hash join


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_hash_join_salted_equals_unsalted(ray_session, how):
    import ray.data as rd

    rng = np.random.default_rng(21)
    # whale key: 0 holds half the fact table
    lk = np.where(rng.random(400) < 0.5, 0,
                  rng.integers(1, 40, 400)).astype(np.int64)
    lv = np.arange(400, dtype=np.int64)
    rk = np.arange(0, 35, dtype=np.int64)
    rv = rk * 3 + 1
    rcar = {} if how in ("semi", "anti") else {"rv": pa.int64()}
    rtbl = pa.table({"k": rk, "rv": rv}) if rcar else \
        pa.table({"k": rk})
    left = rd.from_arrow(pa.table({"k": lk, "lv": lv})).repartition(4)
    right = rd.from_arrow(rtbl).repartition(2)
    outs = []
    for salt in (1, 4):
        out = relational.hash_join_i64(
            left, right, "k", {"lv": pa.int64()}, dict(rcar),
            P=5, how=how, salt=salt).take_all()
        keyset = ["k", "lv"] + (["rv"] if rcar and how != "anti" else [])
        outs.append(sorted(tuple(r.get(c) for c in keyset) for r in out))
    assert outs[0] == outs[1]
    assert len(outs[0]) > 0
