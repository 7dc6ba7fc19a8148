"""Round-4 relational widening (queries_rel2.py): end-to-end DuckDB
parity at sf0.001 (the sf0.01 driver gate is mirrored by
tools/check_oracles.py), plus kernel checks for the argmin fuse and the
only-late-supplier aggregation trick."""
import duckdb
import numpy as np
import pytest

from grandine_ray.pipelines import queries_rel2

SF = "/root/testdata/sf0.001"


def _con(sf=SF):
    con = duckdb.connect()
    for t in ["lineitem", "orders", "part", "customer", "nation",
              "supplier", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    return con


def _cmp(got_df, sql, sf=SF):
    want = _con(sf).execute(sql).df()
    g = got_df.reindex(sorted(got_df.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    assert sorted(g.columns) == sorted(w.columns)
    assert len(g) == len(w)
    gs = sorted(map(tuple, g.astype(str).values.tolist()))
    ws = sorted(map(tuple, w.astype(str).values.tolist()))
    assert gs == ws


@pytest.mark.parametrize("name", sorted(queries_rel2.QUERIES_REL2))
def test_rel2_query_parity(ray_session, name):
    got = queries_rel2.QUERIES_REL2[name](SF).to_pandas()
    _cmp(got, queries_rel2.ORACLE_SQL_REL2[name])


def test_rel2_nonempty_at_sf001(ray_session):
    """The adapted filters must actually select rows at the driver-gate
    scale — an all-empty parity pass proves nothing."""
    for name in ["local_supplier_volume", "market_share",
                 "waiting_suppliers", "min_cost_supplier",
                 "product_profit"]:
        got = queries_rel2.QUERIES_REL2[name]("/root/testdata/sf0.01") \
            .to_pandas()
        assert len(got) > 0, name
        _cmp(got, queries_rel2.ORACLE_SQL_REL2[name],
             sf="/root/testdata/sf0.01")


def test_q2_fuse_is_lexicographic_argmin():
    # min over fused (cents+OFF)<<20 | sk == argmin by (cents, sk)
    rng = np.random.default_rng(11)
    cents = rng.integers(-99_428, 999_741, 500).astype(np.int64)
    sk = rng.integers(0, 1 << 20, 500).astype(np.int64)
    off = np.int64(1 << 21)
    fused = ((cents + off) << np.int64(20)) | sk
    i = int(np.argmin(fused))
    order = sorted(range(500), key=lambda j: (int(cents[j]), int(sk[j])))
    assert (cents[i], sk[i]) == (int(cents[order[0]]), int(sk[order[0]]))
    # and the unfuse is lossless
    assert int(fused[i] >> 20) - off == cents[i]
    assert int(fused[i] & ((1 << 20) - 1)) == sk[i]


def test_q21_sum_identifies_single_late_supplier():
    # Σ late*suppkey recovers the key iff exactly one supplier is late
    sks = np.array([17, 902, 44], np.int64)
    late = np.array([0, 1, 0], np.int64)
    assert int((late * sks).sum()) == 902 and int(late.sum()) == 1
    # two late suppliers: the nlate==1 filter must exclude the order
    late2 = np.array([1, 1, 0], np.int64)
    assert int(late2.sum()) != 1


def test_q17_cross_multiply_matches_float_threshold():
    rng = np.random.default_rng(5)
    q = rng.integers(1, 51, 2000).astype(np.int64)
    cnt = rng.integers(1, 40, 2000).astype(np.int64)
    sum_q = rng.integers(1, 2000, 2000).astype(np.int64)
    exact = 5 * q * cnt < sum_q
    floaty = q.astype(float) < 0.2 * (sum_q / cnt)
    assert (exact == floaty).all()
