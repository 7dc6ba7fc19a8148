"""Round-3 relational-depth queries (queries_rel.py): end-to-end DuckDB
parity at sf0.001 (sf0.01 parity is the driver gate, mirrored by
tools/check_oracles.py), plus edge-case kernel checks for the distinct
fusing and the correlated-average comparison."""
import duckdb
import numpy as np
import pytest

from grandine_ray.pipelines import queries_rel

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["lineitem", "orders", "part", "customer", "nation",
              "supplier"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def _cmp(got_df, sql):
    want = _con().execute(sql).df()
    g = got_df.reindex(sorted(got_df.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    assert len(g) == len(w)
    assert sorted(g.columns) == sorted(w.columns)
    gs = sorted(map(tuple, g.astype(str).values.tolist()))
    ws = sorted(map(tuple, w.astype(str).values.tolist()))
    assert gs == ws


@pytest.mark.parametrize("name", sorted(queries_rel.QUERIES_REL))
def test_rel_query_parity(ray_session, name):
    got = queries_rel.QUERIES_REL[name](SF).to_pandas()
    _cmp(got, queries_rel.ORACLE_SQL_REL[name])


def test_pair_fuse_roundtrip():
    # the (partkey, suppkey) fusing must be lossless up to 2^20 keys
    pk = np.array([0, 1, (1 << 20) - 1, 123456], np.int64)
    sk = np.array([(1 << 20) - 1, 0, 7, 654321], np.int64)
    fused = (pk << np.int64(20)) | sk
    assert ((fused >> np.int64(20)) == pk).all()
    assert ((fused & np.int64((1 << 20) - 1)) == sk).all()


def test_above_avg_cross_multiply_negative_balances():
    # cents*n > s must agree with cents > s/n for negative sums too
    rng = np.random.default_rng(7)
    cents = rng.integers(-10_000, 10_000, 1000).astype(np.int64)
    s, n = cents.sum(), np.int64(len(cents))
    exact = cents * n > s
    floaty = cents.astype(float) > s / n
    assert (exact == floaty).all()
