"""Round-3 extension queries: window kernels (running total, bounded
frame, NTILE), interpolated quantiles, and the TPC-H-style relational
queries — kernel properties vs DuckDB / numpy, plus end-to-end parity at
sf0.001 for the cheap ones (sf0.01 parity is the driver gate, mirrored
by tools/check_oracles.py)."""
import duckdb
import numpy as np
import pyarrow as pa
import pytest

from grandine_ray.pipelines import queries_ext
from grandine_ray.stages import stats

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["lineitem", "orders", "part", "customer", "events",
              "documents"]:
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


# ----------------------------------------------------- NTILE assignment


@pytest.mark.parametrize("n,k", [(0, 10), (1, 10), (9, 10), (10, 10),
                                 (11, 10), (25, 10), (97, 10), (7, 3)])
def test_ntile_assign_matches_duckdb(n, k):
    got = queries_ext.ntile_assign(n, k)
    if n == 0:
        assert len(got) == 0
        return
    want = duckdb.sql(
        f"SELECT NTILE({k}) OVER (ORDER BY i) FROM "
        f"(SELECT UNNEST(generate_series(1, {n})) i)").df().iloc[:, 0]
    assert got.tolist() == want.tolist()


# --------------------------------------------- interpolated quantile ×4


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 100, 1003])
@pytest.mark.parametrize("p4", [0, 1, 2, 3, 4])
def test_quantile_cont_q4_matches_numpy_type7(n, p4):
    rng = np.random.default_rng(n * 10 + p4)
    vals = rng.integers(0, 10_000_000, n).astype(np.int64)
    u, c = np.unique(vals, return_counts=True)
    got = stats.quantile_cont_sorted_q4(u, c, p4)
    want = np.percentile(vals, 25.0 * p4, method="linear") * 4
    assert got == round(want)


def test_quantile_cont_rejects_non_quarter(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"g": ["a"], "v": [1]}))
    with pytest.raises(ValueError, match="quarter"):
        stats.group_quantiles_cont(ds, "g", "v", [0.3], ["x"])


# ------------------------------------------------ window kernel parity


def test_running_total_and_moving_window(ray_session):
    got = queries_ext.q_running_total(SF).to_pandas()
    _cmp(got, queries_ext.ORACLE_SQL_EXT["running_total"])
    got = queries_ext.q_moving_window(SF).to_pandas()
    _cmp(got, queries_ext.ORACLE_SQL_EXT["moving_window"])


def test_token_deciles(ray_session):
    got = queries_ext.q_token_deciles(SF).to_pandas()
    _cmp(got, queries_ext.ORACLE_SQL_EXT["token_deciles"])


def test_value_quantiles_cont(ray_session):
    got = queries_ext.q_value_quantiles_cont(SF).to_pandas()
    _cmp(got, queries_ext.ORACLE_SQL_EXT["value_quantiles_cont"])


# ------------------------------------------------- relational queries


def test_pricing_summary(ray_session):
    got = queries_ext.q_pricing_summary(SF).to_pandas()
    _cmp(got, queries_ext.ORACLE_SQL_EXT["pricing_summary"])


def test_promo_share(ray_session):
    got = queries_ext.q_promo_share(SF).to_pandas()
    _cmp(got, queries_ext.ORACLE_SQL_EXT["promo_share"])


def test_late_orders(ray_session):
    got = queries_ext.q_late_orders(SF).to_pandas()
    _cmp(got, queries_ext.ORACLE_SQL_EXT["late_orders"])


def test_bigram_counts(ray_session):
    got = queries_ext.q_bigram_counts(SF).to_pandas()
    _cmp(got, queries_ext.ORACLE_SQL_EXT["bigram_counts"])
