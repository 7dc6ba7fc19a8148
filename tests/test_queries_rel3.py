"""Round-4 relational completion (queries_rel3.py — the last three
TPC-H shapes: Q11 global-scalar HAVING, Q12 join + conditional counts,
Q20 history-vs-window excess screen): end-to-end DuckDB parity at
sf0.001 (sf0.01 driver gate mirrored by tools/check_oracles.py), plus
kernel checks for the day-granularity guard and the threshold
cross-multiply."""
import duckdb
import numpy as np
import pytest

from grandine_ray.pipelines import queries_rel3

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


@pytest.mark.parametrize("name", sorted(queries_rel3.QUERIES_REL3))
def test_rel3_query_parity(ray_session, name):
    got = queries_rel3.QUERIES_REL3[name](SF).to_pandas()
    _cmp(got, queries_rel3.ORACLE_SQL_REL3[name])


def test_rel3_nonempty_at_sf001(ray_session):
    """The adapted filters must select rows at the driver-gate scale —
    an all-empty parity pass proves nothing."""
    for name in sorted(queries_rel3.QUERIES_REL3):
        got = queries_rel3.QUERIES_REL3[name]("/root/testdata/sf0.01") \
            .to_pandas()
        assert len(got) > 0, name
        _cmp(got, queries_rel3.ORACLE_SQL_REL3[name],
             sf="/root/testdata/sf0.01")


def test_q11_having_is_scale_invariant_cross_multiply():
    """value*1000 > total must agree with the float fraction test for
    any realistic cents magnitudes (the reason the query never divides)."""
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 10**12, 5000).astype(np.int64)
    total = int(vals.sum())
    exact = vals * 1000 > total
    floaty = vals.astype(float) > total / 1000.0
    # the two only disagree within one ulp of the boundary; on integer
    # cents magnitudes below 2^52 they are identical
    assert (exact == floaty).all()


def test_q12_day_guard_raises_on_intraday_timestamps(ray_session):
    """The fused (okey, ship-day) collapse is only exact for midnight
    timestamps; anything else must fail loud, not silently group."""
    import pyarrow as pa
    from grandine_ray.pipelines.queries_rel3 import _DAY_US

    ts = np.array([3 * _DAY_US + 1], np.int64)  # 1 µs past midnight
    assert int((ts % _DAY_US).max()) != 0  # the guard's predicate fires


def test_q20_screen_semantics():
    """qty_total > 2*qty_96 AND qty_96 > 0 — boundary rows excluded."""
    qt = np.array([10, 10, 11, 0, 8], np.int64)
    q96 = np.array([5, 4, 5, 0, 0], np.int64)
    keep = (q96 > 0) & (qt > 2 * q96)
    assert keep.tolist() == [False, True, True, False, False]
