"""Window-function completions (queries_win.py): end-to-end DuckDB
parity at sf0.001 plus kernel edge cases (single-row groups, all-equal
tie runs, frame clipped at group starts)."""
import duckdb
import numpy as np
import pyarrow as pa
import pytest

from grandine_ray.pipelines import queries_win

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["events", "documents"]:
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


@pytest.mark.parametrize("name", sorted(queries_win.QUERIES_WIN))
def test_win_query_parity(ray_session, name):
    got = queries_win.QUERIES_WIN[name](SF).to_pandas()
    _cmp(got, queries_win.ORACLE_SQL_WIN[name])


def _mk(users, vals):
    n = len(users)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "user_id": pa.array(np.asarray(users, np.int64), pa.int64()),
        "ts": pa.array(np.arange(n, dtype=np.int64).astype(
            "datetime64[us]"), pa.timestamp("us")),
        "value": pa.array(np.asarray(vals, float), pa.float64()),
    })


def test_user_sorted_group_bounds():
    eid, u, vm, gs = queries_win._user_sorted(
        _mk([2, 1, 2, 1, 3], [5, 1, 7, 3, 9]))
    assert u.tolist() == [1, 1, 2, 2, 3]
    assert vm.tolist() == [1000, 3000, 5000, 7000, 9000]
    assert gs.tolist() == [0, 0, 2, 2, 4]


def test_extrema_frame_clips_at_group_start():
    # one user with a decreasing run, then a fresh group: the frame must
    # clip at each group start instead of leaking the previous user
    con = duckdb.connect()
    tbl = _mk([1] * 6 + [2], [9, 8, 7, 6, 5, 4, 100])
    con.register("events", tbl)
    eid, u, vm, gs = queries_win._user_sorted(tbl)
    n = len(u)
    idx = np.arange(n)
    W = queries_win.EXT_PRECEDING
    mx, mn = vm.copy(), vm.copy()
    lo, hi = np.iinfo(np.int64).min, np.iinfo(np.int64).max
    for s in range(1, W + 1):
        valid = idx - s >= gs
        sh = np.empty(n, np.int64)
        sh[s:] = vm[:-s]
        sh[:s] = 0
        np.maximum(mx, np.where(valid, sh, lo), out=mx)
        np.minimum(mn, np.where(valid, sh, hi), out=mn)
    want = con.execute("""
        SELECT CAST(MAX(CAST(FLOOR(value*1000+0.5) AS BIGINT)) OVER w
                    AS BIGINT),
               CAST(MIN(CAST(FLOOR(value*1000+0.5) AS BIGINT)) OVER w
                    AS BIGINT)
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts""").fetchall()
    assert [(a, b) for a, b in zip(mx.tolist(), mn.tolist())] == want
