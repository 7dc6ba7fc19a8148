"""Event-analytics queries (queries_evt.py): end-to-end DuckDB parity
at sf0.001 plus an OHLC merge-state edge case (the open/close argmin
must survive multi-block partials)."""
import duckdb
import numpy as np
import pyarrow as pa
import pytest

from grandine_ray.pipelines import queries_evt

SF = "/root/testdata/sf0.001"


def _cmp(got_df, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(sql).df()
    g = got_df.reindex(sorted(got_df.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    assert len(g) == len(w)
    assert sorted(g.columns) == sorted(w.columns)
    gs = sorted(map(tuple, g.astype(str).values.tolist()))
    ws = sorted(map(tuple, w.astype(str).values.tolist()))
    assert gs == ws


@pytest.mark.parametrize("name", sorted(queries_evt.QUERIES_EVT))
def test_evt_query_parity(ray_session, name):
    got = queries_evt.QUERIES_EVT[name](SF).to_pandas()
    _cmp(got, queries_evt.ORACLE_SQL_EVT[name])


def test_ohlc_open_close_across_blocks(ray_session, monkeypatch):
    # one bar whose chronological first/last rows live in DIFFERENT
    # blocks: the merge must pick the global argmin/argmax of (ts, eid),
    # not a block-local one
    import ray.data as rd

    n = 40
    ts = np.arange(n, dtype=np.int64) * 1_000_000  # all in hour 0
    rng = np.random.default_rng(5)
    perm = rng.permutation(n)  # scatter rows across blocks
    tbl = pa.table({
        "event_id": pa.array(perm.astype(np.int64), pa.int64()),
        "event_type": pa.array(["x"] * n, pa.string()),
        "ts": pa.array(ts[perm].astype("datetime64[us]"),
                       pa.timestamp("us")),
        "value": pa.array((perm + 1).astype(float), pa.float64()),
    })
    ds = rd.from_arrow(tbl).repartition(8)

    monkeypatch.setattr(queries_evt.rd, "read_parquet",
                        lambda path, columns=None: ds)
    got = queries_evt.q_events_ohlc("unused").to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    # chronological first row is ts=0 (value perm[pos]=...): value at
    # sorted position 0 is the row whose ts==0, i.e. original index 0
    first_val = (perm + 1)[np.argsort(ts[perm], kind="stable")][0]
    last_val = (perm + 1)[np.argsort(ts[perm], kind="stable")][-1]
    assert row.open_milli == first_val * 1000
    assert row.close_milli == last_val * 1000
    assert row.n == n
    assert row.low_milli == 1000 and row.high_milli == n * 1000


def test_ohlc_tolerates_empty_blocks(ray_session, monkeypatch):
    # an empty parquet fragment must not crash the partial (the run-end
    # index would become [-1] on a zero-length sort order)
    import ray.data as rd

    empty = pa.table({
        "event_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "ts": pa.array(np.array([], "datetime64[us]"),
                       pa.timestamp("us")),
        "value": pa.array([], pa.float64()),
    })
    full = _mk_simple()
    ds = rd.from_arrow([empty, full])
    monkeypatch.setattr(queries_evt.rd, "read_parquet",
                        lambda path, columns=None: ds)
    got = queries_evt.q_events_ohlc("unused").to_pandas()
    assert len(got) == 1 and got.iloc[0].n == 2


def _mk_simple():
    return pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "event_type": pa.array(["a", "a"], pa.string()),
        "ts": pa.array(np.array([0, 1], "datetime64[us]"),
                       pa.timestamp("us")),
        "value": pa.array([1.0, 2.0], pa.float64()),
    })
