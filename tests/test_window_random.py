"""Randomized cross-engine checks for every window/event kernel: random
event tables (duplicate timestamps, single-row users, skewed users) are
fed through the REAL query functions via a monkeypatched reader and
compared to DuckDB running the query's own oracle SQL. Catches
group-boundary and tie-break bugs the fixture tables may not contain."""
import duckdb
import numpy as np
import pyarrow as pa
import pytest

from grandine_ray.pipelines import queries_evt, queries_ext, queries_win

WINDOW_QUERIES = [
    (queries_ext, "running_total"),
    (queries_ext, "moving_window"),
    (queries_win, "events_lead"),
    (queries_win, "window_extrema"),
    (queries_evt, "events_ohlc"),
    (queries_evt, "user_retention"),
    (queries_evt, "type_transitions"),
]


def _rand_events(seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 400))
    users = rng.integers(0, max(2, n // 20), n).astype(np.int64)
    # duplicate timestamps on purpose: tie-break must fall to event_id
    ts = rng.integers(0, 50, n).astype(np.int64) * 3_600_000_000 \
        + rng.integers(0, 5, n) * 1_000_000
    vals = np.round(rng.normal(50, 40, n), 3)
    types = np.array(["view", "click", "buy"])[rng.integers(0, 3, n)]
    return pa.table({
        "event_id": pa.array(rng.permutation(n).astype(np.int64),
                             pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
    })


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("mod,name", WINDOW_QUERIES,
                         ids=[n for _, n in WINDOW_QUERIES])
def test_window_kernel_random_vs_duckdb(ray_session, monkeypatch,
                                        seed, mod, name):
    import ray.data as rd

    tbl = _rand_events(seed * 101 + 7)
    ds = rd.from_arrow(tbl).repartition(5)
    monkeypatch.setattr(mod.rd, "read_parquet",
                        lambda path, columns=None: ds)
    sql_map = getattr(mod, [a for a in dir(mod)
                            if a.startswith("ORACLE_SQL")][0])
    got = mod.__dict__[f"q_{name}"]("unused").to_pandas()
    con = duckdb.connect()
    con.register("events", tbl)
    want = con.execute(sql_map[name]).df()
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    assert len(g) == len(w), name
    assert sorted(g.columns) == sorted(w.columns)
    gs = sorted(map(tuple, g.astype(str).values.tolist()))
    ws = sorted(map(tuple, w.astype(str).values.tolist()))
    assert gs == ws, name


# --------------------------------- sharded ≡ single-phase running total


@pytest.mark.parametrize("seed", [5, 6])
@pytest.mark.parametrize("bucket_us", [1_000_000, 3_600_000_000,
                                       10**15])  # tiny, hourly, one-shard
def test_sharded_running_sum_equals_single_phase(ray_session, seed,
                                                 bucket_us):
    import ray.data as rd

    from grandine_ray.stages.window import sharded_running_sum

    tbl = _rand_events(seed * 31 + 1)
    ds = rd.from_arrow(tbl).repartition(5)
    got = sharded_running_sum(ds, bucket_us=bucket_us).to_pandas() \
        .sort_values(["event_id"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", tbl)
    want = con.execute("""
        SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
               CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_milli
        FROM events ORDER BY event_id""").df().reset_index(drop=True)
    assert got[["event_id", "user_id", "cum_milli"]].astype(str) \
        .values.tolist() == want.astype(str).values.tolist()


def test_sharded_running_sum_rejects_huge_keys(ray_session):
    import ray.data as rd

    from grandine_ray.stages.window import sharded_running_sum

    tbl = pa.table({
        "event_id": pa.array([0], pa.int64()),
        "user_id": pa.array([1 << 45], pa.int64()),
        "ts": pa.array(np.array([0], "datetime64[us]"),
                       pa.timestamp("us")),
        "value": pa.array([1.0], pa.float64()),
    })
    with pytest.raises(Exception, match="41 bits"):
        sharded_running_sum(rd.from_arrow(tbl),
                            bucket_us=3_600_000_000).take_all()
