"""Randomized cross-engine checks for the round-4 analytics queries:
random tables written as real parquet sf-dirs are fed through the REAL
query functions and compared to DuckDB running the query's own oracle
SQL — catches tie-break, sentinel-key and fan-out bugs the fixed
testdata may not contain."""
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from grandine_ray.pipelines import queries_ml
from grandine_ray.pipelines.queries_ml import _oracle_sql_ml


def _write(d, name, tbl):
    pq.write_table(tbl, os.path.join(d, f"{name}.parquet"))


def _rand_lineitem_orders(seed, tmpdir):
    rng = np.random.default_rng(seed)
    n_orders = int(rng.integers(20, 120))
    rows_ok, rows_pk = [], []
    for ok in range(1, n_orders + 1):
        items = rng.integers(1, 8)
        # small part domain on purpose: forces repeated pairs and ties
        parts = rng.integers(1, 12, items)
        for pk in parts:  # duplicates within an order on purpose
            rows_ok.append(ok)
            rows_pk.append(int(pk))
    ts = np.datetime64("1995-02-01", "us")
    li = pa.table({
        "l_orderkey": pa.array(rows_ok, pa.int64()),
        "l_partkey": pa.array(rows_pk, pa.int64()),
        "l_shipdate": pa.array([ts] * len(rows_ok), pa.timestamp("us")),
    })
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(1, n_orders + 1), pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT"] * n_orders, pa.string()),
    })
    _write(tmpdir, "lineitem", li)
    _write(tmpdir, "orders", orders)
    return li, orders


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_basket_pairs_random_vs_duckdb(ray_session, tmp_path, seed):
    li, orders = _rand_lineitem_orders(seed, str(tmp_path))
    got = queries_ml.q_basket_pairs(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.register("lineitem", li)
    con.register("orders", orders)
    want = con.execute(_oracle_sql_ml()["basket_pairs"]).df()
    assert len(got) == len(want)
    g = sorted(map(tuple, got[["pa", "pb", "n", "lift_micro"]].values))
    w = sorted(map(tuple, want[["pa", "pb", "n", "lift_micro"]].values))
    assert g == w


@pytest.mark.parametrize("seed", [21, 22])
def test_bigram_pmi_random_vs_duckdb(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "eps"])
    texts = []
    for _ in range(int(rng.integers(20, 80))):
        k = int(rng.integers(0, 15))
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), k)]))
    docs = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    _write(str(tmp_path), "documents", docs)
    got = queries_ml.q_bigram_pmi(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(_oracle_sql_ml()["bigram_pmi"]).df()
    assert len(got) == len(want)
    g = sorted(map(tuple, got[["bigram", "n", "pmi_micro"]]
                   .astype(str).values))
    w = sorted(map(tuple, want[["bigram", "n", "pmi_micro"]]
                   .astype(str).values))
    assert g == w


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_part_skyline_random_vs_duckdb(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(10, 200))
    # tight domains: exercises both-axes ties on the frontier
    part = pa.table({
        "p_partkey": pa.array(np.arange(1, n + 1), pa.int64()),
        "p_retailprice": pa.array(
            rng.integers(1, 8, n).astype(np.float64) + 0.25, pa.float64()),
        "p_size": pa.array(rng.integers(1, 8, n).astype(np.int32),
                           pa.int32()),
    })
    _write(str(tmp_path), "part", part)
    got = queries_ml.q_part_skyline(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.register("part", part)
    want = con.execute(_oracle_sql_ml()["part_skyline"]).df()
    assert len(got) == len(want)
    g = sorted(map(tuple, got.values.tolist()))
    w = sorted(map(tuple,
                   want[["p_partkey", "price_cents", "p_size"]]
                   .values.tolist()))
    assert g == w


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_anomaly_runs_random_vs_duckdb(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 300))
    users = rng.integers(0, max(2, n // 15), n).astype(np.int64)
    # duplicate timestamps on purpose: event_id must break ties
    ts = (rng.integers(0, 40, n).astype(np.int64) * 3_600_000_000
          + rng.integers(0, 3, n) * 1_000_000)
    # values hugging the threshold on both sides, incl. exact boundary
    vals = np.round(rng.choice(
        [99.9995, 100.0, 100.0005, 150.0, 10.0], n), 4)
    ev = pa.table({
        "event_id": pa.array(rng.permutation(n).astype(np.int64),
                             pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
        "value": pa.array(vals, pa.float64()),
    })
    _write(str(tmp_path), "events", ev)
    got = queries_ml.q_anomaly_runs(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute(_oracle_sql_ml()["anomaly_runs"]).df()
    assert len(got) == len(want)
    cols = ["user_id", "n_runs", "longest_run", "n_anomalous"]
    assert sorted(map(tuple, got[cols].values.tolist())) == \
        sorted(map(tuple, want[cols].values.tolist()))
