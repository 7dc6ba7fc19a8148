"""Local mirror of the driver's correctness gate: run each queries() entry
and its oracle_sql() side by side at sf0.01 and compare row-count, schema,
and an order-insensitive value hash. Usage: python tools/check_oracles.py [names...]
"""
from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main():
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    import time

    names = sys.argv[1:] or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            got = to_pandas(qs[name](SF_DIR))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        q_sec = time.time() - t0
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(got)} rows, "
                  f"cols={list(got.columns)}) [{q_sec:.1f}s]")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle SQL raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        elif value_hash(got) != value_hash(exp):
            problems.append("value hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
            # dump small diff hint
            if sorted(got.columns) == sorted(exp.columns):
                g = got.reindex(sorted(got.columns), axis=1)
                e = exp.reindex(sorted(exp.columns), axis=1)
                gs = set(map(tuple, g.astype(str).values.tolist()))
                es = set(map(tuple, e.astype(str).values.tolist()))
                only_g = list(gs - es)[:3]
                only_e = list(es - gs)[:3]
                print(f"      only-in-ray: {only_g}")
                print(f"      only-in-sql: {only_e}")
        else:
            print(f"PASS  {name}: {len(got)} rows [{q_sec:.1f}s]")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
