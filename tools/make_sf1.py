"""Build /tmp/sf1 — a 10× deterministic scale-up of /root/testdata/sf0.1
for the sf1 bench run (VERDICT r4 item 1: prove the engine one order
above sf0.1 with a peak-RSS record).

Fact tables (documents, embeddings, events, orders, lineitem) replicate
10× with consistent key offsets — orderkeys shift identically in orders
and lineitem so every join still matches; replica 0 keeps the original
ids so fixed-id queries (vec_id < 8) stay meaningful. Dimension tables
(customer, nation, region, supplier, part) copy as-is: dimension keys
must stay unique for the hash_join right-side contract, and a 10×-fact/
1×-dim shape is exactly how a real corpus grows.

Usage: python tools/make_sf1.py [src_dir] [dst_dir]
"""
from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10
# offsets far above each table's max key so replica namespaces never
# collide (sf0.1 maxima: doc_id 500, vec_id 500, o_orderkey 600k,
# event user_id ~15k)
OFFSETS = {
    "documents": ("doc_id", 1_000_000),
    "embeddings": ("vec_id", 1_000_000),
    "events": ("user_id", 1_000_000),
    "orders": ("o_orderkey", 10_000_000),
    "lineitem": ("l_orderkey", 10_000_000),
}
COPY = ["customer", "nation", "region", "supplier", "part"]


def replicate(src: Path, dst: Path, table: str, key: str, off: int):
    t = pq.read_table(src / f"{table}.parquet")
    kt = t[key].type
    chunks = []
    for r in range(REPLICAS):
        shifted = pc.add(pc.cast(t[key], pa.int64()), r * off)
        chunks.append(t.set_column(t.schema.get_field_index(key), key,
                                   pc.cast(shifted, kt)))
    out = pa.concat_tables(chunks)
    pq.write_table(out, dst / f"{table}.parquet")
    print(f"{table}: {t.num_rows} -> {out.num_rows}")


def main():
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1")
    dst.mkdir(parents=True, exist_ok=True)
    for table, (key, off) in OFFSETS.items():
        replicate(src, dst, table, key, off)
    for table in COPY:
        shutil.copy(src / f"{table}.parquet", dst / f"{table}.parquet")
        print(f"{table}: copied")


if __name__ == "__main__":
    main()
