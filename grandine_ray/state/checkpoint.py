"""Per-partition checkpoint / lineage manifest (NORTH-RULE EXT).

Output layout (resumable; SURVEY §4 "Checkpoint / resume"):

    out_dir/
      tiles/<partition_id>.parquet      # tile rows for one partition
      manifest/<partition_id>.json      # written AFTER the parquet is durable

A partition is a (zoom, x-bucket) range of tile keys, so the resume filter
can be applied *before* the tile shuffle: coverage drops rows whose
partition is already complete, skipping shuffle + encode work entirely.
Writes are atomic (tmp file + rename); the manifest row carries lineage
(input fragments, cell range, tile count) plus rows/bytes/wall metrics.
"""
from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..index import xyz

# number of x-buckets per zoom level above this zoom (2^4 = 16 buckets)
_BUCKET_BITS = 4


def partition_of(z: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Vectorized partition id: one per zoom for z<=4, else 16 x-buckets."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    shift = np.maximum(z - _BUCKET_BITS, 0)
    return z * 100 + (x >> shift)


def partition_of_keys(tile_keys: np.ndarray) -> np.ndarray:
    z, x, _ = xyz.tile_key_unpack(tile_keys)
    return partition_of(z, x)


def completed_partitions(out_dir: str) -> set[int]:
    mdir = Path(out_dir) / "manifest"
    if not mdir.is_dir():
        return set()
    done = set()
    for f in mdir.glob("p*.json"):
        try:
            row = json.loads(f.read_text())
            if row.get("status") == "done":
                done.add(int(row["partition"]))
        except (ValueError, KeyError):
            continue
    return done


def write_partition(group: pa.Table, out_dir: str, fragments: str) -> pa.Table:
    """map_groups task over ``partition`` → writes tiles + manifest row.

    Emits the manifest row as its output table so the pipeline's consuming
    stage doubles as the job-level metrics stream. Atomic: tmp + rename,
    manifest marker written only after the data file is durable.
    """
    pid = int(group["partition"][0].as_py())
    tiles = group.drop_columns(["partition"])
    return write_tiles_partition(tiles, pid, out_dir, fragments)


def _crash_hook(out_dir: str, final: str) -> None:
    """Deterministic mid-job crash for the kill/resume test: when
    GRAFT_KILL_AFTER_PARTITIONS=N is set and ≥N partition manifests are
    already durable, die BEFORE completing this partition — leaving a
    torn .tmp data file behind, exactly the state a SIGKILL between the
    parquet write and the rename produces. Guarantees the interrupted
    run ends with n_manifests ∈ [N, total−1] on every machine speed (the
    old wall-clock watcher could miss the window entirely)."""
    kill_after = os.environ.get("GRAFT_KILL_AFTER_PARTITIONS")
    if kill_after is None:
        return
    mdir = os.path.join(out_dir, "manifest")
    n_done = len(os.listdir(mdir)) if os.path.isdir(mdir) else 0
    if n_done >= int(kill_after):
        with open(final + ".tmp", "wb") as f:
            f.write(b"torn mid-write payload")
        raise RuntimeError(
            "GRAFT_KILL_AFTER_PARTITIONS crash hook (test-only)")


def write_tiles_partition(tiles: pa.Table, pid: int, out_dir: str,
                          fragments: str) -> pa.Table:
    """Write one partition's assembled tile rows + its manifest marker
    (the shared core of :func:`write_partition` and the fused
    assemble+write stage in pipelines/tiler.py)."""
    t0 = time.monotonic()
    os.makedirs(os.path.join(out_dir, "tiles"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)
    final = os.path.join(out_dir, "tiles", f"p{pid}.parquet")
    _crash_hook(out_dir, final)
    tmp = final + ".tmp"
    pq.write_table(tiles, tmp)
    os.replace(tmp, final)

    keys = xyz.tile_key(
        tiles["z"].to_numpy(zero_copy_only=False).astype(np.int64),
        tiles["x"].to_numpy(zero_copy_only=False).astype(np.int64),
        tiles["y"].to_numpy(zero_copy_only=False).astype(np.int64),
    )
    total_bytes = int(pa.compute.sum(tiles["bytes"]).as_py() or 0)
    wall = time.monotonic() - t0
    row = {
        "partition": pid,
        "partition_id": f"p{pid}",
        "input_fragment": fragments,
        "cell_range_min": int(keys.min()) if len(keys) else 0,
        "cell_range_max": int(keys.max()) if len(keys) else 0,
        "rows": int(tiles.num_rows),
        "bytes": total_bytes,
        "wall_s": wall,
        "status": "done",
    }
    mfinal = os.path.join(out_dir, "manifest", f"p{pid}.json")
    mtmp = mfinal + ".tmp"
    with open(mtmp, "w") as f:
        json.dump(row, f)
    os.replace(mtmp, mfinal)
    return pa.table(
        {
            "partition_id": pa.array([row["partition_id"]], pa.string()),
            "input_fragment": pa.array([row["input_fragment"]], pa.string()),
            "cell_range_min": pa.array([row["cell_range_min"]], pa.uint64()),
            "cell_range_max": pa.array([row["cell_range_max"]], pa.uint64()),
            "rows": pa.array([row["rows"]], pa.int64()),
            "bytes": pa.array([row["bytes"]], pa.int64()),
            "wall_s": pa.array([row["wall_s"]], pa.float64()),
            "status": pa.array(["done"], pa.string()),
        }
    )


class PartitionWriter:
    """Class form of :func:`write_partition` (actor-pool variant)."""

    def __init__(self, out_dir: str, input_fragments: list[str] | None = None):
        self.out_dir = out_dir
        self.fragments = ";".join(input_fragments or [])
        os.makedirs(os.path.join(out_dir, "tiles"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        pid = int(group["partition"][0].as_py())
        tiles = group.drop_columns(["partition"])
        final = os.path.join(self.out_dir, "tiles", f"p{pid}.parquet")
        _crash_hook(self.out_dir, final)
        tmp = final + ".tmp"
        pq.write_table(tiles, tmp)
        os.replace(tmp, final)

        keys = xyz.tile_key(
            tiles["z"].to_numpy(zero_copy_only=False).astype(np.int64),
            tiles["x"].to_numpy(zero_copy_only=False).astype(np.int64),
            tiles["y"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        total_bytes = int(pa.compute.sum(tiles["bytes"]).as_py() or 0)
        wall = time.monotonic() - t0
        row = {
            "partition": pid,
            "partition_id": f"p{pid}",
            "input_fragment": self.fragments,
            "cell_range_min": int(keys.min()) if len(keys) else 0,
            "cell_range_max": int(keys.max()) if len(keys) else 0,
            "rows": int(tiles.num_rows),
            "bytes": total_bytes,
            "wall_s": wall,
            "status": "done",
        }
        mfinal = os.path.join(self.out_dir, "manifest", f"p{pid}.json")
        mtmp = mfinal + ".tmp"
        with open(mtmp, "w") as f:
            json.dump(row, f)
        os.replace(mtmp, mfinal)
        return pa.table(
            {
                "partition_id": pa.array([row["partition_id"]], pa.string()),
                "input_fragment": pa.array([row["input_fragment"]], pa.string()),
                "cell_range_min": pa.array([row["cell_range_min"]], pa.uint64()),
                "cell_range_max": pa.array([row["cell_range_max"]], pa.uint64()),
                "rows": pa.array([row["rows"]], pa.int64()),
                "bytes": pa.array([row["bytes"]], pa.int64()),
                "wall_s": pa.array([row["wall_s"]], pa.float64()),
                "status": pa.array(["done"], pa.string()),
            }
        )
