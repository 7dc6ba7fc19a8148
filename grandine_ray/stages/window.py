"""Two-phase (sharded) window kernels for whale partition keys.

The repo's default window shape — one key-hash shuffle, one lexsort per
partition (queries_ext/queries_win/queries_evt) — serializes each key's
whole history into one partition. Fine for user-keyed streams; wrong
when one key holds a meaningful fraction of the corpus (a bot user, a
default tenant). The fix here is the classic two-phase prefix sum:

  1. shard every key's stream by a TIME BUCKET and compute local
     cumulative sums per (key, bucket) — partitions are bounded by the
     bucket width no matter how hot the key is;
  2. reduce each shard to its total (per-block partials, vocabulary-
     sized shuffle), run an exclusive prefix over each key's bucket
     sequence (tiny: keys × buckets rows), and
  3. join the offsets back by the fused (key, bucket) id and add.

Everything exchanges either bounded shards or shard AGGREGATES, never a
whole key's history in one place.

Fused-key layout: key << BUCKET_BITS | bucket, with bucket =
ts_us // bucket_us. BUCKET_BITS=22 covers ~480 years of hourly buckets;
keys must fit 41 bits (asserted).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BUCKET_BITS = 22
_BMASK = np.int64((1 << BUCKET_BITS) - 1)


def _np(col):
    return col.to_numpy(zero_copy_only=False)


def _ts_us(col) -> np.ndarray:
    v = _np(col)
    if v.dtype.kind == "M":
        return v.astype("datetime64[us]").astype(np.int64)
    return v.astype(np.int64)


def sharded_running_sum(ev, bucket_us: int, key_col: str = "user_id",
                        ts_col: str = "ts", id_col: str = "event_id",
                        val_col: str = "value", scale: float = 1000.0,
                        P: int = 32):
    """Per-key running total (SUM OVER ROWS UNBOUNDED PRECEDING, order
    (ts, id)) that never co-locates a whole key: returns rows
    (id, key, cum_milli) identical to the single-phase kernel.
    Values integer-ize per row (floor(v·scale + 0.5))."""
    from ray.data.aggregate import Sum
    from .relational import hash_join_i64

    def tag(b: pa.Table) -> pa.Table:
        k = _np(b[key_col]).astype(np.int64)
        if len(k) and int(k.max()) >= (1 << (63 - BUCKET_BITS)):
            raise ValueError("sharded_running_sum: key exceeds 41 bits")
        ts = _ts_us(b[ts_col])
        bucket = ts // bucket_us
        fk = (k << np.int64(BUCKET_BITS)) | bucket
        vm = np.floor(_np(b[val_col]) * scale + 0.5).astype(np.int64)
        return pa.table({
            "fk": pa.array(fk, pa.int64()),
            "id": pa.array(_np(b[id_col]).astype(np.int64), pa.int64()),
            "ts": pa.array(ts, pa.int64()),
            "vm": pa.array(vm, pa.int64()),
        })

    tagged = ev.map_batches(tag, batch_format="pyarrow")

    # phase 1: local cumsum per (key, bucket) shard. The shuffle hashes
    # the FUSED id, so a whale key's shards spread over all partitions
    # (bounded by the bucket width); within a partition one lexsort +
    # cumsum with group-boundary offset subtraction handles every shard
    # vectorized (no per-group Python call).
    def addshard(b: pa.Table) -> pa.Table:
        fk = _np(b["fk"]).astype(np.int64)
        return b.append_column(
            "_p1", pa.array((fk % P).astype(np.int32), pa.int32()))

    def local(t: pa.Table) -> pa.Table:
        fk = _np(t["fk"]).astype(np.int64)
        ts = _np(t["ts"])
        eid = _np(t["id"])
        vm = _np(t["vm"])
        order = np.lexsort((eid, ts, fk))
        fk_s, vm_s = fk[order], vm[order]
        cs = np.cumsum(vm_s)
        n = len(fk_s)
        new = np.ones(n, bool)
        if n:
            new[1:] = fk_s[1:] != fk_s[:-1]
        gs = np.maximum.accumulate(
            np.where(new, np.arange(n, dtype=np.int64), 0))
        base = np.where(gs > 0, cs[np.maximum(gs - 1, 0)], 0)
        return pa.table({
            "fk": pa.array(fk_s, pa.int64()),
            "id": pa.array(eid[order], pa.int64()),
            "cum_local": pa.array(cs - base, pa.int64()),
        })

    rows = tagged.map_batches(addshard, batch_format="pyarrow") \
        .groupby("_p1").map_groups(local, batch_format="pyarrow")

    # phase 2: shard totals (per-block partials → vocabulary shuffle),
    # then an exclusive prefix over each key's bucket sequence
    def total_partial(b: pa.Table) -> pa.Table:
        fk = _np(b["fk"]).astype(np.int64)
        vm = _np(b["vm"]).astype(np.int64)
        order = np.argsort(fk, kind="stable")
        fk_s, vm_s = fk[order], vm[order]
        starts = np.ones(len(fk_s), bool)
        if len(fk_s):
            starts[1:] = fk_s[1:] != fk_s[:-1]
        idx = np.nonzero(starts)[0]
        return pa.table({
            "fk": pa.array(fk_s[idx] if len(fk_s) else fk_s, pa.int64()),
            "tot": pa.array(np.add.reduceat(vm_s, idx)
                            if len(fk_s) else vm_s, pa.int64()),
        })

    totals = tagged.map_batches(total_partial, batch_format="pyarrow") \
        .groupby("fk").aggregate(Sum("tot", alias_name="tot"))

    def addpart(b: pa.Table) -> pa.Table:
        fk = _np(b["fk"]).astype(np.int64)
        key = fk >> np.int64(BUCKET_BITS)
        return pa.table({
            "fk": pa.array(fk, pa.int64()),
            "tot": pc.cast(b["tot"], pa.int64()),
            "_part": pa.array((key % P).astype(np.int32), pa.int32()),
        })

    def offsets(t: pa.Table) -> pa.Table:
        fk = _np(t["fk"]).astype(np.int64)
        tot = _np(t["tot"]).astype(np.int64)
        order = np.argsort(fk, kind="stable")  # (key, bucket) order
        fk_s, tot_s = fk[order], tot[order]
        key_s = fk_s >> np.int64(BUCKET_BITS)
        cs = np.cumsum(tot_s)
        n = len(fk_s)
        new = np.ones(n, bool)
        if n:
            new[1:] = key_s[1:] != key_s[:-1]
        gs = np.maximum.accumulate(
            np.where(new, np.arange(n, dtype=np.int64), 0))
        base = np.where(gs > 0, cs[np.maximum(gs - 1, 0)], 0)
        # exclusive prefix: sum of PRIOR buckets of the same key
        off = cs - tot_s - base
        return pa.table({"fk": pa.array(fk_s, pa.int64()),
                         "off": pa.array(off, pa.int64())})

    offs = totals.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(offsets, batch_format="pyarrow")

    joined = hash_join_i64(
        rows, offs, key="fk",
        left_carry={"id": pa.int64(), "cum_local": pa.int64()},
        right_carry={"off": pa.int64()}, P=P)

    def finish(b: pa.Table) -> pa.Table:
        fk = _np(b["fk"]).astype(np.int64)
        return pa.table({
            "event_id": pc.cast(b["id"], pa.int64()),
            "user_id": pa.array(fk >> np.int64(BUCKET_BITS), pa.int64()),
            "cum_milli": pa.array(_np(b["cum_local"]) + _np(b["off"]),
                                  pa.int64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")
