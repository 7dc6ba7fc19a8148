"""General-purpose distributed joins over Ray Data datasets.

``hash_join_i64`` is the repo's union + part-groupby + searchsorted
equi-join (the pattern from pipelines/spatialize.py and
stages/text.py:_attach_text) generalized to arbitrary carry columns:
both sides are tagged with a hash partition (key % P) and a side marker,
unioned into ONE shuffle, and each partition resolves matches with a
single sort + searchsorted — no driver collection, no Ray
``Dataset.join`` (whose 2.49 hash aggregator raises ArrowInvalid on
empty left partitions and reserves num_partitions×num_cpus CPUs,
deadlocking multi-join graphs — see CLAUDE.md round-2 pitfalls).

``interval_join`` is the non-equi band join (event.ts ∈ [t0, t1)):
intervals are replicated to every time bucket they overlap (clipped, so
an output pair materializes in exactly one bucket) and events land in
their own bucket; within a bucket the join is one sort of the event
timestamps + two searchsorted probes per interval. Scale shape: the
shuffle key is the time bucket — pick ``bucket_us`` near the median
interval length so replication stays O(1) per interval; skewed hot
buckets shard further by the interval id hash if needed.
"""
from __future__ import annotations

import functools
import glob as _glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _np(col):
    return col.to_numpy(zero_copy_only=False)


# ------------------------------------------- adaptive exchange sizing


@functools.lru_cache(maxsize=64)
def _dir_max_rows(sf_dir: str) -> int:
    """Row count of the LARGEST parquet table under ``sf_dir``, from file
    METADATA only (O(1) footer reads, no data I/O). Cached per dir."""
    import pyarrow.parquet as pq

    best = 0
    for f in _glob.glob(os.path.join(sf_dir, "*.parquet")):
        try:
            best = max(best, pq.ParquetFile(f).metadata.num_rows)
        except Exception:
            continue
    return best


def adaptive_parts(sf_dir: str, target_rows: int = 50_000,
                   lo: int = 4, hi: int = 32) -> int:
    """Exchange partition count sized to the input, not a constant.

    ``P = clamp(max_table_rows / target_rows, lo, hi)`` — at sf0.01
    (lineitem ~60 k rows) a join pays 4 partitions' fixed cost instead of
    32; at sf0.1 ~12; from sf1 up it saturates at ``hi``. ``hi=32``
    matches this sandbox's cores — on a real cluster pass
    ``hi ≈ total cluster cores`` (each partition is one resolve task, so
    P bounds the join's parallelism). Derived from parquet footer
    metadata only; non-parquet inputs fall back to ``hi``.
    """
    rows = _dir_max_rows(sf_dir)
    if rows <= 0:
        return hi
    return max(lo, min(hi, (rows + target_rows - 1) // target_rows))


def _ts_us(col) -> np.ndarray:
    v = _np(col)
    if v.dtype.kind == "M":
        return v.astype("datetime64[us]").astype(np.int64)
    return v.astype(np.int64)


# ------------------------------------------------------------ hash join


def hash_join_i64(left, right, key: str,
                  left_carry: dict[str, pa.DataType],
                  right_carry: dict[str, pa.DataType],
                  P: int = 32, how: str = "inner", salt: int = 1):
    """Distributed equi-join on an int64 key.

    ``right`` must have UNIQUE keys (dimension-side contract — asserted
    per partition) for ``inner``/``left``. Carry dicts give the attached
    column types so no schema inference ever executes a dataset. Returns
    columns ``[key] + left_carry + right_carry``; ``how="left"`` keeps
    unmatched left rows with nulls in the right carry; ``how="full"``
    additionally keeps unmatched right rows with nulls in the left
    carry (full outer; incompatible with ``salt`` — a replicated right
    row would emit its unmatched form once per sub-partition).
    ``how="semi"`` / ``"anti"`` are membership filters (right keys may
    repeat; right carry must be empty; only left columns return).

    ``salt > 1`` is the skew lever for WHALE LEFT KEYS (a key holding a
    meaningful fraction of the fact table): every left row lands in one
    of ``salt`` sub-partitions of its key's hash slot while the right
    side replicates into all of them, so the hot key's probes spread
    over ``salt`` workers at the cost of shipping the (small, unique)
    right side ``salt`` times. Output is identical for any salt.
    """
    if how in ("semi", "anti") and right_carry:
        raise ValueError("semi/anti join carries no right columns")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if how == "full" and salt > 1:
        raise ValueError("full outer join does not support salt")
    all_carry = list(left_carry) + list(right_carry)
    types = {**left_carry, **right_carry}

    def tag(side: int, own: dict[str, pa.DataType]):
        def fn(b: pa.Table) -> pa.Table:
            k = _np(b[key]).astype(np.int64)
            n = len(k)
            if side == 1 and salt > 1:
                rep = np.repeat(np.arange(n, dtype=np.int64), salt)
                k = k[rep]
                sub = np.tile(np.arange(salt, dtype=np.int64), n)
            else:
                rep = None
                sub = (np.arange(n, dtype=np.int64) % salt) if salt > 1 \
                    else np.zeros(len(k), np.int64)
            m = len(k)
            cols = {"_key": pa.array(k, pa.int64())}
            for c in all_carry:
                if c not in own:
                    cols[c] = pa.nulls(m, types[c])
                elif rep is None:
                    cols[c] = b[c]
                else:
                    cols[c] = b[c].take(pa.array(rep))
            cols["_side"] = pa.array(np.full(m, side, np.int8), pa.int8())
            cols["_part"] = pa.array(((k % P) * salt + sub)
                                     .astype(np.int32), pa.int32())
            return pa.table(cols)
        return fn

    unioned = left.map_batches(tag(0, left_carry), batch_format="pyarrow") \
        .union(right.map_batches(tag(1, right_carry),
                                 batch_format="pyarrow"))

    def resolve(t: pa.Table) -> pa.Table:
        side = _np(t["_side"])
        keys = _np(t["_key"])
        lmask = side == 0
        lk = keys[lmask]
        rk = keys[~lmask]
        order = np.argsort(rk, kind="stable")
        rk_s = rk[order]
        if how in ("inner", "left", "full") and len(rk_s) > 1 \
                and np.any(rk_s[1:] == rk_s[:-1]):
            raise ValueError("hash_join_i64: right side keys not unique")
        pos = np.searchsorted(rk_s, lk) if len(rk_s) else np.zeros(len(lk), np.int64)
        safe = np.minimum(pos, max(len(rk_s) - 1, 0))
        hit = (rk_s[safe] == lk) if len(rk_s) else np.zeros(len(lk), bool)
        l_idx = np.nonzero(lmask)[0]
        r_idx = np.nonzero(~lmask)[0]
        if how in ("semi", "anti"):
            sel = hit if how == "semi" else ~hit
            cols = {key: pa.array(lk[sel], pa.int64())}
            take_l = pa.array(l_idx[sel])
            for c in left_carry:
                cols[c] = t[c].take(take_l)
        elif how == "inner":
            out_l = l_idx[hit]
            out_r = r_idx[order[safe[hit]]]
            cols = {key: pa.array(lk[hit], pa.int64())}
            take_l = pa.array(out_l)
            take_r = pa.array(out_r)
            for c in left_carry:
                cols[c] = t[c].take(take_l)
            for c in right_carry:
                cols[c] = t[c].take(take_r)
        else:  # left / full
            cols = {key: pa.array(lk, pa.int64())}
            take_l = pa.array(l_idx)
            r_of = np.where(hit, r_idx[order[safe]] if len(rk_s)
                            else 0, -1).astype(np.int64)
            take_r = pa.array(np.where(r_of >= 0, r_of, 0))
            for c in left_carry:
                cols[c] = t[c].take(take_l)
            for c in right_carry:
                col = t[c].take(take_r)
                cols[c] = pc.if_else(pa.array(hit), col,
                                     pa.nulls(len(lk), types[c]))
            if how == "full":
                rmatched = np.zeros(len(rk), bool)
                if hit.any():
                    rmatched[order[safe[hit]]] = True
                um = np.nonzero(~rmatched)[0]
                take_u = pa.array(r_idx[um])
                extra = {key: pa.array(rk[um], pa.int64())}
                for c in left_carry:
                    extra[c] = pa.nulls(len(um), types[c])
                for c in right_carry:
                    extra[c] = t[c].take(take_u)
                return pa.concat_tables([pa.table(cols),
                                         pa.table(extra)])
        return pa.table(cols)

    return unioned.groupby("_part").map_groups(resolve,
                                               batch_format="pyarrow")


# ------------------------------------------------------ string-key join


def _str_hash_i64(col) -> np.ndarray:
    """Stable 64-bit blake2b hash of a string column, as int64 bit views
    (uint64 > 2^63 overflows Ray's groupby key rebuild — CLAUDE.md r3
    pitfall). Hashes the block's DICTIONARY (distinct values), not every
    row."""
    import hashlib

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = pc.dictionary_encode(col)
    dvals = enc.dictionary.to_pylist()
    dh = np.fromiter(
        (int.from_bytes(hashlib.blake2b((s or "").encode("utf-8"),
                                        digest_size=8).digest(), "little")
         for s in dvals), np.uint64, len(dvals))
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return dh.view(np.int64)[idx]


def hash_join_str(left, right, key: str,
                  left_carry: dict[str, pa.DataType],
                  right_carry: dict[str, pa.DataType],
                  P: int = 32):
    """Inner equi-join on a STRING key, built on hash_join_i64: both
    sides partition and probe on the 64-bit key hash, and a post-join
    string-equality filter removes any hash collision — exact at any
    scale (a collision between two distinct RIGHT keys trips the
    unique-right assertion instead of joining wrong rows). Right side
    must have unique keys (dimension contract)."""
    rkey = f"_r_{key}"

    def tag(kout: str, own_key: bool):
        def fn(b: pa.Table) -> pa.Table:
            cols = {"_kh": pa.array(_str_hash_i64(b[key]), pa.int64()),
                    kout: b[key]}
            carry = left_carry if own_key else right_carry
            for c in carry:
                cols[c] = b[c]
            return pa.table(cols)
        return fn

    joined = hash_join_i64(
        left.map_batches(tag(key, True), batch_format="pyarrow"),
        right.map_batches(tag(rkey, False), batch_format="pyarrow"),
        key="_kh",
        left_carry={key: pa.string(), **left_carry},
        right_carry={rkey: pa.string(), **right_carry}, P=P)

    def verify(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b[key], b[rkey]))
        return t.drop_columns(["_kh", rkey])

    return joined.map_batches(verify, batch_format="pyarrow")


# --------------------------------------------------------- interval join


def interval_join(left, ts_col: str, left_carry: dict[str, pa.DataType],
                  intervals, id_col: str, t0_col: str, t1_col: str,
                  bucket_us: int):
    """Inner band join: one output row per (interval, left row) with
    left.ts in [t0, t1). Timestamp columns may be timestamp[us] or int64
    microseconds. Returns [id_col] + left_carry (+ ``ts_col``)."""

    def tag_left(b: pa.Table) -> pa.Table:
        ts = _ts_us(b[ts_col])
        n = len(ts)
        cols = {
            "_bucket": pa.array(ts // bucket_us, pa.int64()),
            "_t0": pa.array(ts, pa.int64()),
            "_t1": pa.array(np.zeros(n, np.int64), pa.int64()),
            "_id": pa.array(np.zeros(n, np.int64), pa.int64()),
            "_side": pa.array(np.zeros(n, np.int8), pa.int8()),
        }
        for c in left_carry:
            cols[c] = b[c]
        return pa.table(cols)

    def tag_intervals(b: pa.Table) -> pa.Table:
        t0 = _ts_us(b[t0_col])
        t1 = _ts_us(b[t1_col])
        iid = _np(b[id_col]).astype(np.int64)
        b0 = t0 // bucket_us
        b1 = np.maximum((t1 - 1) // bucket_us, b0)
        cnts = (b1 - b0 + 1).astype(np.int64)
        total = int(cnts.sum())
        offs = np.cumsum(cnts) - cnts
        rel = np.arange(total, dtype=np.int64) - np.repeat(offs, cnts)
        bucket = np.repeat(b0, cnts) + rel
        # clip the interval to its bucket so each (interval, event) pair
        # materializes in exactly one bucket (the event's own)
        ct0 = np.maximum(np.repeat(t0, cnts), bucket * bucket_us)
        ct1 = np.minimum(np.repeat(t1, cnts), (bucket + 1) * bucket_us)
        cols = {
            "_bucket": pa.array(bucket, pa.int64()),
            "_t0": pa.array(ct0, pa.int64()),
            "_t1": pa.array(ct1, pa.int64()),
            "_id": pa.array(np.repeat(iid, cnts), pa.int64()),
            "_side": pa.array(np.ones(total, np.int8), pa.int8()),
        }
        for c, typ in left_carry.items():
            cols[c] = pa.nulls(total, typ)
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        intervals.map_batches(tag_intervals, batch_format="pyarrow"))

    def resolve(t: pa.Table) -> pa.Table:
        side = _np(t["_side"])
        ev = np.nonzero(side == 0)[0]
        iv = np.nonzero(side == 1)[0]
        ets = _np(t["_t0"])[ev]
        order = np.argsort(ets, kind="stable")
        ets_s = ets[order]
        lo = np.searchsorted(ets_s, _np(t["_t0"])[iv], side="left")
        hi = np.searchsorted(ets_s, _np(t["_t1"])[iv], side="left")
        cnts = (hi - lo).astype(np.int64)
        nz = cnts > 0
        cnts = cnts[nz]
        total = int(cnts.sum())
        offs = np.cumsum(cnts) - cnts
        rel = np.arange(total, dtype=np.int64) - np.repeat(offs, cnts)
        ev_pos = np.repeat(lo[nz], cnts) + rel
        take_ev = pa.array(ev[order[ev_pos]])
        cols = {
            id_col: pa.array(np.repeat(_np(t["_id"])[iv][nz], cnts),
                             pa.int64()),
        }
        for c in left_carry:
            cols[c] = t[c].take(take_ev)
        return pa.table(cols)

    return unioned.groupby("_bucket").map_groups(resolve,
                                                 batch_format="pyarrow")


# ------------------------------------------------------- Bloom pre-filter

BLOOM_M_LOG2 = 20   # 2^20 bits = 128 KiB bitmap
BLOOM_K = 4


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public splitmix64 constants)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bloom_positions(keys: np.ndarray, m_log2: int, k: int) -> np.ndarray:
    """[k, n] bit positions via double hashing (h1 + i*h2, h2 odd)."""
    x = keys.astype(np.int64).view(np.uint64)
    h1 = _splitmix64(x)
    h2 = _splitmix64(x ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    mask = np.uint64((1 << m_log2) - 1)
    return np.stack([(h1 + np.uint64(i) * h2) & mask for i in range(k)])


def _bloom_build_task(m_log2: int, k: int, *blocks) -> np.ndarray:
    """OR per-block key sets into one packed uint64 bitmap — runs on a
    worker from block refs (the bitmap, not the keys, is what ships)."""
    bm = np.zeros(1 << max(m_log2 - 6, 0), np.uint64)
    for t in blocks:
        if not t.num_rows:
            continue
        keys = t["k"].to_numpy(zero_copy_only=False)
        pos = _bloom_positions(keys, m_log2, k).ravel()
        np.bitwise_or.at(bm, pos >> np.uint64(6),
                         np.uint64(1) << (pos & np.uint64(63)))
    return bm


_BLOOM_CACHE: dict = {}


def _cached_bloom(ref) -> np.ndarray:
    key = ref.hex()
    if key not in _BLOOM_CACHE:
        import ray

        _BLOOM_CACHE[key] = ray.get(ref)
    return _BLOOM_CACHE[key]


def bloom_semi_filter(left, right_keys, key: str,
                      m_log2: int = BLOOM_M_LOG2, k: int = BLOOM_K):
    """Map-side Bloom pre-filter for a semi join: keep every ``left`` row
    whose ``key`` MIGHT appear in ``right_keys`` (a Dataset with an
    int64 column ``k``). No false negatives; false positives pass
    through, so compose with ``hash_join_i64(..., how="semi")`` for the
    exact answer. The 128 KiB bitmap is built on a worker from block
    refs and broadcast once — at 100 TB this is the stage that keeps the
    exact semi join's shuffle from carrying the 99% of probe rows that
    can't match."""
    import ray

    blocks = right_keys.materialize().get_internal_block_refs()
    fn = ray.remote(num_cpus=1)(_bloom_build_task)
    bm_ref = fn.remote(m_log2, k, *blocks)

    def probe(b: pa.Table) -> pa.Table:
        bm = _cached_bloom(bm_ref)
        keys = b[key].to_numpy(zero_copy_only=False)
        pos = _bloom_positions(keys, m_log2, k)
        hit = np.ones(len(keys), bool)
        for i in range(k):
            p = pos[i]
            hit &= (bm[p >> np.uint64(6)]
                    >> (p & np.uint64(63))) & np.uint64(1) != 0
        return b.filter(pa.array(hit))

    return left.map_batches(probe, batch_format="pyarrow")
