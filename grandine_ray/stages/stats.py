"""Distributed statistics stages: exact group quantiles via value-count
histograms, exact distinct counts, and a HyperLogLog sketch scale path.

Scale shapes (the 100-TB contract):

* ``group_quantiles``: the shuffle payload is the per-(group, value)
  HISTOGRAM, never the rows — a per-batch ``np.unique`` pre-aggregate
  collapses each block to its distinct (group, value) pairs before the
  groupby, so the all-to-all moves O(groups × distinct-values) rows.
  Exact for any discrete value column (token counts, lengths, ranks);
  for continuous doubles quantize first or use a sketch.
* ``distinct_count_exact``: classic two-stage — dedup shuffle on the
  (group, value) pair (pre-deduped per block), then a tiny per-group
  count. The first shuffle is the honest cost of exactness.
* ``distinct_count_hll``: one pass, no pair shuffle — each block emits
  per-group partial HLL registers (2^p bytes) and only registers merge
  in the groupby. The documented approximate path when the pair shuffle
  is too expensive (billions of distinct values per group).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# --------------------------------------------------------------- quantiles


def _pair_counts(batch: pa.Table, group_col: str, value_col: str) -> pa.Table:
    """Per-block (group, value, n) partial histogram (np.unique combiner)."""
    g = batch[group_col]
    v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # dictionary-encode the group column so the unique pass is numeric
    enc = pc.dictionary_encode(g.combine_chunks()
                               if isinstance(g, pa.ChunkedArray) else g)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    key = (codes << np.int64(44)) | (v & np.int64((1 << 44) - 1))
    uniq, counts = np.unique(key, return_counts=True)
    u_codes = (uniq >> np.int64(44)).astype(np.int64)
    u_vals = (uniq & np.int64((1 << 44) - 1)).astype(np.int64)
    return pa.table({
        group_col: enc.dictionary.take(pa.array(u_codes, pa.int64())),
        value_col: pa.array(u_vals, pa.int64()),
        "n": pa.array(counts.astype(np.int64), pa.int64()),
    })


def quantile_disc_sorted(values: np.ndarray, weights: np.ndarray,
                         q: float) -> int:
    """DuckDB ``quantile_disc`` semantics over a weighted sorted histogram:
    the element at 1-based rank ``ceil(q·n)`` (clamped to [1, n])."""
    n = int(weights.sum())
    rank = min(max(int(np.ceil(q * n)), 1), n)
    cum = np.cumsum(weights)
    return int(values[np.searchsorted(cum, rank, side="left")])


def group_quantiles(ds, group_col: str, value_col: str, qs: list[float],
                    out_names: list[str]):
    """Exact discrete quantiles of ``value_col`` per ``group_col``.

    Values must be non-negative integers < 2^44 (token counts, lengths).
    Returns one row per group: (group_col, n_rows, *out_names).
    """
    from ray.data.aggregate import Sum

    if "n" in (group_col, value_col):
        # the histogram pass uses "n" for its own counts; a colliding
        # input column silently quantiles the wrong values
        raise ValueError("group_quantiles: column name 'n' is reserved "
                         "for the internal histogram counts")

    hist = ds.map_batches(
        lambda b: _pair_counts(b, group_col, value_col),
        batch_format="pyarrow",
    ).groupby([group_col, value_col]).aggregate(Sum("n", alias_name="n"))

    def final(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        w = t["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cols = {
            group_col: t[group_col].slice(0, 1),
            "n_rows": pa.array([int(w.sum())], pa.int64()),
        }
        for q, name in zip(qs, out_names):
            cols[name] = pa.array([quantile_disc_sorted(v, w, q)], pa.int64())
        return pa.table(cols)

    return hist.groupby(group_col).map_groups(final, batch_format="pyarrow")


def quantile_cont_sorted_q4(values: np.ndarray, weights: np.ndarray,
                            p4: int) -> int:
    """Interpolated (type-7 / SQL quantile_cont) quantile at p = p4/4
    over a weighted sorted histogram, returned ×4 as an exact integer:
    h = (n-1)·p; out = 4·v[⌊h⌋] + frac4·(v[⌊h⌋+1] − v[⌊h⌋]) with
    frac4 = 4·(h − ⌊h⌋) ∈ {0,1,2,3}. Quarter quantiles make every term
    integral, so the result is bit-exact across engines."""
    n = int(weights.sum())
    cum = np.cumsum(weights)

    def at(rank0: int) -> int:
        return int(values[np.searchsorted(cum, rank0 + 1, side="left")])

    h4 = (n - 1) * p4
    lo = h4 // 4
    frac4 = h4 % 4
    v_lo = at(lo)
    v_hi = at(min(lo + 1, n - 1)) if frac4 else v_lo
    return 4 * v_lo + frac4 * (v_hi - v_lo)


def group_quantiles_cont(ds, group_col: str, value_col: str,
                         qs: list[float], out_names: list[str]):
    """Exact INTERPOLATED quantiles (SQL quantile_cont) per group over
    the same value-count histogram shuffle as ``group_quantiles``.
    Quantiles must be quarters (p·4 integral) and values non-negative
    integers < 2^44; outputs are the quantile ×4 as int64 (exact — the
    dyadic interpolation weight keeps all arithmetic integral)."""
    from ray.data.aggregate import Sum

    if "n" in (group_col, value_col):
        raise ValueError("group_quantiles_cont: column name 'n' is "
                         "reserved for the internal histogram counts")
    p4s = []
    for q in qs:
        p4 = round(q * 4)
        if abs(p4 - q * 4) > 1e-12:
            raise ValueError(f"quantile {q} is not a quarter")
        p4s.append(int(p4))

    hist = ds.map_batches(
        lambda b: _pair_counts(b, group_col, value_col),
        batch_format="pyarrow",
    ).groupby([group_col, value_col]).aggregate(Sum("n", alias_name="n"))

    def final(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        w = t["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cols = {
            group_col: t[group_col].slice(0, 1),
            "n_rows": pa.array([int(w.sum())], pa.int64()),
        }
        for p4, name in zip(p4s, out_names):
            cols[name] = pa.array([quantile_cont_sorted_q4(v, w, p4)],
                                  pa.int64())
        return pa.table(cols)

    return hist.groupby(group_col).map_groups(final, batch_format="pyarrow")


# ---------------------------------------------------------- distinct count


def distinct_count_exact(ds, group_col: str, value_col: str,
                         out_name: str = "n_distinct"):
    """Exact COUNT(DISTINCT value) per group: per-block pair dedup →
    pair-dedup shuffle → tiny per-group count."""
    from ray.data.aggregate import Count

    def pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch[group_col],
                      value_col: batch[value_col]})
        # block-local dedup before the shuffle (the combiner)
        return t.group_by([group_col, value_col]).aggregate([])

    uniq = ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby([group_col, value_col]).aggregate(Count(alias_name="_n"))
    agg = uniq.groupby(group_col).aggregate(Count(alias_name=out_name))

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({group_col: b[group_col],
                         out_name: pc.cast(b[out_name], pa.int64())})

    return agg.map_batches(widen, batch_format="pyarrow")


# ------------------------------------------------------------- HyperLogLog


_HLL_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def _hll_alpha(m: int) -> float:
    return _HLL_ALPHA.get(int(np.log2(m)), 0.7213 / (1 + 1.079 / m))


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic 64-bit avalanche."""
    x = x.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def hll_partial(values: np.ndarray, p: int = 12) -> np.ndarray:
    """HLL registers (uint8[2^p]) for one block of int64 values."""
    m = 1 << p
    h = _mix64(values.astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    # rank = leading zeros of the remaining 64-p bits, + 1
    rank = np.zeros(len(h), np.uint8)
    bits = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = bits < (np.uint64(1) << np.uint64(64 - shift))
        rank[mask] += shift
        bits[mask] <<= np.uint64(shift)
    rank += 1
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate with the small-range linear-counting fix."""
    m = len(regs)
    est = _hll_alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def distinct_count_hll(ds, group_col: str, value_col: str, p: int = 12,
                       out_name: str = "n_distinct_est"):
    """Approximate COUNT(DISTINCT) per group — one pass, registers-only
    shuffle (each block contributes one 2^p-byte register row per group
    it has seen; the groupby merges registers with element-wise max)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col]
        enc = pc.dictionary_encode(g.combine_chunks()
                                   if isinstance(g, pa.ChunkedArray) else g)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, regs = [], []
        for c in np.unique(codes):
            keys.append(int(c))
            regs.append(hll_partial(v[codes == c], p).tobytes())
        return pa.table({
            group_col: enc.dictionary.take(pa.array(keys, pa.int64())),
            "_regs": pa.array(regs, pa.binary()),
        })

    def merge(t: pa.Table) -> pa.Table:
        blobs = t["_regs"].to_pylist()
        regs = np.frombuffer(b"".join(blobs), np.uint8).reshape(len(blobs), -1)
        merged = regs.max(axis=0)
        return pa.table({
            group_col: t[group_col].slice(0, 1),
            out_name: pa.array([int(round(hll_estimate(merged)))], pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(merge, batch_format="pyarrow")


# -------------------------------------------------- heavy hitters (MG)


def mg_compress(counts: dict, k: int) -> dict:
    """Misra-Gries compression: keep at most k counters by subtracting
    the (k+1)-th largest count from everyone (the mergeable-summaries
    formulation — Agarwal et al., PODS'12). Estimates are true-count
    minus at most n/(k+1) and never above the true count."""
    if len(counts) <= k:
        return dict(counts)
    vals = sorted(counts.values(), reverse=True)
    thresh = vals[k]
    return {key: c - thresh for key, c in counts.items() if c > thresh}


def mg_merge(a: dict, b: dict, k: int) -> dict:
    out = dict(a)
    for key, c in b.items():
        out[key] = out.get(key, 0) + c
    return mg_compress(out, k)


def heavy_hitters_mg(ds, value_col: str, k: int = 64):
    """Approximate top-frequency items in ONE streaming pass: each block
    reduces to an exact local count dict compressed to k counters
    (a valid MG summary of the block), and summaries merge pairwise in a
    tiny final reduce. Per-item error ≤ n/(k+1); every item with true
    count > n/(k+1) is guaranteed present. The sketch path for when the
    exact groupby's shuffle (one row per distinct item) is too wide."""
    import pyarrow.compute as _pc

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[value_col]
        enc = _pc.dictionary_encode(col.combine_chunks()
                                    if isinstance(col, pa.ChunkedArray)
                                    else col)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        local = mg_compress(
            {enc.dictionary[i].as_py(): int(c)
             for i, c in enumerate(cnt) if c}, k)
        return pa.table({
            "item": pa.array(list(local), pa.string()),
            "est": pa.array(list(local.values()), pa.int64()),
            "_one": pa.array(np.zeros(len(local), np.int8), pa.int8()),
        })

    def reduce_all(t: pa.Table) -> pa.Table:
        merged: dict = {}
        items = t["item"].to_pylist()
        ests = t["est"].to_numpy(zero_copy_only=False)
        # summing all summaries then compressing once = pairwise merges
        # (compression commutes with addition in the error bound)
        for it, e in zip(items, ests):
            merged[it] = merged.get(it, 0) + int(e)
        merged = mg_compress(merged, k)
        order = sorted(merged, key=lambda x: (-merged[x], x))
        return pa.table({
            "item": pa.array(order, pa.string()),
            "est": pa.array([merged[o] for o in order], pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_one").map_groups(reduce_all, batch_format="pyarrow")


# ------------------------------------------------- t-digest (quantiles)


def tdigest_build(means: np.ndarray, weights: np.ndarray,
                  delta: int = 100) -> tuple[np.ndarray, np.ndarray]:
    """Merge weighted points into t-digest centroids (Dunning's merging
    variant with the k1 scale function k(q) = δ/2π·asin(2q−1)): clusters
    stay small near the tails, so tail quantiles stay sharp. Input need
    not be sorted; output centroids are sorted by mean. Deterministic."""
    order = np.argsort(means, kind="stable")
    m = means[order].astype(np.float64)
    w = weights[order].astype(np.float64)
    total = w.sum()
    if total == 0:
        return np.empty(0, np.float64), np.empty(0, np.float64)

    # vectorized band construction: point i (by its right-edge quantile)
    # belongs to k-band floor(k(q_i) - k(0)); bands are contiguous spans
    # of the sorted input, so one reduceat computes every centroid. Same
    # k1 size bound as the sequential greedy merge, fully vectorized.
    qe = np.cumsum(w) / total
    ke = delta / (2 * np.pi) * np.arcsin(np.clip(2 * qe - 1, -1, 1))
    cid = np.floor(ke + delta / 4.0).astype(np.int64)
    starts = np.ones(len(cid), bool)
    starts[1:] = cid[1:] != cid[:-1]
    idx = np.nonzero(starts)[0]
    ws = np.add.reduceat(w, idx)
    ms = np.add.reduceat(m * w, idx) / ws
    return ms, ws


def tdigest_quantile(means: np.ndarray, weights: np.ndarray,
                     q: float) -> float:
    """Interpolated quantile from sorted centroids (midpoint rule)."""
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    total = weights.sum()
    target = q * total
    cum = np.cumsum(weights) - weights / 2          # centroid midpoints
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target)) - 1
    f = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(means[i] + f * (means[i + 1] - means[i]))


def group_quantiles_tdigest(ds, group_col: str, value_col: str,
                            qs: list[float], out_names: list[str],
                            delta: int = 200):
    """Approximate per-group quantiles of a CONTINUOUS column in one
    pass: each block reduces to ≤δ centroids per group (a binary blob),
    the groupby merges centroid sets by re-clustering — constant
    shuffle bytes per (block, group) regardless of rows. The
    approximate sibling of ``group_quantiles`` (exact, discrete)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col]
        enc = pc.dictionary_encode(g.combine_chunks()
                                   if isinstance(g, pa.ChunkedArray) else g)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        keys, blobs = [], []
        for c in np.unique(codes):
            sel = v[codes == c]
            # partial digests stay 4x finer; only the final merge
            # compresses to delta (one merge level, not a merge tower,
            # so the rank-error bound stays near the single-pass one)
            m, w = tdigest_build(sel, np.ones(len(sel)), 4 * delta)
            keys.append(int(c))
            blobs.append(np.concatenate([m, w]).tobytes())
        return pa.table({
            group_col: enc.dictionary.take(pa.array(keys, pa.int64())),
            "_td": pa.array(blobs, pa.binary()),
        })

    def merge(t: pa.Table) -> pa.Table:
        ms, ws = [], []
        for blob in t["_td"].to_pylist():
            arr = np.frombuffer(blob, np.float64)
            h = len(arr) // 2
            ms.append(arr[:h])
            ws.append(arr[h:])
        m, w = tdigest_build(np.concatenate(ms), np.concatenate(ws), delta)
        cols = {group_col: t[group_col].slice(0, 1),
                "n_rows": pa.array([int(round(w.sum()))], pa.int64())}
        for q, name in zip(qs, out_names):
            cols[name] = pa.array([tdigest_quantile(m, w, q)], pa.float64())
        return pa.table(cols)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(merge, batch_format="pyarrow")
