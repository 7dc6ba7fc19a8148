"""Round-3 extension queries: TPC-H-style relational breadth (pricing
summary, promo revenue share, late-order counts) and the remaining
window/statistics families (running totals, frame windows, NTILE
bucketing, interpolated quantiles, word bigrams).

Every query follows the repo's scale contract: per-block partial
aggregation before every shuffle, integer-exact money/value math
(floor(x·scale + 0.5) per row on BOTH engines — CLAUDE.md float-parity
rule), joins via stages/relational.hash_join_i64 (union + part-groupby +
searchsorted; no Ray Dataset.join), and window functions as one
key-hash shuffle + one lexsort + numpy scans per partition (the
events_lag pattern from pipelines/queries.py) — never a per-group
Python loop.

Reference scope note: the reference engine (thomersch/grandine) has no
relational layer; these operators extend the engine for the
training-data-pipeline surface (SURVEY.md §2.7b) with DuckDB as the
parity oracle.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages import relational


# ------------------------------------------------------------ helpers


def _np(col):
    return col.to_numpy(zero_copy_only=False)


def _ts_us(col) -> np.ndarray:
    v = _np(col)
    if v.dtype.kind == "M":
        return v.astype("datetime64[us]").astype(np.int64)
    return v.astype(np.int64)


def _group_sums(keys: np.ndarray, *vals: np.ndarray):
    """Sort-based per-block combiner: collapse rows to distinct int64
    keys with summed value columns (np.add.reduceat — one pass)."""
    order = np.argsort(keys, kind="stable")
    k_s = keys[order]
    starts = np.ones(len(k_s), bool)
    if len(k_s):
        starts[1:] = k_s[1:] != k_s[:-1]
    idx = np.nonzero(starts)[0]
    outs = [np.add.reduceat(v[order], idx) if len(k_s)
            else np.empty(0, v.dtype) for v in vals]
    return k_s[idx] if len(k_s) else k_s, outs


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def _fuse20(hi: np.ndarray, lo: np.ndarray, what: str) -> np.ndarray:
    """Fuse two int64 key columns into one (hi << 20 | lo), raising — not
    silently corrupting — when either field overflows its width (hi needs
    < 2^43, lo < 2^20). Mirrors stages/window.py's 41-bit shard guard:
    distinct-count pipelines that fuse keys MUST fail loud at scales the
    packing can't represent (e.g. TPC-H suppkey >= 2^20 at sf >~ 100)."""
    if len(lo) and (int(lo.max()) >= (1 << 20) or int(lo.min()) < 0):
        raise ValueError(f"_fuse20: {what} low field exceeds 20 bits")
    if len(hi) and (int(hi.max()) >= (1 << 43) or int(hi.min()) < 0):
        raise ValueError(f"_fuse20: {what} high field exceeds 43 bits")
    return (hi << np.int64(20)) | lo


# --------------------------------------------------- TPC-H Q1: pricing


PRICING_CUTOFF = np.datetime64("2000-09-01", "us").astype(np.int64)


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1 pricing summary: per (returnflag, linestatus) sums of
    quantity / base / discounted / charged amounts plus row counts over
    shipped-before-cutoff lineitems. One streaming pass collapses each
    block to ≤6 fused-key rows (the group domain), so the groupby
    shuffles O(blocks × 6) rows; money is integer cents per row."""
    from ray.data.aggregate import Sum

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        keep = _ts_us(b["l_shipdate"]) <= PRICING_CUTOFF
        b = b.filter(pa.array(keep))
        fused = pc.binary_join_element_wise(
            b["l_returnflag"].combine_chunks() if isinstance(
                b["l_returnflag"], pa.ChunkedArray) else b["l_returnflag"],
            b["l_linestatus"].combine_chunks() if isinstance(
                b["l_linestatus"], pa.ChunkedArray) else b["l_linestatus"],
            "\x1f")
        enc = pc.dictionary_encode(fused)
        codes = _np(enc.indices).astype(np.int64)
        qty = _np(b["l_quantity"]).astype(np.int64)
        ep = _np(b["l_extendedprice"])
        dc = _np(b["l_discount"])
        tax = _np(b["l_tax"])
        base = _cents(ep)
        disc = np.floor(ep * (1 - dc) * 100 + 0.5).astype(np.int64)
        charge = np.floor(ep * (1 - dc) * (1 + tax) * 100 + 0.5) \
            .astype(np.int64)
        ones = np.ones(len(codes), np.int64)
        keys, (sq, sb, sd, sc, n) = _group_sums(
            codes, qty, base, disc, charge, ones)
        return pa.table({
            "k": enc.dictionary.take(pa.array(keys)),
            "sum_qty": pa.array(sq, pa.int64()),
            "base_cents": pa.array(sb, pa.int64()),
            "disc_cents": pa.array(sd, pa.int64()),
            "charge_cents": pa.array(sc, pa.int64()),
            "n": pa.array(n, pa.int64()),
        })

    agg = li.map_batches(partial, batch_format="pyarrow").groupby("k") \
        .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                   Sum("base_cents", alias_name="base_cents"),
                   Sum("disc_cents", alias_name="disc_cents"),
                   Sum("charge_cents", alias_name="charge_cents"),
                   Sum("n", alias_name="n"))

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["k"], "\x1f")
        rf = pc.list_element(parts, 0)
        ls = pc.list_element(parts, 1)
        cols = {"l_returnflag": rf, "l_linestatus": ls}
        for c in ("sum_qty", "base_cents", "disc_cents", "charge_cents",
                  "n"):
            cols[c] = pc.cast(b[c], pa.int64())
        return pa.table(cols)

    return agg.map_batches(split, batch_format="pyarrow")


# ------------------------------------------------ TPC-H Q14: promo share


def q_promo_share(sf_dir: str):
    """Promo revenue share per ship month (TPC-H Q14 family): lineitem
    collapses per block to (partkey·month, cents) partials, joins the
    part dimension on partkey (hash_join_i64 — union shuffle, unique
    right), and a final month groupby emits promo vs total integer
    cents. The part side ships only (partkey, is_promo int8)."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])

    def li_partial(b: pa.Table) -> pa.Table:
        pk = _np(b["l_partkey"]).astype(np.int64)
        months = _np(b["l_shipdate"]).astype("datetime64[M]")
        mc = months.astype(np.int64)  # months since 1970-01
        ym = (1970 + mc // 12) * 100 + (mc % 12 + 1)
        ep = _np(b["l_extendedprice"])
        dc = _np(b["l_discount"])
        cents = np.floor(ep * (1 - dc) * 100 + 0.5).astype(np.int64)
        # fuse (partkey, ym): ym < 2^20 by construction, partkey guarded
        fused = _fuse20(pk, ym, "(partkey, ym)")
        keys, (sc,) = _group_sums(fused, cents)
        return pa.table({
            "partkey": pa.array(keys >> np.int64(20), pa.int64()),
            "ym": pa.array(keys & np.int64((1 << 20) - 1), pa.int64()),
            "cents": pa.array(sc, pa.int64()),
        })

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])

    def part_slim(b: pa.Table) -> pa.Table:
        promo = pc.equal(b["p_type"], "PROMO")
        return pa.table({
            "partkey": pc.cast(b["p_partkey"], pa.int64()),
            "is_promo": pc.cast(promo, pa.int64()),
        })

    joined = relational.hash_join_i64(
        li.map_batches(li_partial, batch_format="pyarrow"),
        part.map_batches(part_slim, batch_format="pyarrow"),
        key="partkey",
        left_carry={"ym": pa.int64(), "cents": pa.int64()},
        right_carry={"is_promo": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    def ym_partial(b: pa.Table) -> pa.Table:
        ym = _np(b["ym"]).astype(np.int64)
        cents = _np(b["cents"]).astype(np.int64)
        promo = cents * _np(b["is_promo"]).astype(np.int64)
        keys, (sp, st) = _group_sums(ym, promo, cents)
        return pa.table({
            "ym": pa.array(keys, pa.int64()),
            "promo_cents": pa.array(sp, pa.int64()),
            "total_cents": pa.array(st, pa.int64()),
        })

    agg = joined.map_batches(ym_partial, batch_format="pyarrow") \
        .groupby("ym").aggregate(
            Sum("promo_cents", alias_name="promo_cents"),
            Sum("total_cents", alias_name="total_cents"))

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({
            "ym": pc.cast(b["ym"], pa.int64()),
            "promo_cents": pc.cast(b["promo_cents"], pa.int64()),
            "total_cents": pc.cast(b["total_cents"], pa.int64()),
        })

    return agg.map_batches(widen, batch_format="pyarrow")


# ------------------------------------------------ TPC-H Q4: late orders


LATE_FROM = np.datetime64("1996-01-01", "us").astype(np.int64)
LATE_TO = np.datetime64("1998-01-01", "us").astype(np.int64)
LATE_SLIP_US = 60 * 86_400 * 1_000_000  # 60 days


def q_late_orders(sf_dir: str):
    """Order-priority counts of LATE orders (TPC-H Q4 family): orders in
    a two-year window whose last lineitem shipped >60 days after the
    order date. lineitem collapses per block to per-order MAX(shipdate)
    partials before a tiny per-order Max groupby; the date-windowed
    orders join on orderkey (hash_join_i64) and a priority groupby
    counts. The EXISTS is the inner join itself — an order with no
    lineitems can't be late."""
    from ray.data.aggregate import Max, Sum
    from ..stages import relational

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def li_max(b: pa.Table) -> pa.Table:
        ok = _np(b["l_orderkey"]).astype(np.int64)
        ship = _ts_us(b["l_shipdate"])
        order = np.argsort(ok, kind="stable")
        ok_s, sh_s = ok[order], ship[order]
        starts = np.ones(len(ok_s), bool)
        starts[1:] = ok_s[1:] != ok_s[:-1]
        idx = np.nonzero(starts)[0]
        return pa.table({
            "okey": pa.array(ok_s[idx], pa.int64()),
            "ms_us": pa.array(np.maximum.reduceat(sh_s, idx)
                              if len(ok_s) else sh_s, pa.int64()),
        })

    ms = li.map_batches(li_max, batch_format="pyarrow") \
        .groupby("okey").aggregate(Max("ms_us", alias_name="ms_us"))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])

    def ord_slim(b: pa.Table) -> pa.Table:
        od = _ts_us(b["o_orderdate"])
        keep = (od >= LATE_FROM) & (od < LATE_TO)
        t = b.filter(pa.array(keep))
        return pa.table({
            "okey": pc.cast(t["o_orderkey"], pa.int64()),
            "od_us": pa.array(od[keep], pa.int64()),
            "priority": t["o_orderpriority"],
        })

    def ms_widen(b: pa.Table) -> pa.Table:
        return pa.table({"okey": pc.cast(b["okey"], pa.int64()),
                         "ms_us": pc.cast(b["ms_us"], pa.int64())})

    joined = relational.hash_join_i64(
        ms.map_batches(ms_widen, batch_format="pyarrow"),
        orders.map_batches(ord_slim, batch_format="pyarrow"),
        key="okey",
        left_carry={"ms_us": pa.int64()},
        right_carry={"od_us": pa.int64(), "priority": pa.string()},
        P=relational.adaptive_parts(sf_dir))

    def count_partial(b: pa.Table) -> pa.Table:
        late = _np(b["ms_us"]) > _np(b["od_us"]) + LATE_SLIP_US
        t = b.filter(pa.array(late))
        pr = t["priority"].combine_chunks() if isinstance(
            t["priority"], pa.ChunkedArray) else t["priority"]
        enc = pc.dictionary_encode(pr)
        codes = _np(enc.indices).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table({
            "o_orderpriority": enc.dictionary,
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    agg = joined.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("o_orderpriority").aggregate(Sum("n", alias_name="n"))

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderpriority": b["o_orderpriority"],
                         "n": pc.cast(b["n"], pa.int64())})

    return agg.map_batches(widen, batch_format="pyarrow")


# ------------------------------------------- window: running cumulative


def q_running_total(sf_dir: str, num_partitions: int | None = None):
    """Per-user running total (SUM OVER ROWS UNBOUNDED PRECEDING): one
    user-hash shuffle, one lexsort per partition, one integer cumsum
    with group-boundary offset subtraction — the events_lag pattern.
    Values integer-ized per row (milli) before the cumsum, so the
    running sum is exact and order-independent across engines."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    P = num_partitions or relational.adaptive_parts(sf_dir)

    def addpart(b: pa.Table) -> pa.Table:
        u = _np(b["user_id"])
        return b.append_column(
            "_part", pa.array((u % P).astype(np.int32), pa.int32()))

    def running(t: pa.Table) -> pa.Table:
        u = _np(t["user_id"])
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"])
        vm = np.floor(_np(t["value"]) * 1000 + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u_s, vm_s = u[order], vm[order]
        cs = np.cumsum(vm_s)
        starts = np.zeros(len(u_s), np.int64)
        if len(u_s):
            new = np.ones(len(u_s), bool)
            new[1:] = u_s[1:] != u_s[:-1]
            # offset at each row = cumsum just before its group start
            gs = np.maximum.accumulate(np.where(new,
                                                np.arange(len(u_s)), 0))
            starts = np.where(gs > 0, cs[gs - 1], 0)
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": pa.array(u_s.astype(np.int64), pa.int64()),
            "cum_milli": pa.array(cs - starts, pa.int64()),
        })

    return ev.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(running, batch_format="pyarrow")


# -------------------------------------------- window: bounded row frame


MW_PRECEDING = 2  # ROWS BETWEEN 2 PRECEDING AND CURRENT ROW


def q_moving_window(sf_dir: str, num_partitions: int | None = None):
    """Bounded row-frame window (SUM + COUNT over ROWS BETWEEN 2
    PRECEDING AND CURRENT ROW per user): the running-total kernel with a
    trailing-edge subtraction — w_sum[i] = cs[i] - cs[max(group_start,
    i-2) - 1]. Integer milli units; no division, fully exact."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    P = num_partitions or relational.adaptive_parts(sf_dir)
    W = MW_PRECEDING

    def addpart(b: pa.Table) -> pa.Table:
        u = _np(b["user_id"])
        return b.append_column(
            "_part", pa.array((u % P).astype(np.int32), pa.int32()))

    def frame(t: pa.Table) -> pa.Table:
        u = _np(t["user_id"])
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"])
        vm = np.floor(_np(t["value"]) * 1000 + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u_s, vm_s = u[order], vm[order]
        n = len(u_s)
        cs = np.cumsum(vm_s)
        idx = np.arange(n, dtype=np.int64)
        new = np.ones(n, bool)
        if n:
            new[1:] = u_s[1:] != u_s[:-1]
        gs = np.maximum.accumulate(np.where(new, idx, 0))
        lo = np.maximum(gs, idx - W)
        w_n = idx - lo + 1
        prev = np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        w_sum = cs - prev
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": pa.array(u_s.astype(np.int64), pa.int64()),
            "w_sum_milli": pa.array(w_sum, pa.int64()),
            "w_n": pa.array(w_n, pa.int64()),
        })

    return ev.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(frame, batch_format="pyarrow")


# ------------------------------------------------------ NTILE bucketing


def ntile_assign(n: int, k: int) -> np.ndarray:
    """1-based NTILE(k) tile for each 0-based rank of an n-row group
    (SQL semantics: first n%k tiles get one extra row)."""
    q, r = divmod(n, k)
    i = np.arange(n, dtype=np.int64)
    big = r * (q + 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        rest = r + (i - big) // max(q, 1) + 1
    return np.where(i < big, i // (q + 1) + 1, rest).astype(np.int64)


def q_token_deciles(sf_dir: str):
    """Per-language NTILE(10) decile summary of whitespace token counts:
    one lang shuffle, one lexsort (n_tokens, doc_id) per group, integer
    NTILE assignment, per-(lang, tile) count/min/max. Exact rank
    semantics need the per-group sort — the documented scale alternative
    is the histogram quantile path (token_quantiles), which buckets
    without ranking. Group domain = languages, so the per-group volume
    is corpus/|langs|; skewed language mixes shard by doc-hash first and
    merge rank offsets (not needed at fixture scale)."""
    from ..stages import text as text_stage

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "text"])
    toks = docs.map_batches(text_stage.token_counter_batch,
                            batch_format="pyarrow")

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "lang": b["lang"],
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "nt": pc.cast(b["n_tokens_ws"], pa.int64()),
        })

    def deciles(t: pa.Table) -> pa.Table:
        lang = t["lang"][0].as_py()
        nt = _np(t["nt"])
        did = _np(t["doc_id"])
        order = np.lexsort((did, nt))
        nt_s = nt[order]
        tile = ntile_assign(len(nt_s), 10)
        # per-tile count/min/max: tiles are sorted runs
        starts = np.ones(len(tile), bool)
        starts[1:] = tile[1:] != tile[:-1]
        idx = np.nonzero(starts)[0]
        ends = np.r_[idx[1:], len(tile)] - 1
        return pa.table({
            "lang": pa.array([lang] * len(idx), pa.string()),
            "tile": pa.array(tile[idx], pa.int64()),
            "n": pa.array((np.r_[idx[1:], len(tile)] - idx)
                          .astype(np.int64), pa.int64()),
            "min_tokens": pa.array(nt_s[idx], pa.int64()),
            "max_tokens": pa.array(nt_s[ends], pa.int64()),
        })

    return toks.map_batches(slim, batch_format="pyarrow") \
        .groupby("lang").map_groups(deciles, batch_format="pyarrow")


# ------------------------------------------------------- word bigrams


def q_bigram_counts(sf_dir: str):
    """Corpus-wide top-20 word bigrams — the n-gram statistics pass of a
    language-model data pipeline. Per block: one Arrow lowercase +
    whitespace split, adjacent-pair join (binary_join_element_wise on
    the flat term array, masked at document boundaries), dictionary
    encode + bincount partial counts; then a bigram-keyed groupby and a
    global top-k sort+limit. The shuffle carries the bigram VOCABULARY
    (partial counts), never the corpus."""
    from ray.data.aggregate import Sum
    from ..stages.corpus import _batch_terms

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        flat, doc_of, _, _ = _batch_terms(b, "text")
        L = len(flat)
        if L < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        pairs = pc.binary_join_element_wise(
            flat.slice(0, L - 1), flat.slice(1, L - 1), " ")
        same_doc = doc_of[1:] == doc_of[:-1]
        pairs = pairs.filter(pa.array(same_doc))
        enc = pc.dictionary_encode(pairs)
        codes = _np(enc.indices).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table({
            "bigram": enc.dictionary,
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("bigram").aggregate(Sum("n", alias_name="n"))

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({"bigram": b["bigram"],
                         "n": pc.cast(b["n"], pa.int64())})

    return agg.map_batches(widen, batch_format="pyarrow") \
        .sort(["n", "bigram"], descending=[True, False]).limit(20)


# --------------------------------------- interpolated (cont.) quantiles


def q_value_quantiles_cont(sf_dir: str):
    """Exact INTERPOLATED quantiles (SQL quantile_cont / numpy type-7)
    per event type over integer-milli values, via the value-count
    histogram shuffle (stages/stats.group_quantiles_cont) — rows never
    move. Quantiles restricted to quarters (p ∈ {.25,.5,.75}) make the
    interpolation weight an exact dyadic rational, so results are emitted
    ×4 as integers and match DuckDB bit-for-bit."""
    from ..stages import stats as stats_stage

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def milli(b: pa.Table) -> pa.Table:
        vm = np.floor(_np(b["value"]) * 1000 + 0.5).astype(np.int64)
        return pa.table({"event_type": b["event_type"],
                         "vm": pa.array(vm, pa.int64())})

    return stats_stage.group_quantiles_cont(
        ev.map_batches(milli, batch_format="pyarrow"),
        "event_type", "vm",
        [0.25, 0.5, 0.75], ["p25_q", "p50_q", "p75_q"])


# ----------------------------------------------------------- registry


QUERIES_EXT = {
    "pricing_summary": q_pricing_summary,
    "promo_share": q_promo_share,
    "late_orders": q_late_orders,
    "running_total": q_running_total,
    "moving_window": q_moving_window,
    "token_deciles": q_token_deciles,
    "bigram_counts": q_bigram_counts,
    "value_quantiles_cont": q_value_quantiles_cont,
}


ORACLE_SQL_EXT = {
    "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS base_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS disc_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                           * (1 + l_tax) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS charge_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-01'
GROUP BY l_returnflag, l_linestatus""",
    "promo_share": """
SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                                + 0.5) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS total_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY ym""",
    "late_orders": """
WITH ms AS (SELECT l_orderkey, MAX(l_shipdate) AS m
            FROM lineitem GROUP BY 1)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
FROM orders JOIN ms ON o_orderkey = l_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND ms.m > o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderpriority""",
    "running_total": """
SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_milli
FROM events""",
    "moving_window": """
SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) OVER w
            AS BIGINT) AS w_sum_milli,
       CAST(COUNT(*) OVER w AS BIGINT) AS w_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
    "token_deciles": r"""
WITH tok AS (
  SELECT doc_id, lang,
         CAST(CASE WHEN TRIM(text) = '' THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END
              AS BIGINT) AS nt
  FROM documents),
tiled AS (
  SELECT lang, nt,
         NTILE(10) OVER (PARTITION BY lang ORDER BY nt, doc_id) AS tile
  FROM tok)
SELECT lang, CAST(tile AS BIGINT) AS tile, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(nt) AS BIGINT) AS min_tokens,
       CAST(MAX(nt) AS BIGINT) AS max_tokens
FROM tiled GROUP BY lang, tile""",
    "bigram_counts": r"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(TRIM(lower(text)), '\s+') AS ws
  FROM documents WHERE TRIM(text) <> ''),
big AS (
  SELECT UNNEST([ws[i] || ' ' || ws[i+1]
                 for i in generate_series(1, len(ws) - 1)]) AS bigram
  FROM words WHERE len(ws) >= 2)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM big GROUP BY bigram
ORDER BY n DESC, bigram LIMIT 20""",
    "value_quantiles_cont": """
WITH v AS (SELECT event_type,
                  CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
           FROM events)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(quantile_cont(vm, 0.25) * 4 AS BIGINT) AS p25_q,
       CAST(quantile_cont(vm, 0.50) * 4 AS BIGINT) AS p50_q,
       CAST(quantile_cont(vm, 0.75) * 4 AS BIGINT) AS p75_q
FROM v GROUP BY event_type""",
}
