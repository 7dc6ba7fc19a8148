"""Round-3 event-analytics queries: hourly OHLC bars, weekly user
retention, and the event-type transition matrix — the
behavioral-analytics passes over an event stream.

Scale contract: OHLC partials are mergeable (each block emits one row
per (type, hour) carrying argmin/argmax state), retention dedups
(user, week) on a fused int64 key before any per-user work, and
transitions ride the one-user-hash-shuffle window kernel. Every shuffle
is bounded by the group domain (types × hours, users × weeks, type²),
never the event count. Values integer-ize per row (milli) — CLAUDE.md
float-parity rule.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .queries_ext import _fuse20, _np, _ts_us

HOUR_US = 3_600_000_000
WEEK_US = 604_800_000_000


def _chunk(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


# ------------------------------------------------------- hourly OHLC bars


def q_events_ohlc(sf_dir: str):
    """Open/high/low/close value bars per (event_type, hour). Per block:
    one lexsort by (key, ts, event_id) collapses to per-run partials
    carrying the merge STATE for open/close — (ts, event_id, value) of
    the run's first and last row — plus min/max/count; the groupby then
    merges a handful of partial rows per bar with one lexsort each.
    Ties on ts break by event_id, so open/close are deterministic."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # empty fragment: ends=[-1] would misindex
            return pa.table({
                "key": pa.array([], pa.string()),
                **{c: pa.array([], pa.int64()) for c in
                   ("o_ts", "o_eid", "o_vm", "c_ts", "c_eid", "c_vm",
                    "low", "high", "n")},
            })
        ts = _ts_us(b["ts"])
        eid = _np(b["event_id"]).astype(np.int64)
        vm = np.floor(_np(b["value"]) * 1000 + 0.5).astype(np.int64)
        hr = ts // HOUR_US
        key = pc.binary_join_element_wise(
            _chunk(b["event_type"]),
            pa.array(hr.astype("U"), pa.string()), "\x1f")
        enc = pc.dictionary_encode(key)
        codes = _np(enc.indices).astype(np.int64)
        order = np.lexsort((eid, ts, codes))
        c_s = codes[order]
        starts = np.ones(len(c_s), bool)
        if len(c_s):
            starts[1:] = c_s[1:] != c_s[:-1]
        idx = np.nonzero(starts)[0]
        ends = np.r_[idx[1:], len(c_s)] - 1
        vm_s = vm[order]
        mn = np.minimum.reduceat(vm_s, idx) if len(c_s) else vm_s
        mx = np.maximum.reduceat(vm_s, idx) if len(c_s) else vm_s
        n = (np.r_[idx[1:], len(c_s)] - idx).astype(np.int64) \
            if len(c_s) else np.empty(0, np.int64)
        first, last = order[idx], order[ends]
        return pa.table({
            "key": enc.dictionary.take(pa.array(c_s[idx] if len(c_s)
                                                else codes)),
            "o_ts": pa.array(ts[first], pa.int64()),
            "o_eid": pa.array(eid[first], pa.int64()),
            "o_vm": pa.array(vm[first], pa.int64()),
            "c_ts": pa.array(ts[last], pa.int64()),
            "c_eid": pa.array(eid[last], pa.int64()),
            "c_vm": pa.array(vm[last], pa.int64()),
            "low": pa.array(mn, pa.int64()),
            "high": pa.array(mx, pa.int64()),
            "n": pa.array(n, pa.int64()),
        })

    # merge phase: hash-partition the bar keys (a per-BAR map_groups
    # would be one Python call per bar — types × hours grows unbounded
    # with the time span) and resolve every bar in a partition with two
    # vectorized lexsorts over dictionary codes
    P = 32

    def addpart(b: pa.Table) -> pa.Table:
        from .queries_cstats import _crc_part

        return b.append_column("_part", _crc_part(b["key"], P))

    def merge(t: pa.Table) -> pa.Table:
        key = t["key"]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        enc = pc.dictionary_encode(key)
        codes = _np(enc.indices).astype(np.int64)
        o_ts, o_eid, o_vm = (_np(t[c]) for c in ("o_ts", "o_eid", "o_vm"))
        c_ts, c_eid, c_vm = (_np(t[c]) for c in ("c_ts", "c_eid", "c_vm"))
        # open: first row per code run after sorting by (code, ts, eid)
        oo = np.lexsort((o_eid, o_ts, codes))
        c_o = codes[oo]
        starts = np.ones(len(c_o), bool)
        if len(c_o):
            starts[1:] = c_o[1:] != c_o[:-1]
        sidx = np.nonzero(starts)[0]
        open_of = np.empty(len(enc.dictionary), np.int64)
        open_of[c_o[sidx]] = oo[sidx]
        # close: LAST row per code run after sorting by (code, ts, eid)
        co = np.lexsort((c_eid, c_ts, codes))
        c_c = codes[co]
        ends = np.r_[np.nonzero(c_c[1:] != c_c[:-1])[0],
                     len(c_c) - 1] if len(c_c) else np.empty(0, np.int64)
        close_of = np.empty(len(enc.dictionary), np.int64)
        close_of[c_c[ends]] = co[ends]
        # n / low / high: reduceat over code-sorted runs
        so = np.argsort(codes, kind="stable")
        c_s = codes[so]
        rstarts = np.ones(len(c_s), bool)
        if len(c_s):
            rstarts[1:] = c_s[1:] != c_s[:-1]
        ridx = np.nonzero(rstarts)[0]
        ks = c_s[ridx]
        n_tot = np.zeros(len(enc.dictionary), np.int64)
        lo = np.zeros(len(enc.dictionary), np.int64)
        hi = np.zeros(len(enc.dictionary), np.int64)
        n_tot[ks] = np.add.reduceat(_np(t["n"])[so], ridx)
        lo[ks] = np.minimum.reduceat(_np(t["low"])[so], ridx)
        hi[ks] = np.maximum.reduceat(_np(t["high"])[so], ridx)
        keys = enc.dictionary.to_pylist()
        et = [k.rsplit("\x1f", 1)[0] for k in keys]
        hr = [int(k.rsplit("\x1f", 1)[1]) for k in keys]
        return pa.table({
            "event_type": pa.array(et, pa.string()),
            "hr": pa.array(hr, pa.int64()),
            "n": pa.array(n_tot, pa.int64()),
            "open_milli": pa.array(o_vm[open_of], pa.int64()),
            "high_milli": pa.array(hi, pa.int64()),
            "low_milli": pa.array(lo, pa.int64()),
            "close_milli": pa.array(c_vm[close_of], pa.int64()),
        })

    return ev.map_batches(partial, batch_format="pyarrow") \
        .map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(merge, batch_format="pyarrow")


# --------------------------------------------------- weekly user retention


def q_user_retention(sf_dir: str):
    """Week-over-week retention: per week, active users and how many are
    also active the NEXT week. Stage 1 dedups (user, week) on a fused
    int64 key (user << 20 | week); stage 2 shuffles the distinct pairs
    by user hash and finds week-(week+1) adjacencies with one lexsort +
    shift compare per partition; stage 3 sums per-week partials."""
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    P = 32

    def uw_partial(b: pa.Table) -> pa.Table:
        u = _np(b["user_id"]).astype(np.int64)
        wk = _ts_us(b["ts"]) // WEEK_US
        fused = np.unique(_fuse20(u, wk, "(user, week)"))
        return pa.table({"uw": pa.array(fused, pa.int64()),
                         "one": pa.array(np.ones(len(fused), np.int64),
                                         pa.int64())})

    uw = ev.map_batches(uw_partial, batch_format="pyarrow") \
        .groupby("uw").aggregate(Sum("one", alias_name="one"))

    def addpart(b: pa.Table) -> pa.Table:
        fused = _np(b["uw"]).astype(np.int64)
        u = fused >> np.int64(20)
        return pa.table({
            "uw": pa.array(fused, pa.int64()),
            "_part": pa.array((u % P).astype(np.int32), pa.int32()),
        })

    def adj(t: pa.Table) -> pa.Table:
        fused = np.sort(_np(t["uw"]).astype(np.int64))
        wk = fused & np.int64((1 << 20) - 1)
        # same user AND consecutive week ⇔ fused values differ by 1,
        # except at a user boundary where week wraps (width-20 field
        # never wraps: weeks-since-epoch < 2^20)
        ret = np.zeros(len(fused), bool)
        if len(fused) > 1:
            ret[:-1] = fused[1:] == fused[:-1] + 1
        order = np.argsort(wk, kind="stable")
        wk_s = wk[order]
        starts = np.ones(len(wk_s), bool)
        if len(wk_s):
            starts[1:] = wk_s[1:] != wk_s[:-1]
        idx = np.nonzero(starts)[0]
        n_act = (np.r_[idx[1:], len(wk_s)] - idx).astype(np.int64)
        n_ret = np.add.reduceat(ret[order].astype(np.int64), idx) \
            if len(wk_s) else np.empty(0, np.int64)
        return pa.table({
            "wk": pa.array(wk_s[idx] if len(wk_s) else wk_s, pa.int64()),
            "n_active": pa.array(n_act, pa.int64()),
            "n_retained": pa.array(n_ret, pa.int64()),
        })

    agg = uw.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(adj, batch_format="pyarrow") \
        .groupby("wk").aggregate(Sum("n_active", alias_name="n_active"),
                                 Sum("n_retained",
                                     alias_name="n_retained"))

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({
            "wk": pc.cast(b["wk"], pa.int64()),
            "n_active": pc.cast(b["n_active"], pa.int64()),
            "n_retained": pc.cast(b["n_retained"], pa.int64()),
        })

    return agg.map_batches(widen, batch_format="pyarrow")


# ------------------------------------------- event-type transition matrix


def q_type_transitions(sf_dir: str):
    """Markov transition counts between consecutive event types per user
    (ordered by ts, event_id): the one-user-hash-shuffle window kernel
    with a shift compare, then fused (from, to) string partial counts —
    the final shuffle is O(types²)."""
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])
    P = 32

    def addpart(b: pa.Table) -> pa.Table:
        u = _np(b["user_id"])
        return b.append_column(
            "_part", pa.array((u % P).astype(np.int32), pa.int32()))

    def trans(t: pa.Table) -> pa.Table:
        u = _np(t["user_id"])
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"])
        et = _chunk(t["event_type"])
        order = np.lexsort((eid, ts, u))
        u_s = u[order]
        et_s = et.take(pa.array(order))
        n = len(u_s)
        if n < 2:
            return pa.table({"pair": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same = u_s[1:] == u_s[:-1]
        pairs = pc.binary_join_element_wise(
            et_s.slice(0, n - 1), et_s.slice(1, n - 1), "\x1f") \
            .filter(pa.array(same))
        enc = pc.dictionary_encode(pairs)
        codes = _np(enc.indices).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table({
            "pair": enc.dictionary,
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    agg = ev.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(trans, batch_format="pyarrow") \
        .groupby("pair").aggregate(Sum("n", alias_name="n"))

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["pair"], "\x1f")
        return pa.table({
            "from_type": pc.list_element(parts, 0),
            "to_type": pc.list_element(parts, 1),
            "n": pc.cast(b["n"], pa.int64()),
        })

    return agg.map_batches(split, batch_format="pyarrow")


# ----------------------------------------- session duration quantiles


def q_session_quantiles(sf_dir: str, num_partitions: int = 32):
    """Distribution summary of session shapes: exact quartiles of
    session DURATION (seconds) and session SIZE (events) over all
    gap-based 30-min sessions. The sessionizer is the block-vectorized
    kernel (one lexsort + gap mask per partition); each session reduces
    to two (metric, value) rows and the quantiles ride the value-count
    histogram shuffle (stages/stats.group_quantiles) — rows never move
    twice."""
    from ..stages import stats as stats_stage

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    P = num_partitions
    GAP_US = 1_800_000_000

    def addpart(b: pa.Table) -> pa.Table:
        u = _np(b["user_id"])
        return b.append_column(
            "_part", pa.array((u % P).astype(np.int32), pa.int32()))

    def sessions(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"metric": pa.array([], pa.string()),
                             "v": pa.array([], pa.int64())})
        u = _np(t["user_id"])
        e_s = _ts_us(t["ts"])
        order = np.lexsort((e_s, u))
        u_s, e_s = u[order], e_s[order]
        new = np.ones(n, bool)
        new[1:] = (u_s[1:] != u_s[:-1]) \
            | ((e_s[1:] - e_s[:-1]) > GAP_US)
        starts = np.nonzero(new)[0]
        ends = np.r_[starts[1:], n] - 1
        dur = (e_s[ends] - e_s[starts]) // 1_000_000
        nev = (np.r_[starts[1:], n] - starts).astype(np.int64)
        k = len(starts)
        return pa.table({
            "metric": pa.array(["dur_sec"] * k + ["n_events"] * k,
                               pa.string()),
            "v": pa.array(np.r_[dur, nev], pa.int64()),
        })

    per = ev.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(sessions, batch_format="pyarrow")
    return stats_stage.group_quantiles(
        per, "metric", "v", [0.25, 0.5, 0.75],
        ["p25_v", "p50_v", "p75_v"])


# ------------------------------------------------ activity heatmap


def q_activity_heatmap(sf_dir: str):
    """Day-of-week × hour-of-day activity profile (counts + integer
    milli value sums) — the temporal heatmap behind load forecasting.
    All date parts come from pure integer arithmetic on epoch
    microseconds (1970-01-01 was a Thursday ⇒ dow = (days + 4) % 7,
    Sunday = 0) so both engines agree without any calendar library.
    One fused (dow, hour) bincount partial per block; the shuffle is
    ≤ 168 keys."""
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])
    DAY = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = _ts_us(b["ts"])
        days = us // DAY
        dow = (days + 4) % 7
        hr = (us % DAY) // HOUR_US
        fused = dow * 24 + hr
        vm = np.floor(_np(b["value"]) * 1000 + 0.5).astype(np.int64)
        n = np.bincount(fused, minlength=168).astype(np.int64)
        s = np.bincount(fused, weights=vm, minlength=168) \
            .astype(np.int64)
        nz = n > 0
        keys = np.arange(168, dtype=np.int64)[nz]
        return pa.table({
            "dh": pa.array(keys, pa.int64()),
            "n": pa.array(n[nz], pa.int64()),
            "sum_milli": pa.array(s[nz], pa.int64()),
        })

    agg = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("dh").aggregate(Sum("n", alias_name="n"),
                                 Sum("sum_milli", alias_name="sum_milli"))

    def unfuse(b: pa.Table) -> pa.Table:
        dh = _np(b["dh"]).astype(np.int64)
        return pa.table({
            "dow": pa.array(dh // 24, pa.int64()),
            "hr": pa.array(dh % 24, pa.int64()),
            "n": pc.cast(b["n"], pa.int64()),
            "sum_milli": pc.cast(b["sum_milli"], pa.int64()),
        })

    return agg.map_batches(unfuse, batch_format="pyarrow")


# ----------------------------------------------- clickstream paths


PATH_K = 8


def q_user_paths(sf_dir: str):
    """Clickstream path mining: each user's journey = the ordered
    sequence of their first 8 event types joined with '>', counted
    across users. One user-hash shuffle; within a partition one lexsort
    ranks events, an Arrow ListArray built from the user run offsets
    joins each journey in one kernel call (no per-user loop), and the
    path counts ride dictionary-encoded partials. The output domain is
    the distinct-path vocabulary (capped by the 8-event prefix — the
    standard cardinality control for path analysis)."""
    from ray.data.aggregate import Sum
    from .queries_cstats import _count_by_key

    from .queries_win import _addpart

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])
    addpart = _addpart(32)

    def paths(t: pa.Table) -> pa.Table:
        u = _np(t["user_id"])
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"])
        et = _chunk(t["event_type"])
        order = np.lexsort((eid, ts, u))
        u_s = u[order]
        n = len(u_s)
        new = np.ones(n, bool)
        if n:
            new[1:] = u_s[1:] != u_s[:-1]
        idx = np.arange(n, dtype=np.int64)
        gs = np.maximum.accumulate(np.where(new, idx, 0))
        keep = (idx - gs) < PATH_K
        et_kept = et.take(pa.array(order[keep]))
        u_kept = u_s[keep]
        starts = np.ones(len(u_kept), bool)
        if len(u_kept):
            starts[1:] = u_kept[1:] != u_kept[:-1]
        offsets = np.r_[np.nonzero(starts)[0], len(u_kept)] \
            .astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                       et_kept)
        path = pc.binary_join(lst, ">")
        t2 = _count_by_key(path)
        return pa.table({"path": t2["key"], "n": t2["n"]})

    agg = ev.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(paths, batch_format="pyarrow") \
        .groupby("path").aggregate(Sum("n", alias_name="n_users"))

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({"path": b["path"],
                         "n_users": pc.cast(b["n_users"], pa.int64())})

    return agg.map_batches(widen, batch_format="pyarrow")


# --------------------------------------------------- DAU / WAU ratio


def q_dau_wau(sf_dir: str):
    """Daily active users with their week's WAU (the stickiness ratio's
    two integer legs, never divided). Two fused-key distinct passes
    (user, day) and (user, week — day // 7, exactly aligned since the
    epoch starts a week); the weekly aggregate is weeks-sized and
    broadcasts as a dict into the daily pass."""
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    DAY_US = 86_400_000_000

    def ud_partial(b: pa.Table) -> pa.Table:
        u = _np(b["user_id"]).astype(np.int64)
        day = _ts_us(b["ts"]) // DAY_US
        fused = np.unique(_fuse20(u, day, "(user, day)"))
        return pa.table({"ud": pa.array(fused, pa.int64()),
                         "one": pa.array(np.ones(len(fused), np.int64),
                                         pa.int64())})

    ud = ev.map_batches(ud_partial, batch_format="pyarrow") \
        .groupby("ud").aggregate(Sum("one", alias_name="one"))

    def day_partial(b: pa.Table) -> pa.Table:
        day = _np(b["ud"]).astype(np.int64) & np.int64((1 << 20) - 1)
        keys, cnt = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(keys, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    dau = ud.map_batches(day_partial, batch_format="pyarrow") \
        .groupby("day").aggregate(Sum("n", alias_name="dau"))

    # weekly distinct: dedup (user, week) from the (user, day) domain
    def uw_partial(b: pa.Table) -> pa.Table:
        fused = _np(b["ud"]).astype(np.int64)
        u = fused >> np.int64(20)
        wk = (fused & np.int64((1 << 20) - 1)) // 7
        uw = np.unique(_fuse20(u, wk, "(user, week)"))
        return pa.table({"uw": pa.array(uw, pa.int64()),
                         "one": pa.array(np.ones(len(uw), np.int64),
                                         pa.int64())})

    uw = ud.map_batches(uw_partial, batch_format="pyarrow") \
        .groupby("uw").aggregate(Sum("one", alias_name="one"))

    def wk_partial(b: pa.Table) -> pa.Table:
        wk = _np(b["uw"]).astype(np.int64) & np.int64((1 << 20) - 1)
        keys, cnt = np.unique(wk, return_counts=True)
        return pa.table({"wk": pa.array(keys, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    wau_rows = uw.map_batches(wk_partial, batch_format="pyarrow") \
        .groupby("wk").aggregate(Sum("n", alias_name="wau")).take_all()
    wau_map = {int(r["wk"]): int(r["wau"]) for r in wau_rows}

    def attach(b: pa.Table) -> pa.Table:
        day = _np(b["day"]).astype(np.int64)
        wau = np.array([wau_map[int(d) // 7] for d in day], np.int64)
        return pa.table({
            "day": pa.array(day, pa.int64()),
            "dau": pc.cast(b["dau"], pa.int64()),
            "wau": pa.array(wau, pa.int64()),
        })

    return dau.map_batches(attach, batch_format="pyarrow")


# -------------------------------------------- inter-event gap histogram


def q_gap_histogram(sf_dir: str):
    """Histogram of same-user inter-event gaps in minute buckets per
    event type (of the LATER event) — the arrival-process profile behind
    session-timeout choices. The LAG window kernel plus a fused
    (type, bucket) bincount; the shuffle is O(types × buckets)."""
    from ray.data.aggregate import Sum
    from .queries_cstats import _count_by_key

    from .queries_win import _addpart

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])
    MIN_US = 60_000_000
    addpart = _addpart(32)

    def gaps(t: pa.Table) -> pa.Table:
        u = _np(t["user_id"])
        ts = _ts_us(t["ts"])
        eid = _np(t["event_id"])
        et = _chunk(t["event_type"])
        order = np.lexsort((eid, ts, u))
        u_s, ts_s = u[order], ts[order]
        n = len(u_s)
        same = np.zeros(n, bool)
        if n:
            same[1:] = u_s[1:] == u_s[:-1]
        gap_min = np.zeros(n, np.int64)
        gap_min[1:] = (ts_s[1:] - ts_s[:-1]) // MIN_US
        sel = np.nonzero(same)[0]
        et_sel = et.take(pa.array(order[sel]))
        fused = pc.binary_join_element_wise(
            et_sel, pa.array(gap_min[sel].astype("U"), pa.string()),
            "\x1f")
        t2 = _count_by_key(fused)
        return pa.table({"tb": t2["key"], "n": t2["n"]})

    agg = ev.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(gaps, batch_format="pyarrow") \
        .groupby("tb").aggregate(Sum("n", alias_name="n"))

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["tb"], "\x1f")
        return pa.table({
            "event_type": pc.list_element(parts, 0),
            "gap_min": pc.cast(pc.list_element(parts, 1), pa.int64()),
            "n": pc.cast(b["n"], pa.int64()),
        })

    return agg.map_batches(split, batch_format="pyarrow")


# ----------------------------------------------------------- registry


QUERIES_EVT = {
    "events_ohlc": q_events_ohlc,
    "user_retention": q_user_retention,
    "type_transitions": q_type_transitions,
    "session_quantiles": q_session_quantiles,
    "activity_heatmap": q_activity_heatmap,
    "user_paths": q_user_paths,
    "gap_histogram": q_gap_histogram,
    "dau_wau": q_dau_wau,
}


ORACLE_SQL_EVT = {
    "events_ohlc": """
WITH v AS (SELECT event_type, ts, event_id,
                  CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm,
                  CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr
           FROM events)
SELECT DISTINCT event_type, hr,
       CAST(COUNT(*) OVER w AS BIGINT) AS n,
       CAST(FIRST_VALUE(vm) OVER wo AS BIGINT) AS open_milli,
       CAST(MAX(vm) OVER w AS BIGINT) AS high_milli,
       CAST(MIN(vm) OVER w AS BIGINT) AS low_milli,
       CAST(LAST_VALUE(vm) OVER wo AS BIGINT) AS close_milli
FROM v
WINDOW w AS (PARTITION BY event_type, hr),
       wo AS (PARTITION BY event_type, hr ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING)""",
    "user_retention": """
WITH uw AS (SELECT DISTINCT user_id,
                   CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
            FROM events)
SELECT a.wk, CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(COUNT(b.user_id) AS BIGINT) AS n_retained
FROM uw a LEFT JOIN uw b
  ON a.user_id = b.user_id AND b.wk = a.wk + 1
GROUP BY a.wk""",
    "type_transitions": """
WITH s AS (SELECT user_id, event_type,
                  LEAD(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS nxt
           FROM events)
SELECT event_type AS from_type, nxt AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE nxt IS NOT NULL
GROUP BY event_type, nxt""",
    "session_quantiles": """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked),
per AS (
  SELECT user_id, session_id,
         CAST(COUNT(*) AS BIGINT) AS nev,
         CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000
              AS BIGINT) AS dur
  FROM sess GROUP BY user_id, session_id),
m AS (SELECT 'dur_sec' AS metric, dur AS v FROM per
      UNION ALL SELECT 'n_events', nev FROM per)
SELECT metric, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(quantile_disc(v, 0.25) AS BIGINT) AS p25_v,
       CAST(quantile_disc(v, 0.50) AS BIGINT) AS p50_v,
       CAST(quantile_disc(v, 0.75) AS BIGINT) AS p75_v
FROM m GROUP BY metric""",
    "activity_heatmap": """
WITH v AS (SELECT epoch_us(ts) AS us,
                  CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
           FROM events)
SELECT CAST((us // 86400000000 + 4) % 7 AS BIGINT) AS dow,
       CAST((us % 86400000000) // 3600000000 AS BIGINT) AS hr,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(vm) AS BIGINT) AS sum_milli
FROM v GROUP BY dow, hr""",
    "user_paths": """
WITH o AS (SELECT user_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM events),
p AS (SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM o WHERE rn <= 8 GROUP BY user_id)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM p GROUP BY path""",
    "gap_histogram": """
WITH g AS (SELECT event_type, ts, user_id,
                  LAG(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev
           FROM events)
SELECT event_type,
       CAST((epoch_us(ts) - epoch_us(prev)) // 60000000 AS BIGINT)
         AS gap_min,
       CAST(COUNT(*) AS BIGINT) AS n
FROM g WHERE prev IS NOT NULL
GROUP BY event_type, gap_min""",
    "dau_wau": """
WITH ud AS (SELECT DISTINCT user_id,
                   CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
            FROM events),
uw AS (SELECT DISTINCT user_id,
              CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
       FROM events),
dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
        FROM ud GROUP BY day),
wau AS (SELECT wk, CAST(COUNT(*) AS BIGINT) AS wau
        FROM uw GROUP BY wk)
SELECT day, dau, wau
FROM dau JOIN wau ON day // 7 = wk""",
}
