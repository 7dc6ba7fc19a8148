"""Round-3 window-function completions: LEAD / FIRST_VALUE / LAST_VALUE,
RANK / DENSE_RANK, and bounded-frame MIN/MAX extrema — the remaining SQL
window families beyond LAG (queries.py:q_events_lag), cumulative /
frame sums (queries_ext.py) and NTILE (queries_ext.py:q_token_deciles).

All three share the repo's window scale shape: ONE partition-key hash
shuffle (user % P or the lang group), ONE lexsort per partition, then
pure numpy shift/accumulate scans — never a per-group Python loop.
Values integer-ize per row (milli) before any arithmetic so both
engines agree bit-for-bit (CLAUDE.md float-parity rule).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages.relational import adaptive_parts
from .queries_ext import _np, _ts_us


def _user_sorted(t: pa.Table):
    """Shared per-partition prep: lexsort events by (user, ts, event_id)
    and return (event_id_sorted, user_sorted, value_milli_sorted,
    group_start_index_per_row)."""
    u = _np(t["user_id"])
    ts = _ts_us(t["ts"])
    eid = _np(t["event_id"])
    vm = np.floor(_np(t["value"]) * 1000 + 0.5).astype(np.int64)
    order = np.lexsort((eid, ts, u))
    u_s, vm_s = u[order], vm[order]
    n = len(u_s)
    new = np.ones(n, bool)
    if n:
        new[1:] = u_s[1:] != u_s[:-1]
    gs = np.maximum.accumulate(np.where(new, np.arange(n, dtype=np.int64),
                                        0))
    return eid[order], u_s, vm_s, gs


def _addpart(P: int):
    def fn(b: pa.Table) -> pa.Table:
        u = _np(b["user_id"])
        return b.append_column(
            "_part", pa.array((u % P).astype(np.int32), pa.int32()))
    return fn


# ------------------------------------ LEAD / FIRST_VALUE / LAST_VALUE


def q_events_lead(sf_dir: str, num_partitions: int | None = None):
    """LEAD(value, 1) plus whole-partition FIRST_VALUE / LAST_VALUE per
    user. next is a one-slot shift masked at group ends; first indexes
    the group-start array directly; last reuses the group-start scan on
    the reversed order (no second sort)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])

    def lead(t: pa.Table) -> pa.Table:
        eid_s, u_s, vm_s, gs = _user_sorted(t)
        n = len(u_s)
        has_next = np.zeros(n, bool)
        if n:
            has_next[:-1] = u_s[1:] == u_s[:-1]
        nxt = np.zeros(n, np.int64)
        if n:
            nxt[:-1] = vm_s[1:]
        # group end per row: run the group-start scan over the reversed
        # array — a reversed group's start is the original group's end
        new_r = np.ones(n, bool)
        if n:
            new_r[1:] = u_s[::-1][1:] != u_s[::-1][:-1]
        ge_r = np.maximum.accumulate(
            np.where(new_r, np.arange(n, dtype=np.int64), 0))
        ge = (n - 1) - ge_r[::-1]
        return pa.table({
            "event_id": pa.array(eid_s, pa.int64()),
            "user_id": pa.array(u_s.astype(np.int64), pa.int64()),
            "next_milli": pc.if_else(
                pa.array(has_next), pa.array(nxt, pa.int64()),
                pa.nulls(n, pa.int64())),
            "first_milli": pa.array(vm_s[gs] if n else vm_s, pa.int64()),
            "last_milli": pa.array(vm_s[ge] if n else vm_s, pa.int64()),
        })

    return ev.map_batches(_addpart(num_partitions or adaptive_parts(sf_dir)),
                          batch_format="pyarrow") \
        .groupby("_part").map_groups(lead, batch_format="pyarrow")


# --------------------------------------------------- RANK / DENSE_RANK


def q_rank_docs(sf_dir: str):
    """RANK() and DENSE_RANK() of documents by length (n_chars DESC)
    within language. Ranks derive from tie-run starts on one descending
    sort per group, so tie order never affects the output. Group domain
    = languages (per-group volume corpus/|langs|); a skewed language mix
    shards by doc-hash first and merges rank offsets — not needed at
    fixture scale (same contract as token_deciles)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])

    def ranks(t: pa.Table) -> pa.Table:
        lang = t["lang"][0].as_py()
        nc = _np(t["n_chars"]).astype(np.int64)
        did = _np(t["doc_id"]).astype(np.int64)
        order = np.lexsort((did, -nc))
        nc_s = nc[order]
        n = len(nc_s)
        new = np.ones(n, bool)
        if n:
            new[1:] = nc_s[1:] != nc_s[:-1]
        idx = np.arange(n, dtype=np.int64)
        rnk = np.maximum.accumulate(np.where(new, idx, 0)) + 1
        drnk = np.cumsum(new).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(did[order], pa.int64()),
            "lang": pa.array([lang] * n, pa.string()),
            "n_chars": pa.array(nc_s, pa.int64()),
            "rnk": pa.array(rnk, pa.int64()),
            "drnk": pa.array(drnk, pa.int64()),
        })

    return docs.groupby("lang").map_groups(ranks, batch_format="pyarrow")


# ----------------------------------------- bounded-frame MIN/MAX extrema


EXT_PRECEDING = 3  # ROWS BETWEEN 3 PRECEDING AND CURRENT ROW


def q_window_extrema(sf_dir: str, num_partitions: int | None = None):
    """Sliding MIN/MAX over ROWS BETWEEN 3 PRECEDING AND CURRENT ROW per
    user: the frame is a constant 4 rows, so the extrema are W-1
    vectorized shift-and-compare passes with int64 sentinels outside the
    group — O(W·n), no deque, no per-group loop. (An unbounded or
    data-dependent frame would switch to the monotonic-stack kernel;
    constant small W is the common feature-engineering case.)"""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    W = EXT_PRECEDING

    def extrema(t: pa.Table) -> pa.Table:
        eid_s, u_s, vm_s, gs = _user_sorted(t)
        n = len(u_s)
        idx = np.arange(n, dtype=np.int64)
        mx = vm_s.copy()
        mn = vm_s.copy()
        lo = np.iinfo(np.int64).min
        hi = np.iinfo(np.int64).max
        for s in range(1, W + 1):
            valid = idx - s >= gs
            sh = np.empty(n, np.int64)
            sh[s:] = vm_s[:-s] if s else vm_s
            sh[:s] = 0
            np.maximum(mx, np.where(valid, sh, lo), out=mx)
            np.minimum(mn, np.where(valid, sh, hi), out=mn)
        return pa.table({
            "event_id": pa.array(eid_s, pa.int64()),
            "user_id": pa.array(u_s.astype(np.int64), pa.int64()),
            "w_max_milli": pa.array(mx, pa.int64()),
            "w_min_milli": pa.array(mn, pa.int64()),
        })

    return ev.map_batches(_addpart(num_partitions or adaptive_parts(sf_dir)),
                          batch_format="pyarrow") \
        .groupby("_part").map_groups(extrema, batch_format="pyarrow")


# --------------------------------------- PERCENT_RANK / CUME_DIST (exact)


def q_percent_rank_docs(sf_dir: str):
    """PERCENT_RANK and CUME_DIST of document length within language,
    emitted as EXACT integer fractions (pr = pr_num/pr_den, cd =
    cd_num/cd_den) instead of doubles — no float ever crosses engines.
    pr_num = rank−1; cd_num = index of the tie-run's last row + 1 (the
    count of rows ≤ the current value in the DESC order). Same one-sort-
    per-group kernel as rank_docs."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])

    def ranks(t: pa.Table) -> pa.Table:
        lang = t["lang"][0].as_py()
        nc = _np(t["n_chars"]).astype(np.int64)
        did = _np(t["doc_id"]).astype(np.int64)
        order = np.lexsort((did, -nc))
        nc_s = nc[order]
        n = len(nc_s)
        idx = np.arange(n, dtype=np.int64)
        new = np.ones(n, bool)
        if n:
            new[1:] = nc_s[1:] != nc_s[:-1]
        rnk = np.maximum.accumulate(np.where(new, idx, 0)) + 1
        # run END index per row: reversed group-start scan over the
        # reversed tie-run marks
        new_r = np.ones(n, bool)
        if n:
            new_r[1:] = nc_s[::-1][1:] != nc_s[::-1][:-1]
        ge_r = np.maximum.accumulate(np.where(new_r, idx, 0))
        run_end = (n - 1) - ge_r[::-1]
        return pa.table({
            "doc_id": pa.array(did[order], pa.int64()),
            "lang": pa.array([lang] * n, pa.string()),
            "pr_num": pa.array(rnk - 1, pa.int64()),
            "pr_den": pa.array(np.full(n, max(n - 1, 1), np.int64),
                               pa.int64()),
            "cd_num": pa.array(run_end + 1, pa.int64()),
            "cd_den": pa.array(np.full(n, n, np.int64), pa.int64()),
        })

    return docs.groupby("lang").map_groups(ranks, batch_format="pyarrow")


# -------------------------------------- sharded (whale-key) running sum


def q_running_total_sharded(sf_dir: str):
    """The same per-user running total as running_total, computed by the
    WHALE-KEY scale path (stages/window.sharded_running_sum): time-bucket
    shards + local cumsums + an exclusive shard-prefix join, so no
    partition ever holds a whole key's history. Identical output and
    oracle SQL — the point is the exchange shape, pinned equivalent to
    the single-phase kernel in pytest."""
    from ..stages.window import sharded_running_sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    return sharded_running_sum(ev, bucket_us=6 * 3_600_000_000)


# ----------------------------------------------------------- registry


QUERIES_WIN = {
    "events_lead": q_events_lead,
    "rank_docs": q_rank_docs,
    "window_extrema": q_window_extrema,
    "running_total_sharded": q_running_total_sharded,
    "percent_rank_docs": q_percent_rank_docs,
}


ORACLE_SQL_WIN = {
    "running_total_sharded": """
SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_milli
FROM events""",
    "percent_rank_docs": """
SELECT doc_id, lang,
       CAST(RANK() OVER wo - 1 AS BIGINT) AS pr_num,
       CAST(GREATEST(COUNT(*) OVER wp - 1, 1) AS BIGINT) AS pr_den,
       CAST(COUNT(*) OVER (PARTITION BY lang ORDER BY n_chars DESC
                           RANGE BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cd_num,
       CAST(COUNT(*) OVER wp AS BIGINT) AS cd_den
FROM documents
WINDOW wo AS (PARTITION BY lang ORDER BY n_chars DESC),
       wp AS (PARTITION BY lang)""",
    "events_lead": """
WITH v AS (SELECT event_id, user_id, ts,
                  CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
           FROM events)
SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
       CAST(LEAD(vm) OVER w AS BIGINT) AS next_milli,
       CAST(FIRST_VALUE(vm) OVER w AS BIGINT) AS first_milli,
       CAST(LAST_VALUE(vm) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS BIGINT) AS last_milli
FROM v
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "rank_docs": """
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
FROM documents
WINDOW w AS (PARTITION BY lang ORDER BY n_chars DESC)""",
    "window_extrema": """
WITH v AS (SELECT event_id, user_id, ts,
                  CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
           FROM events)
SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
       CAST(MAX(vm) OVER w AS BIGINT) AS w_max_milli,
       CAST(MIN(vm) OVER w AS BIGINT) AS w_min_milli
FROM v
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""",
}
