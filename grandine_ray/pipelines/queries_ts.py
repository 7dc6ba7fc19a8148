"""Round-4b time-series / profiling / sampling queries: modal values,
daily cross-type correlation and autocorrelation (exact integer
sufficient statistics), character-class corpus profiles, per-source
modal tokens, Heaps'-law vocabulary growth curves, stratified
fixed-quota sampling, and a relational CUBE.

Scale contract: every shuffle here moves AGGREGATE-sized partials —
(type, value-unit) counts, (day, type) counts, per-source class sums,
vocabulary-sized (term, min-bucket) rows — never raw event/doc rows.
Driver-side collection is bounded by the aggregate domain (types ×
value units, days × types, buckets, sources × quota, nations × years),
all of which are independent of corpus size. Correlation statistics
are emitted as exact BIGINT sufficient statistics (n, Σx, Σy, Σxy and
the covariance numerator n·Σxy − Σx·Σy) rather than cross-library
floats, per the repo float-parity rule.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .queries_cstats import _chunk, _count_by_key
from .queries_ext import _np

US_PER_DAY = 86_400_000_000
STRATUM_K = 5  # stratified_sample quota per source
GROWTH_BUCKETS = 10


# ------------------------------------------------ modal value per type


def q_value_mode(sf_dir: str):
    """Per-event-type modal value (integer units, floor(v + 0.5)) with
    its frequency — the discrete mode statistic Ray Data has no builtin
    for. Per-block fused (type, unit) count partials → one
    aggregate-domain groupby (types × distinct units rows, never event
    rows) → per-block argmax partials → a driver merge bounded by
    blocks × types. Tie-break: smallest unit, matching the SQL
    ROW_NUMBER ordering."""
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        vu = np.floor(_np(b["value"]) + 0.5).astype(np.int64)
        fused = pc.binary_join_element_wise(
            _chunk(b["event_type"]),
            pa.array(vu.astype("U"), pa.string()), "\x1f")
        t = _count_by_key(fused)
        return pa.table({"tv": t["key"], "n": t["n"]})

    agg = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("tv").aggregate(Sum("n", alias_name="n"))

    def best(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["tv"], "\x1f")
        typ = pc.list_element(parts, 0)
        vu = pc.cast(pc.list_element(parts, 1), pa.int64())
        enc = pc.dictionary_encode(_chunk(typ))
        codes = _np(enc.indices).astype(np.int64)
        n = pc.cast(b["n"], pa.int64())
        nv, vv = _np(n), _np(vu)
        # per-type argmax with (n desc, vu asc) tie-break in one lexsort
        order = np.lexsort((vv, -nv, codes))
        cs, ns, vs = codes[order], nv[order], vv[order]
        first = np.ones(len(cs), bool)
        first[1:] = cs[1:] != cs[:-1]
        idx = np.nonzero(first)[0]
        return pa.table({
            "event_type": enc.dictionary.take(pa.array(cs[idx])),
            "mode_unit": pa.array(vs[idx], pa.int64()),
            "n_mode": pa.array(ns[idx], pa.int64()),
        })

    cand = agg.map_batches(best, batch_format="pyarrow").take_all()
    merged: dict[str, tuple[int, int]] = {}
    for r in cand:
        cur = merged.get(r["event_type"])
        key = (-int(r["n_mode"]), int(r["mode_unit"]))
        if cur is None or key < cur:
            merged[r["event_type"]] = key
    types = sorted(merged)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "mode_unit": pa.array([merged[t][1] for t in types], pa.int64()),
        "n_mode": pa.array([-merged[t][0] for t in types], pa.int64()),
    })


# ------------------------------------ daily cross-type correlation


def _daily_type_counts(sf_dir: str):
    """(epoch_day, event_type) → count, zero-fill domain info. One
    fused-key groupby over per-block count partials; the result is
    days × types rows (aggregate-sized)."""
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        us = _np(b["ts"]).astype("datetime64[us]").astype(np.int64)
        day = us // US_PER_DAY
        fused = pc.binary_join_element_wise(
            pa.array(day.astype("U"), pa.string()),
            _chunk(b["event_type"]), "\x1f")
        t = _count_by_key(fused)
        return pa.table({"dt": t["key"], "n": t["n"]})

    agg = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("dt").aggregate(Sum("n", alias_name="n")).take_all()
    rows = []
    for r in agg:
        d, t = r["dt"].split("\x1f")
        rows.append((int(d), t, int(r["n"])))
    return rows


def q_daily_type_corr(sf_dir: str):
    """Pairwise correlation of the daily count series of every two
    event types, as exact BIGINT sufficient statistics (n_days, Σa, Σb,
    Σab and the covariance numerator n·Σab − Σa·Σb) over the zero-filled
    day spine. The heavy work is one (day, type)-count shuffle; the
    pair arithmetic runs on the aggregate-domain matrix (days × types),
    which is corpus-size-independent."""
    rows = _daily_type_counts(sf_dir)
    days = sorted({d for d, _, _ in rows})
    types = sorted({t for _, t, _ in rows})
    di = {d: i for i, d in enumerate(days)}
    ti = {t: i for i, t in enumerate(types)}
    M = np.zeros((len(types), len(days)), np.int64)
    for d, t, n in rows:
        M[ti[t], di[d]] = n
    ta, tb, nd, sa, sb, sab, cov = [], [], [], [], [], [], []
    D = len(days)
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            a, b = M[i], M[j]
            s_a, s_b = int(a.sum()), int(b.sum())
            s_ab = int((a * b).sum())
            ta.append(types[i])
            tb.append(types[j])
            nd.append(D)
            sa.append(s_a)
            sb.append(s_b)
            sab.append(s_ab)
            cov.append(D * s_ab - s_a * s_b)
    return pa.table({
        "type_a": pa.array(ta, pa.string()),
        "type_b": pa.array(tb, pa.string()),
        "n_days": pa.array(nd, pa.int64()),
        "sum_a": pa.array(sa, pa.int64()),
        "sum_b": pa.array(sb, pa.int64()),
        "sum_ab": pa.array(sab, pa.int64()),
        "cov_num": pa.array(cov, pa.int64()),
    })


def q_daily_autocorr(sf_dir: str):
    """Lag-1..7 autocorrelation sufficient statistics of the total
    daily event-count series (ordered by day): per lag k the exact
    BIGINTs n_pairs, Σx_t, Σx_{t+k}, Σx_t·x_{t+k} and the covariance
    numerator. Same one-shuffle (day, type) aggregate as
    daily_type_corr; the lag arithmetic is O(days × 7) on the driver."""
    rows = _daily_type_counts(sf_dir)
    tot: dict[int, int] = {}
    for d, _, n in rows:
        tot[d] = tot.get(d, 0) + n
    days = sorted(tot)
    x = np.array([tot[d] for d in days], np.int64)
    lag, npair, sx, sy, sxy, cov = [], [], [], [], [], []
    for k in range(1, 8):
        if k >= len(x):
            break
        a, b = x[:-k], x[k:]
        n = len(a)
        s_x, s_y, s_xy = int(a.sum()), int(b.sum()), int((a * b).sum())
        lag.append(k)
        npair.append(n)
        sx.append(s_x)
        sy.append(s_y)
        sxy.append(s_xy)
        cov.append(n * s_xy - s_x * s_y)
    return pa.table({
        "lag": pa.array(lag, pa.int64()),
        "n_pairs": pa.array(npair, pa.int64()),
        "sum_x": pa.array(sx, pa.int64()),
        "sum_y": pa.array(sy, pa.int64()),
        "sum_xy": pa.array(sxy, pa.int64()),
        "cov_num": pa.array(cov, pa.int64()),
    })


# ------------------------------------------- character-class profile


def q_char_class_stats(sf_dir: str):
    """Per-source ASCII character-class counts (digits, uppercase,
    spaces) — the cheap script/quality profile pass. Zero-copy: the
    class masks run over the Arrow string data buffer as one numpy
    pass; per-row counts come from one cumsum + offset gather, grouped
    by the dictionary-encoded source. UTF-8-safe: multibyte code units
    never collide with ASCII byte values, so byte counts equal the SQL
    character-regex counts exactly."""
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        src = pc.dictionary_encode(_chunk(b["source"]))
        codes = _np(src.indices).astype(np.int64)
        txt = _chunk(b["text"])
        bufs = txt.buffers()
        # offset-aware slice of the offsets buffer (never .values-style
        # zero-offset assumptions — ADVICE r3 item); masks run over the
        # FULL data buffer so sliced blocks need no rebase copy
        off = np.frombuffer(bufs[1], np.int32)[
            txt.offset: txt.offset + len(txt) + 1].astype(np.int64)
        data = (np.frombuffer(bufs[2], np.uint8)
                if bufs[2] is not None else np.zeros(0, np.uint8))
        ndoc = np.bincount(codes, minlength=len(src.dictionary))
        cols = {"source": src.dictionary,
                "n_docs": pa.array(ndoc.astype(np.int64), pa.int64())}
        for name, lo, hi in (("n_digits", 48, 57), ("n_upper", 65, 90),
                             ("n_spaces", 32, 32)):
            m = ((data >= lo) & (data <= hi)).astype(np.int64)
            c = np.zeros(len(m) + 1, np.int64)
            np.cumsum(m, out=c[1:])
            per_row = c[off[1:]] - c[off[:-1]]
            cols[name] = pa.array(
                np.bincount(codes, weights=per_row,
                            minlength=len(src.dictionary)).astype(
                    np.int64), pa.int64())
        return pa.table(cols)

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_digits", alias_name="n_digits"),
            Sum("n_upper", alias_name="n_upper"),
            Sum("n_spaces", alias_name="n_spaces"))
    return agg.map_batches(lambda b: pa.table({
        "source": b["source"],
        "n_docs": pc.cast(b["n_docs"], pa.int64()),
        "n_digits": pc.cast(b["n_digits"], pa.int64()),
        "n_upper": pc.cast(b["n_upper"], pa.int64()),
        "n_spaces": pc.cast(b["n_spaces"], pa.int64()),
    }), batch_format="pyarrow")


# --------------------------------------------- modal token per source


def q_top_token_per_source(sf_dir: str):
    """The single most frequent token of every source (tie-break:
    lexicographically smallest term) — the grouped-mode shape over an
    unbounded term domain. Per-block fused (source, term) count
    partials → vocabulary-sized groupby → per-block best-per-source
    partials → driver merge bounded by blocks × sources."""
    from ray.data.aggregate import Sum
    from ..stages.corpus import _batch_terms

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        flat, doc_of, _, _ = _batch_terms(b, "text")
        src = _chunk(b["source"]).take(pa.array(doc_of))
        fused = pc.binary_join_element_wise(src, flat, "\x1f")
        t = _count_by_key(fused)
        return pa.table({"st": t["key"], "n": t["n"]})

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("st").aggregate(Sum("n", alias_name="n"))

    def best(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["st"], "\x1f")
        src = pc.list_element(parts, 0)
        term = pc.list_element(parts, 1)
        enc = pc.dictionary_encode(_chunk(src))
        codes = _np(enc.indices).astype(np.int64)
        n = _np(pc.cast(b["n"], pa.int64()))
        tenc = pc.dictionary_encode(_chunk(term))
        # dictionary codes sort as strings only if we order the
        # dictionary first: rank terms lexicographically
        tdict = tenc.dictionary.to_numpy(zero_copy_only=False)
        rank_of = np.empty(len(tdict), np.int64)
        rank_of[np.argsort(tdict, kind="stable")] = \
            np.arange(len(tdict), dtype=np.int64)
        trank = rank_of[_np(tenc.indices).astype(np.int64)]
        order = np.lexsort((trank, -n, codes))
        cs = codes[order]
        first = np.ones(len(cs), bool)
        first[1:] = cs[1:] != cs[:-1]
        idx = order[np.nonzero(first)[0]]
        return pa.table({
            "source": _chunk(src).take(pa.array(idx)),
            "term": _chunk(term).take(pa.array(idx)),
            "n": pa.array(n[idx], pa.int64()),
        })

    cand = agg.map_batches(best, batch_format="pyarrow").take_all()
    merged: dict[str, tuple[int, str]] = {}
    for r in cand:
        key = (-int(r["n"]), r["term"])
        cur = merged.get(r["source"])
        if cur is None or key < cur:
            merged[r["source"]] = key
    srcs = sorted(merged)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "term": pa.array([merged[s][1] for s in srcs], pa.string()),
        "n": pa.array([-merged[s][0] for s in srcs], pa.int64()),
    })


# --------------------------------------------- vocabulary growth curve


def q_vocab_growth(sf_dir: str):
    """Heaps'-law vocabulary growth: documents are split into 10
    doc-id-ordered buckets and each bucket reports how many NEW terms
    it introduces plus the cumulative vocabulary size. The corpus
    reduces to vocabulary-sized (term, min-bucket) rows (per-block min
    partial, then a Min groupby); the curve itself is ≤ 10 rows."""
    from ray.data.aggregate import Min
    from ..stages.corpus import _batch_terms

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    mx = int(docs.max("doc_id"))

    def partial(b: pa.Table) -> pa.Table:
        flat, doc_of, codes, dictionary = _batch_terms(b, "text")
        did = _np(b["doc_id"]).astype(np.int64)
        bucket = did * GROWTH_BUCKETS // (mx + 1)
        tb = bucket[doc_of]
        mn = np.full(len(dictionary), GROWTH_BUCKETS, np.int64)
        np.minimum.at(mn, codes, tb)
        return pa.table({"term": dictionary,
                         "minb": pa.array(mn, pa.int64())})

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Min("minb", alias_name="minb"))

    def hist(b: pa.Table) -> pa.Table:
        h = np.bincount(_np(pc.cast(b["minb"], pa.int64())),
                        minlength=GROWTH_BUCKETS)
        return pa.table({
            "bucket": pa.array(np.arange(GROWTH_BUCKETS), pa.int64()),
            "n_new": pa.array(h[:GROWTH_BUCKETS].astype(np.int64),
                              pa.int64())})

    parts = agg.map_batches(hist, batch_format="pyarrow").take_all()
    h = np.zeros(GROWTH_BUCKETS, np.int64)
    for r in parts:
        h[r["bucket"]] += r["n_new"]
    # spine = buckets that documents actually occupy
    spine = sorted({r["bucket"] for r in
                    docs.map_batches(lambda b: pa.table({
                        "bucket": pa.array(np.unique(
                            _np(b["doc_id"]).astype(np.int64)
                            * GROWTH_BUCKETS // (mx + 1)), pa.int64())}),
                        batch_format="pyarrow").take_all()})
    cum = np.cumsum(h)
    return pa.table({
        "bucket": pa.array(spine, pa.int64()),
        "n_new_terms": pa.array([int(h[b]) for b in spine], pa.int64()),
        "n_cum_terms": pa.array([int(cum[b]) for b in spine],
                                pa.int64()),
    })


# ------------------------------------------------ stratified sampling


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sample: the K=5 documents per source
    with the smallest md5(doc_id) digest — the reproducible
    spot-check/eval-split primitive. Per-block top-K-per-source
    partials (the per-row md5 IS the sampling contract — C-speed
    hashlib, no seed-salted hash()); the driver merge is bounded by
    blocks × sources × K."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])

    def partial(b: pa.Table) -> pa.Table:
        did = _np(b["doc_id"]).astype(np.int64)
        h = np.array([hashlib.md5(str(i).encode()).hexdigest()
                      for i in did], dtype="U32")
        src = pc.dictionary_encode(_chunk(b["source"]))
        codes = _np(src.indices).astype(np.int64)
        order = np.lexsort((did, h, codes))
        cs = codes[order]
        pos = np.arange(len(cs), dtype=np.int64)
        starts = np.zeros(len(cs), np.int64)
        first = np.ones(len(cs), bool)
        first[1:] = cs[1:] != cs[:-1]
        np.maximum.accumulate(np.where(first, pos, 0), out=starts)
        keep = pos - starts < STRATUM_K
        idx = order[keep]
        return pa.table({
            "source": _chunk(b["source"]).take(pa.array(idx)),
            "doc_id": pa.array(did[idx], pa.int64()),
            "h": pa.array(h[idx].tolist(), pa.string()),
        })

    cand = docs.map_batches(partial, batch_format="pyarrow").take_all()
    per_src: dict[str, list[tuple[str, int]]] = {}
    for r in cand:
        per_src.setdefault(r["source"], []).append(
            (r["h"], int(r["doc_id"])))
    out_s, out_d, out_h = [], [], []
    for s in sorted(per_src):
        for hh, d in sorted(per_src[s])[:STRATUM_K]:
            out_s.append(s)
            out_d.append(d)
            out_h.append(hh)
    return pa.table({
        "source": pa.array(out_s, pa.string()),
        "doc_id": pa.array(out_d, pa.int64()),
        "h": pa.array(out_h, pa.string()),
    })


# --------------------------------------------------------- CUBE


def q_revenue_cube(sf_dir: str):
    """CUBE (nation, order-year) over order revenue — all four grouping
    sets with 'ALL'/-1 sentinels. Orders partial-aggregate per block to
    (custkey, year, cents), one hash join attaches the customer's
    nation key, and the base aggregate collapses to nations × years
    rows; the three coarser grouping sets are derived from that tiny
    base (never re-scanning facts), which is how a scale-out engine
    should compute a cube."""
    from ray.data.aggregate import Sum
    from ..stages import relational

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])

    def o_partial(b: pa.Table) -> pa.Table:
        ck = _np(b["o_custkey"]).astype(np.int64)
        yr = (_np(b["o_orderdate"]).astype("datetime64[Y]")
              .astype(np.int64) + 1970)
        cents = np.floor(_np(b["o_totalprice"]) * 100.0
                         + 0.5).astype(np.int64)
        if len(yr) and (yr.min() < 0 or yr.max() >= 4096
                        or ck.max() >= 1 << 51):
            raise ValueError("revenue_cube fused key out of range")
        fused = ck << 12 | yr
        order = np.argsort(fused, kind="stable")
        fs = fused[order]
        firsts = np.ones(len(fs), bool)
        firsts[1:] = fs[1:] != fs[:-1]
        idx = np.nonzero(firsts)[0]
        return pa.table({
            "custkey": pa.array(ck[order][idx], pa.int64()),
            "year": pa.array(yr[order][idx], pa.int64()),
            "cents": pa.array(np.add.reduceat(cents[order], idx),
                              pa.int64()),
        })

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"]) \
        .map_batches(lambda b: pa.table({
            "custkey": pc.cast(b["c_custkey"], pa.int64()),
            "nationkey": pc.cast(b["c_nationkey"], pa.int64()),
        }), batch_format="pyarrow")

    j = relational.hash_join_i64(
        orders.map_batches(o_partial, batch_format="pyarrow"),
        cust, key="custkey",
        left_carry={"year": pa.int64(), "cents": pa.int64()},
        right_carry={"nationkey": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    def ny_partial(b: pa.Table) -> pa.Table:
        nk = _np(b["nationkey"]).astype(np.int64)
        yr = _np(b["year"]).astype(np.int64)
        cents = _np(b["cents"]).astype(np.int64)
        fused = nk << 12 | yr
        order = np.argsort(fused, kind="stable")
        fs = fused[order]
        firsts = np.ones(len(fs), bool)
        firsts[1:] = fs[1:] != fs[:-1]
        idx = np.nonzero(firsts)[0]
        return pa.table({
            "ny": pa.array(fs[idx], pa.int64()),
            "cents": pa.array(np.add.reduceat(cents[order], idx),
                              pa.int64()),
        })

    base = j.map_batches(ny_partial, batch_format="pyarrow") \
        .groupby("ny").aggregate(Sum("cents", alias_name="cents")) \
        .take_all()

    names = {int(r["n_nationkey"]): r["n_name"] for r in
             rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
             .take_all()}
    cube: dict[tuple[str, int], int] = {}
    for r in base:
        nk, yr = int(r["ny"]) >> 12, int(r["ny"]) & 0xFFF
        c = int(r["cents"])
        nm = names[nk]
        for key in ((nm, yr), (nm, -1), ("ALL", yr), ("ALL", -1)):
            cube[key] = cube.get(key, 0) + c
    keys = sorted(cube)
    return pa.table({
        "n_name": pa.array([k[0] for k in keys], pa.string()),
        "o_year": pa.array([k[1] for k in keys], pa.int64()),
        "revenue_cents": pa.array([cube[k] for k in keys], pa.int64()),
    })


def q_trend_slope(sf_dir: str):
    """Per-event-type linear trend of the daily count series: the exact
    BIGINT sufficient statistics of an OLS fit of count on epoch-day
    (n, Σx, Σy, Σxy, Σx² and the slope's numerator n·Σxy − Σx·Σy /
    denominator n·Σx² − (Σx)²). The corpus-sized work is the one
    (day, type) count shuffle shared with daily_type_corr; the per-type
    sums run on the aggregate domain in exact Python ints, so no float
    ever crosses the engine boundary."""
    rows = _daily_type_counts(sf_dir)
    acc: dict[str, list[int]] = {}
    for d, t, n in rows:
        a = acc.setdefault(t, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += d
        a[2] += n
        a[3] += d * n
        a[4] += d * d
    types = sorted(acc)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n_days": pa.array([acc[t][0] for t in types], pa.int64()),
        "sum_x": pa.array([acc[t][1] for t in types], pa.int64()),
        "sum_y": pa.array([acc[t][2] for t in types], pa.int64()),
        "sum_xy": pa.array([acc[t][3] for t in types], pa.int64()),
        "sum_x2": pa.array([acc[t][4] for t in types], pa.int64()),
        "slope_num": pa.array(
            [acc[t][0] * acc[t][3] - acc[t][1] * acc[t][2]
             for t in types], pa.int64()),
        "slope_den": pa.array(
            [acc[t][0] * acc[t][4] - acc[t][1] * acc[t][1]
             for t in types], pa.int64()),
    })


def q_theilsen_trend(sf_dir: str):
    """Per-event-type Theil-Sen robust trend of the daily count series:
    the MEDIAN of all pairwise slopes (n_j−n_i)/(d_j−d_i) over observed
    days — the outlier-resistant companion to trend_slope's OLS fit.
    Each pair slope is integer-ized once as trunc((Δn·1e6)/Δd) (both
    engines, DuckDB ``//`` trunc parity) and the median follows DuckDB
    quantile_disc semantics (1-based rank ⌈P/2⌉). The corpus-sized work
    is the shared (day,type) count shuffle; the O(D²) pair fan-out runs
    vectorized on the aggregate domain (D = observed days per type,
    corpus-size-independent — a time series grows with TIME, not data
    scale). Types with one observed day report zero pairs/slope."""
    rows = _daily_type_counts(sf_dir)
    series: dict[str, list] = {}
    for d, t, n in rows:
        series.setdefault(t, []).append((d, n))
    types = sorted(series)
    out_nd, out_np, out_sl = [], [], []
    for t in types:
        seq = sorted(series[t])
        d = np.asarray([x for x, _ in seq], np.int64)
        n = np.asarray([y for _, y in seq], np.int64)
        i, j = np.triu_indices(len(d), k=1)
        num = (n[j] - n[i]) * 1_000_000
        den = d[j] - d[i]                       # > 0 by sort
        s = np.where(num >= 0, np.abs(num) // den,
                     -(np.abs(num) // den))     # trunc toward zero
        s.sort()
        P = len(s)
        out_nd.append(len(d))
        out_np.append(P)
        out_sl.append(int(s[(P + 1) // 2 - 1]) if P else 0)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n_days": pa.array(out_nd, pa.int64()),
        "n_pairs": pa.array(out_np, pa.int64()),
        "slope_micro": pa.array(out_sl, pa.int64()),
    })


US_PER_HOUR = 3_600_000_000


def q_peak_hour(sf_dir: str):
    """Per-event-type peak load: the hour bucket (epoch hours) with the
    most events and its count — argmax with earliest-hour tie-break on
    both engines. One (hour,type) fused-key count shuffle; the argmax
    runs per type on mergeable (count desc, hour asc) partials."""
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        us = _np(b["ts"]).astype("datetime64[us]").astype(np.int64)
        hour = us // US_PER_HOUR
        fused = pc.binary_join_element_wise(
            pa.array(hour.astype("U"), pa.string()),
            _chunk(b["event_type"]), "\x1f")
        t = _count_by_key(fused)
        return pa.table({"ht": t["key"], "n": t["n"]})

    agg = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("ht").aggregate(Sum("n", alias_name="n"))

    def best_partial(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["ht"], "\x1f")
        hour = np.asarray(
            _chunk(pc.list_element(parts, 0)).to_pylist(), "U").astype(
            np.int64)
        et = np.asarray(_chunk(pc.list_element(parts, 1)).to_pylist(),
                        object)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-type argmax inside the block: sort by (type, -n, hour)
        order = np.lexsort((hour, -n, et))
        et_s = et[order]
        first = np.ones(len(et_s), bool)
        first[1:] = et_s[1:] != et_s[:-1]
        sel = order[first]
        return pa.table({
            "event_type": pa.array(et[sel].tolist(), pa.string()),
            "peak_hour": pa.array(hour[sel], pa.int64()),
            "n_peak": pa.array(n[sel], pa.int64()),
        })

    # block partials then ONE more tiny reduce over ≤ types×blocks rows
    part2 = agg.map_batches(best_partial, batch_format="pyarrow") \
        .take_all()
    best: dict = {}
    for r in part2:
        cur = best.get(r["event_type"])
        cand = (-r["n_peak"], r["peak_hour"])
        if cur is None or cand < cur:
            best[r["event_type"]] = cand
    types = sorted(best)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "peak_hour": pa.array([best[t][1] for t in types], pa.int64()),
        "n_peak": pa.array([-best[t][0] for t in types], pa.int64()),
    })


ROLL_WIN = 7


def q_rolling_median(sf_dir: str):
    """7-day rolling DISCRETE median of each event type's daily count
    over its observed days (DuckDB quantile_disc window parity: rank
    ⌈w/2⌉ over the trailing ROLL_WIN-row frame). The corpus-sized work
    is the shared (day,type) count shuffle; the window runs on the
    aggregate-domain series. Output: (event_type, day, med)."""
    rows = _daily_type_counts(sf_dir)
    series: dict[str, list] = {}
    for d, t, n in rows:
        series.setdefault(t, []).append((d, n))
    out_t, out_d, out_m = [], [], []
    for t in sorted(series):
        seq = sorted(series[t])
        ns = [n for _, n in seq]
        for i, (d, _n) in enumerate(seq):
            w = ns[max(0, i - ROLL_WIN + 1):i + 1]
            w = sorted(w)
            out_t.append(t)
            out_d.append(d)
            out_m.append(w[(len(w) + 1) // 2 - 1])
    return pa.table({
        "event_type": pa.array(out_t, pa.string()),
        "day": pa.array(out_d, pa.int64()),
        "med": pa.array(out_m, pa.int64()),
    })


def q_new_users_daily(sf_dir: str):
    """User-acquisition curve: events per day attributable to each
    user's FIRST-ever activity day (first-seen groupby-Min over the
    user domain, then a day census). The shuffle is user-sized, the
    output day-sized."""
    from ray.data.aggregate import Min, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def partial(b: pa.Table) -> pa.Table:
        us = _np(b["ts"]).astype("datetime64[us]").astype(np.int64)
        day = us // US_PER_DAY
        uid = _np(b["user_id"]).astype(np.int64)
        order = np.lexsort((day, uid))
        first = np.ones(len(uid), bool)
        first[1:] = uid[order][1:] != uid[order][:-1]
        sel = order[first]
        return pa.table({"user_id": pa.array(uid[sel], pa.int64()),
                         "d": pa.array(day[sel], pa.int64())})

    first_day = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Min("d", alias_name="d"))

    def census(b: pa.Table) -> pa.Table:
        d, c = np.unique(b["d"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    return first_day.map_batches(census, batch_format="pyarrow") \
        .groupby("day").aggregate(Sum("n", alias_name="n_new_users"))


VOCAB_COVER_K = 100


def q_vocab_coverage(sf_dir: str):
    """Head-of-Zipf coverage: the share of ALL token occurrences
    covered by the top-VOCAB_COVER_K terms (count desc, term asc
    tie-break), in exact ppm — the one-number duplication/boilerplate
    signal of a corpus. One vocabulary-domain count shuffle; the top-k
    and ratio run on mergeable per-block (count, term) partials."""
    from ray.data.aggregate import Sum
    from ..stages.corpus import _batch_terms

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])

    def tc(b: pa.Table) -> pa.Table:
        flat, _, _, _ = _batch_terms(b, "text")
        t = _count_by_key(flat)
        return pa.table({"term": t["key"], "n": t["n"]})

    agg = docs.map_batches(tc, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n", alias_name="n"))

    def topk_partial(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        term = np.asarray(_chunk(b["term"]).to_pylist(), object)
        order = np.lexsort((term, -n))[:VOCAB_COVER_K]
        out = pa.table({
            "term": pa.array(term[order].tolist() + ["\x01TOTAL"],
                             pa.string()),
            "n": pa.array(np.append(n[order], n.sum()), pa.int64()),
        })
        return out

    rows = agg.map_batches(topk_partial, batch_format="pyarrow") \
        .take_all()
    total = sum(r["n"] for r in rows if r["term"] == "\x01TOTAL")
    cand = sorted(((-r["n"], r["term"]) for r in rows
                   if r["term"] != "\x01TOTAL"))[:VOCAB_COVER_K]
    head = sum(-c for c, _ in cand)
    return pa.table({
        "n_terms": pa.array([min(VOCAB_COVER_K, len(cand))], pa.int64()),
        "head_tokens": pa.array([head], pa.int64()),
        "total_tokens": pa.array([total], pa.int64()),
        "coverage_ppm": pa.array(
            [head * 1_000_000 // total if total else 0], pa.int64()),
    })


def q_locf_fill(sf_dir: str):
    """Gap filling: each event type's daily count series re-emitted on
    the FULL global day spine (min..max observed day across all types)
    with gaps filled by Last Observation Carried Forward — the
    missing-data repair step every downstream time-series model
    assumes; days before a type's first observation fill with 0.
    Output: (event_type, day, filled, is_gap). The corpus-sized work
    is the shared (day,type) count shuffle; the spine expansion runs
    on the aggregate domain (days × types, corpus-size-independent)."""
    rows = _daily_type_counts(sf_dir)
    if not rows:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "day": pa.array([], pa.int64()),
                         "filled": pa.array([], pa.int64()),
                         "is_gap": pa.array([], pa.int64())})
    days = sorted({d for d, _, _ in rows})
    spine = list(range(days[0], days[-1] + 1))
    series: dict[str, dict[int, int]] = {}
    for d, t, n in rows:
        series.setdefault(t, {})[d] = n
    out_t, out_d, out_v, out_g = [], [], [], []
    for t in sorted(series):
        have = series[t]
        last = 0
        for d in spine:
            if d in have:
                last = have[d]
                gap = 0
            else:
                gap = 1
            out_t.append(t)
            out_d.append(d)
            out_v.append(last)
            out_g.append(gap)
    return pa.table({
        "event_type": pa.array(out_t, pa.string()),
        "day": pa.array(out_d, pa.int64()),
        "filled": pa.array(out_v, pa.int64()),
        "is_gap": pa.array(out_g, pa.int64()),
    })


def q_dow_seasonality(sf_dir: str):
    """Weekday seasonality per event type: counts per day-of-week
    (0 = Thursday epoch anchor convention: dow = day % 7) and the
    EXACT uniformity χ²-numerator Σ_w (7·n_w − N)² — an integer that is
    0 iff the weekday profile is perfectly flat, in the same
    cross-multiplied style as the correlation family. One fused-key
    (dow,type) groupby; 7×types output plus the per-type statistic."""
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        us = _np(b["ts"]).astype("datetime64[us]").astype(np.int64)
        dow = (us // US_PER_DAY) % 7
        fused = pc.binary_join_element_wise(
            pa.array(dow.astype("U"), pa.string()),
            _chunk(b["event_type"]), "\x1f")
        t = _count_by_key(fused)
        return pa.table({"dt": t["key"], "n": t["n"]})

    agg = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("dt").aggregate(Sum("n", alias_name="n")).take_all()
    per: dict[str, dict[int, int]] = {}
    for r in agg:
        w, t = r["dt"].split("\x1f")
        per.setdefault(t, {})[int(w)] = int(r["n"])
    types = sorted(per)
    chi = []
    for t in types:
        tot = sum(per[t].values())
        chi.append(sum((7 * per[t].get(w, 0) - tot) ** 2
                       for w in range(7)))
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n_events": pa.array([sum(per[t].values()) for t in types],
                             pa.int64()),
        "chi2_num": pa.array(chi, pa.int64()),
    })


EVENT_TYPE_BITS = {"click": 1, "error": 2, "purchase": 4,
                   "signup": 8, "view": 16}


def q_behavior_census(sf_dir: str):
    """Behavioral segmentation census: (user, day) sessions grouped by
    the exact SET of event types triggered that day (bitmask over the
    fixed type domain) — 'how many user-days view but never purchase'
    and every other daily segment in one table. Distributed OR without
    a BitOr aggregate: the (user-day, type) domain dedups per block
    and globally, each distinct pair contributes its type bit once, so
    a plain Sum IS the bitwise OR; the final census groups the
    session-domain masks. Unknown event types fail loudly (the bit
    table is part of the contract)."""
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])

    def pairs(b: pa.Table) -> pa.Table:
        us = _np(b["ts"]).astype("datetime64[us]").astype(np.int64)
        day = us // US_PER_DAY
        uid = _np(b["user_id"]).astype(np.int64)
        if len(uid) and (uid.min() < 0 or uid.max() >= (1 << 43)):
            raise ValueError(
                "behavior_census: uid outside the 43-bit lane")
        # user-day key: uid << 20 | (day & 0xFFFFF) — synth days are a
        # narrow contiguous range, no collision within it
        ud = (uid << 20) | (day & 0xFFFFF)
        et = _chunk(b["event_type"])
        fused = pc.binary_join_element_wise(
            pa.array(ud.astype("U"), pa.string()), et, "\x1f")
        uniq = _chunk(pc.unique(fused))
        parts = pc.split_pattern(uniq, "\x1f")
        u = np.asarray(_chunk(pc.list_element(parts, 0)).to_pylist(),
                       "U").astype(np.int64)
        t = _chunk(pc.list_element(parts, 1)).to_pylist()
        try:
            bits = np.asarray([EVENT_TYPE_BITS[x] for x in t], np.int64)
        except KeyError as e:
            raise ValueError(f"behavior_census: unknown event type {e}")
        return pa.table({"ud": pa.array(u, pa.int64()),
                         "bit": pa.array(bits, pa.int64()),
                         "one": pa.array(np.ones(len(u), np.int64),
                                         pa.int64())})

    # global (user-day, bit) dedup first — a pair seen in many blocks
    # must contribute its bit ONCE
    ub = ev.map_batches(pairs, batch_format="pyarrow") \
        .groupby(["ud", "bit"]).aggregate(Sum("one", alias_name="one"))

    def to_mask(b: pa.Table) -> pa.Table:
        return pa.table({"ud": b["ud"],
                         "bit": pc.cast(b["bit"], pa.int64())})

    masks = ub.map_batches(to_mask, batch_format="pyarrow") \
        .groupby("ud").aggregate(Sum("bit", alias_name="mask"))

    def census(b: pa.Table) -> pa.Table:
        m, c = np.unique(b["mask"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"mask": pa.array(m, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    return masks.map_batches(census, batch_format="pyarrow") \
        .groupby("mask").aggregate(Sum("n", alias_name="n_user_days"))


def q_session_type_pairs(sf_dir: str):
    """Market-basket co-occurrence of event types inside gap-based
    sessions (the 30-min events_sessions contract): for every unordered
    type pair, how many sessions contain both, and the lift vs the
    types' marginal session counts (×1e6, integer truncation on both
    engines). ONE user-hash exchange; each partition sessionizes in a
    single numpy pass (lexsort + gap mask) and reduces straight to a
    fixed-size partial — pair counts over the 5-type domain plus
    sentinel rows for marginals (i,−1) and the session total (−1,−1) —
    so the final groupby and the driver collection are O(|types|²),
    independent of event volume. Lift numerators use Python ints off
    the hot path (n·N·1e6 exceeds int64 at planet scale). The bit
    order of EVENT_TYPE_BITS is alphabetical, which keeps the Ray-side
    (i<j) pair order identical to the oracle's string inequality."""
    from ray.data.aggregate import Sum

    from ..stages import relational

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    P = relational.adaptive_parts(sf_dir)
    names = [k for k, _ in sorted(EVENT_TYPE_BITS.items(),
                                  key=lambda kv: kv[1])]
    assert names == sorted(names), "bit order must match string order"
    V = len(names)
    bits = [EVENT_TYPE_BITS[k] for k in names]
    # the probe below assumes the bit values are exactly consecutive
    # powers of two — a non-contiguous bit (e.g. 64) would silently
    # misattribute marginals/pairs
    assert bits == [1 << i for i in range(V)], bits

    def addpart(b: pa.Table) -> pa.Table:
        u = _np(b["user_id"]).astype(np.int64)
        return b.append_column(
            "_part", pa.array((u % P).astype(np.int32), pa.int32()))

    def pair_partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            z = pa.array([], pa.int64())
            return pa.table({"a": z, "b": z, "n": z})
        u = _np(t["user_id"]).astype(np.int64)
        e_us = _np(t["ts"]).astype("datetime64[us]").astype(np.int64)
        et = _chunk(t["event_type"]).to_pylist()
        try:
            code = np.asarray([EVENT_TYPE_BITS[x] for x in et], np.int64)
        except KeyError as e:
            raise ValueError(
                f"session_type_pairs: unknown event type {e}")
        order = np.lexsort((e_us, u))
        u_s, e_s, c_s = u[order], e_us[order], code[order]
        new_sess = np.ones(n, bool)
        new_sess[1:] = (u_s[1:] != u_s[:-1]) | \
            ((e_s[1:] - e_s[:-1]) > 1_800_000_000)
        starts = np.nonzero(new_sess)[0]
        masks = np.bitwise_or.reduceat(c_s, starts)
        present = [(masks & bits[i]) != 0 for i in range(V)]
        aa, bb, nn = [-1], [-1], [len(masks)]     # total-sessions row
        for i in range(V):
            ni = int(present[i].sum())
            if ni:
                aa.append(i)
                bb.append(-1)
                nn.append(ni)                     # marginal row
            for j in range(i + 1, V):
                nij = int((present[i] & present[j]).sum())
                if nij:
                    aa.append(i)
                    bb.append(j)
                    nn.append(nij)                # pair row
        return pa.table({"a": pa.array(aa, pa.int64()),
                         "b": pa.array(bb, pa.int64()),
                         "n": pa.array(nn, pa.int64())})

    agg = ev.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(pair_partial, batch_format="pyarrow") \
        .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n")) \
        .take_all()                                # ≤ 1+V+V(V−1)/2 rows
    ns = 0
    marg: dict[int, int] = {}
    pairs: list[tuple[int, int, int]] = []
    for r in agg:
        a, b, cnt = int(r["a"]), int(r["b"]), int(r["n"])
        if a == -1:
            ns = cnt
        elif b == -1:
            marg[a] = cnt
        else:
            pairs.append((a, b, cnt))
    ta, tb, nc, lift = [], [], [], []
    for a, b, cnt in sorted(pairs):
        ta.append(names[a])
        tb.append(names[b])
        nc.append(cnt)
        lift.append((cnt * ns * 1_000_000) // (marg[a] * marg[b]))
    return pa.table({
        "type_a": pa.array(ta, pa.string()),
        "type_b": pa.array(tb, pa.string()),
        "n_sessions": pa.array(nc, pa.int64()),
        "lift_micro": pa.array(lift, pa.int64()),
    })


def q_session_attribution(sf_dir: str):
    """First-touch attribution census: per entry event type (the FIRST
    event of a 30-min gap session, ties broken by event_id like every
    window query here), how many sessions start that way, how many of
    them convert (contain ≥1 purchase), and the total purchases they
    carry — the landing-page-effectiveness table. Same single
    user-hash exchange as session_type_pairs; each partition reduces
    to a |types|-row partial (vectorized reduceat over session
    starts), so the final shuffle is O(|types|)."""
    from ray.data.aggregate import Sum

    from ..stages import relational

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    P = relational.adaptive_parts(sf_dir)
    names = [k for k, _ in sorted(EVENT_TYPE_BITS.items(),
                                  key=lambda kv: kv[1])]
    code_of = {k: i for i, k in enumerate(names)}
    pur = code_of["purchase"]

    def addpart(b: pa.Table) -> pa.Table:
        u = _np(b["user_id"]).astype(np.int64)
        return b.append_column(
            "_part", pa.array((u % P).astype(np.int32), pa.int32()))

    def attr_partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            z = pa.array([], pa.int64())
            return pa.table({"ft": z, "ns": z, "nc": z, "np": z})
        u = _np(t["user_id"]).astype(np.int64)
        e_us = _np(t["ts"]).astype("datetime64[us]").astype(np.int64)
        eid = _np(t["event_id"]).astype(np.int64)
        et = _chunk(t["event_type"]).to_pylist()
        try:
            code = np.asarray([code_of[x] for x in et], np.int64)
        except KeyError as e:
            raise ValueError(
                f"session_attribution: unknown event type {e}")
        order = np.lexsort((eid, e_us, u))
        u_s, e_s, c_s = u[order], e_us[order], code[order]
        new_sess = np.ones(n, bool)
        new_sess[1:] = (u_s[1:] != u_s[:-1]) | \
            ((e_s[1:] - e_s[:-1]) > 1_800_000_000)
        starts = np.nonzero(new_sess)[0]
        first = c_s[starts]
        n_pur = np.add.reduceat((c_s == pur).astype(np.int64), starts)
        out_ft, out_ns, out_nc, out_np = [], [], [], []
        for i in range(len(names)):
            m = first == i
            if m.any():
                out_ft.append(i)
                out_ns.append(int(m.sum()))
                out_nc.append(int((n_pur[m] > 0).sum()))
                out_np.append(int(n_pur[m].sum()))
        return pa.table({"ft": pa.array(out_ft, pa.int64()),
                         "ns": pa.array(out_ns, pa.int64()),
                         "nc": pa.array(out_nc, pa.int64()),
                         "np": pa.array(out_np, pa.int64())})

    agg = ev.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(attr_partial, batch_format="pyarrow") \
        .groupby("ft").aggregate(Sum("ns", alias_name="ns"),
                                 Sum("nc", alias_name="nc"),
                                 Sum("np", alias_name="np")) \
        .take_all()                               # ≤ |types| rows
    rows = sorted((int(r["ft"]), int(r["ns"]), int(r["nc"]),
                   int(r["np"])) for r in agg)
    return pa.table({
        "first_type": pa.array([names[f] for f, *_ in rows],
                               pa.string()),
        "n_sessions": pa.array([ns for _, ns, _, _ in rows], pa.int64()),
        "n_conv_sessions": pa.array([nc for _, _, nc, _ in rows],
                                    pa.int64()),
        "n_purchases": pa.array([np_ for *_, np_ in rows], pa.int64()),
    })


def q_peak_concurrency(sf_dir: str):
    """Distributed sweep-line: the maximum number of SIMULTANEOUSLY
    active 30-min gap sessions across all users, and the earliest
    instant it is reached — the capacity-planning number behind 'how
    many concurrent users must the service hold'. Shape: sessions
    (one user-hash exchange) → ±1 boundary deltas → hour-bucket
    exchange where each bucket computes its local prefix run (sorted
    by (t, +1-before-−1)) as (total, max_prefix, argmax t) — the
    classic two-phase distributed prefix-max; the driver combines the
    O(hours) bucket summaries with cumulative offsets. Ties at the
    same instant count starts before ends (a zero-length session
    still peaks), and the earliest peak instant wins on both engines."""
    from ray.data.aggregate import Sum  # noqa: F401 (shape parity)

    from ..stages import relational

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    P = relational.adaptive_parts(sf_dir)
    BUCKET_US = 3_600_000_000

    def addpart(b: pa.Table) -> pa.Table:
        u = _np(b["user_id"]).astype(np.int64)
        return b.append_column(
            "_part", pa.array((u % P).astype(np.int32), pa.int32()))

    def deltas(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            z = pa.array([], pa.int64())
            return pa.table({"t": z, "d": z})
        u = _np(t["user_id"]).astype(np.int64)
        e_us = _np(t["ts"]).astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((e_us, u))
        u_s, e_s = u[order], e_us[order]
        new_sess = np.ones(n, bool)
        new_sess[1:] = (u_s[1:] != u_s[:-1]) | \
            ((e_s[1:] - e_s[:-1]) > 1_800_000_000)
        starts = np.nonzero(new_sess)[0]
        ends = np.append(starts[1:], n) - 1
        return pa.table({
            "t": pa.array(np.concatenate([e_s[starts], e_s[ends]]),
                          pa.int64()),
            "d": pa.array(np.concatenate([
                np.ones(len(starts), np.int64),
                -np.ones(len(starts), np.int64)]), pa.int64()),
        })

    def addbucket(b: pa.Table) -> pa.Table:
        t = _np(b["t"]).astype(np.int64)
        return b.append_column(
            "bucket", pa.array(t // BUCKET_US, pa.int64()))

    def bucket_run(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"bucket": z, "total": z, "mx": z, "tx": z})
        ts = _np(t["t"]).astype(np.int64)
        d = _np(t["d"]).astype(np.int64)
        order = np.lexsort((-d, ts))      # +1 before −1 at equal t
        run = np.cumsum(d[order])
        i = int(np.argmax(run))           # FIRST index at the max
        return pa.table({
            "bucket": pa.array([int(ts[0] // BUCKET_US)], pa.int64()),
            "total": pa.array([int(run[-1])], pa.int64()),
            "mx": pa.array([int(run[i])], pa.int64()),
            "tx": pa.array([int(ts[order][i])], pa.int64()),
        })

    rows = ev.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(deltas, batch_format="pyarrow") \
        .map_batches(addbucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_run, batch_format="pyarrow") \
        .take_all()                       # O(hours) bucket summaries
    rows.sort(key=lambda r: int(r["bucket"]))
    offset = 0
    peak, t_peak = 0, None
    for r in rows:
        cand = offset + int(r["mx"])
        if cand > peak or (cand == peak and t_peak is None):
            peak, t_peak = cand, int(r["tx"])
        offset += int(r["total"])
    return pa.table({
        "peak_concurrency": pa.array([peak], pa.int64()),
        "t_peak_us": pa.array([t_peak if t_peak is not None else 0],
                              pa.int64()),
    })


def q_session_gaps(sf_dir: str):
    """Per-user BETWEEN-session gap statistics (session count, total
    and longest away-time in exact integer microseconds) — the churn /
    re-engagement profile that complements the within-session windows.
    Same single user-hash exchange; the partition kernel reduces
    session-level arrays per user with reduceat (a user's sessions are
    contiguous after the lexsort), padding user boundaries with 0 —
    safe because a real between-session gap is > 30 min by
    construction, so the pad never wins a max and never biases a sum.
    Single-session users report 0/0 (COALESCE parity in the oracle)."""
    from ..stages import relational

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    P = relational.adaptive_parts(sf_dir)

    def addpart(b: pa.Table) -> pa.Table:
        u = _np(b["user_id"]).astype(np.int64)
        return b.append_column(
            "_part", pa.array((u % P).astype(np.int32), pa.int32()))

    def gaps(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            z = pa.array([], pa.int64())
            return pa.table({"user_id": z, "n_sessions": z,
                             "sum_gap_us": z, "max_gap_us": z})
        u = _np(t["user_id"]).astype(np.int64)
        e_us = _np(t["ts"]).astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((e_us, u))
        u_s, e_s = u[order], e_us[order]
        new_user = np.ones(n, bool)
        new_user[1:] = u_s[1:] != u_s[:-1]
        new_sess = new_user.copy()
        new_sess[1:] |= (e_s[1:] - e_s[:-1]) > 1_800_000_000
        starts = np.nonzero(new_sess)[0]
        ends = np.append(starts[1:], n) - 1
        s_user = u_s[starts]
        t0, t1 = e_s[starts], e_s[ends]
        m = len(starts)
        same = s_user[1:] == s_user[:-1]
        g2 = np.zeros(m, np.int64)
        g2[1:] = np.where(same, t0[1:] - t1[:-1], 0)
        ub = np.ones(m, bool)
        ub[1:] = ~same
        ui = np.nonzero(ub)[0]
        return pa.table({
            "user_id": pa.array(s_user[ui], pa.int64()),
            "n_sessions": pa.array(np.diff(np.append(ui, m)), pa.int64()),
            "sum_gap_us": pa.array(np.add.reduceat(g2, ui), pa.int64()),
            "max_gap_us": pa.array(np.maximum.reduceat(g2, ui),
                                   pa.int64()),
        })

    return ev.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(gaps, batch_format="pyarrow")


def q_user_tenure(sf_dir: str):
    """Per-user activity-span profile: first/last active day, calendar
    span, number of DISTINCT active days and total events — the
    engagement-density table (n_active_days/span_days separates the
    daily habitual from the one-burst drive-by). Two aggregate-domain
    exchanges: per-block (user-day, count) partials dedup-sum on the
    fused uid<<20|day key (behavior_census key contract, loud 20-bit
    day guard), then one per-user groupby of Min/Max/Count/Sum — raw
    event rows never shuffle."""
    from ray.data.aggregate import Max, Min, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        us = _np(b["ts"]).astype("datetime64[us]").astype(np.int64)
        day = us // US_PER_DAY
        if len(day) and (day.min() < 0 or day.max() >= (1 << 20)):
            raise ValueError("user_tenure: day outside the 20-bit lane")
        uid = _np(b["user_id"]).astype(np.int64)
        if len(uid) and (uid.min() < 0 or uid.max() >= (1 << 43)):
            raise ValueError("user_tenure: uid outside the 43-bit lane")
        ud = (uid << 20) | day
        uk, cnt = np.unique(ud, return_counts=True)
        return pa.table({"ud": pa.array(uk, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    per_day = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("ud").aggregate(Sum("n", alias_name="n"))

    def split(b: pa.Table) -> pa.Table:
        ud = _np(b["ud"]).astype(np.int64)
        return pa.table({
            "user_id": pa.array(ud >> 20, pa.int64()),
            "d": pa.array(ud & 0xFFFFF, pa.int64()),
            "one": pa.array(np.ones(len(ud), np.int64), pa.int64()),
            "n": pc.cast(b["n"], pa.int64()),
        })

    agg = per_day.map_batches(split, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            Min("d", alias_name="first_day"),
            Max("d", alias_name="last_day"),
            Sum("one", alias_name="n_active_days"),
            Sum("n", alias_name="n_events"))

    def final(b: pa.Table) -> pa.Table:
        f = _np(b["first_day"]).astype(np.int64)
        l = _np(b["last_day"]).astype(np.int64)
        return pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "first_day": pa.array(f, pa.int64()),
            "last_day": pa.array(l, pa.int64()),
            "span_days": pa.array(l - f + 1, pa.int64()),
            "n_active_days": pc.cast(b["n_active_days"], pa.int64()),
            "n_events": pc.cast(b["n_events"], pa.int64()),
        })

    return agg.map_batches(final, batch_format="pyarrow")


def q_changepoint(sf_dir: str):
    """Per-event-type CUSUM changepoint on the daily count series: the
    day k (among the type's observed days, ordered) maximizing
    |D·S_k − k·S_D| — the integer-scaled deviation of the cumulative
    count from the uniform ramp (multiply-through by D avoids the
    rational mean; exact ints). Tie → earliest day. Same aggregate-
    domain shape as trend_slope."""
    rows = _daily_type_counts(sf_dir)
    series: dict[str, list] = {}
    for d, t, n in rows:
        series.setdefault(t, []).append((d, n))
    types = sorted(series)
    out_d, out_s = [], []
    for t in types:
        seq = sorted(series[t])
        D = len(seq)
        total = sum(n for _, n in seq)
        best = (-1, None)  # (score, day)
        s = 0
        for k, (d, n) in enumerate(seq, start=1):
            s += n
            score = abs(D * s - k * total)
            if score > best[0] or (score == best[0] and d < best[1]):
                best = (score, d)
        out_d.append(best[1])
        out_s.append(best[0])
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "cp_day": pa.array(out_d, pa.int64()),
        "score": pa.array(out_s, pa.int64()),
    })


QUERIES_TS = {
    "value_mode": q_value_mode,
    "trend_slope": q_trend_slope,
    "theilsen_trend": q_theilsen_trend,
    "peak_hour": q_peak_hour,
    "locf_fill": q_locf_fill,
    "dow_seasonality": q_dow_seasonality,
    "behavior_census": q_behavior_census,
    "session_type_pairs": q_session_type_pairs,
    "session_attribution": q_session_attribution,
    "peak_concurrency": q_peak_concurrency,
    "session_gaps": q_session_gaps,
    "user_tenure": q_user_tenure,
    "rolling_median": q_rolling_median,
    "new_users_daily": q_new_users_daily,
    "vocab_coverage": q_vocab_coverage,
    "changepoint": q_changepoint,
    "daily_type_corr": q_daily_type_corr,
    "daily_autocorr": q_daily_autocorr,
    "char_class_stats": q_char_class_stats,
    "top_token_per_source": q_top_token_per_source,
    "vocab_growth": q_vocab_growth,
    "stratified_sample": q_stratified_sample,
    "revenue_cube": q_revenue_cube,
}


ORACLE_SQL_TS = {
    "session_type_pairs": """
WITH marked AS (
  SELECT user_id, ts, event_type,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events),
sess AS (
  SELECT user_id, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked),
st AS (SELECT DISTINCT user_id, session_id, event_type FROM sess),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS ns
        FROM (SELECT DISTINCT user_id, session_id FROM st)),
tc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
       FROM st GROUP BY event_type),
pc2 AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_sessions
  FROM st a JOIN st b
    ON a.user_id = b.user_id AND a.session_id = b.session_id
   AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT p.type_a, p.type_b, p.n_sessions,
       CAST((CAST(p.n_sessions AS HUGEINT) * ns * 1000000)
            // (ca.c * cb.c) AS BIGINT) AS lift_micro
FROM pc2 p, tot, tc ca, tc cb
WHERE ca.event_type = p.type_a AND cb.event_type = p.type_b""",
    "user_tenure": """
WITH e AS (SELECT CAST(user_id AS BIGINT) AS user_id,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
           FROM events),
ud AS (SELECT user_id, d, CAST(COUNT(*) AS BIGINT) AS n
       FROM e GROUP BY user_id, d)
SELECT user_id,
       CAST(MIN(d) AS BIGINT) AS first_day,
       CAST(MAX(d) AS BIGINT) AS last_day,
       CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS span_days,
       CAST(COUNT(*) AS BIGINT) AS n_active_days,
       CAST(SUM(n) AS BIGINT) AS n_events
FROM ud GROUP BY user_id""",
    "session_gaps": """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked),
bounds AS (
  SELECT user_id, sid, MIN(ts) AS t0, MAX(ts) AS t1
  FROM sess GROUP BY user_id, sid),
g AS (
  SELECT user_id,
         CAST(epoch_us(t0) AS BIGINT) -
         CAST(epoch_us(LAG(t1) OVER (PARTITION BY user_id
                                     ORDER BY sid)) AS BIGINT) AS gap
  FROM bounds)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS sum_gap_us,
       CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_us
FROM g GROUP BY user_id""",
    "peak_concurrency": """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked),
bounds AS (
  SELECT user_id, sid, MIN(ts) AS t0, MAX(ts) AS t1
  FROM sess GROUP BY user_id, sid),
deltas AS (
  SELECT CAST(epoch_us(t0) AS BIGINT) AS t, 1 AS d FROM bounds
  UNION ALL
  SELECT CAST(epoch_us(t1) AS BIGINT) AS t, -1 AS d FROM bounds),
run AS (
  SELECT t, SUM(d) OVER (ORDER BY t, d DESC
                         ROWS UNBOUNDED PRECEDING) AS c
  FROM deltas),
mx AS (SELECT MAX(c) AS peak FROM run)
SELECT CAST(peak AS BIGINT) AS peak_concurrency,
       CAST((SELECT MIN(t) FROM run WHERE c = peak) AS BIGINT)
         AS t_peak_us
FROM mx""",
    "session_attribution": """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked),
fs AS (
  SELECT user_id, session_id, event_type,
         FIRST_VALUE(event_type) OVER (PARTITION BY user_id, session_id
                                       ORDER BY ts, event_id) AS ft
  FROM sess),
per AS (
  SELECT user_id, session_id, MIN(ft) AS first_type,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
  FROM fs GROUP BY user_id, session_id)
SELECT first_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_conv_sessions,
       CAST(SUM(np) AS BIGINT) AS n_purchases
FROM per GROUP BY first_type""",
    "trend_slope": """
WITH e AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
                  event_type FROM events),
dc AS (SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS n
       FROM e GROUP BY 1, 2)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(d) AS BIGINT) AS sum_x,
       CAST(SUM(n) AS BIGINT) AS sum_y,
       CAST(SUM(d * n) AS BIGINT) AS sum_xy,
       CAST(SUM(d * d) AS BIGINT) AS sum_x2,
       CAST(COUNT(*) * SUM(d * n) - SUM(d) * SUM(n) AS BIGINT)
         AS slope_num,
       CAST(COUNT(*) * SUM(d * d) - SUM(d) * SUM(d) AS BIGINT)
         AS slope_den
FROM dc GROUP BY event_type""",
    "behavior_census": """
WITH ut AS (SELECT DISTINCT user_id,
                   CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
                   event_type
            FROM events),
b AS (SELECT user_id, d,
             CAST(SUM(CASE event_type
                      WHEN 'click' THEN 1 WHEN 'error' THEN 2
                      WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                      WHEN 'view' THEN 16 END) AS BIGINT) AS mask
      FROM ut GROUP BY 1, 2)
SELECT mask, CAST(COUNT(*) AS BIGINT) AS n_user_days
FROM b GROUP BY mask""",
    "locf_fill": """
WITH e AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
                  event_type FROM events),
dc AS (SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS n
       FROM e GROUP BY 1, 2),
bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM dc),
spine AS (SELECT UNNEST(generate_series(lo, hi)) AS day FROM bounds),
types AS (SELECT DISTINCT event_type FROM dc),
g AS (SELECT t.event_type, s.day, dc.n
      FROM types t CROSS JOIN spine s
      LEFT JOIN dc ON dc.event_type = t.event_type AND dc.d = s.day)
SELECT event_type, day,
       CAST(COALESCE(last_value(n IGNORE NULLS) OVER (
              PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
            AS BIGINT) AS filled,
       CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
FROM g""",
    "dow_seasonality": """
WITH e AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) % 7 AS w,
                  event_type FROM events),
wc AS (SELECT event_type, w, CAST(COUNT(*) AS BIGINT) AS n
       FROM e GROUP BY 1, 2),
tt AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot
       FROM wc GROUP BY 1),
ww AS (SELECT UNNEST(generate_series(0, 6)) AS w),
j AS (SELECT tt.event_type, tt.tot,
             7 * COALESCE(wc.n, 0) - tt.tot AS dev
      FROM tt CROSS JOIN ww
      LEFT JOIN wc ON wc.event_type = tt.event_type AND wc.w = ww.w)
SELECT event_type,
       CAST(ANY_VALUE(tot) AS BIGINT) AS n_events,
       CAST(SUM(dev * dev) AS BIGINT) AS chi2_num
FROM j GROUP BY event_type""",
    "peak_hour": """
WITH e AS (SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
                  event_type FROM events),
hc AS (SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS n
       FROM e GROUP BY 1, 2),
r AS (SELECT event_type, h, n,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY n DESC, h) AS rn FROM hc)
SELECT event_type, CAST(h AS BIGINT) AS peak_hour, n AS n_peak
FROM r WHERE rn = 1""",
    "rolling_median": """
WITH e AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
                  event_type FROM events),
dc AS (SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS n
       FROM e GROUP BY 1, 2)
SELECT event_type, d AS day,
       CAST(quantile_disc(n, 0.5) OVER (
             PARTITION BY event_type ORDER BY d
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS med
FROM dc""",
    "new_users_daily": """
WITH f AS (SELECT user_id,
                  MIN(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS d
           FROM events GROUP BY 1)
SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS n_new_users
FROM f GROUP BY 1""",
    "vocab_coverage": r"""
WITH w AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE trim(text) <> ''),
tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY term),
top AS (SELECT n FROM tc ORDER BY n DESC, term LIMIT 100),
s AS (SELECT CAST(SUM(n) AS BIGINT) AS head,
             CAST(COUNT(*) AS BIGINT) AS k FROM top),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM w)
SELECT k AS n_terms, head AS head_tokens, total AS total_tokens,
       CAST(head * 1000000 // total AS BIGINT) AS coverage_ppm
FROM s, tot""",
    "theilsen_trend": """
WITH e AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
                  event_type FROM events),
dc AS (SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS n
       FROM e GROUP BY 1, 2),
sl AS (SELECT a.event_type,
              ((b.n - a.n) * 1000000) // (b.d - a.d) AS s
       FROM dc a JOIN dc b
         ON a.event_type = b.event_type AND b.d > a.d),
m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(quantile_disc(s, 0.5) AS BIGINT) AS slope_micro
      FROM sl GROUP BY event_type),
nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
       FROM dc GROUP BY event_type)
SELECT nd.event_type, nd.n_days,
       COALESCE(m.n_pairs, 0) AS n_pairs,
       COALESCE(m.slope_micro, 0) AS slope_micro
FROM nd LEFT JOIN m ON m.event_type = nd.event_type""",
    "changepoint": """
WITH e AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
                  event_type FROM events),
dc AS (SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS n
       FROM e GROUP BY 1, 2),
w AS (SELECT event_type, d,
             SUM(n) OVER (PARTITION BY event_type ORDER BY d) AS s,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS k,
             COUNT(*) OVER (PARTITION BY event_type) AS nd,
             SUM(n) OVER (PARTITION BY event_type) AS tot
      FROM dc),
sc AS (SELECT event_type, d, ABS(nd * s - k * tot) AS score,
              ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY ABS(nd * s - k * tot) DESC, d)
                AS rn
       FROM w)
SELECT event_type, CAST(d AS BIGINT) AS cp_day,
       CAST(score AS BIGINT) AS score
FROM sc WHERE rn = 1""",
    "value_mode": """
WITH v AS (SELECT event_type,
                  CAST(FLOOR(value + 0.5) AS BIGINT) AS vu FROM events),
c AS (SELECT event_type, vu, COUNT(*) AS n FROM v GROUP BY 1, 2),
r AS (SELECT event_type, vu, n,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY n DESC, vu) AS rn FROM c)
SELECT event_type, CAST(vu AS BIGINT) AS mode_unit,
       CAST(n AS BIGINT) AS n_mode
FROM r WHERE rn = 1""",
    "daily_type_corr": """
WITH e AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
                  event_type FROM events),
days AS (SELECT DISTINCT d FROM e),
types AS (SELECT DISTINCT event_type FROM e),
c AS (SELECT d, event_type, COUNT(*) AS n FROM e GROUP BY 1, 2),
f AS (SELECT days.d, types.event_type, COALESCE(c.n, 0) AS n
      FROM days CROSS JOIN types
      LEFT JOIN c ON c.d = days.d AND c.event_type = types.event_type)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(a.n) AS BIGINT) AS sum_a,
       CAST(SUM(b.n) AS BIGINT) AS sum_b,
       CAST(SUM(a.n * b.n) AS BIGINT) AS sum_ab,
       CAST(COUNT(*) * SUM(a.n * b.n)
            - SUM(a.n) * SUM(b.n) AS BIGINT) AS cov_num
FROM f a JOIN f b ON a.d = b.d AND a.event_type < b.event_type
GROUP BY 1, 2""",
    "daily_autocorr": """
WITH e AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
           FROM events),
t AS (SELECT d, COUNT(*) AS n FROM e GROUP BY d),
s AS (SELECT n, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM t),
lags AS (SELECT CAST(k AS BIGINT) AS lag
         FROM generate_series(1, 7) AS g(k))
SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(a.n) AS BIGINT) AS sum_x,
       CAST(SUM(b.n) AS BIGINT) AS sum_y,
       CAST(SUM(a.n * b.n) AS BIGINT) AS sum_xy,
       CAST(COUNT(*) * SUM(a.n * b.n)
            - SUM(a.n) * SUM(b.n) AS BIGINT) AS cov_num
FROM lags JOIN s a ON TRUE JOIN s b ON b.rn = a.rn + lag
GROUP BY lag""",
    "char_class_stats": """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)
           - length(regexp_replace(text, '[0-9]', '', 'g'))) AS BIGINT)
           AS n_digits,
       CAST(SUM(length(text)
           - length(regexp_replace(text, '[A-Z]', '', 'g'))) AS BIGINT)
           AS n_upper,
       CAST(SUM(length(text)
           - length(replace(text, ' ', ''))) AS BIGINT) AS n_spaces
FROM documents GROUP BY source""",
    "top_token_per_source": r"""
WITH words AS (
  SELECT source,
         UNNEST(regexp_split_to_array(TRIM(lower(text)), '\s+')) AS term
  FROM documents WHERE TRIM(text) <> ''),
c AS (SELECT source, term, COUNT(*) AS n FROM words GROUP BY 1, 2),
r AS (SELECT source, term, n,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n DESC, term) AS rn FROM c)
SELECT source, term, CAST(n AS BIGINT) AS n FROM r WHERE rn = 1""",
    "vocab_growth": r"""
WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
d AS (SELECT doc_id, CAST(doc_id * 10 // (m + 1) AS BIGINT) AS bucket,
             text FROM documents, mx),
words AS (
  SELECT bucket,
         UNNEST(regexp_split_to_array(TRIM(lower(text)), '\s+')) AS term
  FROM d WHERE TRIM(text) <> ''),
m2 AS (SELECT term, MIN(bucket) AS b FROM words GROUP BY term),
nb AS (SELECT b, COUNT(*) AS n_new FROM m2 GROUP BY b),
spine AS (SELECT DISTINCT bucket AS b FROM d)
SELECT CAST(spine.b AS BIGINT) AS bucket,
       CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new_terms,
       CAST(SUM(COALESCE(n_new, 0))
            OVER (ORDER BY spine.b) AS BIGINT) AS n_cum_terms
FROM spine LEFT JOIN nb ON nb.b = spine.b""",
    "stratified_sample": """
WITH h AS (SELECT source, doc_id,
                  md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
r AS (SELECT source, doc_id, h,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY h, doc_id) AS rn FROM h)
SELECT source, CAST(doc_id AS BIGINT) AS doc_id, h
FROM r WHERE rn <= 5""",
    "revenue_cube": """
WITH o AS (SELECT o_custkey,
                  CAST(YEAR(o_orderdate) AS BIGINT) AS y,
                  CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                      AS cents
           FROM orders),
j AS (SELECT n_name, y, cents
      FROM o JOIN customer ON c_custkey = o_custkey
             JOIN nation ON n_nationkey = c_nationkey)
SELECT COALESCE(n_name, 'ALL') AS n_name,
       CAST(COALESCE(y, -1) AS BIGINT) AS o_year,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM j GROUP BY CUBE (n_name, y)""",
}
