"""Brute-force cross-checks for the queries_ts family at sf0.001 —
independent scalar reimplementations (Counter / set / md5-sort), not
the DuckDB oracles (those run in tools/check_oracles.py)."""
import hashlib
from collections import Counter

import numpy as np
import pyarrow.parquet as pq

from grandine_ray.pipelines import queries_ts

SF = "/root/testdata/sf0.001"


def _events():
    return pq.read_table(f"{SF}/events.parquet").to_pydict()


def _docs():
    return pq.read_table(f"{SF}/documents.parquet").to_pydict()


def test_value_mode_brute():
    ev = _events()
    cnt: dict[str, Counter] = {}
    for t, v in zip(ev["event_type"], ev["value"]):
        cnt.setdefault(t, Counter())[int(np.floor(v + 0.5))] += 1
    got = queries_ts.q_value_mode(SF).to_pydict()
    assert got["event_type"] == sorted(cnt)
    for t, mu, nm in zip(got["event_type"], got["mode_unit"],
                         got["n_mode"]):
        best = min(((-n, u) for u, n in cnt[t].items()))
        assert (mu, nm) == (best[1], -best[0])


def test_daily_corr_and_autocorr_brute():
    ev = _events()
    days = sorted({ts.toordinal() for ts in ev["ts"]})
    # epoch-day via toordinal offset: both are day-granular and the
    # query uses epoch microseconds // 86400e6 — same day boundaries
    types = sorted(set(ev["event_type"]))
    M = np.zeros((len(types), len(days)), np.int64)
    di = {d: i for i, d in enumerate(days)}
    ti = {t: i for i, t in enumerate(types)}
    for ts, t in zip(ev["ts"], ev["event_type"]):
        M[ti[t], di[ts.toordinal()]] += 1

    got = queries_ts.q_daily_type_corr(SF).to_pydict()
    k = 0
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            a, b = M[i], M[j]
            assert got["type_a"][k] == types[i]
            assert got["type_b"][k] == types[j]
            assert got["n_days"][k] == len(days)
            assert got["sum_ab"][k] == int((a * b).sum())
            assert got["cov_num"][k] == (len(days) * int((a * b).sum())
                                         - int(a.sum()) * int(b.sum()))
            k += 1
    assert k == len(got["type_a"])

    x = M.sum(axis=0)
    got2 = queries_ts.q_daily_autocorr(SF).to_pydict()
    for i, lag in enumerate(got2["lag"]):
        a, b = x[:-lag], x[lag:]
        assert got2["n_pairs"][i] == len(a)
        assert got2["sum_xy"][i] == int((a * b).sum())
        assert got2["cov_num"][i] == (len(a) * int((a * b).sum())
                                      - int(a.sum()) * int(b.sum()))


def test_char_class_stats_brute():
    d = _docs()
    agg: dict[str, list] = {}
    for s, t in zip(d["source"], d["text"]):
        a = agg.setdefault(s, [0, 0, 0, 0])
        a[0] += 1
        a[1] += sum(c.isdigit() and c.isascii() for c in t)
        a[2] += sum("A" <= c <= "Z" for c in t)
        a[3] += t.count(" ")
    rows = queries_ts.q_char_class_stats(SF).take_all()
    got = {k: [r[k] for r in rows] for k in rows[0]}
    for i, s in enumerate(got["source"]):
        assert [got["n_docs"][i], got["n_digits"][i], got["n_upper"][i],
                got["n_spaces"][i]] == agg[s]


def test_top_token_per_source_brute():
    d = _docs()
    cnt: dict[str, Counter] = {}
    for s, t in zip(d["source"], d["text"]):
        c = cnt.setdefault(s, Counter())
        for w in t.lower().split():
            c[w] += 1
    got = queries_ts.q_top_token_per_source(SF).to_pydict()
    assert got["source"] == sorted(cnt)
    for s, term, n in zip(got["source"], got["term"], got["n"]):
        best = min(((-m, w) for w, m in cnt[s].items()))
        assert (term, n) == (best[1], -best[0])


def test_vocab_growth_brute():
    d = _docs()
    mx = max(d["doc_id"])
    first_bucket: dict[str, int] = {}
    for did, t in sorted(zip(d["doc_id"], d["text"])):
        b = did * 10 // (mx + 1)
        for w in t.lower().split():
            first_bucket.setdefault(w, b)
    h = Counter(first_bucket.values())
    got = queries_ts.q_vocab_growth(SF).to_pydict()
    cum = 0
    for b, nn, nc in zip(got["bucket"], got["n_new_terms"],
                         got["n_cum_terms"]):
        assert nn == h.get(b, 0)
        cum += nn
        assert nc == cum
    assert cum == len(first_bucket)


def test_stratified_sample_brute():
    d = _docs()
    per: dict[str, list] = {}
    for did, s in zip(d["doc_id"], d["source"]):
        per.setdefault(s, []).append(
            (hashlib.md5(str(did).encode()).hexdigest(), did))
    got = queries_ts.q_stratified_sample(SF).to_pydict()
    i = 0
    for s in sorted(per):
        for h, did in sorted(per[s])[:queries_ts.STRATUM_K]:
            assert got["source"][i] == s
            assert got["doc_id"][i] == did
            assert got["h"][i] == h
            i += 1
    assert i == len(got["source"])


def test_revenue_cube_brute():
    o = pq.read_table(f"{SF}/orders.parquet").to_pydict()
    c = pq.read_table(f"{SF}/customer.parquet").to_pydict()
    n = pq.read_table(f"{SF}/nation.parquet").to_pydict()
    nk_of = dict(zip(c["c_custkey"], c["c_nationkey"]))
    nm_of = dict(zip(n["n_nationkey"], n["n_name"]))
    cube: dict[tuple, int] = {}
    for ck, dt, tp in zip(o["o_custkey"], o["o_orderdate"],
                          o["o_totalprice"]):
        nm, yr = nm_of[nk_of[ck]], dt.year
        cents = int(np.floor(tp * 100 + 0.5))
        for key in ((nm, yr), (nm, -1), ("ALL", yr), ("ALL", -1)):
            cube[key] = cube.get(key, 0) + cents
    got = queries_ts.q_revenue_cube(SF).to_pydict()
    assert len(got["n_name"]) == len(cube)
    for nm, yr, rc in zip(got["n_name"], got["o_year"],
                          got["revenue_cents"]):
        assert cube[(nm, yr)] == rc
    # grand total row equals the sum over base rows
    base = sum(v for (nm, yr), v in cube.items()
               if nm != "ALL" and yr != -1)
    assert cube[("ALL", -1)] == base


def test_theilsen_trend_brute(ray_session):
    """Median pairwise slope == from-scratch Python loop over the daily
    count dict (trunc division, rank-ceil(P/2) median), plus the
    robustness property that defines Theil-Sen: slope bounded by the
    extreme pair slopes."""
    ev = _events()
    daily: dict[str, Counter] = {}
    for t, ts in zip(ev["event_type"], ev["ts"]):
        us = np.datetime64(ts, "us").astype(np.int64)
        daily.setdefault(t, Counter())[int(us // 86_400_000_000)] += 1
    got = queries_ts.q_theilsen_trend(SF).to_pydict()
    assert got["event_type"] == sorted(daily)
    for t, nd, npair, sl in zip(got["event_type"], got["n_days"],
                                got["n_pairs"], got["slope_micro"]):
        seq = sorted(daily[t].items())
        assert nd == len(seq)
        slopes = []
        for i in range(len(seq)):
            for j in range(i + 1, len(seq)):
                num = (seq[j][1] - seq[i][1]) * 1_000_000
                den = seq[j][0] - seq[i][0]
                q = abs(num) // den
                slopes.append(q if num >= 0 else -q)
        assert npair == len(slopes)
        if slopes:
            slopes.sort()
            want = slopes[(len(slopes) + 1) // 2 - 1]
            assert sl == want
            assert slopes[0] <= sl <= slopes[-1]
        else:
            assert sl == 0


def test_peak_hour_brute(ray_session):
    ev = _events()
    cnt: dict[str, Counter] = {}
    for t, ts in zip(ev["event_type"], ev["ts"]):
        us = np.datetime64(ts, "us").astype(np.int64)
        cnt.setdefault(t, Counter())[int(us // 3_600_000_000)] += 1
    got = queries_ts.q_peak_hour(SF).to_pydict()
    assert got["event_type"] == sorted(cnt)
    for t, h, n in zip(got["event_type"], got["peak_hour"],
                       got["n_peak"]):
        want = min(((-c, hh) for hh, c in cnt[t].items()))
        assert (h, n) == (want[1], -want[0])


def test_rolling_median_brute(ray_session):
    ev = _events()
    daily: dict[str, Counter] = {}
    for t, ts in zip(ev["event_type"], ev["ts"]):
        us = np.datetime64(ts, "us").astype(np.int64)
        daily.setdefault(t, Counter())[int(us // 86_400_000_000)] += 1
    got = queries_ts.q_rolling_median(SF).to_pydict()
    idx = 0
    for t in sorted(daily):
        seq = sorted(daily[t].items())
        ns = [n for _, n in seq]
        for i, (d, _n) in enumerate(seq):
            w = sorted(ns[max(0, i - 6):i + 1])
            assert (got["event_type"][idx], got["day"][idx],
                    got["med"][idx]) == (t, d, w[(len(w) + 1) // 2 - 1])
            idx += 1
    assert idx == len(got["day"])


def test_new_users_and_vocab_coverage_brute(ray_session):
    ev = _events()
    first: dict[int, int] = {}
    for u, ts in zip(ev["user_id"], ev["ts"]):
        us = np.datetime64(ts, "us").astype(np.int64)
        d = int(us // 86_400_000_000)
        if u not in first or d < first[u]:
            first[u] = d
    want = Counter(first.values())
    got = queries_ts.q_new_users_daily(SF).to_pandas()
    assert dict(zip(got.day, got.n_new_users)) == dict(want)
    assert int(got.n_new_users.sum()) == len(first)

    docs = _docs()
    c: Counter = Counter()
    for txt in docs["text"]:
        c.update(txt.lower().split())
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    head, total = sum(n for _, n in top), sum(c.values())
    vc = queries_ts.q_vocab_coverage(SF).to_pandas().iloc[0]
    assert (vc.n_terms, vc.head_tokens, vc.total_tokens) == \
        (min(100, len(c)), head, total)
    assert vc.coverage_ppm == head * 1_000_000 // total


def test_locf_and_dow_brute(ray_session):
    ev = _events()
    daily: dict[str, Counter] = {}
    for t, ts in zip(ev["event_type"], ev["ts"]):
        us = np.datetime64(ts, "us").astype(np.int64)
        daily.setdefault(t, Counter())[int(us // 86_400_000_000)] += 1
    days = sorted({d for c in daily.values() for d in c})
    spine = list(range(days[0], days[-1] + 1))
    got = queries_ts.q_locf_fill(SF).to_pandas()
    assert len(got) == len(spine) * len(daily)
    for t, g in got.groupby("event_type"):
        g = g.sort_values("day")
        last = 0
        for r in g.itertuples():
            if daily[t].get(r.day) is not None:
                last = daily[t][r.day]
                assert r.is_gap == 0
            else:
                assert r.is_gap == 1
            assert r.filled == last
    dow = queries_ts.q_dow_seasonality(SF).to_pandas() \
        .set_index("event_type")
    for t, c in daily.items():
        w = Counter()
        for d, n in c.items():
            w[d % 7] += n
        tot = sum(w.values())
        chi = sum((7 * w.get(k, 0) - tot) ** 2 for k in range(7))
        assert (dow.loc[t].n_events, dow.loc[t].chi2_num) == (tot, chi)


def test_behavior_census_brute(ray_session):
    ev = _events()
    bits = queries_ts.EVENT_TYPE_BITS
    masks: dict[tuple, int] = {}
    for u, t, ts in zip(ev["user_id"], ev["event_type"], ev["ts"]):
        us = np.datetime64(ts, "us").astype(np.int64)
        k = (u, int(us // 86_400_000_000))
        masks[k] = masks.get(k, 0) | bits[t]
    want = Counter(masks.values())
    got = queries_ts.q_behavior_census(SF).to_pandas()
    assert dict(zip(got["mask"], got.n_user_days)) == dict(want)
    assert int(got.n_user_days.sum()) == len(masks)


def test_session_type_pairs_brute(ray_session):
    from itertools import combinations

    ev = _events()
    per_user: dict = {}
    for u, t, ts in zip(ev["user_id"], ev["event_type"], ev["ts"]):
        us = int(np.datetime64(ts, "us").astype(np.int64))
        per_user.setdefault(u, []).append((us, t))
    sessions = []
    for u, rows in per_user.items():
        rows.sort()
        cur: set = set()
        last = None
        for us, t in rows:
            if last is not None and us - last > 1_800_000_000:
                sessions.append(cur)
                cur = set()
            cur.add(t)
            last = us
        sessions.append(cur)
    ns = len(sessions)
    marg = Counter(t for s in sessions for t in s)
    co = Counter()
    for s in sessions:
        for a, b in combinations(sorted(s), 2):
            co[(a, b)] += 1
    got = queries_ts.q_session_type_pairs(SF).to_pandas()
    assert len(got) == len(co)
    for r in got.itertuples():
        k = (r.type_a, r.type_b)
        assert co[k] == r.n_sessions
        assert r.lift_micro == \
            co[k] * ns * 1_000_000 // (marg[r.type_a] * marg[r.type_b])


def test_session_attribution_brute(ray_session):
    ev = _events()
    per_user: dict = {}
    for u, t, ts, eid in zip(ev["user_id"], ev["event_type"],
                             ev["ts"], ev["event_id"]):
        us = int(np.datetime64(ts, "us").astype(np.int64))
        per_user.setdefault(u, []).append((us, eid, t))
    stats: dict = {}
    for u, rows in per_user.items():
        rows.sort()
        sessions = []
        cur = []
        last = None
        for us, eid, t in rows:
            if last is not None and us - last > 1_800_000_000:
                sessions.append(cur)
                cur = []
            cur.append(t)
            last = us
        sessions.append(cur)
        for s in sessions:
            ft = s[0]
            np_ = sum(1 for t in s if t == "purchase")
            ns, nc, tot = stats.get(ft, (0, 0, 0))
            stats[ft] = (ns + 1, nc + (np_ > 0), tot + np_)
    got = queries_ts.q_session_attribution(SF).to_pandas()
    assert len(got) == len(stats)
    for r in got.itertuples():
        assert stats[r.first_type] == \
            (r.n_sessions, r.n_conv_sessions, r.n_purchases)
    # census totals = total session count
    assert int(got.n_sessions.sum()) == sum(v[0] for v in stats.values())


def test_peak_concurrency_brute(ray_session):
    ev = _events()
    per_user: dict = {}
    for u, ts in zip(ev["user_id"], ev["ts"]):
        us = int(np.datetime64(ts, "us").astype(np.int64))
        per_user.setdefault(u, []).append(us)
    deltas = []
    for u, times in per_user.items():
        times.sort()
        s0 = times[0]
        last = times[0]
        for t in times[1:]:
            if t - last > 1_800_000_000:
                deltas.append((s0, 1))
                deltas.append((last, -1))
                s0 = t
            last = t
        deltas.append((s0, 1))
        deltas.append((last, -1))
    deltas.sort(key=lambda x: (x[0], -x[1]))   # +1 before -1 at ties
    c = peak = 0
    t_peak = None
    for t, d in deltas:
        c += d
        if c > peak:
            peak, t_peak = c, t
    got = queries_ts.q_peak_concurrency(SF).to_pandas()
    assert len(got) == 1
    assert int(got.peak_concurrency[0]) == peak
    assert int(got.t_peak_us[0]) == t_peak


def test_session_gaps_brute(ray_session):
    ev = _events()
    per_user: dict = {}
    for u, ts in zip(ev["user_id"], ev["ts"]):
        us = int(np.datetime64(ts, "us").astype(np.int64))
        per_user.setdefault(u, []).append(us)
    want = {}
    for u, times in per_user.items():
        times.sort()
        bounds = []
        s0 = last = times[0]
        for t in times[1:]:
            if t - last > 1_800_000_000:
                bounds.append((s0, last))
                s0 = t
            last = t
        bounds.append((s0, last))
        gaps = [bounds[i + 1][0] - bounds[i][1]
                for i in range(len(bounds) - 1)]
        want[u] = (len(bounds), sum(gaps), max(gaps) if gaps else 0)
    got = queries_ts.q_session_gaps(SF).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.user_id] == \
            (r.n_sessions, r.sum_gap_us, r.max_gap_us)


def test_user_tenure_brute(ray_session):
    ev = _events()
    days: dict = {}
    nev: Counter = Counter()
    for u, ts in zip(ev["user_id"], ev["ts"]):
        us = int(np.datetime64(ts, "us").astype(np.int64))
        days.setdefault(u, set()).add(us // 86_400_000_000)
        nev[u] += 1
    got = queries_ts.q_user_tenure(SF).to_pandas()
    assert len(got) == len(days)
    for r in got.itertuples():
        d = days[r.user_id]
        assert (r.first_day, r.last_day, r.span_days,
                r.n_active_days, r.n_events) == \
            (min(d), max(d), max(d) - min(d) + 1, len(d),
             nev[r.user_id])
