"""Brute-force cross-checks for queries_fuzzy + the new queries_ts
members (trend_slope, changepoint) at sf0.001 — independent scalar
reimplementations (full O(V²) DP Levenshtein, Counter sums)."""
from collections import Counter

import numpy as np
import pyarrow.parquet as pq

from grandine_ray.pipelines import queries_fuzzy, queries_ts

SF = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    """Classic full DP Levenshtein (independent of the two-pointer)."""
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def test_typo_pairs_brute(ray_session):
    t = pq.read_table(f"{SF}/part.parquet", columns=["p_name", "p_brand"])
    labels = sorted({f"{n} {b}" for n, b in zip(t["p_name"].to_pylist(),
                                                t["p_brand"].to_pylist())})
    want = set()
    for i, a in enumerate(labels):
        for b in labels[i + 1:]:
            if abs(len(a) - len(b)) <= 1 and _lev(a, b) <= 1:
                want.add((a, b))
    got = queries_fuzzy.q_typo_pairs(SF).to_pandas()
    got_pairs = set(zip(got.s_a, got.s_b))
    assert got_pairs == want
    assert len(want) > 0  # fixture must exercise the operator


def test_lev_le1_matches_dp():
    words = ["", "a", "ab", "abc", "abd", "acb", "bbc", "abcd", "xabc",
             "abxc", "aabc", "abca"]
    for a in words:
        for b in words:
            if a == b:
                continue
            assert queries_fuzzy._lev_le1(a, b) == (_lev(a, b) <= 1), (a, b)


def test_simpson_diversity_brute(ray_session):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"])
    per: dict[str, Counter] = {}
    for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        toks = txt.strip().lower().split()
        if toks:
            per.setdefault(s, Counter()).update(toks)
    got = queries_fuzzy.q_simpson_diversity(SF).to_pandas()
    assert sorted(got.source) == sorted(per)
    for r in got.itertuples():
        c = per[r.source]
        assert r.n_tokens == sum(c.values())
        assert r.n_distinct == len(c)
        assert r.collision_sum == sum(v * v for v in c.values())


def _daily(sf):
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["ts", "event_type"]).to_pydict()
    cnt: dict[str, Counter] = {}
    for ts, t in zip(ev["ts"], ev["event_type"]):
        day = int(np.datetime64(ts, "us").astype(np.int64)
                  // 86_400_000_000)
        cnt.setdefault(t, Counter())[day] += 1
    return cnt


def test_trend_slope_brute(ray_session):
    cnt = _daily(SF)
    got = queries_ts.q_trend_slope(SF).to_pydict()
    assert got["event_type"] == sorted(cnt)
    for i, t in enumerate(got["event_type"]):
        xs = sorted(cnt[t])
        n = len(xs)
        sx = sum(xs)
        sy = sum(cnt[t].values())
        sxy = sum(d * cnt[t][d] for d in xs)
        sx2 = sum(d * d for d in xs)
        assert got["n_days"][i] == n
        assert got["sum_x"][i] == sx
        assert got["sum_y"][i] == sy
        assert got["sum_xy"][i] == sxy
        assert got["sum_x2"][i] == sx2
        assert got["slope_num"][i] == n * sxy - sx * sy
        assert got["slope_den"][i] == n * sx2 - sx * sx


def test_changepoint_brute(ray_session):
    cnt = _daily(SF)
    got = queries_ts.q_changepoint(SF).to_pydict()
    assert got["event_type"] == sorted(cnt)
    for i, t in enumerate(got["event_type"]):
        xs = sorted(cnt[t])
        D = len(xs)
        tot = sum(cnt[t].values())
        best = None
        s = 0
        for k, d in enumerate(xs, 1):
            s += cnt[t][d]
            score = abs(D * s - k * tot)
            cand = (-score, d)
            if best is None or cand < best:
                best = cand
        assert got["cp_day"][i] == best[1]
        assert got["score"][i] == -best[0]
