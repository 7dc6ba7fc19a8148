"""Per-tile feature merging (reference lib/spatial/merge.go:6-114).

Groups features by exact props equality, then concatenates LineStrings
whose endpoints touch. Only LineStrings merge.

This is an EXACT simulation of the reference algorithm — including its
order-dependent tie-breaks when several line endpoints collide — made
near-linear with endpoint hash indexes:

  * ``MergeFeatures`` (merge.go:6-29): per props-bucket, repeat
    ``searchAndMerge`` until the bucket length stops shrinking;
  * ``searchAndMerge`` (merge.go:68-104): for each feature (ascending
    position, skipping ignored), scan the remaining features ascending;
    on a match extend the current line IN PLACE (``l1+l2[1:]`` when
    l1.last == l2.first is tested FIRST, else ``l2+l1[1:]``) and keep
    scanning FORWARD from the matched index — a hash lookup of the
    current endpoints plus a min-index filter reproduces that scan
    without touching non-matching features.

Each merge consumes one feature, so total work is O(n + collisions)
per round instead of the reference's O(n²) pairwise scan — required
because low-zoom tiles hold the whole corpus in one group — while the
chosen pairings (and therefore output bytes) are identical
(tests/test_mvt.py::test_merge_endpoint_collision_parity checks against
a literal transcription of the Go loop).
"""
from __future__ import annotations

import numpy as np


def merge_features(feats: list[dict]) -> list[dict]:
    """feats: [{"props": hashable-key, "type": int, "rings": [np.ndarray]}].

    Returns the merged list; non-line geometries pass through unchanged.
    """
    if len(feats) <= 1:
        return feats

    buckets: list[list[dict]] = []
    keys: list = []
    for ft in feats:
        for i, k in enumerate(keys):
            if k == ft["props"]:
                buckets[i].append(ft)
                break
        else:
            keys.append(ft["props"])
            buckets.append([ft])

    out: list[dict] = []
    for bucket in buckets:
        # reference fixpoint (merge.go:13-23): repeat until no shrink.
        # _search_and_merge reports whether any head/tail match remains in
        # its final index, so converged buckets skip the confirming round
        # (a round that finds nothing is a full dict rebuild — measured 2x
        # merge cost on deep tile pyramids).
        while len(bucket) > 1:
            bucket, more = _search_and_merge(bucket)
            if not more:
                break
        out.extend(bucket)
    return out


def _search_and_merge(fts: list[dict]):
    """One ``searchAndMerge`` round (merge.go:68-104), hash-accelerated.

    Returns (surviving features, any-match-remains flag)."""
    n = len(fts)
    line_idx = [i for i in range(n) if fts[i]["type"] == 2]
    if len(line_idx) < 2:
        return fts, False
    ignored = [False] * n
    heads: dict[tuple, list[int]] = {}
    tails: dict[tuple, list[int]] = {}
    rings: dict[int, np.ndarray] = {}
    merged_flag: dict[int, bool] = {}
    for i in line_idx:
        r = fts[i]["rings"][0]
        rings[i] = r
        heads.setdefault((r[0, 0], r[0, 1]), []).append(i)
        tails.setdefault((r[-1, 0], r[-1, 1]), []).append(i)
    # no endpoint is both a head and a tail ⇒ no merge can ever happen
    if not heads.keys() & tails.keys():
        return fts, False

    for ref in line_idx:
        if ignored[ref]:
            continue
        ring = rings[ref]
        first = tuple(ring[0])
        last = tuple(ring[-1])
        fronts: list[np.ndarray] = []   # latest prepend first
        backs: list[np.ndarray] = [ring]
        pos = -1
        changed = False
        while True:
            cands = [i for i in heads.get(last, ())
                     if not ignored[i] and i != ref and i > pos]
            cands += [i for i in tails.get(first, ())
                      if not ignored[i] and i != ref and i > pos]
            if not cands:
                break
            i = min(cands)
            r_i = rings[i]
            # mergeLines order (merge.go:106-113): l1.last==l2.first first
            if tuple(r_i[0]) == last:
                backs.append(r_i[1:])
                last = tuple(r_i[-1])
            else:
                fronts.insert(0, r_i)
                first = tuple(r_i[0])
            ignored[i] = True
            heads[tuple(r_i[0])].remove(i)
            tails[tuple(r_i[-1])].remove(i)
            pos = i
            changed = True
        if changed:
            old_first = tuple(ring[0])
            old_last = tuple(ring[-1])
            parts = fronts[:1] + [p[1:] for p in fronts[1:]] + (
                [backs[0][1:] if fronts else backs[0]] + backs[1:]
                if fronts else backs
            )
            new_ring = np.vstack(parts)
            rings[ref] = new_ring
            merged_flag[ref] = True
            # later refs must see ref's CURRENT endpoints (Go mutates
            # fts[refID] in place)
            heads[old_first].remove(ref)
            tails[old_last].remove(ref)
            heads.setdefault(tuple(new_ring[0]), []).append(ref)
            tails.setdefault(tuple(new_ring[-1]), []).append(ref)

    # does any (head, tail) match survive in the final index? (decides
    # whether the caller needs another round; Go's rerun would find
    # exactly these)
    more = False
    for key, hl in heads.items():
        live_h = [i for i in hl if not ignored[i]]
        if not live_h:
            continue
        for j in tails.get(key, ()):
            if not ignored[j] and (len(live_h) > 1 or live_h[0] != j):
                more = True
                break
        if more:
            break

    out: list[dict] = []
    for posi in range(n):
        if ignored[posi]:
            continue
        ft = fts[posi]
        if posi in merged_flag:
            ft = {**ft, "rings": [rings[posi]], "merged": True}
        out.append(ft)
    return out, more
