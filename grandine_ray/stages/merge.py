"""Per-tile feature merging (reference lib/spatial/merge.go:6-114).

Groups features by exact props equality, then concatenates LineStrings
whose endpoints touch. Only LineStrings merge. Determinism: callers
pre-sort features canonically (doc_id, span_idx) — the reference fixpoint
result depends on input order (SURVEY §7.5).

Divergence from the reference, by design: merging is hash-chained (O(n))
rather than the O(n²) pairwise fixpoint of merge.go:68-104 — required
because low-zoom tiles hold the whole corpus in one group. When endpoints
are unique the maximal chains are identical; when several lines share an
endpoint (possible after clipping to tile borders) both algorithms pick an
arbitrary-but-deterministic matching, and ours picks by lowest input index.
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
        out.extend(_chain_merge(bucket))
    return out


def _chain_merge(fts: list[dict]) -> list[dict]:
    """Hash-chained tail-to-head merging — O(n) instead of the reference's
    O(n²) pairwise fixpoint (merge.go:68-104). Produces the same maximal
    chains when line endpoints are unique; with duplicate endpoints the
    lowest input index is chosen deterministically (input is canonically
    pre-sorted by the callers).
    """
    lines = [i for i, ft in enumerate(fts) if ft["type"] == 2]
    if len(lines) < 2:
        return fts
    heads: dict[tuple, list[int]] = {}
    tails: dict[tuple, list[int]] = {}
    for i in lines:
        ring = fts[i]["rings"][0]
        heads.setdefault(tuple(ring[0]), []).append(i)
        tails.setdefault(tuple(ring[-1]), []).append(i)

    used: set[int] = set()
    merged_out: dict[int, dict] = {}
    for i in lines:
        if i in used:
            continue
        # only start a chain from a line whose head extends no unused tail,
        # so every chain is maximal; pure cycles fall through below
        ring = fts[i]["rings"][0]
        if any(j not in used and j != i for j in tails.get(tuple(ring[0]), [])):
            continue
        used.add(i)
        parts = [ring]
        tail = tuple(ring[-1])
        while True:
            nxt = next((j for j in heads.get(tail, []) if j not in used), None)
            if nxt is None:
                break
            used.add(nxt)
            parts.append(fts[nxt]["rings"][0][1:])
            tail = tuple(fts[nxt]["rings"][0][-1])
        if len(parts) > 1:
            merged_out[i] = {**fts[i], "rings": [np.vstack(parts)], "merged": True}
        else:
            merged_out[i] = fts[i]
    # cycles: remaining unused lines form closed loops; merge each loop
    for i in lines:
        if i in used:
            continue
        used.add(i)
        ring = fts[i]["rings"][0]
        parts = [ring]
        tail = tuple(ring[-1])
        while True:
            nxt = next((j for j in heads.get(tail, []) if j not in used), None)
            if nxt is None:
                break
            used.add(nxt)
            parts.append(fts[nxt]["rings"][0][1:])
            tail = tuple(fts[nxt]["rings"][0][-1])
        if len(parts) > 1:
            merged_out[i] = {**fts[i], "rings": [np.vstack(parts)], "merged": True}
        else:
            merged_out[i] = fts[i]

    out = []
    for pos, ft in enumerate(fts):
        if ft["type"] != 2:
            out.append(ft)
        elif pos in merged_out:
            out.append(merged_out[pos])
    return out
