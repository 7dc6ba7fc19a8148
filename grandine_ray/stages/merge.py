"""Per-tile feature merging (reference lib/spatial/merge.go:6-114).

Groups features by exact props equality, then iteratively concatenates
LineStrings whose endpoints touch (fixpoint). Only LineStrings merge.
Determinism: callers must pre-sort features canonically (doc_id, span_idx)
— the fixpoint result depends on input order (SURVEY §7.5).
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
        while len(bucket) > 1:
            start = len(bucket)
            bucket = _search_and_merge(bucket)
            if len(bucket) == start:
                break
        out.extend(bucket)
    return out


def _search_and_merge(fts: list[dict]) -> list[dict]:
    ignore: set[int] = set()
    for ref_id in range(len(fts)):
        if ref_id in ignore:
            continue
        for i, ft in enumerate(fts):
            if i in ignore or i == ref_id:
                continue
            if ft["type"] != fts[ref_id]["type"] or ft["type"] != 2:
                continue
            merged = _merge_lines(fts[ref_id]["rings"][0], ft["rings"][0])
            if merged is not None:
                fts[ref_id] = {**fts[ref_id], "rings": [merged]}
                ignore.add(i)
    return [ft for pos, ft in enumerate(fts) if pos not in ignore]


def _merge_lines(l1: np.ndarray, l2: np.ndarray):
    """merge.go:106-114: tail-to-head concatenation only."""
    if (l1[-1] == l2[0]).all():
        return np.vstack([l1, l2[1:]])
    if (l2[-1] == l1[0]).all():
        return np.vstack([l2, l1[1:]])
    return None
