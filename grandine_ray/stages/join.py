"""Spatial joins / lookups (SURVEY §2.5 J3-J5, NORTH-RULE EXT).

* Point-in-polygon join: the polygon side (small) is broadcast once via
  ``ray.put``; each actor builds an STR R-tree over polygon bboxes in
  ``__init__`` (X5 — build once, reuse across Arrow batches) and streams
  point batches through vectorized candidate filtering + exact PIP
  (reference semantics, point.go:72-101).
* kNN by Haversine (J4): exact — queries broadcast, per-batch vectorized
  distance matrix → partial top-k per (query, batch), then a small
  groupby(query_id) top-k. The cell-partitioned neighbor-ring variant is
  the both-sides-huge scale path (documented; partitioning assumption:
  query set fits in one broadcast object).
* BBox join: interval-overlap join against broadcast bboxes (SQL-checkable).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..geom import wkb as wkbmod
from ..geom.ops import haversine_m
from ..geom.predicates import points_in_polygon
from ..index import xyz
from ..index.rtree import STRtree


def polygons_payload(ids: list, wkb_blobs: list[bytes]) -> dict:
    """Build the broadcastable polygon-side payload ONCE on the driver:
    bboxes + compiled PIP segment constants (flat arrays via the fully
    vectorized ragged compile — one object through ray.put, zero-copy
    views per polygon on workers)."""
    from ..geom.predicates import compile_polygons_ragged

    gb = wkbmod.decode_wkb_batch(wkb_blobs)
    return {
        "ids": list(ids),
        "bboxes": gb.bboxes(),
        "compiled": compile_polygons_ragged(
            gb.coords, gb.ring_offsets, gb.geom_offsets
        ),
    }


PIP_CELL_ZOOM = 6  # candidate grid: 64×64 world cells (tunable per density)


class PIPJoiner:
    """map_batches actor: point batches → (point doc_id/span_idx, polygon id).

    Candidate generation is cell-bucketed: each actor builds (once, in
    __init__) a z-level XYZ-cell → polygon-index bucket map from the
    broadcast polygon payload, so a batch of P points against M polygons
    costs Σ_cell |points(cell)|·|polys(cell)| instead of P·M. The exact
    test keeps the reference PIP semantics (points_in_polygon).

    Expects point batches with columns doc_id, span_idx, bbox_minx (=x),
    bbox_miny (=y) — points only.
    """

    def __init__(self, poly_ref, cell_zoom: int = PIP_CELL_ZOOM):
        from ..geom.predicates import compile_polygons

        payload = ray.get(poly_ref) if isinstance(poly_ref, ray.ObjectRef) else poly_ref
        self.ids = payload["ids"]
        self.comp = payload.get("compiled")
        if self.comp is None:
            self.comp = compile_polygons(payload["rings"])
        self._views: dict[int, object] = {}  # lazy per-polygon views
        self.bboxes = payload["bboxes"]
        self.zoom = cell_zoom
        cells = payload.get("cells")
        if cells is None:
            cells = build_cell_index(self.bboxes, cell_zoom)
        # sorted-key arrays straight from plasma (zero-copy; O(log n)
        # searchsorted lookup — no per-worker dict build over all cells)
        self.cell_keys = cells["keys"]
        self.cell_off = cells["off"]
        self.cell_poly = cells["poly_idx"]

    def _view(self, pi: int):
        v = self._views.get(pi)
        if v is None:
            from ..geom.predicates import polygon_view

            v = self._views[pi] = polygon_view(self.comp, pi)
        return v

    def _cell_polys(self, key: int):
        j = np.searchsorted(self.cell_keys, key)
        if j >= len(self.cell_keys) or self.cell_keys[j] != key:
            return None
        return self.cell_poly[self.cell_off[j]:self.cell_off[j + 1]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch["bbox_minx"].to_numpy(zero_copy_only=False)
        py = batch["bbox_miny"].to_numpy(zero_copy_only=False)

        out_doc: list[np.ndarray] = []  # hit index arrays
        out_poly: list[str] = []
        if len(px):
            cx, cy = xyz.tile_xy(px, py, self.zoom)
            pkeys = (cx << np.int64(32)) | cy
            order = np.argsort(pkeys, kind="stable")
            sk = pkeys[order]
            uniq, starts = np.unique(sk, return_index=True)
            bounds = np.append(starts, len(sk))
            for ci in range(len(uniq)):
                polys = self._cell_polys(int(uniq[ci]))
                if polys is None or not len(polys):
                    continue
                sel = order[bounds[ci]:bounds[ci + 1]]
                spx = px[sel]
                spy = py[sel]
                for pi in polys.tolist():
                    bb = self.bboxes[pi]
                    m = (spx >= bb[0]) & (spx <= bb[2]) & (spy >= bb[1]) & (spy <= bb[3])
                    if not m.any():
                        continue
                    cand = sel[m]
                    inside = points_in_polygon(
                        px[cand], py[cand], None, compiled=self._view(pi)
                    )
                    hits = cand[inside]
                    if len(hits):
                        out_doc.append(hits)
                        out_poly.extend([self.ids[pi]] * len(hits))
        hit_idx = (
            np.concatenate(out_doc) if out_doc else np.empty(0, dtype=np.int64)
        )
        take = pa.array(hit_idx)
        return pa.table(
            {
                "doc_id": batch["doc_id"].take(take),
                "span_idx": batch["span_idx"].take(take),
                "polygon_id": pa.array(out_poly, pa.string()),
            }
        )


def build_cell_index(bboxes: np.ndarray, cell_zoom: int) -> dict:
    """cell key → polygon indices as flat sorted arrays (broadcastable)."""
    if not len(bboxes):
        return {"keys": np.empty(0, np.int64), "off": np.zeros(1, np.int64),
                "poly_idx": np.empty(0, np.int64)}
    row, cx, cy = xyz.coverage_flatmap(
        bboxes[:, 0], bboxes[:, 1], bboxes[:, 2], bboxes[:, 3], cell_zoom
    )
    keys = (cx << np.int64(32)) | cy
    order = np.argsort(keys, kind="stable")
    keys_s = keys[order]
    uniq, starts = np.unique(keys_s, return_index=True)
    off = np.append(starts, len(keys_s)).astype(np.int64)
    return {"keys": uniq, "off": off, "poly_idx": row[order]}


_JOINER_CACHE: dict = {}


def _cached_joiner(ref) -> "PIPJoiner":
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    j = _JOINER_CACHE.get(key)
    if j is None:
        _JOINER_CACHE.clear()  # one live join side per worker is enough
        j = _JOINER_CACHE[key] = PIPJoiner(ref)
    return j


def pip_join(points_ds, poly_ids, poly_wkbs, concurrency=None,
             cell_zoom: int = PIP_CELL_ZOOM):
    """Runs as stateless tasks with a per-worker-process singleton joiner:
    long-lived Ray workers cache the broadcast index after the first batch
    (actor-pool semantics without pool spin-up or per-actor init storms)."""
    payload = polygons_payload(poly_ids, poly_wkbs)
    # strip the per-polygon ring objects (21k small arrays would pickle per
    # worker); ship only flat arrays + fixed-width-unicode ids — zero-copy
    slim = {
        "ids": np.asarray(payload["ids"]),
        "bboxes": payload["bboxes"],
        "compiled": payload["compiled"],
        "cells": build_cell_index(payload["bboxes"], cell_zoom),
    }
    ref = ray.put(slim)

    def join_batch(batch: pa.Table) -> pa.Table:
        return _cached_joiner(ref)(batch)

    return points_ds.map_batches(join_batch, batch_format="pyarrow")


BROADCAST_MAX_POLYS = 200_000
BROADCAST_MAX_BYTES = 256 << 20


@ray.remote
def _slim_payload_task(cell_zoom: int, *blocks) -> dict:
    """Build the broadcast polygon payload from BLOCKS, on a worker: the
    driver passes block refs and receives back an object-store ref — it
    never holds a polygon row (VERDICT r2 wrong #1)."""
    tables = [b for b in blocks if b.num_rows]
    t = pa.concat_tables(tables) if tables else pa.table(
        {"doc_id": pa.array([], pa.string()),
         "span_idx": pa.array([], pa.int32()),
         "geom_wkb": pa.array([], pa.binary())})
    ids = [f"{d}#{s}" for d, s in zip(t["doc_id"].to_pylist(),
                                      t["span_idx"].to_pylist())]
    payload = polygons_payload(ids, t["geom_wkb"].to_pylist())
    return {
        "ids": np.asarray(payload["ids"]),
        "bboxes": payload["bboxes"],
        "compiled": payload["compiled"],
        "cells": build_cell_index(payload["bboxes"], cell_zoom),
    }


def pip_join_auto(points_ds, polys_ds, cell_zoom: int = PIP_CELL_ZOOM,
                  broadcast_max_polys: int = BROADCAST_MAX_POLYS,
                  broadcast_max_bytes: int = BROADCAST_MAX_BYTES,
                  force: str | None = None):
    """Size-switched PIP join over two features datasets.

    The polygon side is pinned (``materialize()`` — blocks stay in the
    object store, NOT on the driver) and its count/byte size read from
    block metadata. Small side → broadcast join with the payload compiled
    in a worker task from the block refs; large side →
    :func:`pip_join_partitioned` (both sides shuffle by cell). ``force``
    ("broadcast" | "partitioned") pins a path for tests.
    """
    mat = polys_ds.materialize()
    n_polys = mat.count()
    n_bytes = mat.size_bytes() or 0
    mode = force or (
        "broadcast"
        if n_polys <= broadcast_max_polys and n_bytes <= broadcast_max_bytes
        else "partitioned"
    )
    if mode == "partitioned":
        return pip_join_partitioned(points_ds, mat, cell_zoom)
    ref = _slim_payload_task.remote(cell_zoom, *mat.get_internal_block_refs())

    def join_batch(batch: pa.Table) -> pa.Table:
        return _cached_joiner(ref)(batch)

    return points_ds.map_batches(join_batch, batch_format="pyarrow")


def pip_join_bruteforce(points, polys) -> set:
    """O(n·m) oracle: points [(doc_id, span_idx, x, y)], polys [(id, rings)]."""
    out = set()
    for did, sidx, x, y in points:
        for pid, rings in polys:
            from ..geom.predicates import point_in_rings

            if point_in_rings(x, y, rings):
                out.add((did, sidx, pid))
    return out


def pip_join_partitioned(points_ds, polys_ds, cell_zoom: int = PIP_CELL_ZOOM,
                         hot_cells=None, salt_k: int = 8):
    """Both-sides-large PIP join: partition BOTH sides by XYZ cell.

    Points hash to their single cell; polygons are replicated to every
    cell their bbox covers (coverage flat-map), so each (cell) group joins
    locally — the textbook partitioned spatial join for when the polygon
    side no longer fits in a broadcast object. No duplicate output pairs:
    a point belongs to exactly one cell.

    Both inputs are features datasets (doc_id, span_idx, geom_wkb,
    bbox_*).

    SKEW: ``hot_cells`` (int64 cell keys, e.g. from a sampled count
    pre-pass like pipelines/tiler.detect_hot_cells) splits each hot
    cell's POINTS round-robin over ``salt_k`` sub-groups while the
    polygons covering that cell replicate into all of them — a dense
    urban cell's matmul-equivalent spreads over salt_k workers at the
    cost of shipping its (few) polygons salt_k times. Output is
    identical for any salt (each point still meets every polygon of its
    cell exactly once). ``salt_k`` ≤ 256 (the sub-key is 8 bits).
    """
    if not 1 <= salt_k <= 256:
        raise ValueError("salt_k must be in [1, 256]")
    hot = None
    if hot_cells is not None and len(hot_cells):
        hot = np.unique(np.asarray(hot_cells, dtype=np.int64))

    def pt_cells(batch: pa.Table) -> pa.Table:
        px = batch["bbox_minx"].to_numpy(zero_copy_only=False)
        py = batch["bbox_miny"].to_numpy(zero_copy_only=False)
        cx, cy = xyz.tile_xy(px, py, cell_zoom)
        cell = (cx << np.int64(32)) | cy
        key = cell << np.int64(8)
        if hot is not None:
            mask = np.isin(cell, hot)
            sub = np.arange(len(cell), dtype=np.int64) % salt_k
            key = key | np.where(mask, sub, 0)
        return pa.table(
            {
                "cell": pa.array(key, pa.int64()),
                "side": pa.array(np.zeros(len(px), np.int8), pa.int8()),
                "doc_id": batch["doc_id"],
                "span_idx": batch["span_idx"],
                "x": pa.array(px),
                "y": pa.array(py),
                "geom_wkb": pa.array([b""] * len(px), pa.binary()),
            }
        )

    def poly_cells(batch: pa.Table) -> pa.Table:
        row, cx, cy = xyz.coverage_flatmap(
            batch["bbox_minx"].to_numpy(zero_copy_only=False),
            batch["bbox_miny"].to_numpy(zero_copy_only=False),
            batch["bbox_maxx"].to_numpy(zero_copy_only=False),
            batch["bbox_maxy"].to_numpy(zero_copy_only=False),
            cell_zoom,
        )
        cell = (cx << np.int64(32)) | cy
        key = cell << np.int64(8)
        if hot is not None:
            # rows landing in a hot cell replicate into every salt sub-group
            mask = np.isin(cell, hot)
            reps = np.where(mask, salt_k, 1).astype(np.int64)
            offs = np.cumsum(reps) - reps
            total = int(reps.sum())
            rel = np.arange(total, dtype=np.int64) - np.repeat(offs, reps)
            key = np.repeat(key, reps) | rel
            row = row[np.repeat(np.arange(len(row), dtype=np.int64), reps)]
        take = pa.array(row)
        return pa.table(
            {
                "cell": pa.array(key, pa.int64()),
                "side": pa.array(np.ones(len(key), np.int8), pa.int8()),
                "doc_id": batch["doc_id"].take(take),
                "span_idx": batch["span_idx"].take(take),
                "x": pa.array(np.zeros(len(key))),
                "y": pa.array(np.zeros(len(key))),
                "geom_wkb": batch["geom_wkb"].take(take),
            }
        )

    both = points_ds.map_batches(pt_cells, batch_format="pyarrow").union(
        polys_ds.map_batches(poly_cells, batch_format="pyarrow")
    )

    def join_cell(group: pa.Table) -> pa.Table:
        from ..geom.predicates import CompiledPolygon, points_in_polygon

        side = group["side"].to_numpy(zero_copy_only=False)
        pts = group.filter(pa.array(side == 0))
        polys = group.filter(pa.array(side == 1))
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "span_idx": pa.array([], pa.int32()),
                "polygon_id": pa.array([], pa.string()),
            }
        )
        if pts.num_rows == 0 or polys.num_rows == 0:
            return empty
        px = pts["x"].to_numpy(zero_copy_only=False)
        py = pts["y"].to_numpy(zero_copy_only=False)
        gb = wkbmod.decode_wkb_batch(polys["geom_wkb"].to_pylist())
        pids = [
            f"{d}#{s}" for d, s in zip(polys["doc_id"].to_pylist(),
                                       polys["span_idx"].to_pylist())
        ]
        hit_idx, hit_pid = [], []
        for pi in range(len(gb)):
            cp = CompiledPolygon(gb.rings_of(pi))
            inside = points_in_polygon(px, py, None, compiled=cp)
            sel = np.nonzero(inside)[0]
            if len(sel):
                hit_idx.append(sel)
                hit_pid.extend([pids[pi]] * len(sel))
        if not hit_idx:
            return empty
        take = pa.array(np.concatenate(hit_idx))
        return pa.table(
            {
                "doc_id": pts["doc_id"].take(take),
                "span_idx": pts["span_idx"].take(take),
                "polygon_id": pa.array(hit_pid, pa.string()),
            }
        )

    return both.groupby("cell").map_groups(join_cell, batch_format="pyarrow")


# --------------------------------------------------------------------- kNN


class KnnScorer:
    """Partial top-k Haversine kNN: corpus batches vs broadcast queries."""

    def __init__(self, query_ref, k: int):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.qids = q["ids"]
        self.qx = np.asarray(q["x"], dtype=np.float64)
        self.qy = np.asarray(q["y"], dtype=np.float64)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        cx = batch["bbox_minx"].to_numpy(zero_copy_only=False)
        cy = batch["bbox_miny"].to_numpy(zero_copy_only=False)
        doc_ids = batch["doc_id"].to_pylist()
        span_idx = batch["span_idx"].to_numpy(zero_copy_only=False)
        n = len(cx)
        if n == 0:
            return pa.table({
                "query_id": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.string()),
                "span_idx": pa.array([], pa.int32()),
                "dist_m": pa.array([], pa.float64()),
            })
        k = min(self.k, n)
        rows = {"query_id": [], "doc_id": [], "span_idx": [], "dist_m": []}
        # vectorized distance matrix [nq, n] one query at a time to bound memory
        for qi in range(len(self.qids)):
            d = haversine_m(self.qx[qi], self.qy[qi], cx, cy)
            sel = np.argpartition(d, kth=k - 1)[:k]
            rows["query_id"].extend([self.qids[qi]] * k)
            rows["doc_id"].extend(doc_ids[i] for i in sel)
            rows["span_idx"].extend(int(span_idx[i]) for i in sel)
            rows["dist_m"].extend(d[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], pa.string()),
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "span_idx": pa.array(rows["span_idx"], pa.int32()),
                "dist_m": pa.array(rows["dist_m"], pa.float64()),
            }
        )


def knn_topk_chunked(points_ds, query_ids, qx, qy, k: int = 5,
                     chunk: int = 10_000):
    """Huge-query-set scale path: the exact broadcast kNN applied per query
    chunk so the broadcast object stays bounded; the corpus streams once
    per chunk. Exact (same results as knn_topk), memory O(chunk)."""
    outs = []
    for i in range(0, len(query_ids), chunk):
        outs.append(
            knn_topk(points_ds, query_ids[i:i + chunk], qx[i:i + chunk],
                     qy[i:i + chunk], k=k)
        )
    ds = outs[0]
    for o in outs[1:]:
        ds = ds.union(o)
    return ds


def knn_topk(points_ds, query_ids, qx, qy, k: int = 5, concurrency=None):
    """Exact global kNN: partial per-batch top-k → groupby(query_id) top-k.

    The scorer runs as stateless tasks (no pool startup latency): the query
    payload is broadcast once via ray.put and fetched zero-copy from the
    local object store inside each task.
    """
    ref = ray.put({"ids": list(query_ids), "x": np.asarray(qx), "y": np.asarray(qy)})

    def score(batch: pa.Table) -> pa.Table:
        return KnnScorer(ref, k)(batch)

    partial = points_ds.map_batches(score, batch_format="pyarrow")

    def topk(g: pa.Table) -> pa.Table:
        d = g["dist_m"].to_numpy(zero_copy_only=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        si = g["span_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((si, doc, d))[:k]
        out = g.take(pa.array(order))
        return out.append_column(
            "rank", pa.array(np.arange(1, len(order) + 1, dtype=np.int64)))

    return partial.groupby("query_id").map_groups(topk, batch_format="pyarrow")


# --------------------------------------------------------------- bbox join


class BBoxJoiner:
    """Interval-overlap join of feature bboxes vs broadcast target bboxes.

    The STRtree prunes the target set once per batch (query = the batch's
    overall bbox); the surviving targets are tested with one vectorized
    interval mask over all rows and hits are emitted with a single take —
    no Python loop over rows.
    """

    def __init__(self, targets_ref):
        t = ray.get(targets_ref) if isinstance(targets_ref, ray.ObjectRef) else targets_ref
        self.ids = np.asarray(t["ids"], dtype=object)
        self.tree = STRtree(np.asarray(t["bboxes"], dtype=np.float64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        minx = batch["bbox_minx"].to_numpy(zero_copy_only=False)
        miny = batch["bbox_miny"].to_numpy(zero_copy_only=False)
        maxx = batch["bbox_maxx"].to_numpy(zero_copy_only=False)
        maxy = batch["bbox_maxy"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {"doc_id": pa.array([], pa.string()),
             "span_idx": pa.array([], pa.int32()),
             "target_id": pa.array([], pa.string())}
        )
        if len(minx) == 0:
            return empty
        cand = self.tree.query(minx.min(), miny.min(), maxx.max(), maxy.max())
        if len(cand) == 0:
            return empty
        # [T, N] overlap mask, then one nonzero → (target row, feature row);
        # chunk the target axis so the mask stays bounded for huge target sets
        t_chunk = max(1, 16_000_000 // max(1, len(minx)))
        ti_parts, si_parts = [], []
        for s in range(0, len(cand), t_chunk):
            bb = self.tree.bboxes[cand[s:s + t_chunk]]
            m = ~((minx[None, :] > bb[:, 2:3]) | (maxx[None, :] < bb[:, 0:1])
                  | (miny[None, :] > bb[:, 3:4]) | (maxy[None, :] < bb[:, 1:2]))
            t_i, s_i = np.nonzero(m)
            ti_parts.append(t_i + s)
            si_parts.append(s_i)
        ti = np.concatenate(ti_parts)
        si = np.concatenate(si_parts)
        return pa.table(
            {
                "doc_id": batch["doc_id"].take(pa.array(si)),
                "span_idx": pc.cast(batch["span_idx"].take(pa.array(si)),
                                    pa.int32()),
                "target_id": pa.array(self.ids[cand[ti]], pa.string()),
            }
        )


def bbox_join(features_ds, target_ids, target_bboxes, concurrency=(1, 4)):
    ref = ray.put({"ids": list(target_ids), "bboxes": np.asarray(target_bboxes)})
    return features_ds.map_batches(
        BBoxJoiner, fn_constructor_args=(ref,), batch_format="pyarrow",
        concurrency=concurrency,
    )


# ------------------------------------------------------------- as-of join


def asof_join(left_ds, right_ds, by: str, on: str,
              left_cols: list[str], right_cols: list[str],
              num_partitions: int = 32):
    """Distributed LEFT as-of join: for every left row, attach the right
    row with the greatest ``on`` value ≤ the left row's ``on``, within the
    same ``by`` group (DuckDB ``ASOF LEFT JOIN`` semantics, inclusive).

    Shape: ONE hash shuffle on ``by`` (both sides union-tagged, partition
    = hash(by) % P), then a single block-vectorized merge pass per
    partition — lexsort by (by, on, side) with right rows first at equal
    ``on``, a running maximum of right-row indices, and a group-membership
    check instead of explicit per-group resets (stale carries from the
    previous ``by`` group are masked by one vectorized equality test).
    No per-group Python, no driver materialization; right-side ties on
    (by, on) resolve to the largest right ordinal (deterministic given
    unique right keys).
    """
    P = num_partitions
    lcols = [c for c in left_cols if c not in (by, on)]
    rcols = [c for c in right_cols if c not in (by, on)]

    def tag(side: int, carry: list[str], other: list[str], other_types):
        def fn(b: pa.Table) -> pa.Table:
            n = len(b)
            byv = b[by].to_numpy(zero_copy_only=False)
            cols = {
                by: b[by],
                on: b[on],
                "_side": pa.array(np.full(n, side, np.int8), pa.int8()),
                "_part": pa.array((byv.astype(np.uint64) % np.uint64(P))
                                  .astype(np.int32), pa.int32()),
            }
            for c in carry:
                cols[f"_{side}_{c}"] = b[c]
            for c in other:
                cols[f"_{1 - side}_{c}"] = pa.nulls(n, other_types[c])
            return pa.table(cols)
        return fn

    def _types(ds):
        s = ds.schema()
        return dict(zip(s.names, s.types))

    lschema = _types(left_ds)
    rschema = _types(right_ds)
    unioned = left_ds.map_batches(
        tag(1, lcols, rcols, rschema), batch_format="pyarrow"
    ).union(right_ds.map_batches(
        tag(0, rcols, lcols, lschema), batch_format="pyarrow"))

    def resolve(t: pa.Table) -> pa.Table:
        byv = t[by].to_numpy(zero_copy_only=False)
        onv = t[on].to_numpy(zero_copy_only=False)
        side = t["_side"].to_numpy(zero_copy_only=False)
        n = len(byv)
        order = np.lexsort((side, onv, byv))  # right(0) before left(1)
        by_s, side_s = byv[order], side[order]
        is_right = side_s == 0
        mark = np.where(is_right, np.arange(n), -1)
        last_right = np.maximum.accumulate(mark)
        lrows = np.nonzero(~is_right)[0]
        match = last_right[lrows]
        ok = (match >= 0) & (by_s[np.maximum(match, 0)] == by_s[lrows])
        lorig = order[lrows]
        rorig = order[np.maximum(match, 0)]
        lt = t.take(pa.array(lorig))
        cols = {by: lt[by], on: lt[on]}
        for c in lcols:
            cols[c] = lt[f"_1_{c}"]
        okpa = pa.array(ok)
        for c in rcols:
            matched = t[f"_0_{c}"].take(pa.array(rorig))
            cols[f"right_{c}"] = pc.if_else(okpa, matched,
                                            pa.nulls(len(ok), matched.type))
        return pa.table(cols)

    return unioned.groupby("_part").map_groups(resolve, batch_format="pyarrow")
