"""OSM PBF → features pipeline (reference cmd/spatialize, SURVEY §3.3).

The reference makes three sequential in-process passes over the PBF with
id-keyed hash maps (elemCache, T6). The Ray form replaces the maps with
distributed hash-partitioned joins (J1) — the driver never materializes
node coordinates, assembled lines, or features:

    blobs (blob-parallel decode)
      ├─ tagged nodes matching mapping conds  → point features
      ├─ matched ways (id, refs, mapped tags)
      ├─ matched multipolygon relations (members, mapped tags)
      ├─ ALL ways (id, refs)           [for relation members, semi-join]
      └─ ALL node coords (id, lon, lat)
    join #1 (part = node_id % P):  way-node uses × node coords, resolved
        with one vectorized searchsorted per partition (NOT per node id)
    join #2 (part = way_id % P):   ordered line assembly per use_key via
        lexsort + ListArray.from_arrays (one call per partition)
    join #3 (part = way_id % P):   way props × lines → way features;
        relation members × lines → (rel, ring) rows
    join #4 (part = rel_id % P):   ring rows → multipolygon features
    span_idx: per-(kind, part) counts → driver-side prefix offsets
        (3·P tiny rows) → distributed rank assignment

Assembly semantics mirror spatialize.go:240-330 exactly: ways reversed if
clockwise; `__type=area` consumed into a polygon; relations kept iff
type=multipolygon or __type=area; outer rings forced counter-clockwise,
inner rings clockwise; rings with <3 points dropped; a way referencing a
node absent from the PBF is fatal (spatialize.go:152).

Scale notes (planet-PBF design): every stage is a map_batches or a
P-partition groupby whose group function is vectorized over the whole
partition; the only driver-side collections are the relation-member way-id
set (relations are a ~1% sliver of a planet file; broadcast via ray.put)
and the 3·P span-offset rows.
"""
from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..geom import wkb as wkbmod
from ..geom.ops import is_clockwise
from ..sources import osm
from ..stages.mapping import parse_mapping

DEFAULT_PARTITIONS = 64

_ROLE_OUTER = 0
_ROLE_INNER = 1


@ray.remote
def _member_ids_task(*blocks) -> np.ndarray:
    """Unique relation-member way ids from member BLOCKS, on a worker:
    the driver passes block refs and receives back an object-store ref —
    it never materializes a member row."""
    parts = [b["way_id"].to_numpy(zero_copy_only=False).astype(np.int64)
             for b in blocks if b.num_rows]
    if not parts:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(parts))


def _blob_ds(pbf_path: str) -> rd.Dataset:
    idx = [
        {"path": pbf_path, "off": off, "size": size}
        for off, size, btype in osm.scan_blob_index(pbf_path)
        if btype == "OSMData"
    ]
    return rd.from_items(idx)


def _decode_batch(batch: pa.Table):
    for path, off, size in zip(batch["path"].to_pylist(),
                               batch["off"].to_pylist(),
                               batch["size"].to_pylist()):
        yield osm.decode_block(osm._read_blob(path, off, size))


def _empty_feat_part() -> pa.Table:
    return pa.table({
        "kind": pa.array([], pa.int8()),
        "sort_key": pa.array([], pa.int64()),
        "part": pa.array([], pa.int32()),
        "geom_wkb": pa.array([], pa.binary()),
        "props_json": pa.array([], pa.string()),
    })


def spatialize(pbf_path: str, mapping_yaml: str,
               num_partitions: int = DEFAULT_PARTITIONS) -> rd.Dataset:
    """Returns a features Dataset (same schema as extract/converter).

    ``num_partitions`` sizes the hash-join partitions; one partition's
    rows must fit in a worker's heap (raise it for planet-scale inputs).
    """
    conds = parse_mapping(mapping_yaml)
    blobs = _blob_ds(pbf_path)
    P = num_partitions

    # ---------------- stage A: blob-parallel extraction -------------------

    def node_coords(batch: pa.Table) -> pa.Table:
        ids_l, lons_l, lats_l = [], [], []
        for block in _decode_batch(batch):
            ids, lons, lats, _ = block["nodes"]
            ids_l.append(ids)
            lons_l.append(lons)
            lats_l.append(lats)
        return pa.table(
            {
                "node_id": pa.array(np.concatenate(ids_l) if ids_l else [], pa.int64()),
                "lon": pa.array(np.concatenate(lons_l) if lons_l else []),
                "lat": pa.array(np.concatenate(lats_l) if lats_l else []),
            }
        )

    def tagged_points(batch: pa.Table) -> pa.Table:
        rows = {"node_id": [], "geom_wkb": [], "props_json": []}
        for block in _decode_batch(batch):
            ids, lons, lats, tags = block["nodes"]
            for i, t in enumerate(tags):
                if not t:
                    continue
                for cond in conds:
                    if cond.matches(t):
                        rows["node_id"].append(int(ids[i]))
                        rows["geom_wkb"].append(
                            wkbmod.encode_point(lons[i], lats[i])
                        )
                        rows["props_json"].append(
                            json.dumps(cond.map_props(t), sort_keys=True)
                        )
        return pa.table(
            {
                "node_id": pa.array(rows["node_id"], pa.int64()),
                "geom_wkb": pa.array(rows["geom_wkb"], pa.binary()),
                "props_json": pa.array(rows["props_json"], pa.string()),
            }
        )

    def matched_ways(batch: pa.Table) -> pa.Table:
        rows = {"way_id": [], "refs": [], "props_json": []}
        for block in _decode_batch(batch):
            for wid, refs, tags in block["ways"]:
                for cond in conds:
                    if cond.matches(tags):
                        rows["way_id"].append(wid)
                        rows["refs"].append(refs.tolist())
                        rows["props_json"].append(
                            json.dumps(cond.map_props(tags), sort_keys=True)
                        )
        return pa.table(
            {
                "way_id": pa.array(rows["way_id"], pa.int64()),
                "refs": pa.array(rows["refs"], pa.list_(pa.int64())),
                "props_json": pa.array(rows["props_json"], pa.string()),
            }
        )

    def matched_rels(batch: pa.Table) -> pa.Table:
        rows = {"rel_id": [], "way_id": [], "role": [], "seq": [], "props_json": []}
        for block in _decode_batch(batch):
            for rid, members, tags in block["relations"]:
                for cond in conds:
                    if not cond.matches(tags):
                        continue
                    mapped = cond.map_props(tags)
                    keep = (tags.get("type") == "multipolygon"
                            or mapped.get("__type") == "area"
                            or tags.get("__type") == "area")
                    if not keep:
                        continue
                    pj = json.dumps(mapped, sort_keys=True)
                    for seq, (mid, mtype, role) in enumerate(members):
                        if mtype == osm.WAY and role in ("outer", "inner"):
                            rows["rel_id"].append(rid)
                            rows["way_id"].append(mid)
                            rows["role"].append(
                                _ROLE_OUTER if role == "outer" else _ROLE_INNER
                            )
                            rows["seq"].append(seq)
                            rows["props_json"].append(pj)
        return pa.table(
            {
                "rel_id": pa.array(rows["rel_id"], pa.int64()),
                "way_id": pa.array(rows["way_id"], pa.int64()),
                "role": pa.array(rows["role"], pa.int8()),
                "seq": pa.array(rows["seq"], pa.int32()),
                "props_json": pa.array(rows["props_json"], pa.string()),
            }
        )

    def all_way_refs(batch: pa.Table) -> pa.Table:
        rows = {"way_id": [], "refs": []}
        for block in _decode_batch(batch):
            for wid, refs, tags in block["ways"]:
                rows["way_id"].append(wid)
                rows["refs"].append(refs.tolist())
        return pa.table(
            {
                "way_id": pa.array(rows["way_id"], pa.int64()),
                "refs": pa.array(rows["refs"], pa.list_(pa.int64())),
            }
        )

    nodes = blobs.map_batches(node_coords, batch_format="pyarrow")
    points = blobs.map_batches(tagged_points, batch_format="pyarrow")
    ways = blobs.map_batches(matched_ways, batch_format="pyarrow").materialize()
    rel_members = blobs.map_batches(matched_rels, batch_format="pyarrow").materialize()
    allways = blobs.map_batches(all_way_refs, batch_format="pyarrow")

    # relation member ways need refs from the full way table. Broadcast
    # semi-join: relations are a tiny sliver of a planet file, so the
    # member-id set is small — built ON A WORKER from the (already
    # materialized) member block refs and broadcast as an object-store
    # ref; the driver never holds a member row (the _slim_payload_task
    # pattern, stages/join.py).
    member_ref = _member_ids_task.remote(
        *rel_members.get_internal_block_refs())

    def member_refs(batch: pa.Table) -> pa.Table:
        ids = ray.get(member_ref)
        m = np.isin(batch["way_id"].to_numpy(zero_copy_only=False), ids)
        return batch.filter(pa.array(m))

    member_ways = allways.map_batches(member_refs, batch_format="pyarrow")

    # ------------- join #1: node-coordinate resolution --------------------
    # Uses and coords are hash-partitioned on node_id; within a partition
    # ONE searchsorted resolves every use (vs. a Python fn per node id).

    def explode(kind: int):
        def fn(batch: pa.Table) -> pa.Table:
            refs = batch["refs"].combine_chunks()
            flat = pc.list_flatten(refs)
            parent = pc.list_parent_indices(refs)
            lens = pc.list_value_length(refs).to_numpy(zero_copy_only=False)
            seq = (np.concatenate([np.arange(l) for l in lens])
                   if len(lens) else np.empty(0, np.int64))
            nid = flat.to_numpy(zero_copy_only=False)
            use_key = (batch["way_id"].take(parent).to_numpy(zero_copy_only=False)
                       * 4 + kind)
            n = len(nid)
            return pa.table(
                {
                    "node_id": pa.array(nid, pa.int64()),
                    "use_key": pa.array(use_key, pa.int64()),
                    "seq": pa.array(seq.astype(np.int32), pa.int32()),
                    "side": pa.array(np.ones(n, np.int8), pa.int8()),
                    "lon": pa.array(np.zeros(n)),
                    "lat": pa.array(np.zeros(n)),
                    "part": pa.array((nid % P).astype(np.int32), pa.int32()),
                }
            )

        return fn

    way_use = ways.map_batches(explode(1), batch_format="pyarrow").union(
        member_ways.map_batches(explode(2), batch_format="pyarrow")
    )

    def node_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        nid = batch["node_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node_id": batch["node_id"],
                "use_key": pa.array(np.zeros(n, np.int64), pa.int64()),
                "seq": pa.array(np.zeros(n, np.int32), pa.int32()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "lon": batch["lon"],
                "lat": batch["lat"],
                "part": pa.array((nid % P).astype(np.int32), pa.int32()),
            }
        )

    unioned = way_use.union(nodes.map_batches(node_side, batch_format="pyarrow"))

    def vec_resolve(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        nid = t["node_id"].to_numpy(zero_copy_only=False)
        cmask = side == 0
        order = np.argsort(nid[cmask], kind="stable")
        cids = nid[cmask][order]
        clon = t["lon"].to_numpy(zero_copy_only=False)[cmask][order]
        clat = t["lat"].to_numpy(zero_copy_only=False)[cmask][order]
        umask = ~cmask
        unid = nid[umask]
        pos = np.searchsorted(cids, unid)
        bad = (pos >= len(cids)) | (cids[np.minimum(pos, max(len(cids) - 1, 0))]
                                    != unid) if len(cids) else np.ones(len(unid), bool)
        if bad.any():
            raise ValueError(
                f"missing node {int(unid[bad.argmax()])} referenced by way"
            )  # reference: fatal (spatialize.go:152)
        uk = t["use_key"].to_numpy(zero_copy_only=False)[umask]
        return pa.table(
            {
                "use_key": pa.array(uk, pa.int64()),
                "seq": t["seq"].filter(pa.array(umask)),
                "lon": pa.array(clon[pos]),
                "lat": pa.array(clat[pos]),
                "part": pa.array(((uk >> 2) % P).astype(np.int32), pa.int32()),
            }
        )

    resolved = unioned.groupby("part").map_groups(
        vec_resolve, batch_format="pyarrow"
    )

    # ------------- join #2: ordered line assembly per use_key -------------
    # Re-keyed by way_id (= use_key >> 2): one lexsort + one
    # ListArray.from_arrays per partition assembles every line in it.

    def vec_assemble(t: pa.Table) -> pa.Table:
        uk = t["use_key"].to_numpy(zero_copy_only=False)
        seq = t["seq"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, uk))
        uk_s = uk[order]
        bounds = np.flatnonzero(np.diff(uk_s)) + 1
        starts = np.concatenate([[0], bounds])
        flat = np.empty(2 * len(uk_s))
        flat[0::2] = lon[order]
        flat[1::2] = lat[order]
        offsets = np.concatenate([starts, [len(uk_s)]]).astype(np.int64) * 2
        coords = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()) if offsets[-1] < 2**31 else
            pa.array(offsets, pa.int64()),
            pa.array(flat),
        )
        keys = uk_s[starts] if len(uk_s) else np.empty(0, np.int64)
        return pa.table(
            {
                "use_key": pa.array(keys, pa.int64()),
                "coords": coords,
                "part": pa.array(((keys >> 2) % P).astype(np.int32), pa.int32()),
            }
        )

    lines = resolved.groupby("part").map_groups(
        vec_assemble, batch_format="pyarrow"
    ).materialize()  # consumed by two joins (#3 ways, #3 rels) — pin once

    # ------------- join #3a: way props × lines → way features -------------

    def way_side(batch: pa.Table) -> pa.Table:
        wid = batch["way_id"].to_numpy(zero_copy_only=False)
        n = len(wid)
        return pa.table(
            {
                "use_key": pa.array(wid * 4 + 1, pa.int64()),
                "coords": pa.array([None] * n, pa.list_(pa.float64())),
                "props_json": batch["props_json"],
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "part": pa.array((wid % P).astype(np.int32), pa.int32()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "use_key": batch["use_key"],
                "coords": batch["coords"],
                "props_json": pa.array([""] * n, pa.string()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "part": batch["part"],
            }
        )

    way_join = ways.map_batches(way_side, batch_format="pyarrow").union(
        lines.map_batches(line_side, batch_format="pyarrow")
    )

    def emit_way_feats(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        luk = t["use_key"].to_numpy(zero_copy_only=False)[lmask]
        order = np.argsort(luk, kind="stable")
        luk_s = luk[order]
        lcoords = t["coords"].filter(pa.array(lmask)).take(pa.array(order))
        wmask = ~lmask
        wuk = t["use_key"].to_numpy(zero_copy_only=False)[wmask]
        props_arr = t["props_json"].filter(pa.array(wmask)).to_pylist()
        pos = np.searchsorted(luk_s, wuk)
        out_wkb, out_props, out_key = [], [], []
        for i in range(len(wuk)):
            p = pos[i]
            if p >= len(luk_s) or luk_s[p] != wuk[i]:
                continue  # way had no resolvable line
            ln = np.asarray(lcoords[p].as_py(), dtype=np.float64).reshape(-1, 2)
            props = json.loads(props_arr[i]) if props_arr[i] else {}
            area = props.pop("__type", None) == "area"
            ring = (ln[:-1] if area and len(ln) > 1 and (ln[0] == ln[-1]).all()
                    else ln)
            if is_clockwise(ring):  # ways normalized CCW (spatialize.go:283-285)
                ring = ring[::-1].copy()
            out_wkb.append(wkbmod.encode_polygon([ring]) if area
                           else wkbmod.encode_linestring(ring))
            out_props.append(json.dumps(props, sort_keys=True))
            out_key.append(int(wuk[i]) >> 2)
        if not out_key:
            return _empty_feat_part()
        keys = np.asarray(out_key, dtype=np.int64)
        return pa.table(
            {
                "kind": pa.array(np.ones(len(keys), np.int8), pa.int8()),
                "sort_key": pa.array(keys, pa.int64()),
                "part": pa.array((keys % P).astype(np.int32), pa.int32()),
                "geom_wkb": pa.array(out_wkb, pa.binary()),
                "props_json": pa.array(out_props, pa.string()),
            }
        )

    way_feats = way_join.groupby("part").map_groups(
        emit_way_feats, batch_format="pyarrow"
    )

    # ------------- join #3b/#4: relation members × lines → polygons -------

    def rel_side(batch: pa.Table) -> pa.Table:
        wid = batch["way_id"].to_numpy(zero_copy_only=False)
        n = len(wid)
        return pa.table(
            {
                "use_key": pa.array(wid * 4 + 2, pa.int64()),
                "coords": pa.array([None] * n, pa.list_(pa.float64())),
                "rel_id": batch["rel_id"],
                "role": batch["role"],
                "seq": batch["seq"],
                "props_json": batch["props_json"],
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "part": pa.array((wid % P).astype(np.int32), pa.int32()),
            }
        )

    def line_side_rel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "use_key": batch["use_key"],
                "coords": batch["coords"],
                "rel_id": pa.array(np.zeros(n, np.int64), pa.int64()),
                "role": pa.array(np.zeros(n, np.int8), pa.int8()),
                "seq": pa.array(np.zeros(n, np.int32), pa.int32()),
                "props_json": pa.array([""] * n, pa.string()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "part": batch["part"],
            }
        )

    rel_join = rel_members.map_batches(rel_side, batch_format="pyarrow").union(
        lines.map_batches(line_side_rel, batch_format="pyarrow")
    )

    def attach_member_lines(t: pa.Table) -> pa.Table:
        """Attach each member way's line (kind-2 key, kind-1 fallback)."""
        side = t["side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        luk = t["use_key"].to_numpy(zero_copy_only=False)[lmask]
        order = np.argsort(luk, kind="stable")
        luk_s = luk[order]
        lcoords = t["coords"].filter(pa.array(lmask)).take(pa.array(order))
        rmask = ~lmask
        rt = t.filter(pa.array(rmask))
        ruk = rt["use_key"].to_numpy(zero_copy_only=False)

        def lookup(keys):
            p = np.searchsorted(luk_s, keys)
            ok = (p < len(luk_s))
            ok &= np.where(ok, luk_s[np.minimum(p, max(len(luk_s) - 1, 0))]
                           == keys, False)
            return p, ok

        pos2, ok2 = lookup(ruk)
        pos1, ok1 = lookup(ruk - 1)          # kind-1 fallback (wid*4+1)
        pos = np.where(ok2, pos2, pos1)
        ok = ok2 | ok1
        sel = np.nonzero(ok)[0]
        rel_id = rt["rel_id"].to_numpy(zero_copy_only=False)[sel]
        return pa.table(
            {
                "rel_id": pa.array(rel_id, pa.int64()),
                "role": rt["role"].take(pa.array(sel)),
                "seq": rt["seq"].take(pa.array(sel)),
                "props_json": rt["props_json"].take(pa.array(sel)),
                "coords": lcoords.take(pa.array(pos[sel])),
                "part": pa.array((rel_id % P).astype(np.int32), pa.int32()),
            }
        )

    rel_rings = rel_join.groupby("part").map_groups(
        attach_member_lines, batch_format="pyarrow"
    )

    def emit_rel_feats(t: pa.Table) -> pa.Table:
        rid = t["rel_id"].to_numpy(zero_copy_only=False)
        seq = t["seq"].to_numpy(zero_copy_only=False)
        role = t["role"].to_numpy(zero_copy_only=False)
        props_l = t["props_json"].to_pylist()
        coords = t["coords"]
        order = np.lexsort((seq, rid))
        out_wkb, out_props, out_key = [], [], []
        i = 0
        n = len(rid)
        while i < n:
            j = i
            rings = []
            while j < n and rid[order[j]] == rid[order[i]]:
                ln = np.asarray(coords[order[j]].as_py(),
                                dtype=np.float64).reshape(-1, 2)
                ring = (ln[:-1] if len(ln) > 1 and (ln[0] == ln[-1]).all()
                        else ln)
                if len(ring) >= 3:  # spatialize.go:312-314
                    cw = is_clockwise(ring)
                    r = role[order[j]]
                    if (r == _ROLE_OUTER and cw) or (r == _ROLE_INNER and not cw):
                        ring = ring[::-1].copy()
                    rings.append(ring)
                j += 1
            if rings:
                props = (json.loads(props_l[order[i]])
                         if props_l[order[i]] else {})
                props.pop("__type", None)
                out_wkb.append(wkbmod.encode_polygon(rings))
                out_props.append(json.dumps(props, sort_keys=True))
                out_key.append(int(rid[order[i]]))
            i = j
        if not out_key:
            return _empty_feat_part()
        keys = np.asarray(out_key, dtype=np.int64)
        return pa.table(
            {
                "kind": pa.array(np.full(len(keys), 2, np.int8), pa.int8()),
                "sort_key": pa.array(keys, pa.int64()),
                "part": pa.array((keys % P).astype(np.int32), pa.int32()),
                "geom_wkb": pa.array(out_wkb, pa.binary()),
                "props_json": pa.array(out_props, pa.string()),
            }
        )

    rel_feats = rel_rings.groupby("part").map_groups(
        emit_rel_feats, batch_format="pyarrow"
    )

    # ------------- point features ----------------------------------------

    def point_feats(batch: pa.Table) -> pa.Table:
        nid = batch["node_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "kind": pa.array(np.zeros(len(nid), np.int8), pa.int8()),
                "sort_key": pa.array(nid, pa.int64()),
                "part": pa.array((nid % P).astype(np.int32), pa.int32()),
                "geom_wkb": batch["geom_wkb"],
                "props_json": batch["props_json"],
            }
        )

    pt_feats = points.map_batches(point_feats, batch_format="pyarrow")

    # ------------- span_idx: distributed deterministic numbering ----------
    # Per-(kind, part) counts come to the driver (≤ 3·P tiny rows); prefix
    # offsets are broadcast; each group assigns offset + rank (sorted by
    # sort_key) — features never collect on the driver.
    feats0 = pt_feats.union(way_feats).union(rel_feats).materialize()
    from ray.data.aggregate import Count

    cnt_rows = feats0.groupby(["kind", "part"]).aggregate(
        Count(alias_name="n")
    ).take_all()
    offsets = {}
    acc = 0
    for r in sorted(cnt_rows, key=lambda r: (r["kind"], r["part"])):
        offsets[(int(r["kind"]), int(r["part"]))] = acc
        acc += int(r["n"])
    off_ref = ray.put(offsets)
    source = pbf_path

    def finalize(t: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        kind = int(t["kind"][0].as_py())
        part = int(t["part"][0].as_py())
        base = offs[(kind, part)]
        order = np.argsort(t["sort_key"].to_numpy(zero_copy_only=False),
                           kind="stable")
        t = t.take(pa.array(order))
        wkbs = t["geom_wkb"].to_pylist()
        props = t["props_json"].to_pylist()
        gb = wkbmod.decode_wkb_batch(wkbs)
        bb = gb.bboxes()
        layers = [str((json.loads(p) if p else {}).get("@layer", "default"))
                  for p in props]
        n = len(wkbs)
        return pa.table(
            {
                "doc_id": pa.array([source] * n, pa.string()),
                "span_idx": pa.array(
                    np.arange(base, base + n, dtype=np.int32), pa.int32()
                ),
                "geom_type": pa.array(gb.types, pa.uint8()),
                "geom_wkb": pa.array(wkbs, pa.binary()),
                "bbox_minx": pa.array(bb[:, 0] if n else []),
                "bbox_miny": pa.array(bb[:, 1] if n else []),
                "bbox_maxx": pa.array(bb[:, 2] if n else []),
                "bbox_maxy": pa.array(bb[:, 3] if n else []),
                "layer": pa.array(layers, pa.string()),
                "props_json": pa.array(props, pa.string()),
            }
        )

    return feats0.groupby(["kind", "part"]).map_groups(
        finalize, batch_format="pyarrow"
    )
