"""OSM PBF → features pipeline (reference cmd/spatialize, SURVEY §3.3).

The reference makes three sequential in-process passes over the PBF with
id-keyed hash maps (elemCache, T6). The Ray form replaces the maps with
joins (J1):

    blobs (blob-parallel decode)
      ├─ tagged nodes matching mapping conds  → point features
      ├─ matched ways (id, refs, mapped tags)
      ├─ matched multipolygon relations (members, mapped tags)
      ├─ ALL ways (id, refs)           [for relation members]
      └─ ALL node coords (id, lon, lat)
    way_use = explode(refs of matched ways ∪ relation-member ways)
    coords  = groupby(node_id){way_use ∪ node_coords}   # hash join #1
    lines   = groupby(use_key) assemble ordered vertices # shuffle #2
    features = way lines (CCW-normalized; __type=area → polygon)
             ∪ relation polygons (groupby rel_id, outer/inner winding)

Assembly semantics mirror spatialize.go:240-330 exactly: ways reversed if
clockwise; `__type=area` consumed into a polygon; relations kept iff
type=multipolygon or __type=area; outer rings forced counter-clockwise,
inner rings clockwise; rings with <3 points dropped.
"""
from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..geom import wkb as wkbmod
from ..geom.ops import is_clockwise
from ..sources import osm
from ..stages.mapping import parse_mapping


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


def spatialize(pbf_path: str, mapping_yaml: str) -> rd.Dataset:
    """Returns a features Dataset (same schema as extract/converter)."""
    conds = parse_mapping(mapping_yaml)
    blobs = _blob_ds(pbf_path)

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
        rows = {"geom_wkb": [], "props_json": []}
        for block in _decode_batch(batch):
            ids, lons, lats, tags = block["nodes"]
            for i, t in enumerate(tags):
                if not t:
                    continue
                for cond in conds:
                    if cond.matches(t):
                        rows["geom_wkb"].append(
                            wkbmod.encode_point(lons[i], lats[i])
                        )
                        rows["props_json"].append(
                            json.dumps(cond.map_props(t), sort_keys=True)
                        )
        return pa.table(
            {
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
                            rows["role"].append(role)
                            rows["seq"].append(seq)
                            rows["props_json"].append(pj)
        return pa.table(
            {
                "rel_id": pa.array(rows["rel_id"], pa.int64()),
                "way_id": pa.array(rows["way_id"], pa.int64()),
                "role": pa.array(rows["role"], pa.string()),
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

    # relation member ways need refs from the full way table (semi-join)
    member_way_ids = {r["way_id"] for r in rel_members.take_all()}

    def member_refs(batch: pa.Table) -> pa.Table:
        m = np.isin(batch["way_id"].to_numpy(zero_copy_only=False),
                    np.asarray(sorted(member_way_ids), dtype=np.int64))
        return batch.filter(pa.array(m))

    member_ways = allways.map_batches(member_refs, batch_format="pyarrow")

    # ---- node-coordinate resolution: hash join on node_id ---------------
    def explode(kind: int):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            refs = batch["refs"].combine_chunks()
            flat = pc.list_flatten(refs)
            parent = pc.list_parent_indices(refs)
            # per-way sequence number
            lens = pc.list_value_length(refs).to_numpy(zero_copy_only=False)
            seq = np.concatenate([np.arange(l) for l in lens]) if len(lens) else np.empty(0, np.int64)
            return pa.table(
                {
                    "node_id": flat,
                    "use_key": pa.compute.add(
                        pa.compute.multiply(batch["way_id"].take(parent), 4),
                        kind,
                    ),
                    "seq": pa.array(seq.astype(np.int32), pa.int32()),
                    "side": pa.array(np.full(len(flat), 1, np.int8), pa.int8()),
                    "lon": pa.array(np.zeros(len(flat))),
                    "lat": pa.array(np.zeros(len(flat))),
                }
            )

        return fn

    way_use = ways.map_batches(explode(1), batch_format="pyarrow").union(
        member_ways.map_batches(explode(2), batch_format="pyarrow")
    )

    def node_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "node_id": batch["node_id"],
                "use_key": pa.array(np.zeros(n, np.int64), pa.int64()),
                "seq": pa.array(np.zeros(n, np.int32), pa.int32()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "lon": batch["lon"],
                "lat": batch["lat"],
            }
        )

    unioned = way_use.union(nodes.map_batches(node_side, batch_format="pyarrow"))

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        src = group[group["side"] == 0]
        if src.empty:
            raise ValueError(
                f"missing node {int(group['node_id'].iloc[0])} referenced by way"
            )  # reference: fatal (spatialize.go:152)
        lon = src["lon"].iloc[0]
        lat = src["lat"].iloc[0]
        uses = group[group["side"] == 1]
        return pd.DataFrame(
            {"use_key": uses["use_key"], "seq": uses["seq"],
             "lon": lon, "lat": lat}
        )

    resolved = unioned.groupby("node_id").map_groups(resolve, batch_format="pandas")

    # ---- line assembly per use_key --------------------------------------
    def assemble(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("seq")
        pts = np.stack([g["lon"].to_numpy(), g["lat"].to_numpy()], axis=1)
        return pd.DataFrame(
            {
                "use_key": [int(g["use_key"].iloc[0])],
                "coords": [pts.reshape(-1).tolist()],
            }
        )

    lines = resolved.groupby("use_key").map_groups(
        assemble, batch_format="pandas"
    ).materialize()

    line_map = {
        int(r["use_key"]): np.asarray(r["coords"], dtype=np.float64).reshape(-1, 2)
        for r in lines.take_all()
    }

    # ---- way features ----------------------------------------------------
    feat_wkb: list[bytes] = []
    feat_props: list[str] = []
    for r in ways.take_all():
        ln = line_map.get(int(r["way_id"]) * 4 + 1)
        if ln is None:
            continue
        props = json.loads(r["props_json"]) if r["props_json"] else {}
        area = props.pop("__type", None) == "area"
        ring = ln[:-1] if area and len(ln) > 1 and (ln[0] == ln[-1]).all() else ln
        if is_clockwise(ring):  # ways normalized CCW (spatialize.go:283-285)
            ring = ring[::-1].copy()
        if area:
            feat_wkb.append(wkbmod.encode_polygon([ring]))
        else:
            feat_wkb.append(wkbmod.encode_linestring(ring))
        feat_props.append(json.dumps(props, sort_keys=True))

    # ---- relation polygons ----------------------------------------------
    rel_rows: dict[int, dict] = {}
    for r in rel_members.take_all():
        rel_rows.setdefault(int(r["rel_id"]), {"props": r["props_json"], "members": []})
        rel_rows[int(r["rel_id"])]["members"].append(
            (int(r["seq"]), r["role"], int(r["way_id"]))
        )
    for rid in sorted(rel_rows):
        rings = []
        for seq, role, wid in sorted(rel_rows[rid]["members"]):
            ln = line_map.get(wid * 4 + 2, line_map.get(wid * 4 + 1))
            if ln is None:
                continue
            ring = ln[:-1] if len(ln) > 1 and (ln[0] == ln[-1]).all() else ln
            if len(ring) < 3:  # spatialize.go:312-314
                continue
            cw = is_clockwise(ring)
            if (role == "outer" and cw) or (role == "inner" and not cw):
                ring = ring[::-1].copy()
            rings.append(ring)
        if rings:
            feat_wkb.append(wkbmod.encode_polygon(rings))
            props = json.loads(rel_rows[rid]["props"]) if rel_rows[rid]["props"] else {}
            props.pop("__type", None)
            feat_props.append(json.dumps(props, sort_keys=True))

    assembled = _features_table(feat_wkb, feat_props, source=pbf_path)
    point_rows = points.take_all()
    pt_table = _features_table(
        [r["geom_wkb"] for r in point_rows],
        [r["props_json"] for r in point_rows],
        source=pbf_path,
        offset=assembled.num_rows,
    )
    full = pa.concat_tables([pt_table, assembled])
    return rd.from_arrow(full)


def _features_table(wkbs: list[bytes], props: list[str], source: str,
                    offset: int = 0) -> pa.Table:
    gb = wkbmod.decode_wkb_batch(wkbs)
    bb = gb.bboxes()
    layers = []
    for p in props:
        d = json.loads(p) if p else {}
        layers.append(str(d.get("@layer", "default")))
    n = len(wkbs)
    return pa.table(
        {
            "doc_id": pa.array([source] * n, pa.string()),
            "span_idx": pa.array(
                np.arange(offset, offset + n, dtype=np.int32), pa.int32()
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
