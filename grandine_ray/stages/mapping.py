"""Tag-mapping rule DSL (reference lib/mapping/*).

YAML schema (lib/mapping/file.go:13-30, mapping.yml):

    - src:  {key: highway, value: primary | [a, b] | "*"}
      dest: [{key: "@layer", value: transportation},
             {key: class, value: "$highway", type: int}]
      op: lines

Semantics preserved:
  * empty value list (from "*") matches any value of the key
    (condition.go:16-28, file.go:63-68);
  * dest values starting with "$" substitute the source prop
    (file.go:76-87); ``type: int`` coerces with the yes→1 / no→0 rule
    (file.go:147-166);
  * op "lines" explodes polygons into one LineString per ring
    (ops.go:5-16);
  * a feature matching k conditions is emitted k times; when any
    conditions are configured, non-matching features are dropped
    (converter.go:188-199).

The compiled ruleset is broadcast by closure capture into a vectorized
``map_batches`` stage (flat-map: 1 row → 0..N rows).
"""
from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..geom import wkb as wkbmod


class Condition:
    def __init__(self, key: str, values: list[str], static: dict,
                 dynamic: dict, op: str | None):
        self.key = key
        self.values = values  # empty = wildcard
        self.static = static
        self.dynamic = dynamic  # dest_key -> (src_field, typ)
        self.op = op

    def matches(self, props: dict) -> bool:
        if self.key not in props:
            return False
        return not self.values or props[self.key] in self.values

    def map_props(self, props: dict) -> dict:
        out = dict(self.static)
        for dest_key, (src_field, typ) in self.dynamic.items():
            if src_field in props:
                v = props[src_field]
                if typ == "int":
                    v = _to_int(v)
                out[dest_key] = v
        return out


def _to_int(v):
    """file.go:147-166: strconv.Atoi with yes→1 / no→0; fallback: original."""
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, str):
        try:
            return int(v)
        except ValueError:
            if v == "yes":
                return 1
            if v == "no":
                return 0
    return v


def parse_mapping(src: str) -> list[Condition]:
    import yaml

    rules = yaml.safe_load(src) or []
    conds = []
    for fm in rules:
        sv = fm["src"].get("value")
        if isinstance(sv, list):
            values = [str(v) for v in sv]
        elif sv == "*":
            values = []
        else:
            values = [str(sv)]
        static = {}
        dynamic = {}
        for kvm in fm.get("dest", []) or []:
            dv = kvm.get("value")
            if isinstance(dv, str) and dv.startswith("$"):
                dynamic[kvm["key"]] = (dv[1:], kvm.get("type"))
            else:
                static[kvm["key"]] = dv
        conds.append(
            Condition(str(fm["src"]["key"]), values, static, dynamic,
                      fm.get("op"))
        )
    return conds


# YAML mirror of the reference's built-in ruleset (lib/mapping/default.go:52-69).
# Quirks preserved: building matches only the empty tag VALUE (value [""]
# in Default, not a wildcard); railway=rail maps through the
# transportation fn, whose class comes from the (absent) highway tag and
# therefore ends up the empty string.
DEFAULT_MAPPING = """
- src: {key: aeroway, value: [aerodrome, apron, heliport, runway, helipad, taxiway]}
  dest:
    - {key: "@layer", value: aeroway}
    - {key: class, value: $aeroway}
- src: {key: highway, value: [motorway, primary, trunk, secondary, tertiary]}
  dest:
    - {key: "@layer", value: transportation}
    - {key: class, value: $highway}
- src: {key: building, value: [""]}
  dest:
    - {key: "@layer", value: building}
    - {key: "@zoom:min", value: 14}
- src: {key: landuse, value: forest}
  dest:
    - {key: __type, value: area}
    - {key: "@layer", value: landcover}
    - {key: class, value: wood}
- src: {key: railway, value: rail}
  dest:
    - {key: "@layer", value: transportation}
    - {key: class, value: ""}
- src: {key: waterway, value: river}
  dest:
    - {key: "@layer", value: waterway}
    - {key: class, value: $waterway}
"""


def apply_mapping_batch(batch: pa.Table, conds: list[Condition]) -> pa.Table:
    """Flat-map a features batch through the ruleset.

    Materializes the @-keys into the engine's hot columns: ``layer``
    (tiler.go:296-312), ``zoom_min``/``zoom_max`` (tiler.go:230-248).
    """
    props_list = [
        json.loads(p) if p else {}
        for p in (batch["props_json"].to_pylist()
                  if "props_json" in batch.column_names
                  else [""] * batch.num_rows)
    ]
    keep_idx: list[int] = []
    out_props: list[str] = []
    out_layer: list[str] = []
    out_zmin: list[int] = []
    out_zmax: list[int] = []
    out_geom: list[bytes | None] = []  # None = keep original geometry

    wkb_col = batch["geom_wkb"].to_pylist()
    types_col = batch["geom_type"].to_numpy(zero_copy_only=False)

    for i, props in enumerate(props_list):
        for cond in conds:
            if not cond.matches(props):
                continue
            mapped = cond.map_props(props)
            layer = str(mapped.get("@layer", "default"))
            zmin = int(mapped.get("@zoom:min", 0))
            zmax = int(mapped.get("@zoom:max", 99))
            public = {k: v for k, v in mapped.items()}
            pj = json.dumps(public, sort_keys=True) if public else ""
            if cond.op == "lines" and types_col[i] == wkbmod.GEOM_POLYGON:
                gb = wkbmod.decode_wkb_batch([wkb_col[i]])
                for ring in gb.rings_of(0):
                    keep_idx.append(i)
                    out_props.append(pj)
                    out_layer.append(layer)
                    out_zmin.append(zmin)
                    out_zmax.append(zmax)
                    out_geom.append(wkbmod.encode_linestring(ring))
            else:
                keep_idx.append(i)
                out_props.append(pj)
                out_layer.append(layer)
                out_zmin.append(zmin)
                out_zmax.append(zmax)
                out_geom.append(None)

    take = pa.array(np.asarray(keep_idx, dtype=np.int64))
    base = batch.take(take)
    geom_out = []
    geom_type_out = []
    src_types = base["geom_type"].to_numpy(zero_copy_only=False)
    src_wkb = base["geom_wkb"].to_pylist()
    for j, g in enumerate(out_geom):
        if g is None:
            geom_out.append(src_wkb[j])
            geom_type_out.append(int(src_types[j]))
        else:
            geom_out.append(g)
            geom_type_out.append(wkbmod.GEOM_LINESTRING)

    cols = {name: base[name] for name in base.column_names}
    cols["geom_wkb"] = pa.array(geom_out, pa.binary())
    cols["geom_type"] = pa.array(geom_type_out, pa.uint8())
    cols["layer"] = pa.array(out_layer, pa.string())
    cols["props_json"] = pa.array(out_props, pa.string())
    cols["zoom_min"] = pa.array(out_zmin, pa.int8())
    cols["zoom_max"] = pa.array(out_zmax, pa.int8())
    return pa.table(cols)


def make_mapping_fn(yaml_src: str):
    conds = parse_mapping(yaml_src)

    def fn(batch: pa.Table) -> pa.Table:
        return apply_mapping_batch(batch, conds)

    return fn
