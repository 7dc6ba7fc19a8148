"""Mapbox Vector Tile v2 encoding (reference lib/mvt/codec.go, project.go).

From-scratch MVT protobuf writer (no compiled proto needed — the wire format
is hand-rolled with numpy-vectorized varint packing for the geometry command
streams). Field numbers follow the public vector-tile 2.1 spec:

    Tile      { repeated Layer layers = 3 }
    Layer     { name=1, repeated Feature features=2, repeated string keys=3,
                repeated Value values=4, extent=5, version=15 }
    Feature   { id=1, packed uint32 tags=2, GeomType type=3,
                packed uint32 geometry=4 }
    Value     { string=1, float=2, double=3, int=4, uint=5, sint=6, bool=7 }

Pipeline semantics per reference assembleLayer (codec.go:139-198): project
each vertex to tile-local coords (project.go:43-76, with Go int truncation
on the flipped Y), clip to [0,4096]², MergeFeatures, intern tags (keys that
start with "@" skipped), delta+zigzag command streams (codec.go:202-261).
Canonicalization where Go is nondeterministic: layers sorted by name, props
iterated in sorted key order (SURVEY §7.5).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import clip as clipmod
from ..geom import predicates as predmod
from ..geom import wkb as wkbmod
from ..geom.ops import proj_4326_to_3857
from ..index import xyz
from .merge import merge_features

EXTENT = 4096
CMD_MOVETO = 1
CMD_LINETO = 2
CMD_CLOSEPATH = 7

# ------------------------------------------------------------- protobuf bits


def _varint_slow(v: int) -> bytes:
    out = bytearray()
    v = int(v)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# precomputed encodings for the 1-2 byte range (covers zigzagged tile-space
# deltas, tag indices and length fields — the per-feature hot path does
# millions of scalar encodes on deep pyramids)
_VARINT_TABLE = None


def _varint(v: int) -> bytes:
    global _VARINT_TABLE
    if _VARINT_TABLE is None:
        _VARINT_TABLE = [_varint_slow(i) for i in range(1 << 14)]
    if 0 <= v < (1 << 14):
        return _VARINT_TABLE[int(v)]
    return _varint_slow(v)


def varint_array(vals: np.ndarray) -> bytes:
    """Vectorized varint encoding of a uint64 array (packed repeated)."""
    vals = np.asarray(vals, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return b""
    if n <= 24:  # tiny arrays: plain loop beats numpy setup cost
        return b"".join(map(_varint, vals.tolist()))
    if int(vals.max()) < 128:  # single-byte fast path
        return vals.astype(np.uint8).tobytes()
    return _varint_array_sized(vals)[0]


def _varint_array_sized(vals: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Vectorized varint encode returning (bytes, per-value byte sizes)."""
    vals = np.asarray(vals, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    nbytes = np.ones(n, dtype=np.int64)
    v = vals >> np.uint64(7)
    while v.any():
        nbytes += (v > 0).astype(np.int64)
        v >>= np.uint64(7)
    maxb = int(nbytes.max())
    if maxb == 1:
        return vals.astype(np.uint8).tobytes(), nbytes
    buf = np.zeros((n, maxb), dtype=np.uint8)
    v = vals.copy()
    for i in range(maxb):
        buf[:, i] = (v & np.uint64(0x7F)).astype(np.uint8)
        v >>= np.uint64(7)
    cont = np.arange(maxb)[None, :] < (nbytes - 1)[:, None]
    buf[cont] |= 0x80
    keep = np.arange(maxb)[None, :] < nbytes[:, None]
    return buf[keep].tobytes(), nbytes


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _len_prefixed(payload: bytes) -> bytes:
    n = len(payload)
    return (bytes((n,)) if n < 128 else _varint(n)) + payload


def _varint_field(num: int, v: int) -> bytes:
    return _field(num, 0) + _varint(v)


def encode_zigzag(i: np.ndarray) -> np.ndarray:
    i = np.asarray(i, dtype=np.int64)
    return ((i << 1) ^ (i >> 63)).astype(np.uint64)


def command_int(cmd: int, count: int) -> int:
    return (cmd & 0x7) | (count << 3)


# ------------------------------------------------------- geometry commands


def encode_geometry_commands(gtype: int, rings: list[np.ndarray]) -> np.ndarray:
    """Tile-space rings → MVT command stream (codec.go:202-261).

    Coordinates are truncated to int (Go int() cast) here.
    """
    cur = np.zeros(2, dtype=np.int64)
    cmds: list[np.ndarray] = []
    if gtype == wkbmod.GEOM_POINT:
        pt = rings[0][0]
        d = np.trunc(pt).astype(np.int64) - cur
        return np.concatenate(
            [
                np.array([command_int(CMD_MOVETO, 1)], dtype=np.uint64),
                encode_zigzag(d),
            ]
        )
    if gtype == wkbmod.GEOM_LINESTRING:
        return _encode_line(rings[0], cur)
    # polygon
    for ring in rings:
        enc = _encode_line(ring, cur)
        cmds.append(enc)
        cmds.append(np.array([command_int(CMD_CLOSEPATH, 1)], dtype=np.uint64))
    return np.concatenate(cmds) if cmds else np.empty(0, dtype=np.uint64)


def _encode_line(pts: np.ndarray, cur: np.ndarray) -> np.ndarray:
    """codec.go:239-261 — MoveTo(1) first vertex, LineTo(n-1) rest."""
    ipts = np.trunc(np.asarray(pts, dtype=np.float64)).astype(np.int64)
    deltas = np.empty_like(ipts)
    deltas[0] = ipts[0] - cur
    deltas[1:] = ipts[1:] - ipts[:-1]
    cur[:] = ipts[-1]
    zz = encode_zigzag(deltas.reshape(-1)).reshape(-1, 2)
    n = len(ipts)
    out = np.empty(2 * n + 2, dtype=np.uint64)
    out[0] = command_int(CMD_MOVETO, 1)
    out[1:3] = zz[0]
    out[3] = command_int(CMD_LINETO, n - 1)
    out[4:] = zz[1:].reshape(-1)
    return out


def batch_encode_commands(gb, is_poly: np.ndarray):
    """Vectorized MVT command streams for EVERY geometry of a GeomBatch.

    Returns (values uint64 [N], geom_cmd_offsets int64 [n+1]) so a
    feature's command array is a zero-compute slice. Semantics identical
    to encode_geometry_commands: cur resets per geometry, persists across
    polygon rings; MoveTo(1)+LineTo(n-1) per ring; ClosePath after each
    polygon ring; Go int truncation.
    """
    coords = gb.coords
    ring_off = gb.ring_offsets
    geom_off = gb.geom_offsets
    n_geoms = len(gb.types)
    tc = np.trunc(coords).astype(np.int64)
    g_starts = ring_off[geom_off[:-1]]
    prev = np.empty_like(tc)
    if len(tc):
        prev[1:] = tc[:-1]
        prev[0] = 0
    prev[g_starts] = 0
    zz = encode_zigzag((tc - prev).reshape(-1)).reshape(-1, 2)

    ring_sizes = (ring_off[1:] - ring_off[:-1]).astype(np.int64)
    nrings_per_geom = geom_off[1:] - geom_off[:-1]
    ring_geom = np.repeat(np.arange(n_geoms, dtype=np.int64), nrings_per_geom)
    poly_ring = is_poly[ring_geom]
    ring_out_len = 2 * ring_sizes + 2 + poly_ring.astype(np.int64)
    ring_out_off = np.zeros(len(ring_sizes) + 1, dtype=np.int64)
    np.cumsum(ring_out_len, out=ring_out_off[1:])
    out = np.empty(int(ring_out_off[-1]), dtype=np.uint64)

    p = ring_out_off[:-1]
    r_starts = ring_off[:-1]
    out[p] = command_int(CMD_MOVETO, 1)
    out[p + 1] = zz[r_starts, 0]
    out[p + 2] = zz[r_starts, 1]
    out[p + 3] = (((ring_sizes - 1) << 3) | CMD_LINETO).astype(np.uint64)
    body_src = wkbmod.expand_ranges(r_starts + 1, r_starts + ring_sizes)
    body_dst = wkbmod.expand_ranges(p + 4, p + 4 + 2 * (ring_sizes - 1))
    out[body_dst] = zz[body_src].reshape(-1)
    close_pos = ring_out_off[1:][poly_ring] - 1
    out[close_pos] = command_int(CMD_CLOSEPATH, 1)

    geom_cmd_off = ring_out_off[geom_off]
    return out, geom_cmd_off


def decode_geometry_commands(cmds: list[int]):
    """Inverse of encode_geometry_commands, for tests/inspection.

    Returns list of (cmd, [(x, y), ...]) runs with absolute coords.
    """
    out = []
    x = y = 0
    i = 0
    while i < len(cmds):
        c = cmds[i] & 0x7
        count = cmds[i] >> 3
        i += 1
        pts = []
        if c == CMD_CLOSEPATH:
            out.append((c, []))
            continue
        for _ in range(count):
            dx = _unzigzag(cmds[i])
            dy = _unzigzag(cmds[i + 1])
            i += 2
            x += dx
            y += dy
            pts.append((x, y))
        out.append((c, pts))
    return out


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


# ----------------------------------------------------------- value encoding


def encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _varint_field(7, 1 if v else 0)
    if isinstance(v, str):
        return _len_field(1, v.encode("utf-8"))
    if isinstance(v, float):
        return _field(3, 1) + np.float64(v).tobytes()
    if isinstance(v, (int, np.integer)):
        zz = int(encode_zigzag(np.array([int(v)]))[0])
        return _field(6, 0) + _varint(zz)
    return _len_field(1, str(v).encode("utf-8"))


# -------------------------------------------------------------- tile params


def tile_params(z: int, x: int, y: int, extent: int = EXTENT):
    """project.go:64-76: offsets/scales from the tile's 3857 bbox."""
    minx, miny, maxx, maxy = (float(v) for v in xyz.tile_bbox(x, y, z))
    sw_x, sw_y = proj_4326_to_3857(minx, miny)
    ne_x, ne_y = proj_4326_to_3857(maxx, maxy)
    return (
        float(sw_x),
        float(sw_y),
        abs(float(sw_x) - float(ne_x)),
        abs(float(sw_y) - float(ne_y)),
        extent,
    )


def project_to_tile(coords: np.ndarray, tp) -> np.ndarray:
    """Vectorized tilePoint (project.go:48-54): lon/lat → tile-local.

    Y is flipped with Go int-truncation: extent - trunc(v).
    """
    xoff, yoff, dx, dy, extent = tp
    px, py = proj_4326_to_3857(coords[:, 0], coords[:, 1])
    tx = (px - xoff) / dx * extent
    ty = extent - np.trunc((py - yoff) / dy * extent)
    return np.stack([tx, ty], axis=1)


# ------------------------------------------------------------- tile assembly


def _clip_feature(gtype: int, rings: list[np.ndarray], extent: int,
                  border_hit: bool | None = None):
    """Clip one tile-space geometry to [0,extent]² (codec.go:156-158).
    ``border_hit`` forwards a precomputed ring_intersects_rect verdict
    (bulk classification in TilespacePrepare) to skip the per-call scan."""
    if gtype == wkbmod.GEOM_POINT:
        p = rings[0][0]
        if 0 <= p[0] <= extent and 0 <= p[1] <= extent:
            return [(gtype, rings)]
        return []
    if gtype == wkbmod.GEOM_LINESTRING:
        parts = clipmod.clip_line(rings[0], 0, 0, extent, extent)
        return [(gtype, [part]) for part in parts if len(part) >= 2]
    polys = clipmod.clip_polygon(rings, 0, 0, extent, extent,
                                 _border_hit=border_hit)
    return [(gtype, pr) for pr in polys if pr]


def prepare_features(tp, feats: list[dict]) -> list[dict]:
    """Project lon/lat features to tile space and clip to [0,extent]².

    The salted two-phase path runs this per (tile, salt) sub-group; the
    single-phase path runs it inline before :func:`finalize_tile`.
    """
    extent = tp[4]
    clipped: list[dict] = []
    for ft in feats:
        tile_rings = [project_to_tile(r, tp) for r in ft["rings"]]
        for gtype, rings in _clip_feature(ft["type"], tile_rings, extent):
            clipped.append(
                {
                    "props": ft.get("props") or (),
                    "type": gtype,
                    "rings": rings,
                    "layer": ft.get("layer", "default"),
                }
            )
    return clipped


def encode_tile(z: int, x: int, y: int, layer_feats: dict) -> bytes:
    """layer_feats: {layer_name: [ {props: dict, type: int, rings: [...] } ]}

    Geometries are given in lon/lat; this function projects, clips, merges
    and assembles the tile protobuf. Returns b"" for an empty tile.
    """
    tp = tile_params(z, x, y)
    layer_bufs = []
    for lname in sorted(layer_feats):
        clipped = prepare_features(tp, layer_feats[lname])
        buf = _assemble_layer(clipped, tp, lname)
        if buf:
            layer_bufs.append(buf)
    if not layer_bufs:
        return b""
    return b"".join(_len_field(3, lb) for lb in layer_bufs)


def finalize_tile(layer_feats_tilespace: dict, extent: int = EXTENT) -> bytes:
    """Assemble a tile from *already projected+clipped* tile-space features."""
    tp = (0.0, 0.0, 1.0, 1.0, extent)
    layer_bufs = []
    for lname in sorted(layer_feats_tilespace):
        buf = _assemble_layer(layer_feats_tilespace[lname], tp, lname)
        if buf:
            layer_bufs.append(buf)
    if not layer_bufs:
        return b""
    return b"".join(_len_field(3, lb) for lb in layer_bufs)


def _zz_int(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


_EXTENT_FIELD = _field(5, 0) + _varint(EXTENT)   # layer extent (constant)
_VERSION_FIELD = _field(15, 0) + _varint(2)      # layer version (constant)


def _assemble_layer(clipped: list[dict], tp, lname: str,
                    batch_cmds=None) -> bytes:
    extent = tp[4]
    merged = merge_features(clipped)

    keys: dict[str, int] = {}
    vals: dict = {}
    # pass 1: tags + per-feature command arrays (geometry varints are
    # batched into ONE vectorized encode below — Python-level varint calls
    # were the dominant cost for mega-tiles)
    feats: list[tuple[list[int], int, object]] = []  # (tags, type, cmds|pt)
    cmd_arrays: list[np.ndarray] = []
    cmd_lens: list[int] = []
    for ft in merged:
        tags: list[int] = []
        props = dict(ft["props"]) if ft["props"] else {}
        for k in props:  # props built in sorted order upstream
            if k.startswith("@"):  # skipAtKeys (codec.go:30,165-167)
                continue
            v = props[k]
            kpos = keys.setdefault(k, len(keys))
            vkey = (type(v).__name__, v)
            vpos = vals.setdefault(vkey, len(vals))
            tags.extend((kpos, vpos))
        if ft.get("rings") is None and "pt" in ft:
            gb = ft.get("geom_buf")
            feats.append((tags, 1, gb if gb is not None else ft["pt"]))
            continue
        gi = ft.get("gi")
        if batch_cmds is not None and gi is not None and not ft.get("merged"):
            # precomputed block-level command slice (zero per-feature work)
            allc, goff = batch_cmds
            cmds = allc[goff[gi]:goff[gi + 1]]
        else:
            cmds = encode_geometry_commands(ft["type"], ft["rings"])
        if len(cmds) == 0:
            continue
        feats.append((tags, int(ft["type"]), None))
        cmd_arrays.append(cmds)
        cmd_lens.append(len(cmds))

    if not feats:
        return b""

    # batched geometry varint encode + per-feature byte-range split;
    # tiny layers (1-2 small geometries — the common deep-zoom case) take a
    # plain-python path that avoids the numpy setup cost entirely
    small_cmds = None
    if cmd_arrays:
        total_vals = sum(cmd_lens)
        if total_vals <= 48:
            small_cmds = [
                b"".join(map(_varint, a.tolist())) for a in cmd_arrays
            ]
        else:
            allcmds = (np.concatenate(cmd_arrays) if len(cmd_arrays) > 1
                       else cmd_arrays[0])
            enc, sizes = _varint_array_sized(allcmds)
            val_bounds = np.zeros(len(cmd_lens) + 1, dtype=np.int64)
            np.cumsum(np.asarray(cmd_lens), out=val_bounds[1:])
            byte_cum = np.zeros(len(sizes) + 1, dtype=np.int64)
            np.cumsum(sizes, out=byte_cum[1:])
            byte_bounds = byte_cum[val_bounds]
    ci = 0
    parts: list[bytes] = [_len_field(1, lname.encode("utf-8"))]
    # precomputed wire-format tag bytes for the per-feature hot loop
    _NINE = _varint(9)
    _TYPE = (b"", b"\x18\x01", b"\x18\x02", b"\x18\x03")  # field 3 varint
    for tags, gtype, pt in feats:
        if pt is not None:
            if isinstance(pt, bytes):  # bulk-encoded point geometry bytes
                geom_buf = pt
            else:
                geom_buf = _NINE + _varint(_zz_int(pt[0])) + _varint(_zz_int(pt[1]))
        elif small_cmds is not None:
            geom_buf = small_cmds[ci]
            ci += 1
        else:
            geom_buf = enc[byte_bounds[ci]:byte_bounds[ci + 1]]
            ci += 1
        gl = len(geom_buf)
        body_tail = (
            _TYPE[gtype] + b"\x22"
            + (bytes((gl,)) if gl < 128 else _varint(gl))
            + geom_buf
        )
        if tags:
            body = (
                b"\x12"
                + _len_prefixed(varint_array(np.asarray(tags, dtype=np.uint64)))
                + body_tail
            )
        else:
            body = body_tail
        bl = len(body)
        parts.append(
            b"\x12" + (bytes((bl,)) if bl < 128 else _varint(bl)) + body
        )

    for k in keys:
        parts.append(_len_field(3, k.encode("utf-8")))
    for (_, v) in vals:
        parts.append(_len_field(4, encode_value(v)))
    parts.append(_EXTENT_FIELD if extent == EXTENT else _varint_field(5, extent))
    parts.append(_VERSION_FIELD)
    return b"".join(parts)


# ----------------------------------------------------------- group encoder


class TileEncoder:
    """Actor-pool map_groups callable: one (z,x,y) group → one tile row.

    State built once per actor (T8 in SURVEY §2.4): nothing heavyweight is
    needed for XYZ tiles beyond reusable buffers, but the class keeps the
    per-actor construction point for zoom lookup tables.
    """

    def __init__(self, extent: int = EXTENT):
        self.extent = extent

    def __call__(self, group: pa.Table) -> pa.Table:
        key = int(group["tile_key"][0].as_py())
        z, x, y = (int(v) for v in xyz.tile_key_unpack(np.uint64(key)))

        # canonical order for merge determinism (SURVEY §7.5)
        order = pa.compute.sort_indices(
            group, sort_keys=[("doc_id", "ascending"), ("span_idx", "ascending")]
        )
        group = group.take(order)
        layer_feats = _group_to_feats(group)
        buf = encode_tile(z, x, y, layer_feats)
        if not buf:
            return _EMPTY_TILE_TABLE
        return pa.table(
            {
                "z": pa.array([z], pa.int8()),
                "x": pa.array([x], pa.int32()),
                "y": pa.array([y], pa.int32()),
                "mvt": pa.array([buf], pa.binary()),
                "n_features": pa.array([group.num_rows], pa.int32()),
                "bytes": pa.array([len(buf)], pa.int64()),
            }
        )


class SortedBlockTileEncoder:
    """Lean encoder over a *tile_key-sorted* block (the fast path).

    Used after ``ds.sort("tile_key")``: Ray's range partitioner never splits
    one key across blocks, so each block holds whole groups. Column
    extraction and canonical sorting happen ONCE per block (vectorized);
    the per-group loop then works on plain numpy slices / python lists with
    zero Arrow overhead — ~3-5× less per-group constant cost than
    groupby().map_groups for the many tiny groups a tile pyramid produces.

    ``tilespace=True``: input geometries are already projected + clipped to
    tile coordinates (output of :class:`TilespacePrepare`) — projection and
    clipping are skipped, only canonical-sort + merge + assembly run.
    """

    def __init__(self, extent: int = EXTENT, tilespace: bool = False):
        self.extent = extent
        self.tilespace = tilespace

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_TILE_TABLE
        sort_keys = [
            ("tile_key", "ascending"),
            ("doc_id", "ascending"),
            ("span_idx", "ascending"),
        ]
        if "part" in batch.column_names:
            sort_keys.append(("part", "ascending"))
        order = pa.compute.sort_indices(batch, sort_keys=sort_keys)
        batch = batch.take(order)
        keys = batch["tile_key"].to_numpy(zero_copy_only=False)
        layers = batch["layer"].to_pylist()
        props_json = (
            batch["props_json"].to_pylist()
            if "props_json" in batch.column_names else None
        )
        if "coords" in batch.column_names:
            # Arrow-native ragged geometry (prepared path): zero decode cost
            gb_all = ragged_to_geombatch(batch)
        else:
            gb_all = wkbmod.decode_wkb_batch(batch["geom_wkb"].to_pylist())
        types = gb_all.types
        geom_off = gb_all.geom_offsets
        ring_off = gb_all.ring_offsets

        # --- block-level vectorized tile-space projection -----------------
        # every vertex of every geometry is projected ONCE here; the
        # per-group loop below only slices views into `tcoords`.
        g_starts, g_stops = gb_all.geom_point_ranges()
        ext = float(self.extent)
        if self.tilespace:
            tx = gb_all.coords[:, 0]
            ty = gb_all.coords[:, 1]
        else:
            zs_r, xs_r, ys_r = xyz.tile_key_unpack(keys)
            t_minx, t_miny, t_maxx, t_maxy = xyz.tile_bbox_z(xs_r, ys_r, zs_r)
            sw_x, sw_y = proj_4326_to_3857(t_minx, t_miny)
            ne_x, ne_y = proj_4326_to_3857(t_maxx, t_maxy)
            dx = np.abs(sw_x - ne_x)
            dy = np.abs(sw_y - ne_y)
            npts = g_stops - g_starts
            rowidx = np.repeat(np.arange(len(keys), dtype=np.int64), npts)
            mx, my = proj_4326_to_3857(gb_all.coords[:, 0], gb_all.coords[:, 1])
            tx = (mx - sw_x[rowidx]) / dx[rowidx] * ext
            ty = ext - np.trunc((my - sw_y[rowidx]) / dy[rowidx] * ext)
        tcoords = np.stack([tx, ty], axis=1)
        # point-feature fast path: trunc + in-tile mask, vectorized
        is_pt = types == wkbmod.GEOM_POINT
        pt_x = np.trunc(tx[g_starts]).astype(np.int64)
        pt_y = np.trunc(ty[g_starts]).astype(np.int64)
        pt_in = (
            (tx[g_starts] >= 0) & (tx[g_starts] <= ext)
            & (ty[g_starts] >= 0) & (ty[g_starts] <= ext)
        )
        # per-geometry tile-space bbox (vectorized): classify fully-inside /
        # clearly-outside so the per-feature Python clip runs only for
        # border-crossing geometries
        gminx = np.minimum.reduceat(tx, g_starts)
        gmaxx = np.maximum.reduceat(tx, g_starts)
        gminy = np.minimum.reduceat(ty, g_starts)
        gmaxy = np.maximum.reduceat(ty, g_starts)
        g_fully_in = (gminx >= 0) & (gmaxx <= ext) & (gminy >= 0) & (gmaxy <= ext)
        g_outside = (gmaxx < 0) | (gminx > ext) | (gmaxy < 0) | (gminy > ext)

        uniq, starts = np.unique(keys, return_index=True)
        bounds = np.append(starts, len(keys))
        zs, xs, ys = xyz.tile_key_unpack(uniq)

        out_z, out_x, out_y, out_mvt, out_n, out_b = [], [], [], [], [], []
        import json as _json

        for gi in range(len(uniq)):
            lo, hi = int(bounds[gi]), int(bounds[gi + 1])
            layer_feats: dict[str, list[dict]] = {}
            for i in range(lo, hi):
                props = ()
                if props_json is not None and props_json[i]:
                    props = tuple(sorted(_json.loads(props_json[i]).items()))
                if is_pt[i]:
                    if not pt_in[i]:
                        continue
                    layer_feats.setdefault(layers[i], []).append(
                        {"props": props, "type": 1,
                         "pt": (int(pt_x[i]), int(pt_y[i])), "rings": None}
                    )
                    continue
                if g_outside[i]:
                    continue
                rings = [
                    tcoords[ring_off[r]:ring_off[r + 1]]
                    for r in range(geom_off[i], geom_off[i + 1])
                ]
                if g_fully_in[i]:
                    layer_feats.setdefault(layers[i], []).append(
                        {"props": props, "type": int(types[i]), "rings": rings}
                    )
                    continue
                for gtype, crings in _clip_feature(int(types[i]), rings, self.extent):
                    layer_feats.setdefault(layers[i], []).append(
                        {"props": props, "type": gtype, "rings": crings}
                    )
            layer_bufs = []
            for lname in sorted(layer_feats):
                lb = _assemble_layer(
                    layer_feats[lname], (0.0, 0.0, 1.0, 1.0, self.extent), lname
                )
                if lb:
                    layer_bufs.append(lb)
            if not layer_bufs:
                continue
            buf = b"".join(_len_field(3, lb) for lb in layer_bufs)
            out_z.append(int(zs[gi]))
            out_x.append(int(xs[gi]))
            out_y.append(int(ys[gi]))
            out_mvt.append(buf)
            out_n.append(hi - lo)
            out_b.append(len(buf))
        return pa.table(
            {
                "z": pa.array(out_z, pa.int8()),
                "x": pa.array(out_x, pa.int32()),
                "y": pa.array(out_y, pa.int32()),
                "mvt": pa.array(out_mvt, pa.binary()),
                "n_features": pa.array(out_n, pa.int32()),
                "bytes": pa.array(out_b, pa.int64()),
            }
        )


def _group_to_feats(group: pa.Table):
    """Decode a sorted tile group into per-layer feature dicts (lon/lat)."""
    blobs = group["geom_wkb"].to_pylist()
    gb = wkbmod.decode_wkb_batch(blobs)
    layers = group["layer"].to_pylist()
    props_json = (
        group["props_json"].to_pylist() if "props_json" in group.column_names else None
    )
    layer_feats: dict[str, list[dict]] = {}
    for i in range(len(gb)):
        props = ()
        if props_json is not None and props_json[i]:
            import json

            props = tuple(sorted(json.loads(props_json[i]).items()))
        layer_feats.setdefault(layers[i], []).append(
            {"props": props, "type": int(gb.types[i]), "rings": gb.rings_of(i)}
        )
    return layer_feats


_EMPTY_TILE_TABLE = pa.table(
    {
        "z": pa.array([], pa.int8()),
        "x": pa.array([], pa.int32()),
        "y": pa.array([], pa.int32()),
        "mvt": pa.array([], pa.binary()),
        "n_features": pa.array([], pa.int32()),
        "bytes": pa.array([], pa.int64()),
    }
)


class TilePrepare:
    """Phase-A callable for the salted path: (tile_key, salt) group →
    projected+clipped tile-space feature rows (geometry re-encoded as WKB in
    tile coordinates). Runs the per-feature heavy work on the salted key so
    hot cells are spread over the pool; the phase-B group on tile_key alone
    only merges + assembles protobuf.
    """

    def __call__(self, group: pa.Table) -> pa.Table:
        key = int(group["tile_key"][0].as_py())
        z, x, y = (int(v) for v in xyz.tile_key_unpack(np.uint64(key)))
        order = pa.compute.sort_indices(
            group, sort_keys=[("doc_id", "ascending"), ("span_idx", "ascending")]
        )
        group = group.take(order)
        tp = tile_params(z, x, y)

        blobs = group["geom_wkb"].to_pylist()
        gb = wkbmod.decode_wkb_batch(blobs)
        layers = group["layer"].to_pylist()
        doc_ids = group["doc_id"].to_pylist()
        span_idx = group["span_idx"].to_pylist()
        props_json = (
            group["props_json"].to_pylist() if "props_json" in group.column_names else None
        )

        out = {k: [] for k in (
            "tile_key", "doc_id", "span_idx", "part", "geom_type", "geom_wkb",
            "layer", "props_json",
        )}
        for i in range(len(gb)):
            tile_rings = [project_to_tile(r, tp) for r in gb.rings_of(i)]
            parts = _clip_feature(int(gb.types[i]), tile_rings, tp[4])
            for p, (gtype, rings) in enumerate(parts):
                if gtype == wkbmod.GEOM_POINT:
                    blob = wkbmod.encode_point(rings[0][0, 0], rings[0][0, 1])
                elif gtype == wkbmod.GEOM_LINESTRING:
                    blob = wkbmod.encode_linestring(rings[0])
                else:
                    blob = wkbmod.encode_polygon(rings)
                out["tile_key"].append(key)
                out["doc_id"].append(doc_ids[i])
                out["span_idx"].append(span_idx[i])
                out["part"].append(p)
                out["geom_type"].append(gtype)
                out["geom_wkb"].append(blob)
                out["layer"].append(layers[i])
                out["props_json"].append(props_json[i] if props_json else "")
        return pa.table(
            {
                "tile_key": pa.array(out["tile_key"], pa.uint64()),
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "span_idx": pa.array(out["span_idx"], pa.int32()),
                "part": pa.array(out["part"], pa.int32()),
                "geom_type": pa.array(out["geom_type"], pa.uint8()),
                "geom_wkb": pa.array(out["geom_wkb"], pa.binary()),
                "layer": pa.array(out["layer"], pa.string()),
                "props_json": pa.array(out["props_json"], pa.string()),
            }
        )


class TileFinalize:
    """Phase-B callable: tile_key group of tile-space features → tile row."""

    def __call__(self, group: pa.Table) -> pa.Table:
        key = int(group["tile_key"][0].as_py())
        z, x, y = (int(v) for v in xyz.tile_key_unpack(np.uint64(key)))
        order = pa.compute.sort_indices(
            group,
            sort_keys=[
                ("doc_id", "ascending"),
                ("span_idx", "ascending"),
                ("part", "ascending"),
            ],
        )
        group = group.take(order)
        layer_feats = _group_to_feats(group)
        buf = finalize_tile(layer_feats)
        if not buf:
            return _EMPTY_TILE_TABLE
        return pa.table(
            {
                "z": pa.array([z], pa.int8()),
                "x": pa.array([x], pa.int32()),
                "y": pa.array([y], pa.int32()),
                "mvt": pa.array([buf], pa.binary()),
                "n_features": pa.array([group.num_rows], pa.int32()),
                "bytes": pa.array([len(buf)], pa.int64()),
            }
        )


def _layer_hash_column(layer_col) -> pa.Array:
    """crc32 of the layer name per row (via dictionary encode — few
    distinct values), stable across processes."""
    import zlib

    arr = layer_col.combine_chunks() if isinstance(layer_col, pa.ChunkedArray) else layer_col
    enc = pa.compute.dictionary_encode(arr)
    dic = enc.dictionary.to_pylist()
    crcs = np.asarray([zlib.crc32(s.encode()) for s in dic], dtype=np.uint32)
    idx = enc.indices.to_numpy(zero_copy_only=False)
    return pa.array(crcs[idx], pa.uint32())


def ragged_to_geombatch(batch: pa.Table) -> wkbmod.GeomBatch:
    """Arrow ragged geometry columns → GeomBatch, fully vectorized.

    Expects ``coords`` (list<float64>, interleaved x,y per row) and
    ``ring_sizes`` (list<int32>, vertices per ring per row).
    """
    import pyarrow.compute as pc

    ccol = batch["coords"].combine_chunks()
    vals = pc.list_flatten(ccol).to_numpy(zero_copy_only=False)
    rcol = batch["ring_sizes"].combine_chunks()
    ring_sizes = pc.list_flatten(rcol).to_numpy(zero_copy_only=False).astype(np.int64)
    nrings = pc.list_value_length(rcol).to_numpy(zero_copy_only=False).astype(np.int64)
    geom_offsets = np.zeros(len(nrings) + 1, dtype=np.int64)
    np.cumsum(nrings, out=geom_offsets[1:])
    ring_offsets = np.zeros(len(ring_sizes) + 1, dtype=np.int64)
    np.cumsum(ring_sizes, out=ring_offsets[1:])
    return wkbmod.GeomBatch(
        types=batch["geom_type"].to_numpy(zero_copy_only=False),
        coords=vals.reshape(-1, 2),
        ring_offsets=ring_offsets,
        geom_offsets=geom_offsets,
    )


class TilespacePrepare:
    """Shuffle-free prepare stage: coverage rows → clipped tile-space rows.

    Projection + clipping are per-feature (each row carries its own tile
    key), so this runs as a plain ``map_batches`` over the *unsorted*
    coverage output — perfectly uniform parallelism, no skew. The sort
    shuffle that follows then carries only clipped tile-space geometry
    as Arrow-native ragged columns (``coords`` list<float64> +
    ``ring_sizes`` list<int32> — no WKB re-encode/re-decode between the
    phases; fully-inside geometries are gathered with one vectorized
    fancy-index), and the finalize stage
    (SortedBlockTileEncoder(tilespace=True)) only has merge + protobuf
    assembly left — shrinking the low-zoom mega-tile straggler to its
    irreducible part.
    """

    def __init__(self, extent: int = EXTENT):
        self.extent = extent
        e = float(extent)
        # the full-tile rectangle clip result is the same bytes for every
        # covered tile — encode it once (matches clip_polygon's rectangle
        # branch: [[minx,miny],[maxx,miny],[maxx,maxy],[minx,maxy]])
        self._rect_wkb = wkbmod.encode_polygon(
            [np.array([[0.0, 0.0], [e, 0.0], [e, e], [0.0, e]])]
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            cols = {
                "tile_key": pa.array([], pa.uint64()),
                "doc_id": pa.array([], pa.string()),
                "span_idx": pa.array([], pa.int32()),
                "part": pa.array([], pa.int32()),
                "geom_type": pa.array([], pa.uint8()),
                "geom_wkb": pa.array([], pa.binary()),
                "layer": pa.array([], pa.string()),
                "lhash": pa.array([], pa.uint32()),
            }
            if "props_json" in batch.column_names:
                cols["props_json"] = pa.array([], pa.string())
            return pa.table(cols)
        keys = batch["tile_key"].to_numpy(zero_copy_only=False)
        blobs = batch["geom_wkb"].to_pylist()
        gb_all = wkbmod.decode_wkb_batch(blobs)
        types = gb_all.types
        geom_off = gb_all.geom_offsets
        ring_off = gb_all.ring_offsets

        zs_r, xs_r, ys_r = xyz.tile_key_unpack(keys)
        t_minx, t_miny, t_maxx, t_maxy = xyz.tile_bbox_z(xs_r, ys_r, zs_r)
        sw_x, sw_y = proj_4326_to_3857(t_minx, t_miny)
        ne_x, ne_y = proj_4326_to_3857(t_maxx, t_maxy)
        dx = np.abs(sw_x - ne_x)
        dy = np.abs(sw_y - ne_y)
        g_starts, g_stops = gb_all.geom_point_ranges()
        npts = g_stops - g_starts
        rowidx = np.repeat(np.arange(n, dtype=np.int64), npts)
        mx, my = proj_4326_to_3857(gb_all.coords[:, 0], gb_all.coords[:, 1])
        ext = float(self.extent)
        tx = (mx - sw_x[rowidx]) / dx[rowidx] * ext
        ty = ext - np.trunc((my - sw_y[rowidx]) / dy[rowidx] * ext)
        tcoords = np.stack([tx, ty], axis=1)

        is_pt = types == wkbmod.GEOM_POINT
        gminx = np.minimum.reduceat(tx, g_starts)
        gmaxx = np.maximum.reduceat(tx, g_starts)
        gminy = np.minimum.reduceat(ty, g_starts)
        gmaxy = np.maximum.reduceat(ty, g_starts)
        g_fully_in = (gminx >= 0) & (gmaxx <= ext) & (gminy >= 0) & (gmaxy <= ext)
        g_outside = (gmaxx < 0) | (gminx > ext) | (gmaxy < 0) | (gminy > ext)

        # Payload is tile-space WKB in ONE binary column: a binary column
        # sorts/shuffles ~12× cheaper than ragged list<float64> columns in
        # Ray's range shuffle (sliced list arrays re-serialize their full
        # value buffers). Points are bulk-encoded vectorized.
        out_idx: list[int] = []
        out_part: list[int] = []
        out_type: list[int] = []
        out_wkb: list[bytes] = []
        pt_sel = np.nonzero(is_pt & g_fully_in)[0]
        if len(pt_sel):
            m = len(pt_sel)
            raw = np.empty((m, 21), dtype=np.uint8)
            raw[:, 0] = 1
            raw[:, 1] = wkbmod.GEOM_POINT
            raw[:, 2:5] = 0
            raw[:, 5:] = (
                np.ascontiguousarray(tcoords[g_starts[pt_sel]])
                .view(np.uint8).reshape(m, 16)
            )
            buf = raw.tobytes()
            out_wkb.extend(buf[i * 21:(i + 1) * 21] for i in range(m))
            out_idx.extend(pt_sel.tolist())
            out_part.extend([0] * m)
            out_type.extend([wkbmod.GEOM_POINT] * m)
        # fully-in linestrings: bulk WKB encode (vectorized buffer build)
        ln_sel = np.nonzero((types == wkbmod.GEOM_LINESTRING) & g_fully_in)[0]
        if len(ln_sel):
            ln_starts = ring_off[geom_off[ln_sel]]
            ln_stops = ring_off[geom_off[ln_sel] + 1]
            pt_idx = wkbmod.expand_ranges(ln_starts, ln_stops)
            out_wkb.extend(
                wkbmod.encode_linestrings_bulk(tcoords[pt_idx], ln_stops - ln_starts)
            )
            out_idx.extend(ln_sel.tolist())
            out_part.extend([0] * len(ln_sel))
            out_type.extend([wkbmod.GEOM_LINESTRING] * len(ln_sel))
        # fully-in polygons: per-feature (ragged rings)
        for i in np.nonzero((types == wkbmod.GEOM_POLYGON) & g_fully_in)[0].tolist():
            out_idx.append(i)
            out_part.append(0)
            out_type.append(wkbmod.GEOM_POLYGON)
            out_wkb.append(wkbmod.encode_polygon([
                tcoords[ring_off[r]:ring_off[r + 1]]
                for r in range(geom_off[i], geom_off[i + 1])
            ]))
        # border-crossing geometries: reference clip semantics per feature.
        # Single-ring polygons — the overwhelming majority at deep zooms —
        # are pre-classified in ONE bulk numpy pass (identical math to
        # clip_polygon's ring_intersects_rect shortcut, polygon.go:26-40):
        # no-border-hit + bbox-covers-tile ⇒ the constant full-tile
        # rectangle; no-border-hit + no containment ⇒ empty (GEOS
        # semantics); only true border-crossers take the per-feature path.
        cross_mask = ~g_fully_in & ~g_outside & ~is_pt
        nrings = geom_off[1:] - geom_off[:-1]
        sr_poly = cross_mask & (types == wkbmod.GEOM_POLYGON) & (nrings == 1)
        sr_idx = np.nonzero(sr_poly)[0]
        border_hit = np.zeros(len(sr_idx), dtype=bool)
        if len(sr_idx):
            r_starts = ring_off[geom_off[sr_idx]]
            r_stops = ring_off[geom_off[sr_idx] + 1]
            npt_r = r_stops - r_starts
            pidx = wkbmod.expand_ranges(r_starts, r_stops)
            fid = np.repeat(np.arange(len(sr_idx), dtype=np.int64), npt_r)
            nxt = pidx + 1
            ends = np.cumsum(npt_r) - 1
            nxt[ends] = r_starts
            border_hit = predmod.rings_hit_rect_bulk(
                tcoords[pidx, 0], tcoords[pidx, 1],
                tcoords[nxt, 0], tcoords[nxt, 1],
                fid, len(sr_idx), 0.0, 0.0, ext, ext,
            )
            covered = (
                (gminx[sr_idx] <= 0) & (gmaxx[sr_idx] >= ext)
                & (gminy[sr_idx] <= 0) & (gmaxy[sr_idx] >= ext)
            )
            rect_sel = sr_idx[~border_hit & covered]
            if len(rect_sel):
                rect_wkb = self._rect_wkb
                out_idx.extend(rect_sel.tolist())
                out_part.extend([0] * len(rect_sel))
                out_type.extend([wkbmod.GEOM_POLYGON] * len(rect_sel))
                out_wkb.extend([rect_wkb] * len(rect_sel))
            # ~border_hit & ~covered: disjoint — no output rows
        hit_of = dict(zip(sr_idx.tolist(), border_hit.tolist()))
        cross = np.nonzero(cross_mask)[0]
        for i in cross.tolist():
            bh = hit_of.get(i)
            if bh is False:
                continue  # handled (rectangle) or dropped (disjoint) above
            rings = [
                tcoords[ring_off[r]:ring_off[r + 1]]
                for r in range(geom_off[i], geom_off[i + 1])
            ]
            parts = _clip_feature(int(types[i]), rings, self.extent,
                                  border_hit=bh)
            for p, (gtype, crings) in enumerate(parts):
                out_idx.append(i)
                out_part.append(p)
                out_type.append(gtype)
                if gtype == wkbmod.GEOM_LINESTRING:
                    out_wkb.append(wkbmod.encode_linestring(crings[0]))
                else:
                    out_wkb.append(wkbmod.encode_polygon(crings))

        take = pa.array(np.asarray(out_idx, dtype=np.int64))
        layer_taken = batch["layer"].take(take)
        cols = {
            "tile_key": batch["tile_key"].take(take),
            "doc_id": batch["doc_id"].take(take),
            "span_idx": batch["span_idx"].take(take),
            "part": pa.array(out_part, pa.int32()),
            "geom_type": pa.array(np.asarray(out_type, dtype=np.uint8), pa.uint8()),
            "geom_wkb": pa.array(out_wkb, pa.binary()),
            "layer": layer_taken,
            # deterministic numeric layer key: sorting by (tile_key, lhash)
            # is far cheaper in the range shuffle than a string sort key;
            # crc collisions are harmless (the in-block canonical sort
            # re-separates by the actual layer string)
            "lhash": _layer_hash_column(layer_taken),
        }
        if "props_json" in batch.column_names:
            cols["props_json"] = batch["props_json"].take(take)
        return pa.table(cols)


class SortedBlockLayerEncoder:
    """Finalize phase A: (tile_key, layer)-sorted tile-space rows → one
    encoded LAYER protobuf per (tile, layer) group.

    Splitting finalize by layer parallelizes the low-zoom mega-tile
    straggler ~n_layers-ways: merge + command encoding + tag interning are
    all per-layer state, so layer messages are independent; phase B
    (assemble_tiles) just concatenates them ordered by layer name —
    byte-identical to single-pass assembly (tested).
    """

    def __init__(self, extent: int = EXTENT):
        self.extent = extent

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tile_key": pa.array([], pa.uint64()),
                "layer": pa.array([], pa.string()),
                "layer_buf": pa.array([], pa.binary()),
                "n_features": pa.array([], pa.int32()),
            }
        )
        if batch.num_rows == 0:
            return empty
        sort_keys = [
            ("tile_key", "ascending"),
            ("layer", "ascending"),
            ("doc_id", "ascending"),
            ("span_idx", "ascending"),
        ]
        if "part" in batch.column_names:
            sort_keys.append(("part", "ascending"))
        order = pa.compute.sort_indices(batch, sort_keys=sort_keys)
        batch = batch.take(order)
        keys = batch["tile_key"].to_numpy(zero_copy_only=False)
        layer_col = batch["layer"].combine_chunks()
        lcodes = pa.compute.dictionary_encode(layer_col)
        lidx = lcodes.indices.to_numpy(zero_copy_only=False)
        lnames = lcodes.dictionary.to_pylist()
        props_json = (
            batch["props_json"].to_pylist()
            if "props_json" in batch.column_names else None
        )
        if "coords" in batch.column_names:
            gb_all = ragged_to_geombatch(batch)
        else:
            gb_all = wkbmod.decode_wkb_batch(batch["geom_wkb"].to_pylist())
        types = gb_all.types
        geom_off = gb_all.geom_offsets
        ring_off = gb_all.ring_offsets
        g_starts, _ = gb_all.geom_point_ranges()
        tcoords = gb_all.coords
        ext = float(self.extent)
        is_pt = types == wkbmod.GEOM_POINT
        pt_x = np.trunc(tcoords[g_starts, 0]).astype(np.int64)
        pt_y = np.trunc(tcoords[g_starts, 1]).astype(np.int64)
        # block-level vectorized command streams, sliced per feature below
        batch_cmds = batch_encode_commands(gb_all, types == wkbmod.GEOM_POLYGON)
        # bulk varint geometry bytes for every point feature
        pt_geom_bufs: list = [None] * len(types)
        pt_sel = np.nonzero(is_pt)[0]
        if len(pt_sel):
            triples = np.empty((len(pt_sel), 3), dtype=np.uint64)
            triples[:, 0] = 9
            triples[:, 1] = encode_zigzag(pt_x[pt_sel])
            triples[:, 2] = encode_zigzag(pt_y[pt_sel])
            enc, sizes = _varint_array_sized(triples.reshape(-1))
            bounds = np.zeros(len(pt_sel) * 3 + 1, dtype=np.int64)
            np.cumsum(sizes, out=bounds[1:])
            starts = bounds[::3]
            for j, gi_ in enumerate(pt_sel.tolist()):
                pt_geom_bufs[gi_] = enc[starts[j]:starts[j + 1]]

        # group boundaries on (tile_key, layer code)
        n = len(keys)
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (keys[1:] != keys[:-1]) | (lidx[1:] != lidx[:-1])
        starts = np.nonzero(new_grp)[0]
        bounds = np.append(starts, n)

        out_key, out_layer, out_buf, out_n = [], [], [], []
        import json as _json

        tp = (0.0, 0.0, 1.0, 1.0, self.extent)
        for gi in range(len(starts)):
            lo, hi = int(bounds[gi]), int(bounds[gi + 1])
            feats = []
            for i in range(lo, hi):
                props = ()
                if props_json is not None and props_json[i]:
                    props = tuple(sorted(_json.loads(props_json[i]).items()))
                if is_pt[i]:
                    feats.append({"props": props, "type": 1,
                                  "pt": (int(pt_x[i]), int(pt_y[i])),
                                  "geom_buf": pt_geom_bufs[i], "rings": None})
                else:
                    rings = [
                        tcoords[ring_off[r]:ring_off[r + 1]]
                        for r in range(geom_off[i], geom_off[i + 1])
                    ]
                    feats.append({"props": props, "type": int(types[i]),
                                  "rings": rings, "gi": i})
            lname = lnames[lidx[lo]]
            buf = _assemble_layer(feats, tp, lname, batch_cmds=batch_cmds)
            if not buf:
                continue
            out_key.append(int(keys[lo]))
            out_layer.append(lname)
            out_buf.append(buf)
            out_n.append(hi - lo)
        if not out_key:
            return empty
        return pa.table(
            {
                "tile_key": pa.array(out_key, pa.uint64()),
                "layer": pa.array(out_layer, pa.string()),
                "layer_buf": pa.array(out_buf, pa.binary()),
                "n_features": pa.array(out_n, pa.int32()),
            }
        )


def assemble_tiles(batch: pa.Table) -> pa.Table:
    """Finalize phase B: concatenate layer messages per tile (sorted by
    layer name — the canonical order of encode_tile) → tile rows."""
    if batch.num_rows == 0:
        return _EMPTY_TILE_TABLE
    order = pa.compute.sort_indices(
        batch, sort_keys=[("tile_key", "ascending"), ("layer", "ascending")]
    )
    batch = batch.take(order)
    keys = batch["tile_key"].to_numpy(zero_copy_only=False)
    bufs = batch["layer_buf"].to_pylist()
    nfeat = batch["n_features"].to_numpy(zero_copy_only=False)
    uniq, starts = np.unique(keys, return_index=True)
    bounds = np.append(starts, len(keys))
    zs, xs, ys = xyz.tile_key_unpack(uniq)
    out_z, out_x, out_y, out_mvt, out_n, out_b = [], [], [], [], [], []
    for gi in range(len(uniq)):
        lo, hi = int(bounds[gi]), int(bounds[gi + 1])
        buf = b"".join(_len_field(3, bufs[i]) for i in range(lo, hi))
        out_z.append(int(zs[gi]))
        out_x.append(int(xs[gi]))
        out_y.append(int(ys[gi]))
        out_mvt.append(buf)
        out_n.append(int(nfeat[lo:hi].sum()))
        out_b.append(len(buf))
    return pa.table(
        {
            "z": pa.array(out_z, pa.int8()),
            "x": pa.array(out_x, pa.int32()),
            "y": pa.array(out_y, pa.int32()),
            "mvt": pa.array(out_mvt, pa.binary()),
            "n_features": pa.array(out_n, pa.int32()),
            "bytes": pa.array(out_b, pa.int64()),
        }
    )


def sorted_block_layer_encode(batch: pa.Table) -> pa.Table:
    return SortedBlockLayerEncoder()(batch)


def tilespace_prepare(batch: pa.Table) -> pa.Table:
    """Task-form of :class:`TilespacePrepare` (stateless — elastic tasks
    beat an autoscaling actor pool for this stage)."""
    return TilespacePrepare()(batch)


def sorted_block_encode(batch: pa.Table) -> pa.Table:
    """Task-form of :class:`SortedBlockTileEncoder` (lon/lat input)."""
    return SortedBlockTileEncoder()(batch)


def sorted_block_finalize(batch: pa.Table) -> pa.Table:
    """Task-form of SortedBlockTileEncoder(tilespace=True)."""
    return SortedBlockTileEncoder(tilespace=True)(batch)


# --------------------------------------------------------------- MVT reader


def decode_tile(buf: bytes) -> dict:
    """Minimal MVT decoder for tests: → {layer: {"features": [...], ...}}."""
    layers = {}
    for num, wire, val in _iter_fields(buf):
        if num == 3 and wire == 2:
            lay = _decode_layer(val)
            layers[lay["name"]] = lay
    return layers


def _iter_fields(buf: bytes):
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        num, wire = key >> 3, key & 0x7
        if wire == 0:
            v, i = _read_varint(buf, i)
            yield num, wire, v
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            yield num, wire, buf[i:i + ln]
            i += ln
        elif wire == 5:
            yield num, wire, buf[i:i + 4]
            i += 4
        elif wire == 1:
            yield num, wire, buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"bad wire type {wire}")


def _read_varint(buf: bytes, i: int):
    shift = 0
    out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _decode_layer(buf: bytes) -> dict:
    lay = {"name": None, "features": [], "keys": [], "values": [], "extent": None, "version": None}
    for num, wire, val in _iter_fields(buf):
        if num == 1:
            lay["name"] = val.decode("utf-8")
        elif num == 2:
            lay["features"].append(_decode_feature(val))
        elif num == 3:
            lay["keys"].append(val.decode("utf-8"))
        elif num == 4:
            lay["values"].append(_decode_value(val))
        elif num == 5:
            lay["extent"] = val
        elif num == 15:
            lay["version"] = val
    return lay


def _decode_feature(buf: bytes) -> dict:
    ft = {"tags": [], "type": None, "geometry": []}
    for num, wire, val in _iter_fields(buf):
        if num == 2:
            ft["tags"] = _unpack_varints(val)
        elif num == 3:
            ft["type"] = val
        elif num == 4:
            ft["geometry"] = _unpack_varints(val)
    return ft


def _decode_value(buf: bytes) -> object:
    for num, wire, val in _iter_fields(buf):
        if num == 1:
            return val.decode("utf-8")
        if num == 3:
            return np.frombuffer(val, dtype="<f8")[0]
        if num == 6:
            return _unzigzag(val)
        if num == 7:
            return bool(val)
    return None


def _unpack_varints(buf: bytes) -> list[int]:
    out = []
    i = 0
    while i < len(buf):
        v, i = _read_varint(buf, i)
        out.append(v)
    return out
