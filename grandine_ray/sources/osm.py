"""OSM PBF codec — from scratch (public osmformat/fileformat spec).

Reference behavior mirrored: cmd/spatialize reads OSM PBF via gosmparse
(S7/T6/J1 in SURVEY §2). This module supplies the format layer:

    file   := ( int32 BE header_len | BlobHeader | Blob )*
    BlobHeader { type:1 string; datasize:3 int32 }     "OSMHeader"|"OSMData"
    Blob       { raw:1 bytes | zlib_data:3 bytes; raw_size:2 }
    PrimitiveBlock { stringtable:1 { s:1 repeated bytes };
                     primitivegroup:2 repeated; granularity:17 (100);
                     lat_offset:19; lon_offset:20 }
    PrimitiveGroup { dense:2 DenseNodes; ways:3; relations:4 }
    DenseNodes { id:1 packed sint64 Δ; lat:8 / lon:9 packed sint64 Δ;
                 keys_vals:10 packed int32 (k v ... 0 per node) }
    Way  { id:1; keys:2 / vals:3 packed uint32; refs:8 packed sint64 Δ }
    Relation { id:1; keys:2/vals:3; roles_sid:8 packed int32;
               memids:9 packed sint64 Δ; types:10 packed enum }

    lat/lon degrees = 1e-9 * (offset + granularity * Δ-cumsum)

Both an encoder (deterministic test fixtures — no OSM extracts exist in
this sandbox) and a decoder are provided; delta/zigzag streams decode
vectorized with numpy. Blob boundaries are indexed up front so a Ray read
parallelizes across blobs of one file.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

from ..stages.mvt import _iter_fields, _len_field, _read_varint, _varint, _varint_field

NODE, WAY, RELATION = 0, 1, 2


def _zz(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzz(n: int) -> int:
    return (n >> 1) if (n & 1) == 0 else -((n + 1) >> 1)


def _unzz_arr(a: np.ndarray) -> np.ndarray:
    a = a.astype(np.int64)
    return np.where(a & 1 == 0, a >> 1, -((a + 1) >> 1))


def _packed_varints(buf: bytes) -> np.ndarray:
    out = []
    pos = 0
    n = len(buf)
    while pos < n:
        v, pos = _read_varint(buf, pos)
        out.append(v)
    return np.asarray(out, dtype=np.uint64)


def _pack_varints(vals) -> bytes:
    return b"".join(_varint(int(v)) for v in vals)


# -------------------------------------------------------------------- encode


class PBFWriter:
    """Deterministic OSM PBF builder (for fixtures and round-trip tests)."""

    def __init__(self, granularity: int = 100):
        self.granularity = granularity
        self.blocks: list[bytes] = []

    def _string_table(self, strings: list[str]) -> bytes:
        body = b""
        for s in strings:
            body += _len_field(1, s.encode("utf-8"))
        return body

    def add_block(self, nodes=(), ways=(), relations=()):
        """nodes: [(id, lon, lat, {tags})]; ways: [(id, [refs], {tags})];
        relations: [(id, [(member_id, type, role)], {tags})]."""
        strings = [""]  # index 0 reserved (delimiter in keys_vals)
        sidx: dict[str, int] = {"": 0}

        def intern(s: str) -> int:
            if s not in sidx:
                sidx[s] = len(strings)
                strings.append(s)
            return sidx[s]

        groups = b""
        if nodes:
            ids = np.asarray([n[0] for n in nodes], dtype=np.int64)
            lons = np.asarray([round(n[1] * 1e9) for n in nodes], dtype=np.int64)
            lats = np.asarray([round(n[2] * 1e9) for n in nodes], dtype=np.int64)
            g = self.granularity
            id_d = np.diff(ids, prepend=0)
            lat_d = np.diff(lats // g, prepend=0)
            lon_d = np.diff(lons // g, prepend=0)
            kv: list[int] = []
            for n in nodes:
                for k, v in (n[3] or {}).items():
                    kv.append(intern(k))
                    kv.append(intern(str(v)))
                kv.append(0)
            dense = (
                _len_field(1, _pack_varints(_zz(int(v)) for v in id_d))
                + _len_field(8, _pack_varints(_zz(int(v)) for v in lat_d))
                + _len_field(9, _pack_varints(_zz(int(v)) for v in lon_d))
                + _len_field(10, _pack_varints(kv))
            )
            groups += _len_field(2, _len_field(2, dense))
        for wid, refs, tags in ways:
            refs = np.asarray(refs, dtype=np.int64)
            ref_d = np.diff(refs, prepend=0)
            body = _varint_field(1, wid)
            body += _len_field(2, _pack_varints(intern(k) for k in (tags or {})))
            body += _len_field(3, _pack_varints(intern(str(v)) for v in (tags or {}).values()))
            body += _len_field(8, _pack_varints(_zz(int(v)) for v in ref_d))
            groups += _len_field(2, _len_field(3, body))
        for rid, members, tags in relations:
            memids = np.asarray([m[0] for m in members], dtype=np.int64)
            mem_d = np.diff(memids, prepend=0)
            body = _varint_field(1, rid)
            body += _len_field(2, _pack_varints(intern(k) for k in (tags or {})))
            body += _len_field(3, _pack_varints(intern(str(v)) for v in (tags or {}).values()))
            body += _len_field(8, _pack_varints(intern(m[2]) for m in members))
            body += _len_field(9, _pack_varints(_zz(int(v)) for v in mem_d))
            body += _len_field(10, _pack_varints(m[1] for m in members))
            groups += _len_field(2, _len_field(4, body))

        block = _len_field(1, self._string_table(strings)) + groups
        if self.granularity != 100:
            block += _varint_field(17, self.granularity)
        self.blocks.append(block)

    def tobytes(self) -> bytes:
        out = b""
        header_block = _len_field(4, b"OsmSchema-V0.6") + _len_field(4, b"DenseNodes")
        out += self._frame("OSMHeader", header_block)
        for b in self.blocks:
            out += self._frame("OSMData", b)
        return out

    def _frame(self, btype: str, payload: bytes) -> bytes:
        z = zlib.compress(payload)
        blob = _varint_field(2, len(payload)) + _len_field(3, z)
        hdr = _len_field(1, btype.encode()) + _varint_field(3, len(blob))
        return struct.pack(">I", len(hdr)) + hdr + blob


def write_pbf(path: str, nodes=(), ways=(), relations=(), block_size: int = 8000):
    w = PBFWriter()
    nodes = list(nodes)
    for i in range(0, max(1, len(nodes)), block_size):
        chunk = nodes[i:i + block_size]
        if chunk or (i == 0 and not (ways or relations)):
            w.add_block(nodes=chunk)
    if ways or relations:
        w.add_block(ways=list(ways), relations=list(relations))
    data = w.tobytes()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


# -------------------------------------------------------------------- decode


def scan_blob_index(path: str) -> list[tuple[int, int, str]]:
    """(offset, size, type) per blob — enables blob-parallel Ray reads."""
    out = []
    with open(path, "rb") as f:
        while True:
            lenbuf = f.read(4)
            if len(lenbuf) < 4:
                break
            hlen = struct.unpack(">I", lenbuf)[0]
            hdr = f.read(hlen)
            btype = ""
            dsize = 0
            for num, wire, val in _iter_fields(hdr):
                if num == 1:
                    btype = val.decode()
                elif num == 3:
                    dsize = val
            off = f.tell()
            f.seek(dsize, 1)
            out.append((off, dsize, btype))
    return out


def _read_blob(path: str, offset: int, size: int) -> bytes:
    with open(path, "rb") as f:
        f.seek(offset)
        blob = f.read(size)
    raw = None
    for num, wire, val in _iter_fields(blob):
        if num == 1:
            raw = val
        elif num == 3:
            raw = zlib.decompress(val)
    return raw or b""


def decode_block(payload: bytes) -> dict:
    """PrimitiveBlock → {"nodes": (ids, lons, lats, tags_list),
    "ways": [(id, refs, tags)], "relations": [(id, members, tags)]}."""
    strings: list[str] = []
    granularity = 100
    lat_off = lon_off = 0
    groups = []
    for num, wire, val in _iter_fields(payload):
        if num == 1:
            for snum, _, sval in _iter_fields(val):
                if snum == 1:
                    strings.append(sval.decode("utf-8"))
        elif num == 2:
            groups.append(val)
        elif num == 17:
            granularity = val
        elif num == 19:
            lat_off = val
        elif num == 20:
            lon_off = val

    all_ids = []
    all_lons = []
    all_lats = []
    all_tags = []
    ways = []
    rels = []
    for g in groups:
        for num, wire, val in _iter_fields(g):
            if num == 2:  # DenseNodes
                idb = latb = lonb = kvb = b""
                for dnum, _, dval in _iter_fields(val):
                    if dnum == 1:
                        idb = dval
                    elif dnum == 8:
                        latb = dval
                    elif dnum == 9:
                        lonb = dval
                    elif dnum == 10:
                        kvb = dval
                ids = np.cumsum(_unzz_arr(_packed_varints(idb)))
                lats = np.cumsum(_unzz_arr(_packed_varints(latb)))
                lons = np.cumsum(_unzz_arr(_packed_varints(lonb)))
                lat_deg = 1e-9 * (lat_off + granularity * lats)
                lon_deg = 1e-9 * (lon_off + granularity * lons)
                kv = _packed_varints(kvb).astype(np.int64)
                tags_list: list[dict] = []
                cur: dict = {}
                i = 0
                while i < len(kv):
                    if kv[i] == 0:
                        tags_list.append(cur)
                        cur = {}
                        i += 1
                    else:
                        cur[strings[kv[i]]] = strings[kv[i + 1]]
                        i += 2
                while len(tags_list) < len(ids):
                    tags_list.append({})
                all_ids.append(ids)
                all_lons.append(lon_deg)
                all_lats.append(lat_deg)
                all_tags.extend(tags_list)
            elif num == 3:  # Way
                wid = 0
                keys = vals = refsb = b""
                for wnum, _, wval in _iter_fields(val):
                    if wnum == 1:
                        wid = wval
                    elif wnum == 2:
                        keys = wval
                    elif wnum == 3:
                        vals = wval
                    elif wnum == 8:
                        refsb = wval
                refs = np.cumsum(_unzz_arr(_packed_varints(refsb)))
                tags = {
                    strings[int(k)]: strings[int(v)]
                    for k, v in zip(_packed_varints(keys), _packed_varints(vals))
                }
                ways.append((wid, refs, tags))
            elif num == 4:  # Relation
                rid = 0
                keys = vals = roles = memb = typesb = b""
                for rnum, _, rval in _iter_fields(val):
                    if rnum == 1:
                        rid = rval
                    elif rnum == 2:
                        keys = rval
                    elif rnum == 3:
                        vals = rval
                    elif rnum == 8:
                        roles = rval
                    elif rnum == 9:
                        memb = rval
                    elif rnum == 10:
                        typesb = rval
                memids = np.cumsum(_unzz_arr(_packed_varints(memb)))
                role_idx = _packed_varints(roles).astype(np.int64)
                mtypes = _packed_varints(typesb).astype(np.int64)
                tags = {
                    strings[int(k)]: strings[int(v)]
                    for k, v in zip(_packed_varints(keys), _packed_varints(vals))
                }
                members = [
                    (int(m), int(t), strings[int(r)])
                    for m, t, r in zip(memids, mtypes, role_idx)
                ]
                rels.append((rid, members, tags))

    nodes = (
        np.concatenate(all_ids) if all_ids else np.empty(0, np.int64),
        np.concatenate(all_lons) if all_lons else np.empty(0),
        np.concatenate(all_lats) if all_lats else np.empty(0),
        all_tags,
    )
    return {"nodes": nodes, "ways": ways, "relations": rels}


def read_pbf(path: str) -> dict:
    """Whole-file decode (driver-side / tests)."""
    out = {"nodes": [], "ways": [], "relations": []}
    nodes_parts = []
    for off, size, btype in scan_blob_index(path):
        if btype != "OSMData":
            continue
        block = decode_block(_read_blob(path, off, size))
        nodes_parts.append(block["nodes"])
        out["ways"].extend(block["ways"])
        out["relations"].extend(block["relations"])
    ids = np.concatenate([p[0] for p in nodes_parts]) if nodes_parts else np.empty(0, np.int64)
    lons = np.concatenate([p[1] for p in nodes_parts]) if nodes_parts else np.empty(0)
    lats = np.concatenate([p[2] for p in nodes_parts]) if nodes_parts else np.empty(0)
    tags: list[dict] = []
    for p in nodes_parts:
        tags.extend(p[3])
    out["nodes"] = (ids, lons, lats, tags)
    return out
