"""Spaten format codec (reference lib/spaten/* + fileformat/fileformat.proto).

Wire format (lowlevel.go:17-101):

    header:  "SPAT" + uint32 LE version (=0)                     [8 bytes]
    block:   uint32 LE bodyLen | uint16 LE flags | uint8 compression(=0)
             | uint8 messageType(=0) | protobuf Body             [repeated]

    Body    { Meta meta = 1; repeated Feature feature = 2; }
    Meta    { repeated Tag tags = 1; }
    Feature { GeomType geomtype=1; GeomSerialization geomserial=2;
              bytes geom=3 (LE WKB); double left/right/top/bottom=4..7;
              repeated Tag tags=8; }
    Tag     { string key=1; bytes value=2; ValueType type=3 (STRING/INT/DOUBLE); }

The protobuf is hand-rolled (same varint writer as the MVT codec). Typed
tag values follow transform.go:13-31: str→STRING utf-8 bytes, int→INT
int64 LE, float→DOUBLE LE, None→empty STRING.

Parallelism note (scale design): a Spaten file is a sequential stream of
length-prefixed blocks with no index, and the reference explicitly forbids
parallel reads of one file (chunks.go:13-16) — so the Ray reader
parallelizes across *files* (one read task per file) and across blocks
after a single cheap block-boundary scan; feature decode is the heavy part
and runs in map_batches over block payloads.
"""
from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..geom import wkb as wkbmod
from ..stages.mvt import _iter_fields, _len_field, _varint_field

COOKIE = b"SPAT"
VERSION = 0

TAG_STRING = 0
TAG_INT = 1
TAG_DOUBLE = 2


class SpatenError(ValueError):
    pass


# ------------------------------------------------------------------- encode


def _encode_tag(key: str, value) -> bytes:
    if value is None:
        val, typ = b"", TAG_STRING
    elif isinstance(value, bool):  # bools are not typed; mirror Go: error →
        raise SpatenError("unsupported tag type: bool")
    elif isinstance(value, str):
        val, typ = value.encode("utf-8"), TAG_STRING
    elif isinstance(value, (int, np.integer)):
        val, typ = struct.pack("<q", int(value)), TAG_INT
    elif isinstance(value, float):
        val, typ = struct.pack("<d", value), TAG_DOUBLE
    else:
        raise SpatenError(f"unsupported tag type: {type(value)}")
    out = _len_field(1, key.encode("utf-8")) + _len_field(2, val)
    if typ:
        out += _varint_field(3, typ)
    return out


def _decode_tag(buf: bytes):
    key, val, typ = "", b"", TAG_STRING
    for num, wire, v in _iter_fields(buf):
        if num == 1:
            key = v.decode("utf-8")
        elif num == 2:
            val = v
        elif num == 3:
            typ = v
    if typ == TAG_STRING:
        return key, val.decode("utf-8")
    if typ == TAG_INT:
        return key, struct.unpack("<q", val)[0]
    if typ == TAG_DOUBLE:
        return key, struct.unpack("<d", val)[0]
    raise SpatenError(f"unsupported tag value type: {typ}")


def encode_block(features: list[dict], meta: dict | None = None) -> bytes:
    """features: [{"geom_wkb": bytes, "props": {k: v}}] → one block."""
    body = b""
    meta_buf = b""
    for k, v in (meta or {}).items():
        meta_buf += _len_field(1, _encode_tag(k, v))
    body += _len_field(1, meta_buf)
    for ft in features:
        fbuf = _len_field(3, ft["geom_wkb"])
        for k, v in (ft.get("props") or {}).items():
            fbuf += _len_field(8, _encode_tag(k, v))
        body += _len_field(2, fbuf)
    header = struct.pack("<IHBB", len(body), 0, 0, 0)
    return header + body


def write_spaten(path: str, feature_iter, block_size: int = 1000,
                 srid: str = "4326") -> int:
    """Write features ({"geom_wkb", "props"}) to a Spaten file; returns count."""
    n = 0
    with open(path, "wb") as f:
        f.write(COOKIE + struct.pack("<I", VERSION))
        block: list[dict] = []
        first = True
        for ft in feature_iter:
            block.append(ft)
            n += 1
            if len(block) >= block_size:
                f.write(encode_block(block, {"@srid": srid} if first else None))
                first = False
                block = []
        if block or first:
            f.write(encode_block(block, {"@srid": srid} if first else None))
    return n


# ------------------------------------------------------------------- decode


def read_header(buf: bytes) -> int:
    if len(buf) < 8:
        raise SpatenError("could not read file header cookie")
    if buf[:4] != COOKIE:
        raise SpatenError("invalid cookie")
    vers = struct.unpack("<I", buf[4:8])[0]
    if vers > VERSION:
        raise SpatenError("invalid file version")
    return vers


def iter_blocks(buf: bytes):
    """Yield (features, meta) per block; mirrors readBlock error behavior."""
    read_header(buf)
    pos = 8
    while pos < len(buf):
        if len(buf) - pos < 8:
            if len(buf) - pos == 0:
                return
            raise SpatenError("could not read block header")
        body_len, flags, compression, mtype = struct.unpack_from("<IHBB", buf, pos)
        if compression != 0:
            raise SpatenError("compression is not supported")
        if mtype != 0:
            raise SpatenError("message type is not supported")
        pos += 8
        if len(buf) - pos < body_len:
            raise SpatenError(
                f"incomplete block: expected {body_len} bytes, {len(buf) - pos} available"
            )
        body = buf[pos:pos + body_len]
        pos += body_len
        feats = []
        meta = {}
        for num, wire, val in _iter_fields(body):
            if num == 1:
                for mnum, _, mval in _iter_fields(val):
                    if mnum == 1:
                        k, v = _decode_tag(mval)
                        meta[k] = v
            elif num == 2:
                geom = b""
                props = {}
                for fnum, _, fval in _iter_fields(val):
                    if fnum == 3:
                        geom = fval
                    elif fnum == 8:
                        k, v = _decode_tag(fval)
                        props[k] = v
                feats.append({"geom_wkb": geom, "props": props})
        yield feats, meta


def spaten_to_table(buf: bytes, source: str = "") -> pa.Table:
    """Whole-file decode → features table (bbox computed from WKB)."""
    rows_wkb: list[bytes] = []
    rows_props: list[dict] = []
    for feats, _meta in iter_blocks(buf):
        for ft in feats:
            rows_wkb.append(ft["geom_wkb"])
            rows_props.append(ft["props"])
    gb = wkbmod.decode_wkb_batch(rows_wkb)
    bb = gb.bboxes()
    import json

    layers = [str(p.get("@layer", "default")) for p in rows_props]
    return pa.table(
        {
            "doc_id": pa.array([source] * len(rows_wkb), pa.string()),
            "span_idx": pa.array(np.arange(len(rows_wkb), dtype=np.int32), pa.int32()),
            "geom_type": pa.array(gb.types, pa.uint8()),
            "geom_wkb": pa.array(rows_wkb, pa.binary()),
            "bbox_minx": pa.array(bb[:, 0]),
            "bbox_miny": pa.array(bb[:, 1]),
            "bbox_maxx": pa.array(bb[:, 2]),
            "bbox_maxy": pa.array(bb[:, 3]),
            "layer": pa.array(layers, pa.string()),
            "props_json": pa.array(
                [json.dumps({k: v for k, v in p.items() if not k.startswith("@")},
                            sort_keys=True) if p else ""
                 for p in rows_props],
                pa.string(),
            ),
        }
    )


def read_spaten_dataset(paths):
    """Ray reader: file-parallel decode into the features schema."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            spaten_to_table(data.as_py(), source=path.as_py())
            for path, data in zip(batch["path"], batch["bytes"])
        ]
        return pa.concat_tables(tables) if tables else spaten_to_table(
            COOKIE + b"\x00" * 4
        )

    return files.map_batches(parse, batch_format="pyarrow")
