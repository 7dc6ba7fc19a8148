"""documents → features extraction (SURVEY.md §2.2, ops/extract).

Vectorized ``map_batches`` kernel: flattens the ``spans`` list column with
pyarrow, selects ``kind == "geom"`` spans, bulk-decodes the hex WKB payload
(one ``bytes.fromhex`` per batch, not per row), parses geometry headers into
a ragged :class:`GeomBatch`, and emits the feature table with precomputed
bbox columns (turning Geom.BBox — reference geom.go:339-355 — into column
arithmetic).

The ``spans`` column itself never travels past this stage; the span-sequence
invariant (BASELINE.json:15) is preserved because documents are only read,
never mutated — round-trip tests re-read the source rows by doc_id.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geom import wkb as wkbmod


def extract_features(batch: pa.Table) -> pa.Table:
    spans = batch["spans"].combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)

    # span index within each doc = position - first position of that doc
    n_parent = len(parent)
    if n_parent:
        firsts = np.zeros(n_parent, dtype=np.int64)
        new_doc = np.empty(n_parent, dtype=bool)
        new_doc[0] = True
        new_doc[1:] = parent[1:] != parent[:-1]
        firsts[new_doc] = np.nonzero(new_doc)[0]
        np.maximum.accumulate(firsts, out=firsts)
        span_idx = np.arange(n_parent, dtype=np.int64) - firsts
    else:
        span_idx = np.empty(0, dtype=np.int64)

    kind = flat.field("kind")
    mask = pc.equal(kind, "geom").to_numpy(zero_copy_only=False)
    sel = np.nonzero(mask)[0]

    doc_id_all = batch["doc_id"].combine_chunks() if isinstance(
        batch["doc_id"], pa.ChunkedArray
    ) else batch["doc_id"]
    doc_ids = doc_id_all.take(pa.array(parent[sel]))
    texts = flat.field("text").take(pa.array(sel))
    media = flat.field("media_ref").take(pa.array(sel)).to_pylist()

    # bulk hex decode: join all hex payloads, one fromhex, split by offsets
    hexes = texts.to_pylist()
    joined = bytes.fromhex("".join(hexes))
    sizes = np.asarray([len(h) // 2 for h in hexes], dtype=np.int64)
    ends = np.cumsum(sizes)
    starts = ends - sizes
    blobs = [joined[s:e] for s, e in zip(starts, ends)]

    gb = wkbmod.decode_wkb_batch(blobs)
    bb = gb.bboxes()
    layers = [m[6:] if m.startswith("layer:") else "default" for m in media]

    return pa.table(
        {
            "doc_id": doc_ids,
            "span_idx": pa.array(span_idx[sel].astype(np.int32), pa.int32()),
            "geom_type": pa.array(gb.types, pa.uint8()),
            "geom_wkb": pa.array(blobs, pa.binary()),
            "bbox_minx": pa.array(bb[:, 0]),
            "bbox_miny": pa.array(bb[:, 1]),
            "bbox_maxx": pa.array(bb[:, 2]),
            "bbox_maxy": pa.array(bb[:, 3]),
            "layer": pa.array(layers, pa.string()),
        }
    )
