"""Arrow schemas for the engine's tables (SURVEY.md §1.5, FIXTURES.md §1-2)."""
from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

DOCUMENTS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

FEATURES = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("geom_type", pa.uint8()),
        pa.field("geom_wkb", pa.binary()),
        pa.field("bbox_minx", pa.float64()),
        pa.field("bbox_miny", pa.float64()),
        pa.field("bbox_maxx", pa.float64()),
        pa.field("bbox_maxy", pa.float64()),
        pa.field("layer", pa.string()),
    ]
)

TILES = pa.schema(
    [
        pa.field("z", pa.int8()),
        pa.field("x", pa.int32()),
        pa.field("y", pa.int32()),
        pa.field("mvt", pa.binary()),
        pa.field("n_features", pa.int32()),
        pa.field("bytes", pa.int64()),
    ]
)

MANIFEST = pa.schema(
    [
        pa.field("partition_id", pa.string()),
        pa.field("input_fragment", pa.string()),
        pa.field("cell_range_min", pa.uint64()),
        pa.field("cell_range_max", pa.uint64()),
        pa.field("rows", pa.int64()),
        pa.field("bytes", pa.int64()),
        pa.field("wall_s", pa.float64()),
        pa.field("status", pa.string()),
    ]
)
