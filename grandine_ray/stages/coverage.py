"""Tile-coverage flat-map (reference lib/tile/bbox.go:5-21 + J2 in SURVEY).

One feature row → one row per covered (z, x, y) tile across the configured
zoom levels, fully vectorized (np.repeat + cumulative-offset arange; no
Python loop over rows). This is stage 1 of the tile shuffle; the groupby on
``tile_key`` that follows is the engine's only wide exchange.

Scale notes (100 TB design):
  * only the columns needed downstream travel through the shuffle
    (doc_id, span_idx, geom_type, geom_wkb, layer, tile key) — bbox columns
    are consumed here and dropped.
  * optional pre-clip at the deepest zoom is handled by the MVT encoder per
    tile; geometry bytes dominate, so the flat-map carries the *original*
    blob once per covered tile. Salting for hot cells is applied by the
    pipeline (runtime/tiler) before the groupby.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..index import xyz


def make_coverage_fn(zooms: list[int]):
    """Returns a map_batches fn emitting the tiled table for given zooms."""
    zooms = sorted(zooms)

    def coverage(batch: pa.Table) -> pa.Table:
        minx = batch["bbox_minx"].to_numpy(zero_copy_only=False)
        miny = batch["bbox_miny"].to_numpy(zero_copy_only=False)
        maxx = batch["bbox_maxx"].to_numpy(zero_copy_only=False)
        maxy = batch["bbox_maxy"].to_numpy(zero_copy_only=False)
        has_zoom = "zoom_min" in batch.column_names
        if has_zoom:  # per-feature zoom visibility (renderable, tiler.go:230-248)
            zmin = batch["zoom_min"].to_numpy(zero_copy_only=False)
            zmax = batch["zoom_max"].to_numpy(zero_copy_only=False)

        rows_parts = []
        key_parts = []
        for z in zooms:
            if has_zoom:
                vis = np.nonzero((zmin <= z) & (z <= zmax))[0]
                if len(vis) == 0:
                    continue
                row_idx, tx, ty = xyz.coverage_flatmap(
                    minx[vis], miny[vis], maxx[vis], maxy[vis], z
                )
                row_idx = vis[row_idx]
            else:
                row_idx, tx, ty = xyz.coverage_flatmap(minx, miny, maxx, maxy, z)
            rows_parts.append(row_idx)
            key_parts.append(xyz.tile_key(np.full(len(tx), z), tx, ty))
        if rows_parts:
            row_idx = np.concatenate(rows_parts)
            keys = np.concatenate(key_parts)
        else:
            row_idx = np.empty(0, dtype=np.int64)
            keys = np.empty(0, dtype=np.uint64)

        take = pa.array(row_idx)
        # large_binary: the fan-out × WKB bytes of one batch can exceed the
        # 2 GiB int32 offset limit when continent-sized features hit deep
        # zooms — large offsets make the take safe at any fan-out
        wkb_large = pc.cast(batch["geom_wkb"], pa.large_binary())
        cols = {
            "tile_key": pa.array(keys, pa.uint64()),
            "doc_id": batch["doc_id"].take(take),
            "span_idx": batch["span_idx"].take(take),
            "geom_type": batch["geom_type"].take(take),
            "geom_wkb": wkb_large.take(take),
            "layer": batch["layer"].take(take),
        }
        if "props_json" in batch.column_names:
            cols["props_json"] = pc.cast(
                batch["props_json"], pa.large_string()
            ).take(take)
        return pa.table(cols)

    return coverage
