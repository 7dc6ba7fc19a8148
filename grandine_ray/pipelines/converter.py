"""Format conversion + mapping pipeline (reference cmd/converter).

    read (codec by extension) → mapping filter/transform → encode

Multiple inputs concatenate into one logical output (converter.go README
"concatinate"); when mapping conditions are configured, non-matching
features are dropped and a feature matching k conditions is emitted k
times (converter.go:188-199).
"""
from __future__ import annotations

import pyarrow as pa

from ..sources import geojson as gj
from ..sources import spaten as sp
from ..stages.mapping import make_mapping_fn


def read_features(paths: list[str], **csv_kwargs):
    """Codec-by-extension multi-file reader → features Dataset."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for path, data in zip(batch["path"], batch["bytes"]):
            p = path.as_py()
            raw = data.as_py()
            if p.endswith(".spaten"):
                tables.append(sp.spaten_to_table(raw, source=p))
            elif p.endswith(".geojsonseq"):
                tables.append(gj.parse_feature_seq(raw.decode("utf-8"), source=p))
            elif p.endswith((".geojson", ".json")):
                tables.append(gj.parse_feature_collection(raw.decode("utf-8"), source=p))
            elif p.endswith((".csv", ".tsv")):
                tables.append(
                    gj.parse_points_csv(raw.decode("utf-8"), source=p, **csv_kwargs)
                )
            elif p.endswith(".wkt"):
                from ..sources.wkt import parse_wkt_lines

                tables.append(parse_wkt_lines(raw.decode("utf-8"), source=p))
            elif p.lower().endswith(".shp"):
                from ..sources.shapefile import (parse_shapefile,
                                                 read_sidecar_dbf)

                tables.append(parse_shapefile(
                    raw, dbf=read_sidecar_dbf(p), source=p))
            elif p.lower().endswith(".gpkg"):
                from ..sources.gpkg import parse_gpkg

                tables.append(parse_gpkg(raw, source=p))
            elif p.lower().endswith(".gpx"):
                from ..sources.gpx import parse_gpx

                tables.append(parse_gpx(raw.decode("utf-8"), source=p))
            else:
                raise ValueError(f"no codec for {p}")
        return pa.concat_tables(tables, promote_options="default")

    return files.map_batches(parse, batch_format="pyarrow")


def convert(paths: list[str], out_path: str, mapping_yaml: str | None = None,
            out_format: str = "spaten", **csv_kwargs) -> int:
    """Run the conversion; returns the number of output features."""
    ds = read_features(paths, **csv_kwargs)
    if mapping_yaml:
        ds = ds.map_batches(make_mapping_fn(mapping_yaml), batch_format="pyarrow")

    if out_format == "parquet":
        ds.write_parquet(out_path)
        return ds.count()

    # single-file formats stream through the driver (whole-file encoders
    # buffer in the reference too, converter.go:186,209-217)
    import json as _json

    if out_format == "spaten":
        def rows():
            for batch in ds.iter_batches(batch_size=1000, batch_format="pyarrow"):
                props = (
                    batch["props_json"].to_pylist()
                    if "props_json" in batch.column_names
                    else [""] * batch.num_rows
                )
                for blob, pj in zip(batch["geom_wkb"].to_pylist(), props):
                    yield {"geom_wkb": blob,
                           "props": _json.loads(pj) if pj else {}}

        return sp.write_spaten(out_path, rows())

    if out_format == "geojson":
        table = pa.concat_tables(
            list(ds.iter_batches(batch_size=4096, batch_format="pyarrow")),
            promote_options="default",
        )
        with open(out_path, "w") as f:
            f.write(gj.features_to_geojson(table))
        return table.num_rows

    if out_format == "gpx":
        from ..sources.gpx import features_to_gpx

        table = pa.concat_tables(
            list(ds.iter_batches(batch_size=4096, batch_format="pyarrow")),
            promote_options="default",
        )
        with open(out_path, "w") as f:
            f.write(features_to_gpx(table))
        return table.num_rows

    if out_format == "gpkg":
        from ..sources.gpkg import write_gpkg

        table = pa.concat_tables(
            list(ds.iter_batches(batch_size=4096, batch_format="pyarrow")),
            promote_options="default",
        )
        return write_gpkg(table, out_path)

    if out_format in ("shapefile", "shp"):
        from ..sources.shapefile import write_shapefile

        table = pa.concat_tables(
            list(ds.iter_batches(batch_size=4096, batch_format="pyarrow")),
            promote_options="default",
        )
        return write_shapefile(table, out_path)

    if out_format == "wkt":
        from ..sources.wkt import features_to_wkt

        table = pa.concat_tables(
            list(ds.iter_batches(batch_size=4096, batch_format="pyarrow")),
            promote_options="default",
        )
        with open(out_path, "w") as f:
            f.write(features_to_wkt(table))
        return table.num_rows

    raise ValueError(f"unsupported output format: {out_format}")
