"""The flagship pipeline: documents → vector tiles (SURVEY §3.1 Ray form).

    docs  = ray.data.read_parquet(...)                     # streaming read
    feats = docs.map_batches(extract_features)             # spans → features
    tiled = feats.map_batches(coverage)                    # 1 row → N (z,x,y)
    prep  = tiled.map_batches(tilespace_prepare)           # project+clip, no shuffle
    lbuf  = prep.sort(tile_key, lhash) |> per-layer encode # THE shuffle
    tiles = lbuf.sort(tile_key) |> layer concat            # tiny second pass
    tiles → partitioned parquet + per-partition manifest + JOB.json

Replaces the reference's single-process FeatureCache + worker goroutines
(cmd/tiler/tiler.go, featurecache*.go) with one wide exchange; no global
feature index exists anywhere.

Skew handling (BASELINE.json: "skewed hot cells are salted and
re-partitioned explicitly"): the default "prepared" strategy removes
compute skew structurally — the per-feature heavy work (projection,
clipping, WKB) runs BEFORE the shuffle on uniform blocks, and the
per-(tile, layer) encode splits low-zoom mega-tiles across layer groups.
Explicit hot-cell salting (sampled counts broadcast via ``ray.put``,
``salt = hash(doc_id) % k``) remains available as strategy="salted" and
produces byte-identical tiles (tested).
"""
from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..index import xyz
from ..stages.coverage import make_coverage_fn
from ..stages.extract import extract_features
from ..stages.mvt import (
    TileFinalize,
    TilePrepare,
    sorted_block_encode,
    tilespace_prepare,
)
from ..state.checkpoint import (
    completed_partitions,
    partition_of_keys,
    write_partition,
    write_tiles_partition,
)

DEFAULT_ZOOMS = list(range(0, 9))

_EMPTY_MANIFEST_TABLE = pa.table({
    "partition_id": pa.array([], pa.string()),
    "input_fragment": pa.array([], pa.string()),
    "cell_range_min": pa.array([], pa.uint64()),
    "cell_range_max": pa.array([], pa.uint64()),
    "rows": pa.array([], pa.int64()),
    "bytes": pa.array([], pa.int64()),
    "wall_s": pa.array([], pa.float64()),
    "status": pa.array([], pa.string()),
})


from ..state.runtime import pin_local as _pin_local  # shared util (r5)


def read_documents(path: str) -> rd.Dataset:
    """Storage seam: Lance when available, else Parquet (SURVEY §7.0)."""
    try:  # pragma: no cover - lance not in this sandbox
        import lance  # noqa: F401

        return rd.read_lance(path)
    except ImportError:
        return rd.read_parquet(path)


def features_dataset(docs: rd.Dataset) -> rd.Dataset:
    return docs.map_batches(extract_features, batch_format="pyarrow")


def read_features_any(path: str, mapping_yaml: str | None = None) -> rd.Dataset:
    """Features from any input: interleaved documents (parquet/lance) or a
    Spaten / GeoJSON / CSV file tree (the reference tiler's input), with an
    optional mapping ruleset applied (converter → tiler flow)."""
    if path.lower().endswith((".spaten", ".geojson", ".geojsonseq",
                              ".csv", ".tsv", ".wkt", ".shp", ".gpkg",
                              ".gpx")):
        from .converter import read_features

        feats = read_features([path])
    else:
        feats = features_dataset(read_documents(path))
    if mapping_yaml:
        from ..stages.mapping import make_mapping_fn

        feats = feats.map_batches(make_mapping_fn(mapping_yaml),
                                  batch_format="pyarrow")
    return feats


def detect_hot_cells(
    docs: rd.Dataset | None,
    zooms: list[int],
    sample_fraction: float = 0.05,
    threshold: int = 2000,
    seed: int = 42,
    features: rd.Dataset | None = None,
    stats: dict | None = None,
) -> np.ndarray:
    """Sample pre-pass: estimate per-tile feature counts, return hot keys.

    ``threshold`` applies to the *estimated full* count (sample count
    scaled by 1/fraction). The driver collects ONLY the post-threshold hot
    keys — the full per-tile aggregate stays in the cluster (``stats``,
    when given, records ``collected_rows`` so tests can pin that bound).
    """
    if features is not None:
        sample = features.random_sample(sample_fraction, seed=seed)
    else:
        sample = features_dataset(docs.random_sample(sample_fraction, seed=seed))
    tiled = sample.map_batches(
        make_coverage_fn(zooms), batch_format="pyarrow"
    )

    def count_keys(batch: pa.Table) -> pa.Table:
        keys, counts = np.unique(
            batch["tile_key"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({"tile_key": pa.array(keys, pa.uint64()),
                         "n": pa.array(counts, pa.int64())})

    partials = tiled.map_batches(count_keys, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    agg = partials.groupby("tile_key").aggregate(Sum("n", alias_name="n"))

    # apply the threshold INSIDE the pipeline: the driver collects only the
    # hot keys (tiny by definition), never the full per-tile count aggregate
    # (up to ~2.7e8 rows at z14 planet scale)
    min_sample_n = threshold * sample_fraction

    def keep_hot(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(n >= min_sample_n))

    hot_df = agg.map_batches(keep_hot, batch_format="pyarrow").to_pandas()
    if stats is not None:
        stats["collected_rows"] = len(hot_df)
    return hot_df["tile_key"].to_numpy().astype(np.uint64)


def _add_salt(hot_ref, salt_k: int):
    """Coverage post-stage: salt rows on hot tile keys."""

    def salt(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref) if hot_ref is not None else None
        keys = batch["tile_key"].to_numpy(zero_copy_only=False)
        salt_col = np.zeros(len(keys), dtype=np.int32)
        if hot is not None and len(hot):
            mask = np.isin(keys, hot)
            if mask.any():
                doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
                # crc32, not hash(): per-process SipHash seeding would make the
                # salt partitioning differ between runs, breaking clean resume
                h = np.asarray(
                    [zlib.crc32(str(d).encode()) & 0x7FFFFFFF
                     for d in doc_ids[mask]], dtype=np.int64
                )
                salt_col[mask] = (h % salt_k).astype(np.int32)
        return batch.append_column("salt", pa.array(salt_col, pa.int32()))

    return salt


def _prepared_layer_bufs(tiled: rd.Dataset) -> rd.Dataset:
    """The "prepared" strategy's heavy half: shuffle-free per-feature
    project+clip (uniform parallelism), then ONE sort on (tile_key, lhash)
    of the clipped tile-space rows, then per-(tile, layer) merge+encode —
    splits mega-tile stragglers n_layers-ways. Output rows are encoded
    layer messages (tile_key, layer, layer_buf, n_features); a tiny
    layer-concat per tile finishes them (assemble_tiles), either after a
    second sort (compute-only path) or inside the per-partition write
    groupby (run_tiler's fused write path)."""
    from ..stages.mvt import sorted_block_layer_encode

    prepared = tiled.map_batches(tilespace_prepare, batch_format="pyarrow")
    return prepared.sort(["tile_key", "lhash"]).map_batches(
        sorted_block_layer_encode, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )


def _tiled_rows(
    feats: rd.Dataset,
    zooms: list[int],
    skip_partitions: set[int] | None,
) -> rd.Dataset:
    """coverage (1 feature row → N (z,x,y) rows) + the pre-shuffle resume
    filter that drops rows of already-completed output partitions."""
    tiled = feats.map_batches(make_coverage_fn(zooms), batch_format="pyarrow")
    if skip_partitions:
        skip = np.asarray(sorted(skip_partitions), dtype=np.int64)

        def resume_filter(batch: pa.Table) -> pa.Table:
            keys = batch["tile_key"].to_numpy(zero_copy_only=False)
            pids = partition_of_keys(keys)
            return batch.filter(pa.array(~np.isin(pids, skip)))

        tiled = tiled.map_batches(resume_filter, batch_format="pyarrow")
    return tiled


def tile_dataset(
    docs: rd.Dataset | None = None,
    zooms: list[int] | None = None,
    features: rd.Dataset | None = None,
    salt: bool = False,
    salt_k: int = 8,
    hot_keys: np.ndarray | None = None,
    skip_partitions: set[int] | None = None,
    encoder_concurrency=None,
    strategy: str = "prepared",
) -> rd.Dataset:
    """documents Dataset → tiles Dataset (z, x, y, mvt, n_features, bytes).

    strategy (all three produce byte-identical tiles — tested):
      * "prepared" (default): shuffle-free per-feature project+clip stage,
        then one sort of clipped tile-space rows, then per-(tile, layer)
        merge+assemble — uniform parallelism in the heavy stage, mega-tile
        stragglers split across layers.
      * "direct": single sort + full block-level encode (reference shape).
      * "salted": explicit hot-cell salting with a two-phase groupby.
    """
    zooms = zooms if zooms is not None else DEFAULT_ZOOMS
    feats = docs if features is None else features
    if features is None:
        feats = features_dataset(docs)
    tiled = _tiled_rows(feats, zooms, skip_partitions)

    # concurrency only applies to the legacy "salted" groupby path (its
    # class-based map_groups requires an explicit pool); the default
    # prepared/direct paths run as elastic stateless tasks.
    if encoder_concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        encoder_concurrency = (1, max(2, ncpu))
    kwargs = {"concurrency": encoder_concurrency}

    if salt or strategy == "salted":
        if hot_keys is None:
            hot_keys = detect_hot_cells(docs, zooms, features=features)
        hot_ref = ray.put(hot_keys) if hot_keys is not None and len(hot_keys) else None
        tiled = tiled.map_batches(_add_salt(hot_ref, salt_k), batch_format="pyarrow")
        prepared = tiled.groupby(["tile_key", "salt"]).map_groups(
            TilePrepare, batch_format="pyarrow", **kwargs
        )
        tiles = prepared.groupby("tile_key").map_groups(
            TileFinalize, batch_format="pyarrow", **kwargs
        )
    elif strategy == "prepared":
        from ..stages.mvt import assemble_tiles

        layer_bufs = _pin_local(_prepared_layer_bufs(tiled))
        tiles = layer_bufs.sort("tile_key").map_batches(
            assemble_tiles, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
    else:
        # explicit sort + lean per-block group iteration: the range
        # partitioner keeps whole (z,x,y) groups inside one block, and the
        # block-level encoder amortizes Arrow overhead over all its groups
        tiles = tiled.sort("tile_key").map_batches(
            sorted_block_encode, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
    return tiles


def run_tiler(
    docs_path: str,
    out_dir: str | None = None,
    zooms: list[int] | None = None,
    salt: bool = False,
    resume: bool = True,
    mapping_yaml: str | None = None,
    input_fragments: list[str] | None = None,
) -> rd.Dataset:
    """Full job. With ``out_dir``: resumable partitioned output + manifest;
    returns the manifest dataset. Without: returns the tiles dataset (lazy).
    """
    feats = read_features_any(docs_path, mapping_yaml=mapping_yaml)
    skip = completed_partitions(out_dir) if (out_dir and resume) else None
    fragments = ";".join(input_fragments or [docs_path])

    if out_dir is not None and not salt:
        # FUSED WRITE PATH (default strategy): the write groupby replaces
        # the compute path's second sort — partition is a pure function of
        # tile_key, so grouping encoded layer messages by partition
        # co-locates every layer of every tile in that partition, and the
        # group task assembles AND writes in one step. Two all-to-alls
        # total (the encode sort + this groupby) instead of three
        # (sort, sort, write groupby), and the full-tile-set materialize()
        # is gone with the exchange it served.
        zooms = zooms if zooms is not None else DEFAULT_ZOOMS
        tiled = _tiled_rows(feats, zooms, skip)
        layer_bufs = _pin_local(_prepared_layer_bufs(tiled))

        def add_partition(batch: pa.Table) -> pa.Table:
            keys = batch["tile_key"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "partition", pa.array(partition_of_keys(keys), pa.int64())
            )

        def assemble_write(group: pa.Table) -> pa.Table:
            from ..stages.mvt import assemble_tiles

            if group.num_rows == 0:
                return _EMPTY_MANIFEST_TABLE
            pid = int(group["partition"][0].as_py())
            tiles = assemble_tiles(group.drop_columns(["partition"]))
            return write_tiles_partition(tiles, pid, out_dir, fragments)

        manifest = layer_bufs.map_batches(
            add_partition, batch_format="pyarrow"
        ).groupby("partition").map_groups(
            assemble_write, batch_format="pyarrow"
        )
        return manifest

    tiles = tile_dataset(features=feats, zooms=zooms, salt=salt,
                         skip_partitions=skip)
    if out_dir is None:
        return tiles

    def add_partition(batch: pa.Table) -> pa.Table:
        keys = xyz.tile_key(
            batch["z"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["x"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["y"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        return batch.append_column(
            "partition", pa.array(partition_of_keys(keys), pa.int64())
        )

    # Legacy (salted-strategy) write: pin the (small) tiles result before
    # the partition-write groupby, then one groupby exchange to the writer.
    tiles = _pin_local(tiles)
    with_part = tiles.map_batches(add_partition, batch_format="pyarrow")
    manifest = with_part.groupby("partition").map_groups(
        write_partition,
        fn_args=(out_dir, fragments),
        batch_format="pyarrow",
    )
    return manifest


def finalize_job(manifest: rd.Dataset, out_dir: str, wall_s: float | None = None):
    """Consume the manifest and write job-level metrics (rows/bytes/sec per
    partition + totals) to out_dir/JOB.json. Returns the manifest rows."""
    import glob as _glob
    import json as _json
    import os as _os

    run_rows = manifest.take_all()  # consume/execute this run
    # totals come from the on-disk manifest: includes partitions completed
    # by PREVIOUS (killed) runs that this resume skipped
    rows = []
    for f in sorted(_glob.glob(_os.path.join(out_dir, "manifest", "p*.json"))):
        rows.append(_json.load(open(f)))
    total_rows = sum(r["rows"] for r in rows)
    total_bytes = sum(r["bytes"] for r in rows)
    job = {
        "partitions": len(rows),
        "tiles": int(total_rows),
        "bytes": int(total_bytes),
        "wall_s": wall_s,
        "tiles_per_sec": round(total_rows / wall_s, 1) if wall_s else None,
        "bytes_per_sec": round(total_bytes / wall_s, 1) if wall_s else None,
        "per_partition": [
            {k: r[k] for k in ("partition_id", "rows", "bytes", "wall_s",
                               "cell_range_min", "cell_range_max")}
            for r in sorted(rows, key=lambda r: r["partition_id"])
        ],
    }
    tmp = _os.path.join(out_dir, "JOB.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(job, f, indent=1)
    _os.replace(tmp, _os.path.join(out_dir, "JOB.json"))
    return rows


def write_tiles_dir(tiles: rd.Dataset, out_dir: str, ext: str = "mvt",
                    compress: bool = False, filesystem=None) -> int:
    """Reference-layout sink: one file per tile at out_dir/z/x/y.ext
    (cmd/tiler/tiler.go:269-294; gzip = the -compress flag; any
    pyarrow.fs.FileSystem = the S3 writer seam, cmd/tiler/s3.go). For small
    outputs / parity checks — the scalable layout is the partitioned
    parquet of :func:`run_tiler`.
    """
    from ..state.tilefs import TileWriter

    def write_batch(batch: pa.Table) -> pa.Table:
        w = TileWriter(out_dir, compress=compress, filesystem=filesystem)
        n = w.write_batch(batch, ext=ext)
        return pa.table({"n": pa.array([n], pa.int64())})

    counts = tiles.map_batches(write_batch, batch_format="pyarrow")
    return int(counts.sum("n") or 0)
