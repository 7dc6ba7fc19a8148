"""Per-tile file writers (reference S8 disk / S9 S3, cmd/tiler/tiler.go:269-294,
cmd/tiler/s3.go:28-56).

``TileWriter`` writes ``{out}/z/x/y.ext`` with optional gzip, over any
``pyarrow.fs.FileSystem`` — LocalFileSystem by default; an S3FileSystem
(or any fsspec-backed FS) slots into the same seam when network storage
exists. The scalable sink remains the partitioned parquet + manifest of
pipelines/tiler.py; this layout is for compatibility with consumers of
the reference's output tree.
"""
from __future__ import annotations

import gzip as _gzip
import posixpath


class TileWriter:
    def __init__(self, out_dir: str, compress: bool = False, filesystem=None):
        from pyarrow import fs as pafs

        self.out_dir = out_dir.rstrip("/")
        self.compress = compress
        self.fs = filesystem or pafs.LocalFileSystem()

    def write_tile(self, z: int, x: int, y: int, data: bytes, ext: str = "mvt"):
        d = posixpath.join(self.out_dir, str(z), str(x))
        self.fs.create_dir(d, recursive=True)
        name = f"{y}.{ext}.gz" if self.compress else f"{y}.{ext}"
        payload = _gzip.compress(data) if self.compress else data
        # compression=None: pyarrow would otherwise auto-gzip ".gz" paths
        # on top of our explicit gzip payload
        with self.fs.open_output_stream(posixpath.join(d, name), compression=None) as f:
            f.write(payload)

    def write_batch(self, batch, ext: str = "mvt") -> int:
        zs = batch["z"].to_pylist()
        xs = batch["x"].to_pylist()
        ys = batch["y"].to_pylist()
        bufs = batch["mvt"].to_pylist()
        for z, x, y, buf in zip(zs, xs, ys, bufs):
            self.write_tile(z, x, y, buf, ext=ext)
        return len(zs)
