"""CLI entry points mirroring the reference's four tools (cmd/*).

    python -m grandine_ray.cli tiler -in docs.parquet -out /tmp/tiles -zoom 0-8
    python -m grandine_ray.cli converter -in a.geojson -in b.csv -out o.spaten
    python -m grandine_ray.cli inspect -in file.spaten
    python -m grandine_ray.cli synth -n 10000 -out /tmp/corpus

Flags follow cmd/tiler/tiler.go:85-96 and cmd/converter/converter.go where
they make sense for the Ray engine. Owns its Ray session (scripts only; the
library never calls ray.init).
"""
from __future__ import annotations

import argparse
import os
import sys


def parse_zooms(spec: str) -> list[int]:
    """Zoom list parser (tiler.go:34-47): "2", "0-8", or "0,3,5"."""
    if "-" in spec:
        lo, hi = spec.split("-", 1)
        return list(range(int(lo), int(hi) + 1))
    if "," in spec:
        return [int(z) for z in spec.split(",")]
    return [int(spec)]


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus or int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def cmd_tiler(argv):
    p = argparse.ArgumentParser(prog="tiler")
    p.add_argument("-in", dest="inp", required=True,
                   help="documents parquet/lance path or features spaten")
    p.add_argument("-out", dest="out", required=True)
    p.add_argument("-zoom", default="0-8")
    p.add_argument("-workers", type=int, default=None)
    p.add_argument("-salt", action="store_true", help="salt hot cells")
    p.add_argument("-no-resume", action="store_true")
    p.add_argument("-tiles-dir", action="store_true",
                   help="also write z/x/y.mvt files (reference layout)")
    p.add_argument("-compress", action="store_true", help="gzip tile files")
    a = p.parse_args(argv)
    _ray_init(a.workers)
    import ray

    from .pipelines import tiler as T

    manifest = T.run_tiler(
        a.inp, out_dir=a.out, zooms=parse_zooms(a.zoom), salt=a.salt,
        resume=not a.no_resume,
    )
    rows = manifest.take_all()
    total = sum(r["rows"] for r in rows)
    print(f"wrote {total} tiles across {len(rows)} partitions to {a.out}")
    if a.tiles_dir:
        import glob

        import ray.data as rd

        for f in glob.glob(f"{a.out}/tiles/*.parquet"):
            T.write_tiles_dir(rd.read_parquet(f), os.path.join(a.out, "xyz"),
                              compress=a.compress)
    ray.shutdown()


def cmd_converter(argv):
    p = argparse.ArgumentParser(prog="converter")
    p.add_argument("-in", dest="inp", action="append", required=True)
    p.add_argument("-out", dest="out", required=True)
    p.add_argument("-mapping", default=None, help="YAML mapping rule file")
    p.add_argument("-format", default=None,
                   help="spaten|geojson|parquet|wkt|shp|gpkg|gpx "
                        "(default: by extension)")
    a = p.parse_args(argv)
    _ray_init(None)
    import ray

    from .pipelines.converter import convert

    fmt = a.format
    if fmt is None:
        fmt = ("geojson" if a.out.endswith(".geojson")
               else "parquet" if a.out.endswith(".parquet")
               else "wkt" if a.out.endswith(".wkt")
               else "shp" if a.out.lower().endswith(".shp")
               else "gpkg" if a.out.lower().endswith(".gpkg")
               else "gpx" if a.out.lower().endswith(".gpx")
               else "spaten")
    mapping = open(a.mapping).read() if a.mapping else None
    n = convert(a.inp, a.out, mapping_yaml=mapping, out_format=fmt)
    print(f"wrote {n} features to {a.out}")
    ray.shutdown()


def cmd_inspect(argv):
    p = argparse.ArgumentParser(prog="inspect")
    p.add_argument("-in", dest="inp", required=True)
    p.add_argument("-n", type=int, default=20)
    a = p.parse_args(argv)
    from .sources.geojson import guess_codec

    parser = guess_codec(a.inp)
    raw = open(a.inp, "rb").read()
    if a.inp.lower().endswith(".shp"):
        from .sources.shapefile import read_sidecar_dbf

        table = parser(raw, dbf=read_sidecar_dbf(a.inp))
    elif a.inp.endswith((".spaten", ".gpkg")):
        table = parser(raw)
    else:
        table = parser(raw.decode("utf-8"))
    print(table.schema)
    print(table.slice(0, a.n).to_pandas())


def cmd_tiles(argv):
    """Decode and summarize an MVT tile file (debugging aid)."""
    p = argparse.ArgumentParser(prog="tiles")
    p.add_argument("-in", dest="inp", required=True, help="z/x/y.mvt[.gz] file")
    a = p.parse_args(argv)
    import gzip

    from .stages.mvt import decode_tile

    raw = open(a.inp, "rb").read()
    if a.inp.endswith(".gz"):
        raw = gzip.decompress(raw)
    layers = decode_tile(raw)
    for name, lay in sorted(layers.items()):
        kinds = {}
        for ft in lay["features"]:
            kinds[ft["type"]] = kinds.get(ft["type"], 0) + 1
        print(f"layer {name!r}: {len(lay['features'])} features "
              f"(types {kinds}), {len(lay['keys'])} keys, "
              f"extent {lay['extent']}, version {lay['version']}")


def cmd_synth(argv):
    p = argparse.ArgumentParser(prog="synth")
    p.add_argument("-n", type=int, default=10_000)
    p.add_argument("-seed", type=int, default=42)
    a = p.parse_args(argv)
    from .sources import synth

    out = synth.ensure_corpus(a.n, a.seed)
    print(out)


def cmd_spatialize(argv):
    p = argparse.ArgumentParser(prog="spatialize")
    p.add_argument("-in", dest="inp", required=True, help="OSM PBF file")
    p.add_argument("-out", dest="out", required=True, help="Spaten output")
    p.add_argument("-mapping", default=None, help="YAML mapping rule file")
    a = p.parse_args(argv)
    _ray_init(None)
    import ray

    from .pipelines.spatialize import spatialize
    from .stages.mapping import DEFAULT_MAPPING

    mapping = open(a.mapping).read() if a.mapping else DEFAULT_MAPPING
    feats = spatialize(a.inp, mapping)
    import json as _json

    from .sources.spaten import write_spaten

    def rows():
        for batch in feats.iter_batches(batch_size=1000, batch_format="pyarrow"):
            props = batch["props_json"].to_pylist()
            for blob, pj in zip(batch["geom_wkb"].to_pylist(), props):
                yield {"geom_wkb": blob, "props": _json.loads(pj) if pj else {}}

    n = write_spaten(a.out, rows())
    print(f"wrote {n} features to {a.out}")
    ray.shutdown()


def make_tile_server(tiles_dir, port: int = 0):
    """Viewer + tile HTTP server bound to 127.0.0.1 (port 0 = ephemeral).
    Returns the ThreadingHTTPServer; the caller runs serve_forever()."""
    import http.server
    import os as _os

    viewer_dir = _os.path.join(_os.path.dirname(__file__), "viewer")
    tiles_dir = _os.path.abspath(tiles_dir)

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def do_GET(self):
            path = self.path.split("?")[0]
            if path in ("/", "/index.html"):
                body = open(_os.path.join(viewer_dir, "index.html"), "rb").read()
                self._send(200, body, "text/html")
                return
            if path == "/style.json":
                body = open(_os.path.join(viewer_dir, "style.json"), "rb").read()
                self._send(200, body, "application/json")
                return
            if path.startswith("/tiles/"):
                rel = _os.path.normpath(path[len("/tiles/"):])
                # containment check: reject absolute paths (normpath keeps
                # them absolute, so join() would discard tiles_dir) and any
                # resolved path escaping tiles_dir via .. or symlinks
                if _os.path.isabs(rel) or rel.startswith(".."):
                    self._send(404, b"not found", "text/plain")
                    return
                full = _os.path.realpath(_os.path.join(tiles_dir, rel))
                if _os.path.commonpath([full, _os.path.realpath(tiles_dir)]) \
                        != _os.path.realpath(tiles_dir):
                    self._send(404, b"not found", "text/plain")
                    return
                if not _os.path.isfile(full) and _os.path.isfile(full + ".gz"):
                    full += ".gz"   # tiler -compress writes z/x/y.mvt.gz
                if not _os.path.isfile(full):
                    self._send(404, b"not found", "text/plain")
                    return
                body = open(full, "rb").read()
                gz = body[:2] == b"\x1f\x8b"
                self._send(200, body, "application/vnd.mapbox-vector-tile",
                           gzip_enc=gz)
                return
            self._send(404, b"not found", "text/plain")

        def _send(self, code, body, ctype, gzip_enc=False):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            if gzip_enc:
                self.send_header("Content-Encoding", "gzip")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return http.server.ThreadingHTTPServer(("127.0.0.1", port), Handler)


def cmd_serve(argv):
    """Static viewer + tile server (role parity with the reference's
    viewer/: a small page rendering the engine's z/x/y MVT output).
    Gzipped tiles (tiler -compress) are served with Content-Encoding."""
    p = argparse.ArgumentParser(prog="serve")
    p.add_argument("-dir", dest="tiles", required=True,
                   help="z/x/y tile tree (tiler -tiles-dir output)")
    p.add_argument("-port", type=int, default=8439)
    a = p.parse_args(argv)
    srv = make_tile_server(a.tiles, a.port)
    print(f"serving {a.tiles} at http://127.0.0.1:{srv.server_address[1]}/")
    srv.serve_forever()


def cmd_query(argv):
    """Run any registered pipeline (the queries() surface) from the
    shell: list names, print a result head as CSV, or write the full
    result as parquet. The result is consumed streaming when writing
    (write_parquet on the Dataset), collected only for the CSV head."""
    p = argparse.ArgumentParser(prog="query")
    p.add_argument("name", nargs="?", help="query name (omit to list)")
    p.add_argument("-sf-dir", dest="sf_dir",
                   default="/root/testdata/sf0.001")
    p.add_argument("-out", help="write full result as parquet here")
    p.add_argument("-head", type=int, default=20,
                   help="rows to print when -out is not given")
    p.add_argument("-num-cpus", type=int, default=None)
    a = p.parse_args(argv)

    from grandine_ray.pipelines.queries import QUERIES

    if not a.name:
        for name in sorted(QUERIES):
            print(name)
        return
    if a.name not in QUERIES:
        print(f"unknown query {a.name!r}; run with no name to list",
              file=sys.stderr)
        sys.exit(2)
    _ray_init(a.num_cpus)
    res = QUERIES[a.name](a.sf_dir)
    import ray.data as rd

    if a.out and isinstance(res, rd.Dataset):
        res.write_parquet(a.out)
        print(f"wrote {a.out}")
        return
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    if a.out:
        df.to_parquet(a.out)
        print(f"wrote {a.out} ({len(df)} rows)")
        return
    print(df.head(a.head).to_csv(index=False), end="")


COMMANDS = {
    "tiler": cmd_tiler,
    "spatialize": cmd_spatialize,
    "converter": cmd_converter,
    "inspect": cmd_inspect,
    "query": cmd_query,
    "tiles": cmd_tiles,
    "synth": cmd_synth,
    "serve": cmd_serve,
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in COMMANDS:
        print(f"usage: python -m grandine_ray.cli {{{'|'.join(COMMANDS)}}} ...")
        sys.exit(2)
    COMMANDS[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    main()
