"""Viewer JS MVT decoder parity: the dependency-free decoder embedded in
viewer/index.html must agree with the engine's Python decoder on real
encoded tiles (run under node; skipped when no JS runtime is present)."""
import json
import shutil
import subprocess

import numpy as np
import pytest

from grandine_ray.stages import mvt

NODE = shutil.which("node")

_HARNESS = r"""
const fs = require("fs");
const html = fs.readFileSync(process.argv[2], "utf8");
const m = html.match(/"use strict";([\s\S]*?)\/\* ---------- slippy renderer/);
eval(m[1]);
const buf = new Uint8Array(fs.readFileSync(process.argv[3]));
const layers = decodeTile(buf);
const out = {};
for (const l of layers) {
  const types = {};
  let pts = 0;
  for (const f of l.features) {
    types[f.type] = (types[f.type] || 0) + 1;
    for (const p of paths(f)) pts += p.length;
  }
  out[l.name] = {n: l.features.length, types, extent: l.extent, pts};
}
console.log(JSON.stringify(out));
"""


@pytest.mark.skipif(NODE is None, reason="no node runtime")
def test_viewer_js_decoder_matches_python(tmp_path):
    feats = {
        "roads": [
            {"props": (("class", "primary"),), "type": 2,
             "rings": [np.array([[13.0, 52.0], [13.2, 52.1], [13.3, 52.0]])]},
        ],
        "water": [
            {"props": (), "type": 3,
             "rings": [np.array([[13.0, 52.0], [13.4, 52.0], [13.4, 52.3],
                                 [13.0, 52.3]])]},
            {"props": (), "type": 1,
             "rings": [np.array([[13.05, 52.05]])]},
        ],
    }
    buf = mvt.encode_tile(8, 137, 84, feats)
    tile = tmp_path / "t.mvt"
    tile.write_bytes(buf)
    harness = tmp_path / "h.js"
    harness.write_text(_HARNESS)
    out = subprocess.run(
        [NODE, str(harness), "grandine_ray/viewer/index.html", str(tile)],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    js = json.loads(out.stdout)

    py = mvt.decode_tile(buf)
    assert sorted(js) == sorted(py)
    for name, l in py.items():
        types = {}
        for f in l["features"]:
            types[f["type"]] = types.get(f["type"], 0) + 1
        assert js[name]["n"] == len(l["features"])
        assert {int(k): v for k, v in js[name]["types"].items()} == types
        assert js[name]["extent"] == l["extent"]


def _serve(tmp_path):
    import threading

    from grandine_ray.cli import make_tile_server

    tdir = tmp_path / "tiles" / "8" / "137"
    tdir.mkdir(parents=True)
    (tdir / "84.mvt").write_bytes(b"\x1a\x00tile")
    srv = make_tile_server(str(tmp_path / "tiles"))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


def test_serve_tile_and_traversal_rejected(tmp_path):
    """GET /tiles/z/x/y.mvt serves; absolute and ..-escaping paths 404
    (the handler must never read outside tiles_dir — ADVICE r2)."""
    import http.client

    srv, port = _serve(tmp_path)
    try:
        def get(path):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
            c.request("GET", path)
            r = c.getresponse()
            body = r.read()
            c.close()
            return r.status, body

        st, body = get("/tiles/8/137/84.mvt")
        assert st == 200 and body == b"\x1a\x00tile"
        # absolute path: normpath('/etc/hostname') stays absolute and
        # join() would discard tiles_dir entirely
        st, _ = get("/tiles//etc/hostname")
        assert st == 404
        st, _ = get("/tiles/../../etc/hostname")
        assert st == 404
        st, _ = get("/tiles/8/../../../etc/hostname")
        assert st == 404
        st, body = get("/")
        assert st == 200 and b"<html" in body.lower()
    finally:
        srv.shutdown()
