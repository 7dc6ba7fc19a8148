"""Deterministic synthetic interleaved-document corpus (FIXTURES.md §1).

Generates the authoritative input shape (BASELINE.json input_hint):

    documents(doc_id: string,
              spans: list<struct<kind, text, media_ref, offset:int32>>)

Spans with kind="geom" carry a lowercase-hex little-endian WKB geometry in
``text`` and an optional ``layer:<name>`` hint in ``media_ref``.

Alongside ``documents.parquet`` a companion ground-truth table
``geoms.parquet`` is written from the *pre-WKB* coordinates (independent of
the engine's WKB codec) so DuckDB oracle SQL can recompute bboxes / tile
assignments from raw vertex lists:

    geoms(doc_id, span_idx, geom_type, layer, xs: list<double>, ys: list<double>)

Everything is seeded (seed=42 by default) and cached under
``/tmp/graft_synth/docs_{n}``; regeneration is idempotent and byte-stable.
"""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import schema as sch
from ..geom import wkb as wkbmod
from ..geom.ops import ring_area

SEED = 42
SYNTH_ROOT = os.environ.get("GRAFT_SYNTH_DIR", "/tmp/graft_synth")
LAYERS = ["default", "transportation", "building", "poi", "water"]

# city-sized hot-spot boxes (minx, miny, maxx, maxy) to exercise skew/salting
HOTSPOTS = [
    (13.0, 52.3, 13.8, 52.7),     # Berlin-ish
    (-74.3, 40.5, -73.7, 40.9),   # NYC-ish
    (139.5, 35.5, 140.0, 35.8),   # Tokyo-ish
]

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt labore dolore magna aliqua enim minim veniam quis "
    "nostrud exercitation ullamco laboris nisi aliquip commodo consequat"
).split()


def _fixture_geoms() -> list[tuple[int, list[np.ndarray]]]:
    """Reference fixture geometries included verbatim as the first rows."""
    pts = [
        (13.73630, 51.05377), (18.39856, -33.90184), (-54.59123, -25.59547),
        (-21.94073, 64.14607), (-31.16580, 83.65691), (-64.45649, -85.04438),
    ]
    out: list[tuple[int, list[np.ndarray]]] = [
        (wkbmod.GEOM_POINT, [np.array([p])]) for p in pts
    ]
    out.append((wkbmod.GEOM_LINESTRING, [np.array([[1.0, 1.0], [3.0, 3.0], [5.0, 1.0]])]))
    out.append((wkbmod.GEOM_POLYGON, [np.array([[0.0, 0.0], [3.0, 0.0], [0.0, 3.0]])]))
    # the 5-ring winding fixture (polygon_test.go:40-45)
    out.append(
        (
            wkbmod.GEOM_POLYGON,
            [
                np.array([[-2.109375, 11.178401873711785], [-16.875, -43.06888777416961],
                          [62.57812500000001, -43.580390855607845], [81.5625, 8.407168163601076]]),
                np.array([[7.3828125, -23.241346102386135], [28.4765625, -8.05922962720018],
                          [55.1953125, -11.178401873711772], [22.148437499999996, -33.137551192346145]]),
            ],
        )
    )
    # mergeable lines (merge_test.go:11-67)
    out.append((wkbmod.GEOM_LINESTRING, [np.array([[1.0, 0.0], [1.0, 1.0], [2.0, 3.0], [5.0, 6.0]])]))
    out.append((wkbmod.GEOM_LINESTRING, [np.array([[5.0, 6.0], [7.0, 8.0], [6.0, 6.0], [4.0, 5.0]])]))
    return out


def _gen_geometry(rng: np.random.Generator, gtype: int, cx: float, cy: float):
    """One geometry near (cx, cy) → list of rings (unclosed)."""
    if gtype == wkbmod.GEOM_POINT:
        return [np.array([[cx, cy]])]
    if gtype == wkbmod.GEOM_LINESTRING:
        n = int(rng.integers(3, 13))
        steps = rng.normal(0, 0.02, size=(n, 2))
        pts = np.cumsum(steps, axis=0) + [cx, cy]
        return [pts]
    # polygon: convex-ish ring around center
    n = int(rng.integers(4, 11))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.01, 0.2)
    ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
    if ring_area(ring) < 0:  # outer ring clockwise per reference convention
        ring = ring[::-1].copy()
    rings = [ring]
    if rng.random() < 0.2:  # 20% with one hole (counter-clockwise)
        hole = np.stack(
            [cx + 0.3 * rad * np.cos(ang), cy + 0.3 * rad * np.sin(ang)], axis=1
        )
        if ring_area(hole) > 0:
            hole = hole[::-1].copy()
        rings.append(hole)
    return rings


def generate(n_docs: int, seed: int = SEED, id_offset: int = 0):
    """Build the documents + companion geoms tables as pyarrow Tables.

    ``id_offset`` shifts the doc-id namespace (``doc-{d+id_offset:08d}``)
    so chunked parallel generation (ensure_corpus's big-corpus path)
    yields globally unique ids."""
    rng = np.random.default_rng(seed)
    fixtures = _fixture_geoms()

    doc_ids: list[str] = []
    span_doc: list[int] = []        # doc index per span
    kinds: list[str] = []
    texts: list[str] = []
    media_refs: list[str] = []
    g_doc: list[int] = []           # doc index per geom span
    g_span_idx: list[int] = []
    g_type: list[int] = []
    g_layer: list[str] = []
    g_xs: list[np.ndarray] = []
    g_ys: list[np.ndarray] = []
    g_ring: list[np.ndarray] = []   # per-vertex ring index (polygons w/ holes)

    n_spans_per_doc = rng.integers(1, 9, size=n_docs)
    has_geom = rng.random(n_docs) < 0.8
    hot = rng.random(n_docs) < 0.05
    hot_box = rng.integers(0, len(HOTSPOTS), size=n_docs)
    fixture_cursor = 0

    for d in range(n_docs):
        doc_ids.append(f"doc-{d + id_offset:08d}")
        ns = int(n_spans_per_doc[d])
        kind_codes = rng.integers(0, 3, size=ns)
        if has_geom[d] and not (kind_codes == 2).any():
            kind_codes[ns - 1] = 2
        elif not has_geom[d]:
            kind_codes[kind_codes == 2] = 0
        for i in range(ns):
            span_doc.append(d)
            kc = kind_codes[i]
            if kc == 0:
                nw = int(rng.integers(3, 12))
                words = [_WORDS[j] for j in rng.integers(0, len(_WORDS), nw)]
                kinds.append("text")
                texts.append(" ".join(words))
                media_refs.append("")
            elif kc == 1:
                kinds.append("media")
                texts.append("")
                media_refs.append(f"media://{int(rng.integers(0, 2**62)):016x}")
            else:
                if fixture_cursor < len(fixtures):
                    gtype, rings = fixtures[fixture_cursor]
                    fixture_cursor += 1
                else:
                    if hot[d]:
                        bx = HOTSPOTS[hot_box[d]]
                        cx = rng.uniform(bx[0], bx[2])
                        cy = rng.uniform(bx[1], bx[3])
                    else:
                        cx = rng.uniform(-179.0, 179.0)
                        cy = rng.uniform(-84.0, 84.0)
                    gtype = int(rng.choice([1, 2, 3], p=[0.6, 0.25, 0.15]))
                    rings = _gen_geometry(rng, gtype, cx, cy)
                layer = LAYERS[int(rng.integers(0, len(LAYERS)))]
                if gtype == wkbmod.GEOM_POINT:
                    blob = wkbmod.encode_point(rings[0][0, 0], rings[0][0, 1])
                elif gtype == wkbmod.GEOM_LINESTRING:
                    blob = wkbmod.encode_linestring(rings[0])
                else:
                    blob = wkbmod.encode_polygon(rings)
                kinds.append("geom")
                texts.append(blob.hex())
                media_refs.append(f"layer:{layer}" if layer != "default" else "")
                g_doc.append(d)
                g_span_idx.append(i)
                g_type.append(gtype)
                g_layer.append(layer)
                allpts = np.concatenate([np.asarray(r) for r in rings])
                g_xs.append(allpts[:, 0])
                g_ys.append(allpts[:, 1])
                g_ring.append(np.concatenate(
                    [np.full(len(r), ri, dtype=np.int32)
                     for ri, r in enumerate(rings)]))

    # strictly-increasing offsets per doc: cumulative text length
    span_doc_arr = np.asarray(span_doc, dtype=np.int64)
    lens = np.asarray([len(t) + 1 for t in texts], dtype=np.int64)
    cum = np.cumsum(lens) - lens
    doc_heads = np.zeros(n_docs, dtype=np.int64)
    first_span = np.searchsorted(span_doc_arr, np.arange(n_docs))
    valid = first_span < len(cum)
    doc_heads[valid] = cum[np.minimum(first_span, len(cum) - 1)][valid]
    offsets = (cum - doc_heads[span_doc_arr]).astype(np.int32)

    span_struct = pa.StructArray.from_arrays(
        [
            pa.array(kinds, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(media_refs, pa.string()),
            pa.array(offsets, pa.int32()),
        ],
        fields=list(sch.SPAN_STRUCT),
    )
    list_offsets = np.zeros(n_docs + 1, dtype=np.int32)
    np.cumsum(np.bincount(span_doc_arr, minlength=n_docs), out=list_offsets[1:])
    spans = pa.ListArray.from_arrays(pa.array(list_offsets, pa.int32()), span_struct)
    documents = pa.Table.from_arrays(
        [pa.array(doc_ids, pa.string()), spans], schema=sch.DOCUMENTS
    )

    geoms = pa.table(
        {
            "doc_id": pa.array([doc_ids[d] for d in g_doc], pa.string()),
            "span_idx": pa.array(g_span_idx, pa.int32()),
            "geom_type": pa.array(g_type, pa.int8()),
            "layer": pa.array(g_layer, pa.string()),
            "xs": pa.array([x.tolist() for x in g_xs], pa.list_(pa.float64())),
            "ys": pa.array([y.tolist() for y in g_ys], pa.list_(pa.float64())),
            "ring_of": pa.array([r.tolist() for r in g_ring],
                                pa.list_(pa.int32())),
        }
    )
    return documents, geoms


def n_docs_for_sf(sf_dir: str) -> int:
    """Map a driver sf dir to a deterministic corpus size."""
    name = Path(sf_dir).name
    # sf0.1 (bench) is sized so compute dominates scheduling fixed costs —
    # the scaling-efficiency measurement needs a compute-bound workload
    table = {"sf0.001": 1_000, "sf0.01": 10_000, "sf0.1": 400_000,
             "sf1": 4_000_000}
    return table.get(name, 10_000)


N_SHARDS = 16


def ensure_corpus(n_docs: int, seed: int = SEED) -> str:
    """Generate (once) and return the corpus dir for ``n_docs``.

    Writes both a single ``documents.parquet`` (stable path for the DuckDB
    oracle SQL) and a sharded ``documents/`` directory (N_SHARDS files) so
    Ray's read parallelizes across fragments instead of one serial read
    task — the single-file read was a fixed serial cost at every CPU count.
    """
    out = Path(SYNTH_ROOT) / f"docs_{n_docs}"
    done = out / "_SUCCESS3"  # v3: geoms carries ring_of
    if done.exists():
        return str(out)
    if n_docs > 500_000:
        return _ensure_corpus_chunked(n_docs, seed)
    out.mkdir(parents=True, exist_ok=True)
    documents, geoms = generate(n_docs, seed)
    pq.write_table(documents, out / "documents.parquet")
    pq.write_table(geoms, out / "geoms.parquet")
    shard_dir = out / "documents"
    shard_dir.mkdir(exist_ok=True)
    n = documents.num_rows
    per = (n + N_SHARDS - 1) // N_SHARDS
    for s in range(N_SHARDS):
        part = documents.slice(s * per, per)
        if part.num_rows:
            pq.write_table(part, shard_dir / f"part-{s:04d}.parquet")
    done.touch()
    return str(out)


def _gen_chunk_task(args) -> None:
    """Pool worker: generate one chunk and write its shard files."""
    n, seed, offset, shard_doc, shard_geom = args
    documents, geoms = generate(n, seed=seed, id_offset=offset)
    pq.write_table(documents, shard_doc)
    pq.write_table(geoms, shard_geom)


def _ensure_corpus_chunked(n_docs: int, seed: int = SEED) -> str:
    """Big-corpus (sf1+) generation: 250k-doc chunks in parallel worker
    processes, each written straight to its shard file — the 4M-doc
    corpus builds in ~2 min instead of ~11 (the per-doc Python loop in
    generate() is the cost) and the full table never sits in one
    process's heap. No single documents.parquet is written (the DuckDB
    oracle paths only need the sf0.01 corpus); docs_path() serves the
    sharded directory."""
    from multiprocessing import Pool

    out = Path(SYNTH_ROOT) / f"docs_{n_docs}"
    done = out / "_SUCCESS3"
    if done.exists():
        return str(out)
    shard_dir = out / "documents"
    geom_dir = out / "geoms"
    shard_dir.mkdir(parents=True, exist_ok=True)
    geom_dir.mkdir(parents=True, exist_ok=True)
    chunk = 250_000
    n_chunks = (n_docs + chunk - 1) // chunk
    jobs = []
    for c in range(n_chunks):
        n = min(chunk, n_docs - c * chunk)
        jobs.append((n, seed + c, c * chunk,
                     str(shard_dir / f"part-{c:04d}.parquet"),
                     str(geom_dir / f"part-{c:04d}.parquet")))
    with Pool(processes=min(8, n_chunks)) as pool:
        pool.map(_gen_chunk_task, jobs)
    done.touch()
    return str(out)


def docs_path(corpus_dir: str) -> str:
    """Preferred (sharded) documents path for Ray reads."""
    sharded = Path(corpus_dir) / "documents"
    return str(sharded) if sharded.is_dir() else f"{corpus_dir}/documents.parquet"


def corpus_for_sf(sf_dir: str) -> str:
    return ensure_corpus(n_docs_for_sf(sf_dir))


# ------------------------------------------------------------ synthetic PBF

PBF_MAPPING = """
- src: {key: highway, value: primary}
  dest:
    - {key: "@layer", value: transportation}
    - {key: class, value: $highway}
- src: {key: building, value: "*"}
  dest:
    - {key: "@layer", value: building}
    - {key: __type, value: area}
- src: {key: amenity, value: "*"}
  dest:
    - {key: "@layer", value: poi}
    - {key: kind, value: $amenity}
- src: {key: landuse, value: park}
  dest:
    - {key: "@layer", value: landuse}
"""


def ensure_pbf(scale: int = 1, seed: int = SEED) -> tuple[str, dict]:
    """Generate (once) a multi-blob synthetic OSM PBF for the spatialize
    bench: grid roads, building squares, multipolygon relations, POI nodes.
    Returns (path, expected-feature-count dict). ``scale`` multiplies every
    entity class linearly.
    """
    from . import osm

    out = Path(SYNTH_ROOT) / f"osm_s{scale}"
    path = str(out / "synth.pbf")
    expected = {
        "transportation": 200 * scale,
        "building": 5000 * scale,
        "landuse": 250 * scale,
        "poi": 1000 * scale,
    }
    if (out / "_SUCCESS").exists():
        return path, expected
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_grid = 200                                   # 40k·scale grid nodes
    nodes, ways, rels = [], [], []
    wid = 1
    base = 0
    for s in range(scale):
        off = s * 10.0
        nid0 = base + 1
        for r in range(n_grid):
            for c in range(n_grid):
                nodes.append((nid0 + r * n_grid + c,
                              off + c * 0.01, r * 0.01, {}))
        for r in range(n_grid):
            ways.append((wid, [nid0 + r * n_grid + c for c in range(n_grid)],
                         {"highway": "primary"}))
            wid += 1
        base += n_grid * n_grid
        for b in range(expected["building"] // scale):
            ids = [base + 1 + k for k in range(4)]
            base += 4
            x, y = rng.uniform(0, 2, 2)
            x += off
            nodes += [(ids[0], x, y, {}), (ids[1], x + .001, y, {}),
                      (ids[2], x + .001, y + .001, {}), (ids[3], x, y + .001, {})]
            ways.append((wid, ids + [ids[0]], {"building": "yes"}))
            wid += 1
        for i in range(expected["landuse"] // scale):
            oids = [base + 1 + k for k in range(4)]
            iids = [base + 5 + k for k in range(4)]
            base += 8
            x, y = off + 3 + (i % 50) * 0.1, 3.0 + (i // 50) * 0.1
            nodes += [(oids[0], x, y, {}), (oids[1], x + .05, y, {}),
                      (oids[2], x + .05, y + .05, {}), (oids[3], x, y + .05, {}),
                      (iids[0], x + .01, y + .01, {}), (iids[1], x + .04, y + .01, {}),
                      (iids[2], x + .04, y + .04, {}), (iids[3], x + .01, y + .04, {})]
            ways.append((wid, oids + [oids[0]], {}))
            ways.append((wid + 1, iids + [iids[0]], {}))
            rels.append((10_000_000 + s * 100_000 + i,
                         [(wid, osm.WAY, "outer"), (wid + 1, osm.WAY, "inner")],
                         {"type": "multipolygon", "landuse": "park"}))
            wid += 2
        for i in range(expected["poi"] // scale):
            base += 1
            nodes.append((base, off + rng.uniform(0, 2), rng.uniform(0, 2),
                          {"amenity": "cafe"}))
    osm.write_pbf(path, nodes, ways, rels)
    (out / "_SUCCESS").touch()
    return path, expected
