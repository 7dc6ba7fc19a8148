"""Single-process kernel microbenchmarks — Ray-free, so timings are less
exposed to the VM's scheduler noise than bench.py. Use to verify kernel
optimizations between rounds. Prints one JSON line.

    python tools/microbench.py [n_docs]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import pyarrow.parquet as pq

    from grandine_ray.sources import synth
    from grandine_ray.stages.coverage import make_coverage_fn
    from grandine_ray.stages.extract import extract_features
    from grandine_ray.stages.mvt import (
        SortedBlockLayerEncoder, TilespacePrepare, assemble_tiles,
    )
    from grandine_ray.geom import wkb

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    corpus = synth.ensure_corpus(100_000)
    docs = pq.read_table(f"{corpus}/documents.parquet").slice(0, n)
    out = {"n_docs": n}

    t0 = time.perf_counter()
    feats = extract_features(docs)
    out["extract_s"] = round(time.perf_counter() - t0, 3)
    out["features"] = feats.num_rows

    t0 = time.perf_counter()
    tiled = make_coverage_fn(list(range(0, 9)))(feats)
    out["coverage_s"] = round(time.perf_counter() - t0, 3)
    out["tiled_rows"] = tiled.num_rows

    t0 = time.perf_counter()
    prep = TilespacePrepare()(tiled)
    out["prepare_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    lbuf = SortedBlockLayerEncoder()(prep)
    out["layer_encode_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    tiles = assemble_tiles(lbuf)
    out["assemble_s"] = round(time.perf_counter() - t0, 3)
    out["tiles"] = tiles.num_rows

    t0 = time.perf_counter()
    wkb.decode_wkb_batch(feats["geom_wkb"].to_pylist())
    out["wkb_decode_s"] = round(time.perf_counter() - t0, 3)

    total_rows = tiled.num_rows
    total_s = (out["extract_s"] + out["coverage_s"] + out["prepare_s"]
               + out["layer_encode_s"] + out["assemble_s"])
    out["rows_per_core_sec"] = round(total_rows / total_s, 1)

    # text kernels (minhash signature / simhash) over the driver corpus
    tdocs = pq.read_table("/root/testdata/sf0.1/documents.parquet") \
        .select(["doc_id", "text"]).slice(0, 4000)
    from grandine_ray.stages.text import MinHasher, SimHasher

    nchars = sum(len(t) for t in tdocs["text"].to_pylist())
    mh = MinHasher()
    t0 = time.perf_counter()
    mh(tdocs)
    dt = time.perf_counter() - t0
    out["minhash_s"] = round(dt, 3)
    out["minhash_mchar_per_sec"] = round(nchars / dt / 1e6, 2)
    sh = SimHasher()
    t0 = time.perf_counter()
    sh(tdocs)
    dt = time.perf_counter() - t0
    out["simhash_s"] = round(dt, 3)
    out["simhash_docs_per_sec"] = round(tdocs.num_rows / dt, 1)

    # round-3 kernels
    import numpy as np

    from grandine_ray.stages.corpus import (
        batch_word_ngram_hashes, gopher_stats,
    )
    from grandine_ray.stages.stats import tdigest_build
    from grandine_ray.index.cells import geohash_encode

    texts = tdocs["text"].to_pylist()
    t0 = time.perf_counter()
    batch_word_ngram_hashes(texts, 4)
    dt = time.perf_counter() - t0
    out["word_4gram_s"] = round(dt, 3)
    out["word_4gram_mchar_per_sec"] = round(nchars / dt / 1e6, 2)

    t0 = time.perf_counter()
    gopher_stats(tdocs)
    out["gopher_s"] = round(time.perf_counter() - t0, 3)

    vals = np.random.default_rng(0).normal(0, 1, 1_000_000)
    t0 = time.perf_counter()
    tdigest_build(vals, np.ones(len(vals)), 200)
    dt = time.perf_counter() - t0
    out["tdigest_mvals_per_sec"] = round(len(vals) / dt / 1e6, 2)

    lon = np.random.default_rng(1).uniform(-180, 180, 1_000_000)
    lat = np.random.default_rng(2).uniform(-90, 90, 1_000_000)
    t0 = time.perf_counter()
    geohash_encode(lon, lat, 7)
    dt = time.perf_counter() - t0
    out["geohash_mpts_per_sec"] = round(len(lon) / dt / 1e6, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
