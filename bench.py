"""Headline benchmarks (driver contract: one JSON line on stdout).

Pipelines (all over $GRAFT_SF_DIR, default /root/testdata/sf0.1; geospatial
pipelines use the deterministic synthetic interleaved corpus scaled to that
sf — generated/cached BEFORE timing):

  tiler      documents → extract → coverage → groupby(z,x,y) → MVT encode →
             partitioned parquet + manifest (zooms 0..8)
  pip_join   point features vs broadcast polygon set (R-tree actors)
  knn        exact Haversine top-5 from fixture queries to all points
  ann        brute-force cosine top-10 over the embeddings table
  text       token counting + quality scoring + minhash signatures
  corpus     tfidf + decontaminate + gopher signals over documents
  relational TPC-H family (Q1 pricing, nation star join, Q3 top-k)
  ml         hashed-BoW quality scoring + target affinity + bloom semi join

`--scaling` re-runs the suite in fresh processes at num_cpus=8 and 32 and
reports throughput scaling efficiency (sandbox substitute for N vs 4N
nodes; see BASELINE.md §3).
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

BENCH_ZOOMS = list(range(0, 9))


def run_suite() -> dict:
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import numpy as np

    from grandine_ray.sources import synth

    corpus = synth.corpus_for_sf(sf_dir)  # cached; excluded from timings

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from grandine_ray.pipelines import tiler as tiler_mod
    from grandine_ray.stages import ann as ann_stage
    from grandine_ray.stages import join as join_stage
    from grandine_ray.stages import text as text_stage
    from grandine_ray.stages.extract import extract_features

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    # warm page cache (untimed)
    rd.read_parquet(synth.docs_path(corpus)).count()

    # ---- tiler ----------------------------------------------------------
    out_dir = f"/tmp/graft_bench/tiles_{ncpu}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    manifest = tiler_mod.run_tiler(
        synth.docs_path(corpus), out_dir=out_dir, zooms=BENCH_ZOOMS,
        resume=False,
    )
    rows = manifest.take_all()
    wall = time.perf_counter() - t0
    n_tiles = int(sum(r["rows"] for r in rows))
    queries["tiler"] = round(wall, 3)
    extras["tiles"] = n_tiles
    extras["tiles_per_sec"] = round(n_tiles / wall, 1)

    # ---- tiler_deep: zooms 9..14 on size-bounded features ---------------
    import pyarrow as pa
    import pyarrow.compute as _pc

    from grandine_ray.pipelines.tiler import tile_dataset

    deep_corpus = synth.ensure_corpus(10_000)

    def small_feats(batch: pa.Table) -> pa.Table:
        w = _pc.subtract(batch["bbox_maxx"], batch["bbox_minx"])
        h = _pc.subtract(batch["bbox_maxy"], batch["bbox_miny"])
        return batch.filter(_pc.and_(_pc.less(w, 0.5), _pc.less(h, 0.5)))

    t0 = time.perf_counter()
    deep_docs = rd.read_parquet(synth.docs_path(deep_corpus))
    deep_feats = deep_docs.map_batches(extract_features, batch_format="pyarrow")
    deep_feats = deep_feats.map_batches(small_feats, batch_format="pyarrow")
    # reuse tile_dataset's shuffle+encode by entering after extract
    from grandine_ray.stages.coverage import make_coverage_fn
    from grandine_ray.stages.mvt import (
        assemble_tiles, sorted_block_layer_encode, tilespace_prepare,
    )

    deep_tiled = deep_feats.map_batches(
        make_coverage_fn(list(range(9, 15))), batch_format="pyarrow"
    ).map_batches(tilespace_prepare, batch_format="pyarrow")
    deep_tiles = deep_tiled.sort(["tile_key", "lhash"]).map_batches(
        sorted_block_layer_encode, batch_format="pyarrow", batch_size=None,
    ).materialize().sort("tile_key").map_batches(
        assemble_tiles, batch_format="pyarrow", batch_size=None,
    )
    n_deep = deep_tiles.count()
    wall = time.perf_counter() - t0
    queries["tiler_deep"] = round(wall, 3)
    extras["deep_tiles"] = int(n_deep)
    extras["deep_tiles_per_sec"] = round(n_deep / wall, 1)

    # ---- pip_join -------------------------------------------------------
    feats = rd.read_parquet(synth.docs_path(corpus)).map_batches(
        extract_features, batch_format="pyarrow"
    )
    polys = feats.filter(expr="geom_type == 3")
    pts = feats.filter(expr="geom_type == 1").materialize()
    n_pts = pts.count()
    t0 = time.perf_counter()
    joined = join_stage.pip_join_auto(pts, polys)
    n_join = joined.count()
    wall = time.perf_counter() - t0
    queries["pip_join"] = round(wall, 3)
    extras["join_rows"] = int(n_join)
    extras["join_input_rows"] = int(n_pts)
    extras["join_rows_per_sec"] = round(n_pts / wall, 1)

    # ---- knn ------------------------------------------------------------
    from grandine_ray.pipelines.queries import KNN_QUERIES

    t0 = time.perf_counter()
    knn = join_stage.knn_topk(
        pts, [q[0] for q in KNN_QUERIES], [q[1] for q in KNN_QUERIES],
        [q[2] for q in KNN_QUERIES], k=5, concurrency=(1, max(2, ncpu)),
    )
    knn.count()
    queries["knn"] = round(time.perf_counter() - t0, 3)

    # ---- ann ------------------------------------------------------------
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.filter(expr="vec_id < 8").take_all()
    qm = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    t0 = time.perf_counter()
    ann = ann_stage.brute_force_topk(
        emb, [r["vec_id"] for r in qrows], qm, k=10,
        concurrency=(1, max(2, ncpu)),
    )
    ann.count()
    queries["ann"] = round(time.perf_counter() - t0, 3)

    # ---- spatialize (OSM PBF → features, distributed joins) -------------
    from grandine_ray.pipelines.spatialize import spatialize
    from grandine_ray.sources.synth import PBF_MAPPING, ensure_pbf

    pbf_path, pbf_expected = ensure_pbf(scale=4)   # ~270k nodes, 26k ways
    t0 = time.perf_counter()
    n_feats = spatialize(pbf_path, PBF_MAPPING).count()
    wall = time.perf_counter() - t0
    queries["spatialize"] = round(wall, 3)
    extras["osm_features"] = int(n_feats)
    assert n_feats == sum(pbf_expected.values()), (n_feats, pbf_expected)
    extras["osm_features_per_sec"] = round(n_feats / wall, 1)

    # ---- text -----------------------------------------------------------
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    t0 = time.perf_counter()
    scored = docs.map_batches(
        text_stage.token_counter_batch, batch_format="pyarrow",
    ).map_batches(
        text_stage.quality_scorer_batch, batch_format="pyarrow",
    ).map_batches(
        text_stage.minhasher_batch, batch_format="pyarrow",
    )
    scored.count()
    queries["text"] = round(time.perf_counter() - t0, 3)

    # ---- corpus hygiene (round-3 ops: tfidf, decontaminate, gopher) ------
    from grandine_ray.stages import corpus as corpus_stage

    docs2 = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    n_corpus_docs = docs2.count()
    t0 = time.perf_counter()
    corpus_stage.tfidf_top_terms(docs2, n_docs=n_corpus_docs, k=3).count()

    def bench_side(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(did % 23 == 0))

    def train_side(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(did % 23 != 0))

    corpus_stage.decontaminate(
        docs2.map_batches(train_side, batch_format="pyarrow"),
        docs2.map_batches(bench_side, batch_format="pyarrow"), n=4).count()
    docs2.map_batches(corpus_stage.gopher_stats,
                      batch_format="pyarrow").count()
    queries["corpus"] = round(time.perf_counter() - t0, 3)
    extras["corpus_docs"] = int(n_corpus_docs)

    # ---- relational (round-3 second half: TPC-H family over hash_join) --
    from grandine_ray.pipelines import queries_ext, queries_rel

    t0 = time.perf_counter()
    n_rel = 0
    n_rel += queries_ext.q_pricing_summary(sf_dir).count()
    from grandine_ray.pipelines.queries import q_revenue_by_nation

    n_rel += q_revenue_by_nation(sf_dir).count()
    n_rel += queries_rel.q_top_unshipped(sf_dir).count()
    queries["relational"] = round(time.perf_counter() - t0, 3)
    extras["relational_rows"] = int(n_rel)

    # ---- ml/curation (round 4: hashed-BoW scoring, affinity, bloom) -----
    from grandine_ray.pipelines import queries_ml

    t0 = time.perf_counter()
    n_ml = 0
    n_ml += queries_ml.q_quality_score(sf_dir).count()
    n_ml += queries_ml.q_target_affinity(sf_dir).count()
    n_ml += queries_ml.q_bloom_semi_join(sf_dir).count()
    queries["ml"] = round(time.perf_counter() - t0, 3)
    extras["ml_rows"] = int(n_ml)

    # ---- media (round 5: per-span decode + aHash signature, the actor-
    # pool multimodal stage; linear in spans. The PAIR stage is excluded
    # on purpose: the synthetic corpus's 4096 asset families make dup
    # density quadratic at sf0.1 — 33M pairs, a property of the fake
    # decode's family structure, not of the engine) --------------------
    from grandine_ray.pipelines import queries_media

    t0 = time.perf_counter()
    n_media = queries_media.q_media_ahash(sf_dir).count()
    queries["media"] = round(time.perf_counter() - t0, 3)
    extras["media_spans"] = int(n_media)

    total = round(sum(queries.values()), 3)
    # machine-state probe: single-core numpy-sort time (this VM's delivered
    # compute fluctuates ±2× between runs; lets BENCH numbers be read in
    # context — ~0.9 s on a quiet machine, see BENCH/BASELINE.md)
    import numpy as _np

    arr = _np.random.default_rng(0).random(3_000_000)
    t0 = time.perf_counter()
    for _ in range(12):
        _np.sort(arr)
    probe = round(time.perf_counter() - t0, 3)
    result = {
        "metric": "wall_time_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": ncpu,
        "machine_probe_sec": probe,
        # multi-core delivered-compute probe: the single-core probe MISSES
        # this VM's multi-core throttle phases (r3 measured agg throughput
        # 2.4 vs 6.5-8.8 for the same probe across phases — a 3x swing
        # that turned the 40 s tiler into 171-225 s with a HEALTHY
        # single-core probe). Aggregate numpy-sort throughput of ncpu
        # parallel processes; r2/r3 quiet-phase reference ~6.5-8.8 at 32.
        "machine_agg_throughput": _agg_probe(ncpu),
        **extras,
    }
    ray.shutdown()
    return result


def _agg_probe(n: int) -> float:
    code = ("import numpy as np, time; a=np.random.rand(3_000_000); "
            "t0=time.time()\n"
            "for _ in range(20): b=np.sort(a)\n"
            "print('%.3f' % (time.time()-t0))")
    procs = [subprocess.Popen([sys.executable, "-c", code],
                              stdout=subprocess.PIPE) for _ in range(n)]
    times = [float(p.communicate()[0]) for p in procs]
    return round(sum(20.0 / t for t in times), 2)


def cpu_ceiling(lo: int, hi: int) -> dict:
    """Measure this machine's aggregate-compute scaling ceiling: N parallel
    numpy-sort processes at both widths. On shared/virtualized hosts the
    per-core throughput drops under full load (memory bandwidth, frequency,
    host contention), capping the best achievable pipeline efficiency
    below 1.0 — report it so efficiency can be judged against hardware."""
    import statistics

    code = ("import numpy as np, time; a=np.random.rand(3_000_000); "
            "t0=time.time()\n"
            "for _ in range(40): b=np.sort(a)\n"
            "print('%.3f' % (time.time()-t0))")
    out = {}
    for n in (lo, hi):
        procs = [subprocess.Popen([sys.executable, "-c", code],
                                  stdout=subprocess.PIPE, text=True)
                 for _ in range(n)]
        vals = [float(p.communicate()[0].strip()) for p in procs]
        out[n] = n / statistics.mean(vals)
    return {
        "agg_throughput_lo": round(out[lo], 2),
        "agg_throughput_hi": round(out[hi], 2),
        "hw_ceiling": round(out[hi] / (out[lo] * (hi / lo)), 3),
    }


def run_child(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env,
        capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main():
    if "--scaling" in sys.argv:
        lo, hi = 8, 32
        r_lo = run_child(lo)
        r_hi = run_child(hi)
        # throughput = tiles/sec on the headline tiler pipeline
        thr_lo = r_lo["tiles_per_sec"]
        thr_hi = r_hi["tiles_per_sec"]
        eff_shallow = thr_hi / (thr_lo * (hi / lo))
        # headline: combined tiling workload (zooms 0-8 bulk + 9-14 deep)
        tiles_total_lo = r_lo["tiles"] + r_lo["deep_tiles"]
        tiles_total_hi = r_hi["tiles"] + r_hi["deep_tiles"]
        t_lo = r_lo["queries"]["tiler"] + r_lo["queries"]["tiler_deep"]
        t_hi = r_hi["queries"]["tiler"] + r_hi["queries"]["tiler_deep"]
        comb_lo = tiles_total_lo / t_lo
        comb_hi = tiles_total_hi / t_hi
        eff = comb_hi / (comb_lo * (hi / lo))
        eff_deep = (r_lo["queries"]["tiler_deep"] / r_hi["queries"]["tiler_deep"]) / (hi / lo)
        # total-suite efficiency as a secondary signal
        eff_total = (r_lo["value"] / r_hi["value"]) / (hi / lo)
        hw = cpu_ceiling(lo, hi)
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": round(eff, 3),
            "unit": "ratio",
            "num_cpus_lo": lo, "num_cpus_hi": hi,
            "tiles_per_sec_lo": round(comb_lo, 1),
            "tiles_per_sec_hi": round(comb_hi, 1),
            "shallow_efficiency": round(eff_shallow, 3),
            "deep_efficiency": round(eff_deep, 3),
            "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
            "suite_efficiency": round(eff_total, 3),
            **hw,
            "efficiency_vs_hw_ceiling": round(eff / hw["hw_ceiling"], 3),
            "queries_lo": r_lo["queries"], "queries_hi": r_hi["queries"],
        }))
        return
    print(json.dumps(run_suite()))


if __name__ == "__main__":
    main()
