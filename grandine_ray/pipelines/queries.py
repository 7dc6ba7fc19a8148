"""Driver-facing query registry: Ray pipelines + matching DuckDB oracle SQL.

Each ``QUERIES`` entry is a callable ``fn(sf_dir) -> Dataset | DataFrame |
Table``; ``ORACLE_SQL`` holds the equivalent ANSI SQL DuckDB runs on the
same inputs. Geospatial queries run over the deterministic synthetic
interleaved-documents corpus (sources/synth.py — the BASELINE.json
input_hint shape); the corpus parquet path for sf0.01 is fixed, so the
static SQL strings can reference it with read_parquet(). Text/ANN queries
run over the driver's pre-registered views (documents, embeddings).

Column names and integer widths are aligned on both sides (driver hashes
values after sorting columns by name). Float columns that pass through
different math libraries (trig, cosine) are rounded identically on both
sides.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..geom import wkb as wkbmod
from ..index import xyz
from ..sources import synth
from ..stages import ann as ann_stage
from ..stages import relational
from ..stages import join as join_stage
from ..stages import text as text_stage
from ..stages.coverage import make_coverage_fn
from ..stages.extract import extract_features
from ..index.cells import s2_cell_id, h3ish_cell_id

COVERAGE_ZOOMS = [0, 2, 4, 6]
DEEP_ZOOM = 14          # deepest metric zoom, checked on size-bounded features
DEEP_MAX_SPAN = 0.5     # deg — a continent-sized fixture polygon would cover
                        # ~11M z14 tiles; both engines cap identically
ORACLE_CORPUS = "/tmp/graft_synth/docs_10000"  # sf0.01 ⇒ 10k docs (synth.py)

# fixture query points for kNN (the reference tile-test vectors; first rows
# of the corpus by construction)
KNN_QUERIES = [
    ("q0", 13.73630, 51.05377),
    ("q1", 18.39856, -33.90184),
    ("q2", -54.59123, -25.59547),
    ("q3", -21.94073, 64.14607),
]
KNN_K = 5

BBOX_TARGETS = [
    ("berlin", 13.0, 52.3, 13.8, 52.7),
    ("nyc", -74.3, 40.5, -73.7, 40.9),
    ("tokyo", 139.5, 35.5, 140.0, 35.8),
    ("south_atlantic", -30.0, -40.0, 0.0, -10.0),
]


def _corpus(sf_dir: str) -> str:
    return synth.corpus_for_sf(sf_dir)


def _docs_ds(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(synth.docs_path(_corpus(sf_dir)))


def _features_ds(sf_dir: str) -> rd.Dataset:
    return _docs_ds(sf_dir).map_batches(extract_features, batch_format="pyarrow")


# ------------------------------------------------------------------ queries


def q_extract_features(sf_dir: str):
    def widen(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "span_idx": pc.cast(batch["span_idx"], pa.int64()),
                "geom_type": pc.cast(batch["geom_type"], pa.int64()),
                "layer": batch["layer"],
                "bbox_minx": batch["bbox_minx"],
                "bbox_miny": batch["bbox_miny"],
                "bbox_maxx": batch["bbox_maxx"],
                "bbox_maxy": batch["bbox_maxy"],
            }
        )

    return _features_ds(sf_dir).map_batches(widen, batch_format="pyarrow")


def q_tile_coverage(sf_dir: str):
    """Per-feature covered tiles at COVERAGE_ZOOMS (the parity-critical
    cell assignment, lib/tile/bbox.go semantics)."""
    tiled = _features_ds(sf_dir).map_batches(
        make_coverage_fn(COVERAGE_ZOOMS), batch_format="pyarrow"
    )

    def unpack(batch: pa.Table) -> pa.Table:
        z, x, y = xyz.tile_key_unpack(
            batch["tile_key"].to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "span_idx": pc.cast(batch["span_idx"], pa.int64()),
                "z": pa.array(z, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
            }
        )

    return tiled.map_batches(unpack, batch_format="pyarrow")


def q_tile_coverage_deep(sf_dir: str):
    """z14 tile assignment for size-bounded features (metric zoom parity)."""
    feats = _features_ds(sf_dir)

    def small(batch: pa.Table) -> pa.Table:
        w = pc.subtract(batch["bbox_maxx"], batch["bbox_minx"])
        h = pc.subtract(batch["bbox_maxy"], batch["bbox_miny"])
        mask = pc.and_(pc.less(w, DEEP_MAX_SPAN), pc.less(h, DEEP_MAX_SPAN))
        return batch.filter(mask)

    tiled = feats.map_batches(small, batch_format="pyarrow").map_batches(
        make_coverage_fn([DEEP_ZOOM]), batch_format="pyarrow"
    )

    def unpack(batch: pa.Table) -> pa.Table:
        z, x, y = xyz.tile_key_unpack(
            batch["tile_key"].to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "span_idx": pc.cast(batch["span_idx"], pa.int64()),
                "z": pa.array(z, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
            }
        )

    return tiled.map_batches(unpack, batch_format="pyarrow")


def q_tile_counts(sf_dir: str):
    """Feature count per covered tile — the pre-aggregated shuffle stats."""
    tiled = _features_ds(sf_dir).map_batches(
        make_coverage_fn(COVERAGE_ZOOMS), batch_format="pyarrow"
    )

    def count_keys(batch: pa.Table) -> pa.Table:
        keys, counts = np.unique(
            batch["tile_key"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({"tile_key": pa.array(keys, pa.uint64()),
                         "n": pa.array(counts, pa.int64())})

    from ray.data.aggregate import Sum

    agg = (
        tiled.map_batches(count_keys, batch_format="pyarrow")
        .groupby("tile_key")
        .aggregate(Sum("n", alias_name="n_features"))
    )

    def unpack(batch: pa.Table) -> pa.Table:
        z, x, y = xyz.tile_key_unpack(
            batch["tile_key"].to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "z": pa.array(z, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "n_features": pc.cast(batch["n_features"], pa.int64()),
            }
        )

    return agg.map_batches(unpack, batch_format="pyarrow")


def q_knn_points(sf_dir: str):
    """Exact kNN by Haversine from fixture query points to all point geoms."""
    pts = _features_ds(sf_dir).filter(
        expr="geom_type == 1"
    )
    ids = [q[0] for q in KNN_QUERIES]
    qx = [q[1] for q in KNN_QUERIES]
    qy = [q[2] for q in KNN_QUERIES]
    out = join_stage.knn_topk(pts, ids, qx, qy, k=KNN_K)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["dist_m"] = g["dist_m"].round(3)
        g["span_idx"] = g["span_idx"].astype("int64")
        return g[["query_id", "doc_id", "span_idx", "rank", "dist_m"]]

    return out.map_batches(final, batch_format="pandas")


def q_bbox_join(sf_dir: str):
    ids = [t[0] for t in BBOX_TARGETS]
    boxes = np.asarray([t[1:] for t in BBOX_TARGETS], dtype=np.float64)
    out = join_stage.bbox_join(_features_ds(sf_dir), ids, boxes)

    def widen(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "span_idx": pc.cast(batch["span_idx"], pa.int64()),
                "target_id": batch["target_id"],
            }
        )

    return out.map_batches(widen, batch_format="pyarrow")


def q_pip_join(sf_dir: str):
    """Point-in-polygon join: corpus points vs corpus polygons. Size-
    switched (stages/join.py:pip_join_auto): a small polygon side is
    broadcast — with the payload compiled in a worker task from block
    refs, never collected on the driver — and a large one takes the
    both-sides-partitioned cell join. Oracled by a genuine SQL ray-cast
    over the ground-truth vertex table (see ORACLE_SQL["pip_join"])."""
    polys = _features_ds(sf_dir).filter(expr="geom_type == 3")
    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")
    out = join_stage.pip_join_auto(pts, polys)

    def widen(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "span_idx": pc.cast(batch["span_idx"], pa.int64()),
                "polygon_id": batch["polygon_id"],
            }
        )

    return out.map_batches(widen, batch_format="pyarrow")


def q_cell_index(sf_dir: str):
    """S2-style + H3-style cell ids for point features (NORTH-RULE EXT).

    Checked against an independent scalar reimplementation of the cell
    math (oracle/expected.py); locality/hierarchy asserted in pytest."""
    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")

    def cells(batch: pa.Table) -> pa.Table:
        lon = batch["bbox_minx"].to_numpy(zero_copy_only=False)
        lat = batch["bbox_miny"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "span_idx": pc.cast(batch["span_idx"], pa.int64()),
                "s2_cell": pa.array(s2_cell_id(lon, lat, level=12), pa.uint64()),
                "h3_cell": pa.array(h3ish_cell_id(lon, lat, res=9), pa.uint64()),
            }
        )

    return pts.map_batches(cells, batch_format="pyarrow")


# ----------------------------------------------- text / ANN over testdata


def q_exact_dedup(sf_dir: str):
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    hashed = docs.map_batches(text_stage.content_hash, batch_format="pyarrow")
    from ray.data.aggregate import Count, Min

    agg = hashed.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_dups")
    )

    def widen(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "keep_doc_id": pc.cast(batch["keep_doc_id"], pa.int64()),
                "n_dups": pc.cast(batch["n_dups"], pa.int64()),
            }
        )

    return agg.map_batches(widen, batch_format="pyarrow")


def q_token_counts(sf_dir: str):
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = docs.map_batches(text_stage.token_counter_batch, batch_format="pyarrow")

    def widen(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_tokens_ws": batch["n_tokens_ws"],
            }
        )

    return out.map_batches(widen, batch_format="pyarrow")


def q_doc_length(sf_dir: str):
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def ln(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "doc_len": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
            }
        )

    return docs.map_batches(ln, batch_format="pyarrow")


def q_top_docs(sf_dir: str):
    """Top-20 longest documents (Dataset.sort + limit, SQL-checked)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def ln(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "doc_len": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
            }
        )

    return (
        docs.map_batches(ln, batch_format="pyarrow")
        .sort(["doc_len", "doc_id"], descending=[True, False])
        .limit(20)
    )


def q_lang_dist(sf_dir: str):
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    from ray.data.aggregate import Count

    agg = docs.groupby("lang").aggregate(Count(alias_name="n_docs"))

    def widen(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch["lang"],
                "n_docs": pc.cast(batch["n_docs"], pa.int64()),
            }
        )

    return agg.map_batches(widen, batch_format="pyarrow")


def q_ann_topk(sf_dir: str):
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qrows = (
        emb.filter(expr="vec_id < 4").take_all()
    )
    qids = [r["vec_id"] for r in qrows]
    qm = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    out = ann_stage.brute_force_topk(emb, qids, qm, k=10)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score"] = g["score"].round(4)
        return g[["query_id", "vec_id", "rank", "score"]]

    return out.map_batches(final, batch_format="pandas")


ANN_FILTER_LABELS = (2, 3, 5)


def q_ann_filtered(sf_dir: str):
    """Filtered vector search: exact top-k cosine per query over only
    the embeddings whose label passes a metadata predicate (the
    pre-filter ANN shape every retrieval/curation pipeline needs —
    filter pushed down into the scan, so the scorer never sees an
    excluded row; same broadcast-query-matrix contract as ann_topk)."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.filter(expr="vec_id < 4").take_all()
    qids = [r["vec_id"] for r in qrows]
    qm = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    allowed = np.array(ANN_FILTER_LABELS, np.int64)

    def keep(b: pa.Table) -> pa.Table:
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(np.isin(lab, allowed)))

    filt = emb.map_batches(keep, batch_format="pyarrow")
    out = ann_stage.brute_force_topk(filt, qids, qm, k=10)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score"] = g["score"].round(4)
        return g[["query_id", "vec_id", "rank", "score"]]

    return out.map_batches(final, batch_format="pandas")


def q_minhash_pairs(sf_dir: str):
    """MinHash-LSH near-dup candidates verified by n-gram Jaccard ≥ 0.5 —
    fully distributed: capped in-band pair generation, distinct groupby,
    two hash joins to attach texts, Jaccard inside map_batches (no
    to_pandas/take_all anywhere).

    Oracled by EXACT all-pairs n-gram Jaccard (oracle/expected.py) — the
    LSH parameters give recall 1.0 on the fixed corpus; pytest plants
    near-duplicates for the recall property itself.

    Exactness scope: pair output is exhaustive only while every LSH band
    bucket holds ≤ band_cap (512) docs — see lsh_candidate_pairs. A
    skewed corpus (thousands of identical docs) keeps cluster
    connectivity but may drop individual pairs; pass band_cap=None to
    minhash_near_dup for exhaustive (O(B²)-in-bucket) output."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return text_stage.minhash_near_dup(docs, threshold=0.5)


def q_filter_corpus(sf_dir: str):
    """Training-data corpus filter (the C4-style keep-list): token-count
    and length thresholds plus exact-dedup canonical selection (keep the
    min doc_id per identical text), composed from the token counter and
    content hash stages — the filtered corpus a pretraining run would
    actually read."""
    from ray.data.aggregate import Min

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    scored = docs.map_batches(text_stage.token_counter_batch,
                              batch_format="pyarrow")
    scored = scored.map_batches(text_stage.content_hash,
                                batch_format="pyarrow")

    def thresholds(b: pa.Table) -> pa.Table:
        ln = pc.utf8_length(b["text"])
        keep = pc.and_(pc.greater_equal(b["n_tokens_ws"], 10),
                       pc.greater_equal(ln, 50))
        out = b.filter(keep)
        return pa.table({
            "doc_id": pc.cast(out["doc_id"], pa.int64()),
            "content_hash": out["content_hash"],
            "doc_len": pc.cast(pc.utf8_length(out["text"]), pa.int64()),
            "n_tokens_ws": pc.cast(out["n_tokens_ws"], pa.int64()),
        })

    surviving = scored.map_batches(thresholds, batch_format="pyarrow")
    keep = surviving.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="keep_doc")
    )
    # semi-join survivors to their hash's canonical doc (union+part join)
    P = 8

    def surv_side(b: pa.Table) -> pa.Table:
        h = b["content_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "_h": pa.array(h, pa.int64()),
            "doc_id": b["doc_id"],
            "doc_len": b["doc_len"],
            "n_tokens_ws": b["n_tokens_ws"],
            "_side": pa.array(np.ones(len(h), np.int8), pa.int8()),
            "_part": pa.array((h % P).astype(np.int32), pa.int32()),
        })

    def keep_side(b: pa.Table) -> pa.Table:
        h = b["content_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "_h": pa.array(h, pa.int64()),
            "doc_id": pc.cast(b["keep_doc"], pa.int64()),
            "doc_len": pa.array(np.zeros(len(h), np.int64), pa.int64()),
            "n_tokens_ws": pa.array(np.zeros(len(h), np.int64), pa.int64()),
            "_side": pa.array(np.zeros(len(h), np.int8), pa.int8()),
            "_part": pa.array((h % P).astype(np.int32), pa.int32()),
        })

    unioned = surviving.map_batches(surv_side, batch_format="pyarrow").union(
        keep.map_batches(keep_side, batch_format="pyarrow")
    )

    def pick(t: pa.Table) -> pa.Table:
        side = t["_side"].to_numpy(zero_copy_only=False)
        kmask = side == 0
        kh = t["_h"].to_numpy(zero_copy_only=False)[kmask]
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "doc_len": pa.array([], pa.int64()),
            "n_tokens_ws": pa.array([], pa.int64()),
        })
        if not len(kh):
            # keeps and survivors share hash%P partitioning, so an empty
            # keep side implies an empty survivor side — but don't let the
            # eager kdoc[...] index below crash if that invariant breaks
            return empty
        order = np.argsort(kh, kind="stable")
        kh_s = kh[order]
        kdoc = t["doc_id"].to_numpy(zero_copy_only=False)[kmask][order]
        st = t.filter(pa.array(~kmask))
        sh = st["_h"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(kh_s, sh)
        ok = ((pos < len(kh_s))
              & (kh_s[np.minimum(pos, max(len(kh_s) - 1, 0))] == sh)
              if len(kh_s) else np.zeros(len(sh), bool))
        sel = np.nonzero(ok & (st["doc_id"].to_numpy(zero_copy_only=False)
                               == kdoc[np.minimum(pos, max(len(kh_s) - 1, 0))]))[0]
        out = st.take(pa.array(sel))
        return pa.table({
            "doc_id": out["doc_id"],
            "doc_len": out["doc_len"],
            "n_tokens_ws": out["n_tokens_ws"],
        })

    return unioned.groupby("_part").map_groups(pick, batch_format="pyarrow")


def q_dedup_clusters(sf_dir: str):
    """Duplicate-cluster assignment: connected components over the
    MinHash-LSH near-dup pairs via distributed min-label propagation
    (stages/text.py dedup_clusters); cluster_id = min doc id reachable
    (the canonical keep-doc). Oracled by a DuckDB recursive CTE over the
    independent exact-Jaccard pair table."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = text_stage.minhash_near_dup(docs, threshold=0.5).materialize()
    return text_stage.dedup_clusters(pairs)


def q_cluster_size_hist(sf_dir: str):
    """Duplicate-cluster size distribution — the shape report a dedup
    run is judged by (how much of the corpus sits in 2-clusters vs
    mega-clusters). Chains the connected-components labels
    (q_dedup_clusters) through two count reduces: per-cluster size,
    then clusters per size. Singleton docs (no near-dup pair) are not
    graph nodes and are absent on both engines."""
    from ray.data.aggregate import Sum

    labels = q_dedup_clusters(sf_dir)

    def size_partial(b: pa.Table) -> pa.Table:
        cid = b["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, cnt = np.unique(cid, return_counts=True)
        return pa.table({"cluster_id": pa.array(keys, pa.int64()),
                         "sz": pa.array(cnt.astype(np.int64), pa.int64())})

    sizes = labels.map_batches(size_partial, batch_format="pyarrow") \
        .groupby("cluster_id").aggregate(Sum("sz", alias_name="sz"))

    def hist_partial(b: pa.Table) -> pa.Table:
        sz = b["sz"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, cnt = np.unique(sz, return_counts=True)
        return pa.table({"cluster_size": pa.array(keys, pa.int64()),
                         "n_clusters": pa.array(cnt.astype(np.int64),
                                                pa.int64())})

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({
            "cluster_size": pc.cast(b["cluster_size"], pa.int64()),
            "n_clusters": pc.cast(b["n_clusters"], pa.int64()),
        })

    return sizes.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("cluster_size") \
        .aggregate(Sum("n_clusters", alias_name="n_clusters")) \
        .map_batches(widen, batch_format="pyarrow").sort("cluster_size")


PASSAGE_W = 10          # words per passage chunk (last chunk = remainder)


def q_passage_dedup(sf_dir: str):
    """Passage-level exact dedup with document reconstruction (the
    RefinedWeb/C4 line-dedup shape re-expressed for this corpus's
    single-line documents): each document splits into consecutive
    10-word chunks, a chunk's FIRST occurrence corpus-wide (min fused
    (doc_id, chunk_idx)) survives, every later duplicate is cut, and
    surviving chunks rejoin in order — documents losing every chunk
    drop out. Two hash exchanges, both over the chunk table (the honest
    cost of passage dedup): winner-select partitions by the 64-bit
    chunk hash (blake2b — same exact-key contract as exact_dedup) and
    takes the min fused id per hash in one lexsort per partition;
    reconstruction partitions by doc and order-joins each doc's
    surviving chunks with one ListArray binary_join per partition (no
    per-doc loop)."""
    from .queries_ext import _fuse20

    import hashlib

    P = relational.adaptive_parts(sf_dir)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def chunker(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern(b["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
            else toks
        flat = toks.flatten()              # offset-aware (ADVICE r3)
        n = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nch = (n + PASSAGE_W - 1) // PASSAGE_W
        total = int(nch.sum())
        doc_rep = np.repeat(doc, nch)
        cum = np.concatenate(([0], np.cumsum(nch)))[:-1]
        ci = np.arange(total, dtype=np.int64) - np.repeat(cum, nch)
        tok_start = np.concatenate(([0], np.cumsum(n)))[:-1]
        starts = np.repeat(tok_start, nch) + ci * PASSAGE_W
        offsets = np.concatenate((starts, [int(n.sum())])).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
        chunk = pc.binary_join(lst, " ")
        h = np.fromiter(
            (int.from_bytes(hashlib.blake2b(
                s.encode("utf-8"), digest_size=8).digest(), "little")
             for s in chunk.to_pylist()),
            dtype=np.uint64, count=total)
        return pa.table({
            "chash": pa.array(h.view(np.int64), pa.int64()),
            "fused": pa.array(_fuse20(doc_rep, ci, "passage (doc, ci)"),
                              pa.int64()),
            "chunk": chunk,
            "_part": pa.array((h % np.uint64(P)).astype(np.int32),
                              pa.int32()),
        })

    def winners(t: pa.Table) -> pa.Table:
        h = t["chash"].to_numpy(zero_copy_only=False)
        f = t["fused"].to_numpy(zero_copy_only=False)
        order = np.lexsort((f, h))
        h_s = h[order]
        first = np.ones(len(h_s), bool)
        if len(h_s):
            first[1:] = h_s[1:] != h_s[:-1]
        keep = order[first]
        doc = f[keep] >> np.int64(20)
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "ci": pa.array(f[keep] & np.int64((1 << 20) - 1), pa.int64()),
            "chunk": t["chunk"].take(pa.array(keep)),
            "_p2": pa.array((doc % P).astype(np.int32), pa.int32()),
        })

    def reconstruct(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        ci = t["ci"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ci, doc))
        doc_s = doc[order]
        starts = np.ones(len(doc_s), bool)
        if len(doc_s):
            starts[1:] = doc_s[1:] != doc_s[:-1]
        idx = np.nonzero(starts)[0]
        offsets = np.r_[idx, len(doc_s)].astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            t["chunk"].take(pa.array(order)).combine_chunks())
        counts = np.diff(np.r_[idx, len(doc_s)]).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(doc_s[idx], pa.int64()),
            "text_dedup": pc.binary_join(lst, " "),
            "n_chunks_kept": pa.array(counts, pa.int64()),
        })

    return docs.map_batches(chunker, batch_format="pyarrow") \
        .groupby("_part").map_groups(winners, batch_format="pyarrow") \
        .groupby("_p2").map_groups(reconstruct, batch_format="pyarrow") \
        .sort("doc_id")


SNAP_MOD = 5            # batch = doc_id % 5 == 0; snapshot = the rest
SNAP_PREFIX_W = 8       # words in the prefix fingerprint


def _prefix_fingerprint(b: pa.Table) -> pa.Table:
    """Append 'content_hash': blake2b-64 of the first SNAP_PREFIX_W
    words (the boilerplate/URL-prefix near-exact dedup key — whole-text
    hashing would never fire on corpora whose dups share openings but
    diverge in tails). List-slice + binary_join are vectorized; the
    blake2b pass is the exact-key contract shared with exact_dedup."""
    toks = pc.split_pattern(b["text"], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    prefix = pc.binary_join(pc.list_slice(toks, 0, SNAP_PREFIX_W), " ")
    t = pa.table({"doc_id": pc.cast(b["doc_id"], pa.int64()),
                  "prefix": prefix})
    return text_stage.content_hash(t, col="prefix").drop_columns(
        ["prefix"])


def _fingerprint_snapshot(sf_dir: str) -> str:
    """Build (once) and return the persisted fingerprint snapshot of
    'yesterday's corpus' (doc_id % SNAP_MOD != 0): a parquet directory
    holding the DISTINCT prefix fingerprints, written by a distributed
    pass and cached under /tmp keyed by the sf dir — the artifact an
    incremental pipeline keeps between ingest batches so a new batch
    never re-reads the historical corpus."""
    import os

    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out = f"/tmp/graft_snapshots/{tag}_fp"
    if os.path.isdir(out) and os.listdir(out):
        return out
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def snap_side(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(did % SNAP_MOD != 0))

    from ray.data.aggregate import Count

    distinct = docs.map_batches(snap_side, batch_format="pyarrow") \
        .map_batches(_prefix_fingerprint, batch_format="pyarrow") \
        .groupby("content_hash").aggregate(Count(alias_name="_n")) \
        .map_batches(lambda b: pa.table(
            {"content_hash": pc.cast(b["content_hash"], pa.int64())}),
            batch_format="pyarrow")
    tmp = out + ".building"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    distinct.write_parquet(tmp)
    os.makedirs("/tmp/graft_snapshots", exist_ok=True)
    try:
        os.rename(tmp, out)
    except OSError:          # lost a (benign) race — another run finished
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_incremental_dedup(sf_dir: str):
    """Incremental / cross-snapshot dedup on the prefix fingerprint
    (blake2b of the first 8 words — _prefix_fingerprint): dedup TODAY'S
    ingest batch (doc_id % 5 == 0) against YESTERDAY'S corpus without
    re-reading it — only its persisted fingerprint snapshot
    (_fingerprint_snapshot) is touched. Within-batch winners (min
    doc_id per content hash, one aggregate-domain groupby) then split
    on a broadcast Bloom filter built from the snapshot's block refs:
    misses are DEFINITELY new (no false negatives) and bypass the
    exchange entirely; only the bloom-hit minority pays the exact anti
    join that clears false positives. Equivalent by construction to
    'exact dedup of batch ∪ snapshot, restricted to batch newcomers' —
    the oracle states exactly that. The winner set (distinct batch
    fingerprints, 16 B/row) is pin_local-pinned so the two bloom
    branches don't re-execute it in local mode; multi-node re-executes
    one small groupby instead of pinning."""
    import ray

    from ..stages.relational import (_bloom_build_task, _bloom_positions,
                                     _cached_bloom, BLOOM_K, BLOOM_M_LOG2,
                                     hash_join_i64)
    from ..state.runtime import pin_local
    from ray.data.aggregate import Count, Min

    P = relational.adaptive_parts(sf_dir)
    snap_dir = _fingerprint_snapshot(sf_dir)
    snap = rd.read_parquet(snap_dir)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def batch_side(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(did % SNAP_MOD == 0))

    winners = docs.map_batches(batch_side, batch_format="pyarrow") \
        .map_batches(_prefix_fingerprint, batch_format="pyarrow") \
        .groupby("content_hash").aggregate(
            Min("doc_id", alias_name="doc_id"),
            Count(alias_name="n_batch_dups"))

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({
            "content_hash": pc.cast(b["content_hash"], pa.int64()),
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "n_batch_dups": pc.cast(b["n_batch_dups"], pa.int64()),
        })

    winners = pin_local(winners.map_batches(widen, batch_format="pyarrow"))

    snap_k = snap.map_batches(
        lambda b: pa.table({"k": pc.cast(b["content_hash"], pa.int64())}),
        batch_format="pyarrow")
    blocks = snap_k.materialize().get_internal_block_refs()
    bm_ref = ray.remote(num_cpus=1)(_bloom_build_task) \
        .remote(BLOOM_M_LOG2, BLOOM_K, *blocks)

    def bloom_flag(want_hit: bool):
        def fn(b: pa.Table) -> pa.Table:
            bm = _cached_bloom(bm_ref)
            keys = b["content_hash"].to_numpy(zero_copy_only=False)
            pos = _bloom_positions(keys, BLOOM_M_LOG2, BLOOM_K)
            hit = np.ones(len(keys), bool)
            for i in range(BLOOM_K):
                p = pos[i]
                hit &= (bm[p >> np.uint64(6)]
                        >> (p & np.uint64(63))) & np.uint64(1) != 0
            return b.filter(pa.array(hit if want_hit else ~hit))
        return fn

    definitely_new = winners.map_batches(bloom_flag(False),
                                         batch_format="pyarrow") \
        .drop_columns(["content_hash"])
    candidates = winners.map_batches(bloom_flag(True),
                                     batch_format="pyarrow")
    survivors = hash_join_i64(
        candidates, snap, key="content_hash",
        left_carry={"doc_id": pa.int64(), "n_batch_dups": pa.int64()},
        right_carry={}, how="anti", P=P) \
        .drop_columns(["content_hash"])
    return definitely_new.union(survivors).sort("doc_id")


SUBSTR_W = 8            # words per sliding window (ExactSubstr-style)


def q_substring_dedup(sf_dir: str):
    """Substring-level exact dedup signals (the ExactSubstr mode of Lee
    et al.'s 'Deduplicating Training Data Makes Language Models Better',
    word-granular): every length-8 SLIDING word window (not fixed
    chunks — that's passage_dedup) is hashed; a window duplicated
    anywhere in the corpus (≥2 occurrences corpus-wide, same doc
    included) marks its token span, and per doc the overlapping marked
    windows merge into MAXIMAL duplicated runs — arbitrary-length
    repeated substrings, reported as (n_runs, dup_tokens,
    max_run_tokens) per affected doc.

    Sorted-fingerprint design, no whole-corpus suffix array on one
    node: window hashing is two chained polynomial prefix passes inside
    map_batches (stages/text.word_window_hashes — zero Python loops);
    duplicate marking hash-partitions the window table and counts runs
    of equal hashes per partition (one argsort each); run merging
    re-partitions the surviving (doc, i) rows by doc and islands
    consecutive offsets vectorized. Two exchanges over the window table
    (≈ one row per corpus token, 20 B/row) — the honest cost of exact
    substring dedup, and both are hash-bucketed, never sorted globally.
    64-bit window-hash exact-key contract as exact_dedup/passage_dedup.
    """
    P = relational.adaptive_parts(sf_dir)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def windows(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        row, i1, h = text_stage.word_window_hashes(b["text"], SUBSTR_W)
        return pa.table({
            "h": pa.array(h.view(np.int64), pa.int64()),
            "doc_id": pa.array(doc[row], pa.int64()),
            "i": pa.array(i1, pa.int64()),
            "_part": pa.array((h % np.uint64(P)).astype(np.int32),
                              pa.int32()),
        })

    def dups(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "i": z,
                             "_p2": pa.array([], pa.int32())})
        h = t["h"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        first = np.ones(len(hs), bool)
        first[1:] = hs[1:] != hs[:-1]
        grp = np.cumsum(first) - 1
        cnt = np.bincount(grp)
        keep = order[cnt[grp] >= 2]
        doc = t["doc_id"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "i": pa.array(t["i"].to_numpy(zero_copy_only=False)[keep],
                          pa.int64()),
            "_p2": pa.array((doc % P).astype(np.int32), pa.int32()),
        })

    def runs(t: pa.Table) -> pa.Table:
        empty = pa.table({c: pa.array([], pa.int64()) for c in
                          ("doc_id", "n_runs", "dup_tokens",
                           "max_run_tokens")})
        if t.num_rows == 0:
            return empty
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        ii = t["i"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ii, doc))
        d, i_s = doc[order], ii[order]
        newrun = np.ones(len(d), bool)
        newrun[1:] = (d[1:] != d[:-1]) | ((i_s[1:] - i_s[:-1]) != 1)
        starts = np.nonzero(newrun)[0]
        ends = np.r_[starts[1:], len(d)] - 1
        run_len = i_s[ends] - i_s[starts] + SUBSTR_W
        run_doc = d[starts]
        newdoc = np.ones(len(run_doc), bool)
        newdoc[1:] = run_doc[1:] != run_doc[:-1]
        dstarts = np.nonzero(newdoc)[0]
        n_runs = np.diff(np.r_[dstarts, len(run_doc)])
        return pa.table({
            "doc_id": pa.array(run_doc[dstarts], pa.int64()),
            "n_runs": pa.array(n_runs.astype(np.int64), pa.int64()),
            "dup_tokens": pa.array(np.add.reduceat(run_len, dstarts),
                                   pa.int64()),
            "max_run_tokens": pa.array(
                np.maximum.reduceat(run_len, dstarts), pa.int64()),
        })

    return docs.map_batches(windows, batch_format="pyarrow") \
        .groupby("_part").map_groups(dups, batch_format="pyarrow") \
        .groupby("_p2").map_groups(runs, batch_format="pyarrow") \
        .sort("doc_id")


REP_NCHARS_OFF = np.int64(1 << 19)       # n_chars inverted below 2^19 so
REP_DOC_W = np.int64(1 << 43)            # min(fused) = (max chars, min id)


def q_cluster_representatives(sf_dir: str):
    """One representative per duplicate cluster: the longest document
    (n_chars), ties to the smallest doc_id — the keep-rule a real dedup
    pass applies to near-dup clusters. Chains the connected-components
    labels through one hash join (attach n_chars) and a per-cluster
    integer argmin over the fused key (2^19 - n_chars) * 2^43 + doc_id
    (the q2/min-cost fuse pattern: lexicographic argmin as a single
    Min aggregate, overflow guarded loudly)."""
    from ray.data.aggregate import Count, Min

    labels = q_dedup_clusters(sf_dir)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])

    def docs_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "n_chars": pc.cast(b["n_chars"], pa.int64()),
        })

    P = relational.adaptive_parts(sf_dir)
    j = relational.hash_join_i64(
        labels, docs.map_batches(docs_slim, batch_format="pyarrow"),
        key="doc_id", left_carry={"cluster_id": pa.int64()},
        right_carry={"n_chars": pa.int64()}, P=P)

    def fuse(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(nc) and (int(nc.max()) >= int(REP_NCHARS_OFF)
                        or int(d.max()) >= int(REP_DOC_W)):
            raise ValueError("cluster_representatives: fuse width "
                             "exceeded (n_chars >= 2^19 or doc_id >= "
                             "2^43) — widen the packing")
        return pa.table({
            "cluster_id": pc.cast(b["cluster_id"], pa.int64()),
            "rep_key": pa.array((REP_NCHARS_OFF - nc) * REP_DOC_W + d,
                                pa.int64()),
        })

    agg = j.map_batches(fuse, batch_format="pyarrow") \
        .groupby("cluster_id") \
        .aggregate(Min("rep_key", alias_name="rep_key"),
                   Count(alias_name="cluster_size"))

    def decode(b: pa.Table) -> pa.Table:
        k = b["rep_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "cluster_id": pc.cast(b["cluster_id"], pa.int64()),
            "rep_doc_id": pa.array(k % REP_DOC_W, pa.int64()),
            "rep_n_chars": pa.array(REP_NCHARS_OFF - k // REP_DOC_W,
                                    pa.int64()),
            "cluster_size": pc.cast(b["cluster_size"], pa.int64()),
        })

    return agg.map_batches(decode, batch_format="pyarrow") \
        .sort("cluster_id")


MIX_TEMP_MULT = 3       # quota_s = min(n_s, MULT * isqrt(n_s)) — α≈0.5
_MIX_HASH_MOD = np.int64(4_194_304)        # doc_id folded to 22 bits so
_MIX_HASH_MULT = np.int64(2_654_435_761)   # the Knuth product stays in
_MIX_HASH_RING = np.int64(4_294_967_296)   # int64 on BOTH engines


def q_mix_sources(sf_dir: str):
    """Temperature-flattened source mixing (the pretraining domain-mix
    step): each source's keep quota is min(n_s, 3·⌊√n_s⌋) — the α=0.5
    temperature curve that upweights small sources relative to their
    natural share — and a doc survives iff its deterministic Knuth hash
    lands under the quota on the ring of its source size. Per-source
    counts are one tiny aggregate (the source domain is small by
    construction); the keep filter is a single vectorized pass; output
    reports per-source totals, quotas, kept counts and kept chars.
    ⌊√n⌋ is integer-exact on both engines for any realistic n (isqrt
    here, FLOOR(SQRT(n)) in SQL — IEEE sqrt of n < 2^52 cannot round
    across the integer boundary)."""
    import math
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])

    def count_partial(b: pa.Table) -> pa.Table:
        src = np.asarray(b["source"].to_pylist(), dtype=object)
        keys, cnt = np.unique(src, return_counts=True)
        return pa.table({"source": pa.array(list(keys), pa.string()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    counts = docs.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n", alias_name="n")).take_all()
    nmap = {r["source"]: int(r["n"]) for r in counts}
    qmap = {s: min(n, MIX_TEMP_MULT * math.isqrt(n))
            for s, n in nmap.items()}

    def keep_partial(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        chars = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.asarray(b["source"].to_pylist(), dtype=object)
        uniq, inv = np.unique(src, return_inverse=True)
        n_arr = np.array([nmap[s] for s in uniq], np.int64)[inv]
        q_arr = np.array([qmap[s] for s in uniq], np.int64)[inv]
        h = ((did % _MIX_HASH_MOD) * _MIX_HASH_MULT) % _MIX_HASH_RING
        keep = (h % n_arr) < q_arr
        ku, kinv = np.unique(src[keep], return_inverse=True)
        kept = np.bincount(kinv, minlength=len(ku)).astype(np.int64)
        kchars = np.bincount(kinv, weights=chars[keep],
                             minlength=len(ku)).astype(np.int64)
        return pa.table({"source": pa.array(list(ku), pa.string()),
                         "n_kept": pa.array(kept, pa.int64()),
                         "chars_kept": pa.array(kchars, pa.int64())})

    agg = docs.map_batches(keep_partial, batch_format="pyarrow") \
        .groupby("source") \
        .aggregate(Sum("n_kept", alias_name="n_kept"),
                   Sum("chars_kept", alias_name="chars_kept"))

    def attach(b: pa.Table) -> pa.Table:
        src = b["source"].to_pylist()
        return pa.table({
            "source": pa.array(src, pa.string()),
            "n_total": pa.array([nmap[s] for s in src], pa.int64()),
            "quota": pa.array([qmap[s] for s in src], pa.int64()),
            "n_kept": pc.cast(b["n_kept"], pa.int64()),
            "chars_kept": pc.cast(b["chars_kept"], pa.int64()),
        })

    return agg.map_batches(attach, batch_format="pyarrow")


def q_simhash(sf_dir: str):
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = docs.map_batches(text_stage.simhasher_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "simhash"])


def q_fingerprint(sf_dir: str):
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = docs.map_batches(text_stage.rolling_fingerprint, batch_format="pyarrow")
    return out.select_columns(["doc_id", "fingerprint"])


def q_events_window(sf_dir: str):
    """Tumbling 1-hour windowed aggregate over the events stream table
    (pre-aggregated inside map_batches before the small groupby)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def window(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hour = ts.astype("datetime64[h]")
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": pa.array(hour.astype("datetime64[us]")),
                "value": batch["value"],
            }
        )

    from ray.data.aggregate import Count, Sum

    agg = (
        ev.map_batches(window, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )

    def widen(batch: pa.Table) -> pa.Table:
        # integer milli-units: float sums differ in the last ulp between
        # engines (non-associative addition), so compare exact integers
        sv = batch["sum_value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": batch["window_start"],
                "n_events": pc.cast(batch["n_events"], pa.int64()),
                "sum_value_milli": pa.array(
                    np.round(sv * 1000).astype(np.int64), pa.int64()
                ),
            }
        )

    return agg.map_batches(widen, batch_format="pyarrow")


def q_events_sliding(sf_dir: str):
    """Sliding 1h windows every 30min over events (each event lands in two
    windows — flat-map + pre-agg + small groupby)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def windows(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[s]").astype(np.int64)
        ws0 = (epoch // 1800) * 1800
        starts = np.concatenate([ws0, ws0 - 1800])
        idx = np.concatenate([np.arange(len(ts))] * 2)
        take = pa.array(idx)
        return pa.table(
            {
                "event_type": batch["event_type"].take(take),
                "window_start": pa.array(
                    starts.astype("datetime64[s]").astype("datetime64[us]")
                ),
            }
        )

    from ray.data.aggregate import Count

    agg = (
        ev.map_batches(windows, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"))
    )

    def widen(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": batch["window_start"],
                "n_events": pc.cast(batch["n_events"], pa.int64()),
            }
        )

    return agg.map_batches(widen, batch_format="pyarrow")


def q_events_sessions(sf_dir: str, num_partitions: int | None = None):
    """Gap-based session windows (30 min) per user.

    Block-vectorized (VERDICT r2 wrong #2): users hash into
    ``num_partitions`` groups, and each partition block is sessionized in
    ONE numpy pass — lexsort by (user, ts), gap mask with user-boundary
    resets, reduceat aggregation over session starts. No per-user Python
    call anywhere (the old per-group pandas map_groups was a per-group
    Python loop wearing a shuffle costume)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    P = num_partitions or relational.adaptive_parts(sf_dir)

    def addpart(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "_part", pa.array((u % P).astype(np.int32), pa.int32()))

    def sessionize(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "session_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "t_start": pa.array([], t.schema.field("ts").type),
                "sum_value_milli": pa.array([], pa.int64()),
            })
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        e_us = ts.astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((e_us, u))
        u_s = u[order]
        e_s = e_us[order]
        v_s = v[order]
        new_user = np.ones(n, bool)
        new_user[1:] = u_s[1:] != u_s[:-1]
        new_sess = new_user.copy()
        # strict >30min gap, exact integer microseconds (same decision as
        # pandas diff().dt.total_seconds() > 1800)
        new_sess[1:] |= (e_s[1:] - e_s[:-1]) > 1_800_000_000
        g = np.cumsum(new_sess)
        # per-user session_id = sessions-so-far minus count at user start
        ufirst = np.maximum.accumulate(np.where(new_user, np.arange(n), 0))
        sid = g - g[ufirst]
        starts = np.nonzero(new_sess)[0]
        n_ev = np.diff(np.append(starts, n))
        sums = np.add.reduceat(v_s, starts)
        take = pa.array(order[starts])
        return pa.table(
            {
                "user_id": pa.array(u_s[starts], pa.int64()),
                "session_id": pa.array(sid[starts], pa.int64()),
                "n_events": pa.array(n_ev, pa.int64()),
                "t_start": t["ts"].take(take),
                "sum_value_milli": pa.array(
                    np.round(sums * 1000).astype(np.int64), pa.int64()),
            }
        )

    return ev.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(sessionize, batch_format="pyarrow")


def q_events_asof(sf_dir: str):
    """LEFT as-of join (clicks ← most recent prior view per user) — the
    canonical time-series point-in-time join Ray Data lacks natively.
    One hash shuffle on user_id + a block-vectorized merge pass per
    partition (stages/join.py:asof_join); DuckDB ASOF LEFT JOIN oracle."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"])
    clicks = ev.filter(expr="event_type == 'click'")
    views = ev.filter(expr="event_type == 'view'")
    out = join_stage.asof_join(
        clicks, views, by="user_id", on="ts",
        left_cols=["event_id"], right_cols=["event_id", "value"])

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(b["event_id"], pa.int64()),
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "view_event_id": pc.cast(b["right_event_id"], pa.int64()),
            "view_value_milli": pc.cast(
                pc.round(pc.multiply(b["right_value"], 1000)), pa.int64()),
        })

    return out.map_batches(widen, batch_format="pyarrow")


TOPK_PER_LANG = 3


def q_top_docs_per_lang(sf_dir: str):
    """Per-group top-k (rank window): top 3 docs per language by
    (n_chars DESC, doc_id ASC). Partial per-block top-k inside
    map_batches (the combiner) before the tiny per-lang groupby — the
    shuffle carries ≤ k rows per (lang, block)."""
    K = TOPK_PER_LANG
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])

    def topk(t: pa.Table, final: bool) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        lang = t["lang"].to_numpy(zero_copy_only=False)
        _, lcode = np.unique(lang, return_inverse=True)
        order = np.lexsort((did, -nc, lcode))
        lc_s = lcode[order]
        boundary = np.ones(len(lc_s), bool)
        if len(lc_s) > 1:
            boundary[1:] = lc_s[1:] != lc_s[:-1]
        gid = np.cumsum(boundary) - 1
        starts = np.zeros(gid[-1] + 1 if len(gid) else 0, np.int64)
        if len(gid):
            np.cumsum(np.bincount(gid)[:-1], out=starts[1:])
        rank = np.arange(len(lc_s)) - starts[gid] if len(gid) else \
            np.empty(0, np.int64)
        keep = rank < K
        sel = pa.array(order[keep])
        cols = {
            "lang": t["lang"].take(sel),
            "doc_id": pc.cast(t["doc_id"].take(sel), pa.int64()),
            "n_chars": pc.cast(t["n_chars"].take(sel), pa.int64()),
        }
        if final:
            cols["rnk"] = pa.array(rank[keep] + 1, pa.int64())
        return pa.table(cols)

    partial = docs.map_batches(lambda b: topk(b, False),
                               batch_format="pyarrow")
    return partial.groupby("lang").map_groups(
        lambda g: topk(g, True), batch_format="pyarrow")


SAMPLE_RATE_BP = {"en": 1000}        # dominant language downsampled to 10 %
SAMPLE_DEFAULT_BP = 5000             # others kept at 50 %


def q_sample_corpus(sf_dir: str):
    """Deterministic stratified sampling: per-language keep rates via a
    Knuth multiplicative hash of doc_id — pure map-side filter, zero
    shuffle, reproducible across engines (identical integer arithmetic
    in numpy uint64 and DuckDB BIGINT)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])

    def sample(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((did * np.uint64(2654435761)) % np.uint64(4294967296)) \
            % np.uint64(10000)
        lang = b["lang"].to_numpy(zero_copy_only=False)
        rate = np.full(len(lang), SAMPLE_DEFAULT_BP, np.uint64)
        for lg, bp in SAMPLE_RATE_BP.items():
            rate[lang == lg] = bp
        keep = pa.array(h < rate)
        out = b.filter(keep)
        return pa.table({
            "doc_id": pc.cast(out["doc_id"], pa.int64()),
            "lang": out["lang"],
            "n_chars": pc.cast(out["n_chars"], pa.int64()),
        })

    return docs.map_batches(sample, batch_format="pyarrow")


def q_jaccard_pairs(sf_dir: str):
    """EXACT all-pairs n-gram Jaccard ≥ 0.5 — no sketches: the
    prefix-filter inverted-index self-join (stages/text.py:
    jaccard_near_dup_exact). Same ground truth as minhash_pairs but a
    fundamentally different (exact) algorithm; the two queries
    cross-validate each other."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return text_stage.jaccard_near_dup_exact(docs, threshold=0.5)


def q_ann_ivf(sf_dir: str):
    """IVF-probed approximate ANN (scale path) — rows-only (approximate by
    design; recall vs brute force asserted in pytest)."""
    import zlib

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.filter(expr="vec_id < 4").take_all()
    qm = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    idx_dir = f"/tmp/graft_ivf_{zlib.crc32(sf_dir.encode()) & 0xFFFFFFFF:x}"
    out = ann_stage.ivf_topk(emb, [r["vec_id"] for r in qrows], qm, k=10,
                             index_dir=idx_dir)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score"] = g["score"].round(4)
        return g[["query_id", "vec_id", "rank", "score"]]

    return out.map_batches(final, batch_format="pandas")


def q_ann_ivfpq(sf_dir: str):
    """IVF-PQ approximate ANN — the compressed scale path: the IVF
    hive-partitioned layout with 8-byte PQ residual codes instead of
    raw float vectors (32× smaller index; nlist ∝ √N), ADC scoring.
    Rows-only (approximate by design; recall@10 ≥ 0.9 asserted in
    pytest on the planted-cluster fixture)."""
    import zlib

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.filter(expr="vec_id < 4").take_all()
    qm = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    idx_dir = f"/tmp/graft_ivfpq_{zlib.crc32(sf_dir.encode()) & 0xFFFFFFFF:x}"
    out = ann_stage.ivfpq_topk(emb, [r["vec_id"] for r in qrows], qm,
                               k=10, index_dir=idx_dir)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score"] = g["score"].round(4)
        return g[["query_id", "vec_id", "rank", "score"]]

    return out.map_batches(final, batch_format="pandas")


def q_embedding_dedup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs — SIZE-SWITCHED like
    pip_join_auto: ≤100k vectors (every sf here) runs the exact
    block-nested-loop all-pairs self-join (driver holds block refs only;
    each (block_i, block_j) task is one chunk×chunk matmul); above the
    threshold it switches to the HyperplaneLSH bucket groupby (one
    shuffle, exact in-bucket re-score — approximate recall, exact
    precision)."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return ann_stage.embedding_near_dup_auto(emb, threshold=0.4, round_dp=3)


def q_global_bbox(sf_dir: str):
    """Global bbox + feature count (A2/A3: running BBox.ExtendWith /
    Count over all features — here a tree aggregate)."""
    from ray.data.aggregate import Count, Max, Min

    agg = _features_ds(sf_dir).aggregate(
        Min("bbox_minx", alias_name="minx"),
        Min("bbox_miny", alias_name="miny"),
        Max("bbox_maxx", alias_name="maxx"),
        Max("bbox_maxy", alias_name="maxy"),
        Count(alias_name="n_features"),
    )
    import pandas as pd

    return pd.DataFrame([{
        "minx": agg["minx"], "miny": agg["miny"],
        "maxx": agg["maxx"], "maxy": agg["maxy"],
        "n_features": int(agg["n_features"]),
    }])


def q_simplify(sf_dir: str):
    """RDP simplification of linestrings (M13); oracled by an independent
    scalar RDP (oracle/expected.py)."""
    from ..geom.ops import simplify_rdp

    lines = _features_ds(sf_dir).filter(expr="geom_type == 2")

    def simp(batch: pa.Table) -> pa.Table:
        gb = wkbmod.decode_wkb_batch(batch["geom_wkb"].to_pylist())
        n_in, n_out = [], []
        for i in range(len(gb)):
            pts = gb.rings_of(i)[0]
            out = simplify_rdp(pts, 0.01)
            n_in.append(len(pts))
            n_out.append(len(out))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "span_idx": pc.cast(batch["span_idx"], pa.int64()),
                "n_points_in": pa.array(n_in, pa.int64()),
                "n_points_simplified": pa.array(n_out, pa.int64()),
            }
        )

    return lines.map_batches(simp, batch_format="pyarrow")


def q_raster_stats(sf_dir: str):
    """Rasterize polygon features to a 32×32 grid; report fill fraction —
    oracled by an independent scalar scanline fill (oracle/expected.py)."""
    from ..stages.raster import rasterize_polygon

    polys = _features_ds(sf_dir).filter(expr="geom_type == 3")

    def rast(batch: pa.Table) -> pa.Table:
        gb = wkbmod.decode_wkb_batch(batch["geom_wkb"].to_pylist())
        fills = []
        for i in range(len(gb)):
            rings = [r - r.min(axis=0) for r in gb.rings_of(i)]
            extent = max(1e-9, max(float(r.max()) for r in rings))
            g = rasterize_polygon(rings, 32, extent)
            fills.append(round(float(g.mean()), 6))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "span_idx": pc.cast(batch["span_idx"], pa.int64()),
                "fill_fraction": pa.array(fills, pa.float64()),
            }
        )

    return polys.map_batches(rast, batch_format="pyarrow")


def q_media_features(sf_dir: str):
    """Multimodal actor-pool pipeline over media spans (decode stubbed
    deterministically — see stages/media.py); oracled by a scalar span-walk
    recomputation (oracle/expected.py)."""
    from ..stages.media import media_pipeline

    out = media_pipeline(_docs_ds(sf_dir), concurrency=(1, 4), batch_size=512)

    def widen(batch: pa.Table) -> pa.Table:
        feats = batch["img_features"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "span_idx": pc.cast(batch["span_idx"], pa.int64()),
                "media_ref": batch["media_ref"],
                "mean_r": pa.array([round(f[0], 4) for f in feats], pa.float64()),
            }
        )

    return out.map_batches(widen, batch_format="pyarrow")


def q_layer_stats(sf_dir: str):
    """Per-layer geometry aggregates: feature counts by type, total
    planar line length, total planar polygon area (shoelace with ring
    wrap; holes signed by their winding). Per-feature values integer-ize
    to nano-units BEFORE the layer sum, so the aggregate is exact and
    order-independent on both engines. Fully vectorized: one next-vertex
    gather + two reduceat passes per batch."""
    from ray.data.aggregate import Sum

    docs = _docs_ds(sf_dir)

    def stats(batch: pa.Table) -> pa.Table:
        spans = batch["spans"].combine_chunks()
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        kind = flat.field("kind")
        mask = pc.equal(kind, "geom").to_numpy(zero_copy_only=False)
        sel = np.nonzero(mask)[0]
        hexes = flat.field("text").take(pa.array(sel)).to_pylist()
        media = flat.field("media_ref").take(pa.array(sel)).to_pylist()
        joined = bytes.fromhex("".join(hexes))
        sizes = np.asarray([len(h) // 2 for h in hexes], np.int64)
        ends = np.cumsum(sizes)
        blobs = [joined[e - s:e] for s, e in zip(sizes, ends)]
        gb = wkbmod.decode_wkb_batch(blobs)
        layers = [m[6:] if m.startswith("layer:") else "default"
                  for m in media]
        x = gb.coords[:, 0]
        y = gb.coords[:, 1]
        N = len(x)
        nxt = np.arange(1, N + 1, dtype=np.int64)
        ring_start = gb.ring_offsets[:-1]
        ring_end = gb.ring_offsets[1:]
        if N:
            nxt[ring_end - 1] = ring_start
        cross = x * y[nxt % max(N, 1)] - x[nxt % max(N, 1)] * y \
            if N else np.empty(0, np.float64)
        dx = x[nxt % max(N, 1)] - x if N else np.empty(0, np.float64)
        dy = y[nxt % max(N, 1)] - y if N else np.empty(0, np.float64)
        seglen = np.sqrt(dx * dx + dy * dy)
        if N:
            seglen[ring_end - 1] = 0.0       # length never wraps
        ring_cross = np.add.reduceat(cross, ring_start) \
            if len(ring_start) else np.empty(0, np.float64)
        ring_len = np.add.reduceat(seglen, ring_start) \
            if len(ring_start) else np.empty(0, np.float64)
        # single-point rings: reduceat over size-1 segments is the value
        # itself, which is already the correct (zero-wrap) contribution
        g_off = gb.geom_offsets
        geom_cross = np.add.reduceat(ring_cross, g_off[:-1]) \
            if len(g_off) > 1 else np.empty(0, np.float64)
        geom_len = np.add.reduceat(ring_len, g_off[:-1]) \
            if len(g_off) > 1 else np.empty(0, np.float64)
        is_poly = gb.types == 3
        is_line = gb.types == 2
        area_micro = np.zeros(len(gb.types), np.int64)
        len_micro = np.zeros(len(gb.types), np.int64)
        area_micro[is_poly] = np.floor(
            np.abs(geom_cross[is_poly]) / 2 * 1e6 + 0.5).astype(np.int64)
        len_micro[is_line] = np.floor(
            geom_len[is_line] * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            "layer": pa.array(layers, pa.string()),
            "n_points": pa.array((gb.types == 1).astype(np.int64)),
            "n_lines": pa.array(is_line.astype(np.int64)),
            "n_polys": pa.array(is_poly.astype(np.int64)),
            "len_micro": pa.array(len_micro, pa.int64()),
            "area_micro": pa.array(area_micro, pa.int64()),
        })

    agg = docs.map_batches(stats, batch_format="pyarrow") \
        .groupby("layer").aggregate(
            Sum("n_points", alias_name="n_points"),
            Sum("n_lines", alias_name="n_lines"),
            Sum("n_polys", alias_name="n_polys"),
            Sum("len_micro", alias_name="total_len_micro"),
            Sum("area_micro", alias_name="total_area_micro"))

    def widen(b: pa.Table) -> pa.Table:
        cols = {"layer": b["layer"]}
        for c in ["n_points", "n_lines", "n_polys",
                  "total_len_micro", "total_area_micro"]:
            cols[c] = pc.cast(b[c], pa.int64())
        return pa.table(cols)

    return agg.map_batches(widen, batch_format="pyarrow")


# --------------------------------------------------- corpus-hygiene queries


DECON_NGRAM = 4
DECON_BENCH_MOD = 23
PACK_BUDGET = 256
PACK_SHARD = 100


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (stages/corpus.py): flag every training
    doc sharing a word-4-gram with the benchmark subset (doc_id % 23 == 0
    — the stand-in for an eval set). Benchmark n-gram hashes are reduced
    on a worker from block refs and broadcast; the corpus streams through
    one searchsorted membership scan (no shuffle). Oracled by an
    independent scalar string-tuple-set implementation."""
    from ..stages import corpus as corpus_stage

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def bench_side(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(did % DECON_BENCH_MOD == 0))

    def train_side(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(did % DECON_BENCH_MOD != 0))

    bench = docs.map_batches(bench_side, batch_format="pyarrow")
    train = docs.map_batches(train_side, batch_format="pyarrow")
    return corpus_stage.decontaminate(train, bench, n=DECON_NGRAM)


def q_pack_sequences(sf_dir: str):
    """Greedy sequence packing into 256-token bins, restarted at fixed
    100-doc_id shard boundaries so packing is deterministic and every
    shard packs in parallel (the per-shard loop is per PACK via
    searchsorted over the cumulative token sum, not per doc)."""
    from ..stages import corpus as corpus_stage

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    toks = docs.map_batches(text_stage.token_counter_batch,
                            batch_format="pyarrow")

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "n_tokens": pc.cast(b["n_tokens_ws"], pa.int64()),
        })

    return corpus_stage.pack_sequences(
        toks.map_batches(slim, batch_format="pyarrow"),
        budget=PACK_BUDGET, shard_size=PACK_SHARD)


def q_gopher_quality(sf_dir: str):
    """Gopher-style repetition/quality signals per doc (word count,
    unique-word fraction, top-2-gram fraction — integer micro-units) and
    the keep verdict. One vectorized prefix-hash pass per batch; oracled
    by an independent scalar Counter implementation."""
    from ..stages import corpus as corpus_stage

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return docs.map_batches(corpus_stage.gopher_stats,
                            batch_format="pyarrow")


def q_span_stats(sf_dir: str):
    """Per-document span statistics over the INTERLEAVED corpus schema
    (doc_id, spans: list<struct<kind, text, media_ref, offset>>) — the
    BASELINE.json input_hint shape exercised directly: span counts per
    kind, text-span character volume, max offset. One Arrow
    list-flatten + bincount pass per batch; SQL parity via DuckDB
    recursive UNNEST of the struct list."""
    docs = _docs_ds(sf_dir)

    def stats(b: pa.Table) -> pa.Table:
        spans = b["spans"].combine_chunks()
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        lens = pc.list_value_length(spans).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = len(lens)
        flat = pc.list_flatten(spans)
        kind = flat.field("kind")
        doc_of = np.repeat(np.arange(m, dtype=np.int64), lens)
        n_spans = lens
        def kcount(k):
            mask = pc.equal(kind, k).to_numpy(zero_copy_only=False)
            return np.bincount(doc_of[mask], minlength=m).astype(np.int64)
        n_geom = kcount("geom")
        n_text = kcount("text")
        n_media = kcount("media")
        tmask = pc.equal(kind, "text").to_numpy(zero_copy_only=False)
        tlen = pc.utf8_length(flat.field("text")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        text_chars = np.bincount(
            doc_of[tmask], weights=tlen[tmask], minlength=m).astype(np.int64)
        off = flat.field("offset").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        max_off = np.full(m, np.iinfo(np.int64).min, np.int64)
        np.maximum.at(max_off, doc_of, off)
        nz = n_spans > 0
        sel = pa.array(np.nonzero(nz)[0])
        return pa.table({
            "doc_id": b["doc_id"].take(sel),
            "n_spans": pa.array(n_spans[nz], pa.int64()),
            "n_geom": pa.array(n_geom[nz], pa.int64()),
            "n_text": pa.array(n_text[nz], pa.int64()),
            "n_media": pa.array(n_media[nz], pa.int64()),
            "text_chars": pa.array(text_chars[nz], pa.int64()),
            "max_offset": pa.array(max_off[nz], pa.int64()),
        })

    return docs.map_batches(stats, batch_format="pyarrow")


def q_span_type_runs(sf_dir: str):
    """Longest run of CONSECUTIVE same-kind spans per document over the
    interleaved schema (in span order) — the interleaving-quality
    signal of a multimodal corpus (a doc whose media spans all clump
    together packs/trains differently from one that alternates).
    Ties break toward the earliest run. Fully vectorized run-length
    encoding: one boundary mask + cumsum over the flattened kind codes
    per batch, no shuffle. DuckDB mirror is the classic
    gaps-and-islands (pos − ROW_NUMBER per (doc, kind))."""
    docs = _docs_ds(sf_dir)

    def runs(b: pa.Table) -> pa.Table:
        spans = b["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        lens = pc.list_value_length(spans) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(lens)
        flat = pc.list_flatten(spans)
        enc = flat.field("kind")
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        enc = pc.dictionary_encode(enc)
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vocab = np.asarray(enc.dictionary.to_pylist(), object)
        doc_of = np.repeat(np.arange(m, dtype=np.int64), lens)
        total = len(codes)
        if total == 0:
            return pa.table({"doc_id": b["doc_id"].take(pa.array([],
                                                                 pa.int64())),
                             "max_run": pa.array([], pa.int64()),
                             "run_kind": pa.array([], pa.string())})
        boundary = np.ones(total, bool)
        boundary[1:] = (codes[1:] != codes[:-1]) | \
            (doc_of[1:] != doc_of[:-1])
        starts = np.nonzero(boundary)[0]
        rid = np.cumsum(boundary) - 1
        run_len = np.bincount(rid).astype(np.int64)
        run_doc = doc_of[starts]
        doc_off = np.concatenate([[0], np.cumsum(lens)[:-1]])
        run_st = starts - doc_off[run_doc]   # in-doc start (tie-break)
        order = np.lexsort((run_st, -run_len, run_doc))
        first = np.ones(len(order), bool)
        first[1:] = run_doc[order][1:] != run_doc[order][:-1]
        sel = order[first]
        return pa.table({
            "doc_id": b["doc_id"].take(pa.array(run_doc[sel])),
            "max_run": pa.array(run_len[sel], pa.int64()),
            "run_kind": pa.array(vocab[codes[starts[sel]]].tolist(),
                                 pa.string()),
        })

    return docs.map_batches(runs, batch_format="pyarrow")


def q_span_kind_bigrams(sf_dir: str):
    """Corpus-wide span-kind transition census over the interleaved
    schema: counts of consecutive (kind → next kind) pairs in span
    order within each document — the interleaving grammar of a
    multimodal corpus (does an image follow its caption text, or
    clump with other media?). Fully vectorized per batch: dictionary-
    encode the flattened kinds, mask document boundaries, bincount
    fused code pairs; the only exchange is the final |kinds|²-row
    groupby on a \\x1f-fused string key (repo fuse convention)."""
    from ray.data.aggregate import Sum

    docs = _docs_ds(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        spans = b["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        lens = pc.list_value_length(spans) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(spans)
        enc = flat.field("kind")
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        enc = pc.dictionary_encode(enc)
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vocab = enc.dictionary.to_pylist()
        V = max(len(vocab), 1)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        if len(codes) < 2:
            z = pa.array([], pa.string())
            return pa.table({"k": z, "n": pa.array([], pa.int64())})
        adj = doc_of[1:] == doc_of[:-1]
        fused = codes[:-1][adj] * V + codes[1:][adj]
        cnt = np.bincount(fused, minlength=V * V).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        keys = [f"{vocab[f // V]}\x1f{vocab[f % V]}" for f in nz]
        return pa.table({"k": pa.array(keys, pa.string()),
                         "n": pa.array(cnt[nz], pa.int64())})

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n", alias_name="n"))

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["k"], "\x1f")
        return pa.table({
            "kind_a": pc.list_element(parts, 0),
            "kind_b": pc.list_element(parts, 1),
            "n_pairs": pc.cast(b["n"], pa.int64()),
        })

    return agg.map_batches(split, batch_format="pyarrow")


def q_media_ref_census(sf_dir: str):
    """Asset-reuse histogram over the interleaved schema: for every
    shared media reference, in how many DISTINCT documents it appears,
    histogrammed as (n_docs, n_refs) — the hot-asset / dedup-benefit
    profile of a multimodal corpus (a ref in thousands of docs is a
    fetch-once-broadcast candidate; the long tail of singletons is
    not). A document's spans live in one row, so per-row uniquing is
    already per-document uniquing — no cross-block dedup exchange:
    per block, distinct (doc, ref) pairs reduce to per-ref partial
    counts, ONE groupby sums true doc counts per ref, and a second
    aggregate-domain groupby builds the histogram."""
    from ray.data.aggregate import Sum

    docs = _docs_ds(sf_dir)

    def ref_partial(b: pa.Table) -> pa.Table:
        spans = b["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        lens = pc.list_value_length(spans) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(spans)
        mr = flat.field("media_ref")
        if isinstance(mr, pa.ChunkedArray):
            mr = mr.combine_chunks()
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        # null mr → is_valid False, so and_kleene is definite everywhere
        keep = pc.and_kleene(mr.is_valid(), pc.not_equal(mr, ""))
        keep_np = keep.to_numpy(zero_copy_only=False).astype(bool)
        mr_k = mr.filter(pa.array(keep_np))
        d_k = doc_of[keep_np]
        fused = pc.binary_join_element_wise(
            pa.array(d_k.astype("U"), pa.string()), mr_k, "\x1f")
        uniq = pc.unique(fused)
        refs = pc.list_element(pc.split_pattern(uniq, "\x1f"), 1)
        # per-block partial count per ref (each doc contributes ≤ 1)
        enc = pc.dictionary_encode(refs)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table({
            "mr": enc.dictionary,
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    per_ref = docs.map_batches(ref_partial, batch_format="pyarrow") \
        .groupby("mr").aggregate(Sum("n", alias_name="n_docs"))

    def hist_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(
            b["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True)
        return pa.table({"n_docs": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    return per_ref.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("n_docs").aggregate(Sum("n", alias_name="n_refs")) \
        .map_batches(lambda b: pa.table({
            "n_docs": pc.cast(b["n_docs"], pa.int64()),
            "n_refs": pc.cast(b["n_refs"], pa.int64())}),
            batch_format="pyarrow")


def q_caption_context(sf_dir: str):
    """Caption-affinity census over the interleaved schema: for every
    media span, what sits immediately BEFORE and AFTER it in span order
    within the document — neighbor kind (text / geom / media, or 'none'
    at a document edge) plus the total and max character length of
    text-kind neighbors (the caption-length profile a multimodal
    curator uses to decide whether images are captioned or bare).
    span_kind_bigrams cannot derive this: it has no doc-edge class and
    no payload lengths. Fully vectorized per batch (flatten once, one
    dictionary encode, int64 add.at/maximum.at over fused
    direction×kind codes); the only exchange is the final
    ≤ 2·(|kinds|+1)-row groupby on the repo's \\x1f-fused string key."""
    from ray.data.aggregate import Max, Sum

    docs = _docs_ds(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        spans = b["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        lens = pc.list_value_length(spans) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(spans)
        kind = flat.field("kind")
        if isinstance(kind, pa.ChunkedArray):
            kind = kind.combine_chunks()
        enc = pc.dictionary_encode(kind)
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vocab = enc.dictionary.to_pylist()
        V = len(vocab)                      # code V = 'none' (doc edge)
        try:
            media_code = vocab.index("media")
        except ValueError:
            z = pa.array([], pa.string())
            zi = pa.array([], pa.int64())
            return pa.table({"k": z, "n": zi, "s": zi, "m": zi})
        # text char lengths, zeroed for non-text spans (geom spans carry
        # WKB hex in .text — they must NOT count as caption chars)
        tc = pc.utf8_length(flat.field("text")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        if "text" in vocab:
            tc[codes != vocab.index("text")] = 0
        else:
            tc[:] = 0
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        media = np.nonzero(codes == media_code)[0]
        n_keys = 2 * (V + 1)
        n_acc = np.zeros(n_keys, np.int64)
        s_acc = np.zeros(n_keys, np.int64)
        m_acc = np.zeros(n_keys, np.int64)
        for d, off in ((0, -1), (1, 1)):    # 0 = before, 1 = after
            nb = media + off
            ok = (nb >= 0) & (nb < len(codes))
            ok[ok] = doc_of[nb[ok]] == doc_of[media[ok]]
            nk = np.full(len(media), V, np.int64)
            nk[ok] = codes[nb[ok]]
            ln = np.zeros(len(media), np.int64)
            ln[ok] = tc[nb[ok]]
            key = d * (V + 1) + nk
            np.add.at(n_acc, key, 1)
            np.add.at(s_acc, key, ln)
            np.maximum.at(m_acc, key, ln)
        nz = np.nonzero(n_acc)[0]
        names = vocab + ["none"]
        keys = [("before" if f < V + 1 else "after") + "\x1f"
                + names[f % (V + 1)] for f in nz]
        return pa.table({
            "k": pa.array(keys, pa.string()),
            "n": pa.array(n_acc[nz], pa.int64()),
            "s": pa.array(s_acc[nz], pa.int64()),
            "m": pa.array(m_acc[nz], pa.int64()),
        })

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n", alias_name="n"),
                                Sum("s", alias_name="s"),
                                Max("m", alias_name="m"))

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["k"], "\x1f")
        return pa.table({
            "direction": pc.list_element(parts, 0),
            "neighbor_kind": pc.list_element(parts, 1),
            "n_media": pc.cast(b["n"], pa.int64()),
            "sum_text_chars": pc.cast(b["s"], pa.int64()),
            "max_text_chars": pc.cast(b["m"], pa.int64()),
        })

    return agg.map_batches(split, batch_format="pyarrow")


def q_zscore_events(sf_dir: str):
    """Per-event-type first/second moments (count, mean, population std)
    as one streaming pass of per-block partials (n, Σv, Σv²) + a tiny
    groupby — statistics reported in integer micro-units with the same
    floor(x·1e6 + 0.5) rule as the SQL side."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        enc = pc.dictionary_encode(et.combine_chunks()
                                   if isinstance(et, pa.ChunkedArray) else et)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False)
        k = int(codes.max()) + 1 if len(codes) else 0
        n = np.bincount(codes, minlength=k)
        s = np.bincount(codes, weights=v, minlength=k)
        ss = np.bincount(codes, weights=v * v, minlength=k)
        return pa.table({
            "event_type": enc.dictionary,
            "n": pa.array(n.astype(np.int64), pa.int64()),
            "s": pa.array(s, pa.float64()),
            "ss": pa.array(ss, pa.float64()),
        })

    from ray.data.aggregate import Sum

    agg = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"))

    def final(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = b["s"].to_numpy(zero_copy_only=False)
        ss = b["ss"].to_numpy(zero_copy_only=False)
        mean = s / n
        var = np.maximum(ss / n - mean * mean, 0.0)
        return pa.table({
            "event_type": b["event_type"],
            "n_events": pc.cast(b["n"], pa.int64()),
            "mean_micro": pa.array(
                np.floor(mean * 1e6 + 0.5).astype(np.int64), pa.int64()),
            "std_micro": pa.array(
                np.floor(np.sqrt(var) * 1e6 + 0.5).astype(np.int64),
                pa.int64()),
        })

    return agg.map_batches(final, batch_format="pyarrow")


SAMPLE_K = 5


def q_sample_fixed_k(sf_dir: str):
    """Deterministic k-per-group sample (uniform without replacement):
    keep the k docs with the smallest Knuth multiplicative hash per
    language. Per-block partial top-k combiner before the tiny groupby —
    the shuffle carries ≤ k rows per (lang, block). Shuffle-free
    equivalent of per-group reservoir sampling."""
    K = SAMPLE_K
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])

    def hashes(did: np.ndarray) -> np.ndarray:
        return (did.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(4294967296)

    def topk(t: pa.Table, final: bool) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = hashes(did).astype(np.int64)
        lang = t["lang"].to_numpy(zero_copy_only=False)
        _, lcode = np.unique(lang, return_inverse=True)
        order = np.lexsort((did, h, lcode))
        lc_s = lcode[order]
        boundary = np.ones(len(lc_s), bool)
        if len(lc_s) > 1:
            boundary[1:] = lc_s[1:] != lc_s[:-1]
        gid = np.cumsum(boundary) - 1
        starts = np.zeros(gid[-1] + 1 if len(gid) else 0, np.int64)
        if len(gid):
            np.cumsum(np.bincount(gid)[:-1], out=starts[1:])
        rank = np.arange(len(lc_s)) - starts[gid] if len(gid) else \
            np.empty(0, np.int64)
        keep = rank < K
        sel = pa.array(order[keep])
        cols = {
            "lang": t["lang"].take(sel),
            "doc_id": pc.cast(t["doc_id"].take(sel), pa.int64()),
        }
        if final:
            cols["h"] = pa.array(h[order[keep]], pa.int64())
            cols["rnk"] = pa.array(rank[keep] + 1, pa.int64())
        return pa.table(cols)

    partial = docs.map_batches(lambda b: topk(b, False),
                               batch_format="pyarrow")
    return partial.groupby("lang").map_groups(
        lambda g: topk(g, True), batch_format="pyarrow")


def q_corpus_build(sf_dir: str):
    """The end-to-end pretraining-corpus build: C4-style threshold
    filter + exact-dedup canonical keep (the filter_corpus pipeline)
    composed with greedy sequence packing — the full
    read → filter → dedup → pack chain a training run would consume,
    streaming throughout. Oracled by an independent scalar
    implementation of the whole chain (oracle/expected.py)."""
    from ..stages import corpus as corpus_stage

    surv = q_filter_corpus(sf_dir)

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "n_tokens": pc.cast(b["n_tokens_ws"], pa.int64()),
        })

    return corpus_stage.pack_sequences(
        surv.map_batches(slim, batch_format="pyarrow"),
        budget=PACK_BUDGET, shard_size=PACK_SHARD)


BM25_QUERIES = [
    ("q0", ["spark", "join"]),
    ("q1", ["window", "batch", "stream"]),
    ("q2", ["hash", "sort"]),
]


def q_bm25_search(sf_dir: str):
    """BM25 retrieval (k1=1.2, b=0.75, Lucene idf) for fixture term
    queries: one df pass (broadcast vocabulary payload) + one streaming
    scoring scan with per-block top-10 partials. Full SQL parity — the
    scoring expression mirrors the oracle token for token so both
    engines produce identical doubles before micro-flooring."""
    from ..stages import corpus as corpus_stage
    from ..stages.corpus import _batch_terms

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    n_docs = docs.count()

    def tok(b: pa.Table) -> pa.Table:
        _, _, codes, _ = _batch_terms(b, "text")
        return pa.table({"n": pa.array([len(codes)], pa.int64())})

    total_tokens = int(docs.map_batches(tok, batch_format="pyarrow")
                       .sum("n"))
    return corpus_stage.bm25_search(docs, BM25_QUERIES, n_docs=n_docs,
                                    total_tokens=total_tokens, k=10)


def q_vocab_topk(sf_dir: str):
    """Corpus-wide top-20 terms by raw frequency — exact: per-block
    (term, count) partials (Arrow dictionary encode + bincount) → a
    vocabulary-sized groupby → global top-k sort+limit. The Misra-Gries
    sketch (stages/stats.py heavy_hitters_mg, pytest error bounds) is
    the one-pass scale path when even the vocabulary shuffle is too
    wide."""
    from ..stages.corpus import _batch_terms
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        _, _, codes, dictionary = _batch_terms(b, "text")
        cnt = np.bincount(codes, minlength=len(dictionary))
        return pa.table({
            "term": dictionary,
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n", alias_name="n"))

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({"term": b["term"],
                         "n": pc.cast(b["n"], pa.int64())})

    return agg.map_batches(widen, batch_format="pyarrow") \
        .sort(["n", "term"], descending=[True, False]).limit(20)


def q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd k-means over the full embeddings table (k=10,
    8 iterations): per iteration one streaming assignment pass emitting
    per-block (cluster, n, Σvec, inertia) partials + a k-row merge; the
    driver holds only the k×d centroid matrix. Iterative algorithm →
    rows-only at the gate; pytest asserts monotone inertia and >0.98
    purity on planted clusters."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    C, _hist = ann_stage.kmeans_fit(emb, k=10, iters=8)
    return ann_stage.kmeans_assign(emb, C)


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroids (the k-means / IVF-training step as
    a streaming aggregate): per-block (label, n, Σvec) partials with the
    vector sum carried as ONE binary column (list<float> shuffle
    re-serialization pitfall avoided), merged per label. Long-form
    output, element-wise SQL AVG parity in integer micro-units."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["label", "embedding"])
    return ann_stage.label_centroids(emb)


def q_tfidf_terms(sf_dir: str):
    """Per-doc top-3 terms by tf·idf (idf = ln(N/df)). Pass 1 reduces the
    corpus to its VOCABULARY (distinct (term, doc) postings → per-term
    df, broadcast as a sorted hash payload built on a worker from block
    refs); pass 2 streams, scoring and ranking per doc with integer
    micro-unit scores so the rank order is exact across engines. Full
    SQL parity (DuckDB regexp_split + window rank)."""
    from ..stages import corpus as corpus_stage

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    n_docs = docs.count()
    return corpus_stage.tfidf_top_terms(docs, n_docs=n_docs, k=3)


def q_geohash_cells(sf_dir: str):
    """Geohash (precision 7) of every point feature — the third cell
    index family next to S2/H3 (NORTH-RULE EXT). Oracled by an
    independent scalar interval-halving encoder over the ground-truth
    vertex table."""
    from ..index.cells import geohash_encode

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")

    def cells(batch: pa.Table) -> pa.Table:
        lon = batch["bbox_minx"].to_numpy(zero_copy_only=False)
        lat = batch["bbox_miny"].to_numpy(zero_copy_only=False)
        gh = geohash_encode(lon, lat, precision=7)
        return pa.table({
            "doc_id": batch["doc_id"],
            "span_idx": pc.cast(batch["span_idx"], pa.int64()),
            "geohash": pa.array([g.decode() for g in gh], pa.string()),
        })

    return pts.map_batches(cells, batch_format="pyarrow")


# ----------------------------------------- relational / statistics queries


def q_token_quantiles(sf_dir: str):
    """Exact per-language token-count quantiles (p25/p50/p75/p95) via a
    value-count histogram shuffle (stages/stats.py) — the rows never move,
    only the (lang, n_tokens, count) histogram does. Oracled by DuckDB
    quantile_disc (same discrete-rank semantics, asserted in pytest)."""
    from ..stages import stats as stats_stage

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])
    toks = docs.map_batches(text_stage.token_counter_batch,
                            batch_format="pyarrow")

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "lang": b["lang"],
            "n_tokens_ws": pc.cast(b["n_tokens_ws"], pa.int64()),
        })

    slimmed = toks.map_batches(slim, batch_format="pyarrow")
    return stats_stage.group_quantiles(
        slimmed, "lang", "n_tokens_ws",
        [0.25, 0.5, 0.75, 0.95], ["p25", "p50", "p75", "p95"])


def q_distinct_users(sf_dir: str):
    """Exact daily distinct-user counts: block-local pair dedup → one pair
    shuffle → tiny per-day count (stages/stats.py). The HLL register path
    (q_distinct_users_approx) is the one-pass scale alternative."""
    from ..stages import stats as stats_stage

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def day(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy(zero_copy_only=False)
        d = ts.astype("datetime64[D]").astype("datetime64[us]")
        return pa.table({
            "day": pa.array(d),
            "user_id": pc.cast(b["user_id"], pa.int64()),
        })

    return stats_stage.distinct_count_exact(
        ev.map_batches(day, batch_format="pyarrow"), "day", "user_id")


def q_distinct_users_approx(sf_dir: str):
    """HyperLogLog daily distinct users (p=12, ~1.6% rel. error) — the
    registers-only one-pass path; approximate by design, so rows-only at
    the driver gate (accuracy asserted vs exact counts in pytest)."""
    from ..stages import stats as stats_stage

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def day(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy(zero_copy_only=False)
        d = ts.astype("datetime64[D]").astype("datetime64[us]")
        return pa.table({
            "day": pa.array(d),
            "user_id": pc.cast(b["user_id"], pa.int64()),
        })

    return stats_stage.distinct_count_hll(
        ev.map_batches(day, batch_format="pyarrow"), "day", "user_id")


def q_value_quantiles_approx(sf_dir: str):
    """t-digest quantiles of the CONTINUOUS events.value column per
    event type (stages/stats.py group_quantiles_tdigest): ≤4δ centroids
    per (block, group) shuffle, one re-clustering merge per group.
    Approximate by design (rank error ~0.1%, bounds in pytest), so
    rows-only at the driver gate — the continuous-domain sibling of the
    exact token_quantiles histogram."""
    from ..stages import stats as stats_stage

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    return stats_stage.group_quantiles_tdigest(
        ev, "event_type", "value",
        [0.25, 0.5, 0.75, 0.99], ["p25", "p50", "p75", "p99"])


def q_revenue_by_nation(sf_dir: str):
    """Multi-table star join (lineitem ⋈ orders ⋈ customer ⋈ nation) with
    per-block partial aggregation before EVERY shuffle: lineitem collapses
    to (orderkey, cents) per block, the order join output collapses to
    (custkey, cents) per block, and only the 25-row nation map is
    broadcast. Revenue is integer cents (floor(x·100 + 0.5) per row, same
    rule in the SQL) so the sum is order-independent and exact."""
    from ..stages import relational

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])

    def li_partial(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = b["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
        order = np.argsort(ok, kind="stable")
        ok_s, cents_s = ok[order], cents[order]
        starts = np.ones(len(ok_s), bool)
        starts[1:] = ok_s[1:] != ok_s[:-1]
        idx = np.nonzero(starts)[0]
        return pa.table({
            "okey": pa.array(ok_s[idx], pa.int64()),
            "cents": pa.array(np.add.reduceat(cents_s, idx), pa.int64()),
        })

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def ord_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "okey": pc.cast(b["o_orderkey"], pa.int64()),
            "custkey": pc.cast(b["o_custkey"], pa.int64()),
        })

    j1 = relational.hash_join_i64(
        li.map_batches(li_partial, batch_format="pyarrow"),
        orders.map_batches(ord_slim, batch_format="pyarrow"),
        key="okey",
        left_carry={"cents": pa.int64()},
        right_carry={"custkey": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    def cust_partial(b: pa.Table) -> pa.Table:
        ck = b["custkey"].to_numpy(zero_copy_only=False)
        cents = b["cents"].to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        ck_s, cents_s = ck[order], cents[order]
        starts = np.ones(len(ck_s), bool)
        starts[1:] = ck_s[1:] != ck_s[:-1]
        idx = np.nonzero(starts)[0]
        return pa.table({
            "custkey": pa.array(ck_s[idx], pa.int64()),
            "cents": pa.array(np.add.reduceat(cents_s, idx), pa.int64()),
        })

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])

    def cust_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": pc.cast(b["c_custkey"], pa.int64()),
            "nationkey": pc.cast(b["c_nationkey"], pa.int64()),
        })

    j2 = relational.hash_join_i64(
        j1.map_batches(cust_partial, batch_format="pyarrow"),
        cust.map_batches(cust_slim, batch_format="pyarrow"),
        key="custkey",
        left_carry={"cents": pa.int64()},
        right_carry={"nationkey": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    from ray.data.aggregate import Sum

    agg = j2.groupby("nationkey").aggregate(Sum("cents",
                                                alias_name="revenue_cents"))

    # nation is a 25-row dimension: a genuine broadcast-small-side
    import pyarrow.parquet as pq

    nt = pq.read_table(f"{sf_dir}/nation.parquet",
                       columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nt["n_nationkey"].to_pylist(), nt["n_name"].to_pylist()))

    def name(b: pa.Table) -> pa.Table:
        nk = b["nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array([nmap[int(k)] for k in nk], pa.string()),
            "revenue_cents": pc.cast(b["revenue_cents"], pa.int64()),
        })

    return agg.map_batches(name, batch_format="pyarrow")


def q_events_rollup(sf_dir: str):
    """Multi-granularity aggregate in ONE shuffle (GROUP BY ROLLUP):
    each row flat-maps to its three grouping levels — (type, day),
    (type, ALL), (ALL, ALL) — with sentinel keys, pre-aggregated inside
    the block before a single groupby; sentinels become NULLs at the
    end to match the SQL ROLLUP output."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    SENT_T = "\x00ALL"
    SENT_D = np.datetime64(0, "us")          # 1970 — outside the data

    def levels(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]").astype("datetime64[us]")
        et = b["event_type"].to_numpy(zero_copy_only=False)
        n = len(ts)
        et3 = np.concatenate([et, et, np.full(n, SENT_T, object)])
        day3 = np.concatenate([day, np.full(n, SENT_D, "datetime64[us]"),
                               np.full(n, SENT_D, "datetime64[us]")])
        t = pa.table({
            "event_type": pa.array(et3, pa.string()),
            "day": pa.array(day3),
        })
        # block-local combine before the shuffle
        return t.group_by(["event_type", "day"]).aggregate([([], "count_all")]) \
            .rename_columns(["event_type", "day", "n"])

    from ray.data.aggregate import Sum

    agg = ev.map_batches(levels, batch_format="pyarrow") \
        .groupby(["event_type", "day"]).aggregate(Sum("n", alias_name="n"))

    def widen(b: pa.Table) -> pa.Table:
        et = b["event_type"]
        day = b["day"]
        et_null = pc.if_else(pc.equal(et, SENT_T),
                             pa.nulls(len(b), pa.string()), et)
        day_null = pc.if_else(
            pc.equal(day, pa.scalar(SENT_D.item(), pa.timestamp("us"))),
            pa.nulls(len(b), pa.timestamp("us")),
            pc.cast(day, pa.timestamp("us")))
        return pa.table({
            "event_type": et_null,
            "day": day_null,
            "n": pc.cast(b["n"], pa.int64()),
        })

    return agg.map_batches(widen, batch_format="pyarrow")


def q_events_lag(sf_dir: str, num_partitions: int | None = None):
    """LAG window function: each event's value delta vs the SAME user's
    previous event (null for the first). One user-hash shuffle, one
    lexsort per partition, a shifted-compare mask — the sessionize
    pattern applied to the lead/lag family. Deltas integer-ized per row
    (milli-units) on both engines."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    P = num_partitions or relational.adaptive_parts(sf_dir)

    def addpart(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "_part", pa.array((u % P).astype(np.int32), pa.int32()))

    def lag(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        # deterministic total order: LAG ties broken by event_id (the
        # SQL ORDER BY ts, event_id)
        order = np.lexsort((eid, ts, u))
        u_s, v_s = u[order], v[order]
        has_prev = np.zeros(len(u_s), bool)
        has_prev[1:] = u_s[1:] == u_s[:-1]
        delta = np.zeros(len(u_s), np.float64)
        delta[1:] = v_s[1:] - v_s[:-1]
        dm = np.floor(delta * 1000 + 0.5).astype(np.int64)
        out = pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": pa.array(u_s.astype(np.int64), pa.int64()),
            "delta_milli": pc.if_else(
                pa.array(has_prev), pa.array(dm, pa.int64()),
                pa.nulls(len(u_s), pa.int64())),
        })
        return out

    return ev.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(lag, batch_format="pyarrow")


FUNNEL_WINDOW_US = 10 * 60 * 1_000_000


def q_events_funnel(sf_dir: str, num_partitions: int | None = None):
    """Sequential-pattern conversion count: per user, clicks preceded by
    a view within 10 minutes. One user-hash shuffle; within each
    partition both event streams sort once by (user, ts) and every
    click resolves with two searchsorted probes against its user's view
    segment (dense-user << 42 | relative-ts composite key — no per-user
    Python loop)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    P = num_partitions or relational.adaptive_parts(sf_dir)

    def addpart(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "view") | (et == "click")
        t = b.filter(pa.array(keep))
        u = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "ts": t["ts"],
            "event_type": t["event_type"],
            "_part": pa.array((u % P).astype(np.int32), pa.int32()),
        })

    def funnel(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        _, du = np.unique(u, return_inverse=True)
        rel = ts - ts.min()
        key = (du.astype(np.int64) << np.int64(42)) | rel
        vmask = et == "view"
        cmask = et == "click"
        vk = np.sort(key[vmask])
        ck = key[cmask]
        # (c.ts - W, c.ts] — strict lower bound, inclusive upper
        lo = np.searchsorted(vk, ck - FUNNEL_WINDOW_US, side="right")
        hi = np.searchsorted(vk, ck, side="right")
        conv = hi > lo
        cu = u[cmask][conv]
        uu, counts = np.unique(cu, return_counts=True)
        return pa.table({
            "user_id": pa.array(uu, pa.int64()),
            "n_conv": pa.array(counts.astype(np.int64), pa.int64()),
        })

    return ev.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(funnel, batch_format="pyarrow")


INACTIVE_MIN_PRICE = 450_000.0


def q_inactive_customers(sf_dir: str):
    """Distributed ANTI join: customers with no high-value order (the
    NOT-EXISTS membership filter) via hash_join_i64(how='anti') — one
    union shuffle, searchsorted membership per partition; the right
    side is predicate-filtered at the read and pre-deduped per block so
    the shuffle carries distinct custkeys only."""
    from ..stages import relational

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"])

    def cust_slim(b: pa.Table) -> pa.Table:
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table({
            "custkey": pc.cast(b["c_custkey"], pa.int64()),
            "acctbal_cents": pa.array(
                np.floor(bal * 100 + 0.5).astype(np.int64), pa.int64()),
        })

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def ord_keys(b: pa.Table) -> pa.Table:
        price = b["o_totalprice"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        ck = np.unique(ck[price > INACTIVE_MIN_PRICE])
        return pa.table({"custkey": pa.array(ck.astype(np.int64),
                                             pa.int64())})

    return relational.hash_join_i64(
        cust.map_batches(cust_slim, batch_format="pyarrow"),
        orders.map_batches(ord_keys, batch_format="pyarrow"),
        key="custkey",
        left_carry={"acctbal_cents": pa.int64()},
        right_carry={}, how="anti",
        P=relational.adaptive_parts(sf_dir))


def q_events_intervals(sf_dir: str):
    """Non-equi interval join (stages/relational.py): every event falling
    inside any fixture interval ([anchor ts, +45 min), anchors = every
    211th event). Bucketed band join — the shuffle key is the 30-min time
    bucket; intervals replicate only to buckets they overlap."""
    from ..stages import relational

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])

    def mk_intervals(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        keep = (eid % 211) == 0
        ts = b["ts"].to_numpy(zero_copy_only=False)[keep] \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({
            "interval_id": pa.array(eid[keep], pa.int64()),
            "t0": pa.array(ts, pa.int64()),
            "t1": pa.array(ts + 45 * 60 * 1_000_000, pa.int64()),
        })

    intervals = ev.map_batches(mk_intervals, batch_format="pyarrow")
    out = relational.interval_join(
        ev, "ts",
        {"event_id": pa.int64(), "user_id": pa.int64()},
        intervals, "interval_id", "t0", "t1",
        bucket_us=30 * 60 * 1_000_000)

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({
            "interval_id": pc.cast(b["interval_id"], pa.int64()),
            "event_id": pc.cast(b["event_id"], pa.int64()),
            "user_id": pc.cast(b["user_id"], pa.int64()),
        })

    return out.map_batches(widen, batch_format="pyarrow")


QUERIES = {
    "extract_features": q_extract_features,
    "tile_coverage": q_tile_coverage,
    "tile_coverage_deep": q_tile_coverage_deep,
    "tile_counts": q_tile_counts,
    "knn_points": q_knn_points,
    "bbox_join": q_bbox_join,
    "pip_join": q_pip_join,
    "cell_index": q_cell_index,
    "exact_dedup": q_exact_dedup,
    "token_counts": q_token_counts,
    "doc_length": q_doc_length,
    "top_docs": q_top_docs,
    "lang_dist": q_lang_dist,
    "ann_topk": q_ann_topk,
    "ann_filtered": q_ann_filtered,
    "minhash_pairs": q_minhash_pairs,
    "dedup_clusters": q_dedup_clusters,
    "cluster_size_hist": q_cluster_size_hist,
    "passage_dedup": q_passage_dedup,
    "substring_dedup": q_substring_dedup,
    "incremental_dedup": q_incremental_dedup,
    "cluster_representatives": q_cluster_representatives,
    "mix_sources": q_mix_sources,
    "filter_corpus": q_filter_corpus,
    "simhash": q_simhash,
    "fingerprint": q_fingerprint,
    "events_window": q_events_window,
    "events_sliding": q_events_sliding,
    "events_sessions": q_events_sessions,
    "events_asof": q_events_asof,
    "top_docs_per_lang": q_top_docs_per_lang,
    "sample_corpus": q_sample_corpus,
    "jaccard_pairs": q_jaccard_pairs,
    "ann_ivf": q_ann_ivf,
    "ann_ivfpq": q_ann_ivfpq,
    "embedding_dedup": q_embedding_dedup,
    "global_bbox": q_global_bbox,
    "simplify": q_simplify,
    "raster_stats": q_raster_stats,
    "media_features": q_media_features,
    "token_quantiles": q_token_quantiles,
    "distinct_users": q_distinct_users,
    "distinct_users_approx": q_distinct_users_approx,
    "revenue_by_nation": q_revenue_by_nation,
    "events_intervals": q_events_intervals,
    "decontaminate": q_decontaminate,
    "pack_sequences": q_pack_sequences,
    "gopher_quality": q_gopher_quality,
    "tfidf_terms": q_tfidf_terms,
    "geohash_cells": q_geohash_cells,
    "span_stats": q_span_stats,
    "span_type_runs": q_span_type_runs,
    "span_kind_bigrams": q_span_kind_bigrams,
    "media_ref_census": q_media_ref_census,
    "caption_context": q_caption_context,
    "zscore_events": q_zscore_events,
    "sample_fixed_k": q_sample_fixed_k,
    "label_centroids": q_label_centroids,
    "vocab_topk": q_vocab_topk,
    "corpus_build": q_corpus_build,
    "bm25_search": q_bm25_search,
    "inactive_customers": q_inactive_customers,
    "events_rollup": q_events_rollup,
    "events_funnel": q_events_funnel,
    "value_quantiles_approx": q_value_quantiles_approx,
    "layer_stats": q_layer_stats,
    "kmeans_clusters": q_kmeans_clusters,
    "events_lag": q_events_lag,
}


# --------------------------------------------------------------- oracle SQL

_GEOMS = f"read_parquet('{ORACLE_CORPUS}/geoms.parquet')"

_BBOX_CTE = f"""
WITH g AS (
  SELECT doc_id,
         CAST(span_idx AS BIGINT) AS span_idx,
         CAST(geom_type AS BIGINT) AS geom_type,
         layer,
         list_aggregate(xs, 'min') AS bbox_minx,
         list_aggregate(ys, 'min') AS bbox_miny,
         list_aggregate(xs, 'max') AS bbox_maxx,
         list_aggregate(ys, 'max') AS bbox_maxy
  FROM {_GEOMS}
)
"""

_TILE_XY = """
  CAST(GREATEST(0, LEAST(POW(2, zz.z) - 1,
       FLOOR(({lon} + 180) / 360 * POW(2, zz.z)))) AS BIGINT)
"""

_TILE_Y = """
  CAST(GREATEST(0, LEAST(POW(2, zz.z) - 1,
       FLOOR((1 - LN(TAN(RADIANS(GREATEST(-85.0511287, LEAST(85.0511287, {lat}))))
                     + 1 / COS(RADIANS(GREATEST(-85.0511287, LEAST(85.0511287, {lat})))))
                  / PI()) / 2 * POW(2, zz.z)))) AS BIGINT)
"""

_COVERAGE_CTE = (
    _BBOX_CTE
    + """
, zz AS (SELECT UNNEST([0, 2, 4, 6]) AS z)
, ranges AS (
  SELECT g.doc_id, g.span_idx, CAST(zz.z AS BIGINT) AS z,
         """
    + _TILE_XY.format(lon="g.bbox_minx") + " AS x1,\n         "
    + _TILE_XY.format(lon="g.bbox_maxx") + " AS x2,\n         "
    + _TILE_Y.format(lat="g.bbox_maxy") + " AS y1,\n         "
    + _TILE_Y.format(lat="g.bbox_miny") + """ AS y2
  FROM g CROSS JOIN zz
)
, xs AS (
  SELECT doc_id, span_idx, z, UNNEST(generate_series(x1, x2)) AS x, y1, y2
  FROM ranges
)
, cov AS (
  SELECT doc_id, span_idx, z, x, UNNEST(generate_series(y1, y2)) AS y
  FROM xs
)
"""
)

_HAVERSINE = """
  2 * 6371000 * ATAN2(
    SQRT(POW(SIN(RADIANS({lat2} - {lat1}) / 2), 2)
         + COS(RADIANS({lat1})) * COS(RADIANS({lat2}))
           * POW(SIN(RADIANS({lon2} - {lon1}) / 2), 2)),
    SQRT(1 - (POW(SIN(RADIANS({lat2} - {lat1}) / 2), 2)
         + COS(RADIANS({lat1})) * COS(RADIANS({lat2}))
           * POW(SIN(RADIANS({lon2} - {lon1}) / 2), 2))))
"""

_KNN_QUERY_VALUES = ", ".join(
    f"('{qid}', {lon}, {lat})" for qid, lon, lat in KNN_QUERIES
)

_BBOX_TARGET_VALUES = ", ".join(
    f"('{tid}', {a}, {b}, {c}, {d})" for tid, a, b, c, d in BBOX_TARGETS
)

ORACLE_SQL = {
    "extract_features": _BBOX_CTE + "SELECT * FROM g",
    "tile_coverage": _COVERAGE_CTE + "SELECT doc_id, span_idx, z, x, y FROM cov",
    "tile_coverage_deep": (
        _BBOX_CTE
        + """
, zz AS (SELECT UNNEST([14]) AS z)
, gs AS (
  SELECT * FROM g
  WHERE bbox_maxx - bbox_minx < 0.5 AND bbox_maxy - bbox_miny < 0.5
)
, ranges AS (
  SELECT gs.doc_id, gs.span_idx, CAST(zz.z AS BIGINT) AS z,
         """
        + _TILE_XY.format(lon="gs.bbox_minx") + " AS x1,\n         "
        + _TILE_XY.format(lon="gs.bbox_maxx") + " AS x2,\n         "
        + _TILE_Y.format(lat="gs.bbox_maxy") + " AS y1,\n         "
        + _TILE_Y.format(lat="gs.bbox_miny") + """ AS y2
  FROM gs CROSS JOIN zz
)
, xs AS (
  SELECT doc_id, span_idx, z, UNNEST(generate_series(x1, x2)) AS x, y1, y2
  FROM ranges
)
SELECT doc_id, span_idx, z, x, UNNEST(generate_series(y1, y2)) AS y
FROM xs"""
    ),
    "tile_counts": _COVERAGE_CTE + """
        SELECT z, x, y, CAST(COUNT(*) AS BIGINT) AS n_features
        FROM cov GROUP BY z, x, y""",
    "knn_points": _BBOX_CTE + f"""
, q(query_id, qlon, qlat) AS (VALUES {_KNN_QUERY_VALUES})
, pts AS (SELECT doc_id, span_idx, bbox_minx AS lon, bbox_miny AS lat
          FROM g WHERE geom_type = 1)
, scored AS (
  SELECT q.query_id, pts.doc_id, pts.span_idx,
         {_HAVERSINE.format(lat1="q.qlat", lon1="q.qlon", lat2="pts.lat", lon2="pts.lon")} AS dist,
         ROW_NUMBER() OVER (PARTITION BY q.query_id
                            ORDER BY {_HAVERSINE.format(lat1="q.qlat", lon1="q.qlon", lat2="pts.lat", lon2="pts.lon")},
                                     pts.doc_id, pts.span_idx) AS rank
  FROM q CROSS JOIN pts
)
SELECT query_id, doc_id, span_idx, CAST(rank AS BIGINT) AS rank,
       ROUND(dist, 3) AS dist_m
FROM scored WHERE rank <= {KNN_K}""",
    "bbox_join": _BBOX_CTE + f"""
, t(target_id, tminx, tminy, tmaxx, tmaxy) AS (VALUES {_BBOX_TARGET_VALUES})
SELECT g.doc_id, g.span_idx, t.target_id
FROM g CROSS JOIN t
WHERE NOT (g.bbox_minx > t.tmaxx OR g.bbox_maxx < t.tminx
           OR g.bbox_miny > t.tmaxy OR g.bbox_maxy < t.tminy)""",
    "events_window": """
SELECT event_type,
       date_trunc('hour', ts) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(ROUND(SUM(value) * 1000) AS BIGINT) AS sum_value_milli
FROM events GROUP BY event_type, date_trunc('hour', ts)""",
    "events_sliding": """
WITH w AS (
  SELECT event_type,
         UNNEST([
           to_timestamp(FLOOR(epoch(ts) / 1800) * 1800),
           to_timestamp(FLOOR(epoch(ts) / 1800) * 1800 - 1800)
         ]) AS window_start
  FROM events
)
SELECT event_type, CAST(window_start AS TIMESTAMP) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM w GROUP BY event_type, window_start""",
    "events_asof": """
SELECT c.event_id, c.user_id, v.event_id AS view_event_id,
       CAST(ROUND(v.value * 1000) AS BIGINT) AS view_value_milli
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts""",
    "top_docs_per_lang": f"""
SELECT lang, doc_id, n_chars, rnk FROM (
  SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
         CAST(n_chars AS BIGINT) AS n_chars,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rnk
  FROM documents)
WHERE rnk <= {TOPK_PER_LANG}""",
    "sample_corpus": f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE ((doc_id * 2654435761) % 4294967296) % 10000
      < CASE WHEN lang = 'en' THEN {SAMPLE_RATE_BP['en']}
             ELSE {SAMPLE_DEFAULT_BP} END""",
    # same independent ground truth as minhash_pairs: exact scalar
    # all-pairs n-gram Jaccard (oracle/expected.py) — jaccard_pairs is the
    # exact prefix-filter algorithm, so it must reproduce it identically
    "jaccard_pairs":
        "SELECT * FROM read_parquet('/tmp/graft_expected/minhash_pairs.parquet')",
    "events_sessions": """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS t_start,
       CAST(ROUND(SUM(value) * 1000) AS BIGINT) AS sum_value_milli
FROM sess GROUP BY user_id, session_id""",
    "embedding_dedup": """
WITH n AS (SELECT vec_id, embedding FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 3)
         AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 3)
      >= 0.4""",
    "global_bbox": _BBOX_CTE + """
SELECT MIN(bbox_minx) AS minx, MIN(bbox_miny) AS miny,
       MAX(bbox_maxx) AS maxx, MAX(bbox_maxy) AS maxy,
       CAST(COUNT(*) AS BIGINT) AS n_features
FROM g""",
    "exact_dedup": """
SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY text""",
    "token_counts": r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN TRIM(text) = '' THEN 0
            ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END AS BIGINT)
       AS n_tokens_ws
FROM documents""",
    "doc_length": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(LENGTH(text) AS BIGINT) AS doc_len
FROM documents""",
    "top_docs": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(LENGTH(text) AS BIGINT) AS doc_len
FROM documents
ORDER BY doc_len DESC, doc_id ASC
LIMIT 20""",
    "lang_dist": """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang""",
    "ann_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 4),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS score,
         ROW_NUMBER() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
                                     e.vec_id) AS rank
  FROM q CROSS JOIN embeddings e
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(rank AS BIGINT) AS rank, ROUND(CAST(score AS DOUBLE), 4) AS score
FROM scored WHERE rank <= 10""",
    "ann_filtered": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 4),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS score,
         ROW_NUMBER() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
                                     e.vec_id) AS rank
  FROM q CROSS JOIN embeddings e
  WHERE e.label IN (2, 3, 5)
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(rank AS BIGINT) AS rank, ROUND(CAST(score AS DOUBLE), 4) AS score
FROM scored WHERE rank <= 10""",
    # Genuine SQL ray-cast PIP over the ground-truth vertex table: unnest
    # every polygon ring (ring_of gives per-vertex ring ids, written from
    # the pre-WKB coords), close each ring, bbox-prune candidates, even-odd
    # crossing parity per (point, polygon).
    "pip_join": f"""
WITH pts AS (
  SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
         xs[1] AS px, ys[1] AS py
  FROM {_GEOMS} WHERE geom_type = 1
),
pb AS (
  SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx, xs, ys, ring_of,
         list_aggregate(xs, 'min') AS minx, list_aggregate(ys, 'min') AS miny,
         list_aggregate(xs, 'max') AS maxx, list_aggregate(ys, 'max') AS maxy
  FROM {_GEOMS} WHERE geom_type = 3
),
verts AS (
  SELECT doc_id, span_idx,
         UNNEST(xs) AS x, UNNEST(ys) AS y, UNNEST(ring_of) AS rid,
         UNNEST(generate_series(1, len(xs))) AS pos
  FROM pb
),
ring_info AS (
  SELECT doc_id, span_idx, rid, MIN(pos) AS mn, MAX(pos) AS mx
  FROM verts GROUP BY doc_id, span_idx, rid
),
segs AS (
  SELECT v.doc_id, v.span_idx, v.x AS x1, v.y AS y1,
         COALESCE(w.x, f.x) AS x2, COALESCE(w.y, f.y) AS y2
  FROM verts v
  JOIN ring_info ri
    ON ri.doc_id = v.doc_id AND ri.span_idx = v.span_idx AND ri.rid = v.rid
  LEFT JOIN verts w
    ON w.doc_id = v.doc_id AND w.span_idx = v.span_idx AND w.rid = v.rid
       AND w.pos = v.pos + 1
  JOIN verts f
    ON f.doc_id = v.doc_id AND f.span_idx = v.span_idx AND f.rid = v.rid
       AND f.pos = ri.mn
),
cand AS (
  SELECT p.doc_id AS pd, p.span_idx AS ps, pb.doc_id AS qd,
         pb.span_idx AS qs, p.px, p.py
  FROM pts p JOIN pb
    ON p.px BETWEEN pb.minx AND pb.maxx AND p.py BETWEEN pb.miny AND pb.maxy
),
hits AS (
  SELECT c.pd, c.ps, c.qd, c.qs,
         SUM(CASE WHEN ((s.y1 > c.py) <> (s.y2 > c.py))
                   AND c.px < s.x1 + (c.py - s.y1) / (s.y2 - s.y1)
                                     * (s.x2 - s.x1)
              THEN 1 ELSE 0 END) AS crossings
  FROM cand c
  JOIN segs s ON s.doc_id = c.qd AND s.span_idx = c.qs
  GROUP BY c.pd, c.ps, c.qd, c.qs
)
SELECT pd AS doc_id, ps AS span_idx, qd || '#' || qs AS polygon_id
FROM hits WHERE crossings % 2 = 1""",
    # Independent precomputed ground truth (grandine_ray/oracle/expected.py:
    # scalar from-scratch reimplementations — RDP with segment distance,
    # scanline fill, S2/hex cell math, SimHash, rolling fingerprint, exact
    # all-pairs n-gram Jaccard); materialized by oracle_sql() prep.
    "simplify":
        "SELECT * FROM read_parquet('/tmp/graft_expected/simplify.parquet')",
    "raster_stats":
        "SELECT * FROM read_parquet('/tmp/graft_expected/raster_stats.parquet')",
    "cell_index":
        "SELECT * FROM read_parquet('/tmp/graft_expected/cell_index.parquet')",
    "simhash":
        "SELECT * FROM read_parquet('/tmp/graft_expected/simhash.parquet')",
    "fingerprint":
        "SELECT * FROM read_parquet('/tmp/graft_expected/fingerprint.parquet')",
    "minhash_pairs":
        "SELECT * FROM read_parquet('/tmp/graft_expected/minhash_pairs.parquet')",
    "media_features":
        "SELECT * FROM read_parquet('/tmp/graft_expected/media_features.parquet')",
    "dedup_clusters": """
WITH RECURSIVE
  e AS (
    SELECT doc_a AS a, doc_b AS b
    FROM read_parquet('/tmp/graft_expected/minhash_pairs.parquet')
    UNION ALL
    SELECT doc_b, doc_a
    FROM read_parquet('/tmp/graft_expected/minhash_pairs.parquet')
  ),
  nodes AS (SELECT DISTINCT a AS n FROM e),
  reach(n, m) AS (
    SELECT n, n FROM nodes
    UNION
    SELECT r.n, e.b FROM reach r JOIN e ON e.a = r.m
  )
SELECT n AS doc_id, MIN(m) AS cluster_id
FROM reach GROUP BY n""",
    "cluster_size_hist": """
WITH RECURSIVE
  e AS (
    SELECT doc_a AS a, doc_b AS b
    FROM read_parquet('/tmp/graft_expected/minhash_pairs.parquet')
    UNION ALL
    SELECT doc_b, doc_a
    FROM read_parquet('/tmp/graft_expected/minhash_pairs.parquet')
  ),
  nodes AS (SELECT DISTINCT a AS n FROM e),
  reach(n, m) AS (
    SELECT n, n FROM nodes
    UNION
    SELECT r.n, e.b FROM reach r JOIN e ON e.a = r.m
  ),
  lab AS (SELECT n AS doc_id, MIN(m) AS cluster_id
          FROM reach GROUP BY n),
  sz AS (SELECT cluster_id, COUNT(*) AS cluster_size
         FROM lab GROUP BY cluster_id)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM sz GROUP BY cluster_size""",
    "passage_dedup": """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
), chunks AS (
  SELECT doc_id, CAST((i - 1) // 10 AS BIGINT) AS ci,
         string_agg(tok, ' ' ORDER BY i) AS chunk
  FROM toks GROUP BY doc_id, (i - 1) // 10
), winners AS (
  SELECT chunk, MIN(doc_id * 1048576 + ci) AS w
  FROM chunks GROUP BY chunk
)
SELECT c.doc_id,
       string_agg(c.chunk, ' ' ORDER BY c.ci) AS text_dedup,
       CAST(COUNT(*) AS BIGINT) AS n_chunks_kept
FROM chunks c JOIN winners ON c.chunk = winners.chunk
WHERE c.doc_id * 1048576 + c.ci = winners.w
GROUP BY c.doc_id
ORDER BY c.doc_id""",
    "substring_dedup": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS gram
  FROM t, LATERAL unnest(generate_series(1, len(w) - 7)) AS s(i)
),
dup AS (
  SELECT doc_id, i FROM wins
  QUALIFY COUNT(*) OVER (PARTITION BY gram) >= 2
),
runs AS (
  SELECT doc_id, i,
         i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM dup
),
agg AS (SELECT doc_id, grp, MIN(i) AS lo, MAX(i) AS hi
        FROM runs GROUP BY doc_id, grp)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(SUM(hi - lo + 8) AS BIGINT) AS dup_tokens,
       CAST(MAX(hi - lo + 8) AS BIGINT) AS max_run_tokens
FROM agg GROUP BY doc_id ORDER BY doc_id""",
    "incremental_dedup": """
WITH k AS (SELECT doc_id,
                  array_to_string((string_split(text, ' '))[1:8], ' ')
                  AS fp
           FROM documents),
     w AS (SELECT fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_batch_dups
           FROM k WHERE doc_id % 5 = 0 GROUP BY fp)
SELECT CAST(w.doc_id AS BIGINT) AS doc_id,
       CAST(w.n_batch_dups AS BIGINT) AS n_batch_dups
FROM w
WHERE NOT EXISTS (SELECT 1 FROM k s
                  WHERE s.doc_id % 5 <> 0 AND s.fp = w.fp)
ORDER BY doc_id""",
    "cluster_representatives": """
WITH RECURSIVE
  e AS (
    SELECT doc_a AS a, doc_b AS b
    FROM read_parquet('/tmp/graft_expected/minhash_pairs.parquet')
    UNION ALL
    SELECT doc_b, doc_a
    FROM read_parquet('/tmp/graft_expected/minhash_pairs.parquet')
  ),
  nodes AS (SELECT DISTINCT a AS n FROM e),
  reach(n, m) AS (
    SELECT n, n FROM nodes
    UNION
    SELECT r.n, e.b FROM reach r JOIN e ON e.a = r.m
  ),
  lab AS (SELECT n AS doc_id, MIN(m) AS cluster_id
          FROM reach GROUP BY n),
  rep AS (
    SELECT lab.cluster_id,
           MIN((524288 - d.n_chars) * 8796093022208 + d.doc_id) AS k,
           COUNT(*) AS cluster_size
    FROM lab JOIN documents d ON lab.doc_id = d.doc_id
    GROUP BY lab.cluster_id
  )
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(k % 8796093022208 AS BIGINT) AS rep_doc_id,
       CAST(524288 - k // 8796093022208 AS BIGINT) AS rep_n_chars,
       CAST(cluster_size AS BIGINT) AS cluster_size
FROM rep ORDER BY cluster_id""",
    "mix_sources": """
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
q AS (SELECT source, n,
             LEAST(n, 3 * CAST(FLOOR(SQRT(n)) AS BIGINT)) AS quota
      FROM c)
SELECT d.source, CAST(q.n AS BIGINT) AS n_total,
       CAST(q.quota AS BIGINT) AS quota,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept
FROM documents d JOIN q ON d.source = q.source
WHERE ((d.doc_id % 4194304) * 2654435761) % 4294967296 % q.n < q.quota
GROUP BY d.source, q.n, q.quota""",
    "filter_corpus": r"""
WITH scored AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
         CAST(LENGTH(text) AS BIGINT) AS doc_len,
         CAST(CASE WHEN TRIM(text) = '' THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END AS BIGINT)
         AS n_tokens_ws
  FROM documents
),
surv AS (
  SELECT * FROM scored WHERE n_tokens_ws >= 10 AND doc_len >= 50
),
canon AS (
  SELECT doc_id, doc_len, n_tokens_ws,
         MIN(doc_id) OVER (PARTITION BY text) AS keep_doc
  FROM surv
)
SELECT doc_id, doc_len, n_tokens_ws
FROM canon WHERE doc_id = keep_doc""",
    "token_quantiles": r"""
WITH t AS (
  SELECT lang,
         CAST(CASE WHEN TRIM(text) = '' THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END
              AS BIGINT) AS n
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(quantile_disc(n, 0.25) AS BIGINT) AS p25,
       CAST(quantile_disc(n, 0.50) AS BIGINT) AS p50,
       CAST(quantile_disc(n, 0.75) AS BIGINT) AS p75,
       CAST(quantile_disc(n, 0.95) AS BIGINT) AS p95
FROM t GROUP BY lang""",
    "distinct_users": """
SELECT date_trunc('day', ts) AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY 1""",
    "revenue_by_nation": """
SELECT n_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name""",
    "events_intervals": """
WITH iv AS (
  SELECT event_id AS interval_id, ts AS t0,
         ts + INTERVAL 45 MINUTE AS t1
  FROM events WHERE event_id % 211 = 0
)
SELECT iv.interval_id, e.event_id, CAST(e.user_id AS BIGINT) AS user_id
FROM events e JOIN iv ON e.ts >= iv.t0 AND e.ts < iv.t1""",
    # independent scalar ground truths (oracle/expected.py): string-tuple
    # n-gram sets for decontamination, a pure-Python greedy packer, and a
    # collections.Counter reimplementation of the repetition signals
    "decontaminate":
        "SELECT * FROM read_parquet('/tmp/graft_expected/decontaminate.parquet')",
    "pack_sequences":
        "SELECT * FROM read_parquet('/tmp/graft_expected/pack_sequences.parquet')",
    "gopher_quality":
        "SELECT * FROM read_parquet('/tmp/graft_expected/gopher_quality.parquet')",
    "tfidf_terms": r"""
WITH words AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(TRIM(lower(text)), '\s+')) AS term
  FROM documents WHERE TRIM(text) <> ''
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         CAST(FLOOR(tf.tf * LN(CAST(n.n AS DOUBLE) / df.df) * 1000000
                    + 0.5) AS BIGINT) AS score_micro
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, term, CAST(tf AS BIGINT) AS tf,
       score_micro, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score_micro DESC, term) AS rnk
      FROM scored)
WHERE rnk <= 3""",
    "geohash_cells":
        "SELECT * FROM read_parquet('/tmp/graft_expected/geohash_cells.parquet')",
    "span_stats": f"""
WITH s AS (
  SELECT doc_id, UNNEST(spans, recursive := true)
  FROM read_parquet('{ORACLE_CORPUS}/documents.parquet')
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(COUNT(*) FILTER (WHERE kind = 'geom') AS BIGINT) AS n_geom,
       CAST(COUNT(*) FILTER (WHERE kind = 'text') AS BIGINT) AS n_text,
       CAST(COUNT(*) FILTER (WHERE kind = 'media') AS BIGINT) AS n_media,
       CAST(COALESCE(SUM(LENGTH(text)) FILTER (WHERE kind = 'text'), 0)
            AS BIGINT) AS text_chars,
       CAST(MAX("offset") AS BIGINT) AS max_offset
FROM s GROUP BY doc_id""",
    "span_type_runs": f"""
WITH s AS (
  SELECT doc_id,
         UNNEST(list_transform(spans, x -> x.kind)) AS kind,
         UNNEST(generate_series(1, len(spans))) AS pos
  FROM read_parquet('{ORACLE_CORPUS}/documents.parquet')),
i AS (SELECT doc_id, kind, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id, kind
                                      ORDER BY pos) AS grp
      FROM s),
runs AS (SELECT doc_id, kind, CAST(COUNT(*) AS BIGINT) AS rl,
                MIN(pos) AS st
         FROM i GROUP BY doc_id, kind, grp),
best AS (SELECT doc_id, kind, rl,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY rl DESC, st) AS rn
         FROM runs)
SELECT doc_id, rl AS max_run, kind AS run_kind
FROM best WHERE rn = 1""",
    "span_kind_bigrams": f"""
WITH s AS (
  SELECT doc_id,
         UNNEST(list_transform(spans, x -> x.kind)) AS kind,
         UNNEST(generate_series(1, len(spans))) AS pos
  FROM read_parquet('{ORACLE_CORPUS}/documents.parquet')),
p AS (SELECT a.kind AS kind_a, b.kind AS kind_b
      FROM s a JOIN s b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1)
SELECT kind_a, kind_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM p GROUP BY kind_a, kind_b""",
    "media_ref_census": f"""
WITH raw AS (
  SELECT doc_id,
         UNNEST(list_transform(spans, x -> x.media_ref)) AS mr
  FROM read_parquet('{ORACLE_CORPUS}/documents.parquet')),
s AS (SELECT DISTINCT doc_id, mr FROM raw
      WHERE mr IS NOT NULL AND mr <> ''),
c AS (SELECT mr, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM s GROUP BY mr)
SELECT n_docs, CAST(COUNT(*) AS BIGINT) AS n_refs
FROM c GROUP BY n_docs""",
    "caption_context": f"""
WITH s AS (
  SELECT doc_id,
         UNNEST(list_transform(spans, x -> x.kind)) AS kind,
         UNNEST(list_transform(spans, x -> x.text)) AS text,
         UNNEST(generate_series(1, len(spans))) AS pos
  FROM read_parquet('{ORACLE_CORPUS}/documents.parquet')),
m AS (SELECT doc_id, pos FROM s WHERE kind = 'media'),
nb AS (
  SELECT 'before' AS direction, COALESCE(p.kind, 'none') AS neighbor_kind,
         CASE WHEN p.kind = 'text' THEN LENGTH(p.text) ELSE 0 END AS tc
  FROM m LEFT JOIN s p ON p.doc_id = m.doc_id AND p.pos = m.pos - 1
  UNION ALL
  SELECT 'after', COALESCE(p.kind, 'none'),
         CASE WHEN p.kind = 'text' THEN LENGTH(p.text) ELSE 0 END
  FROM m LEFT JOIN s p ON p.doc_id = m.doc_id AND p.pos = m.pos + 1)
SELECT direction, neighbor_kind,
       CAST(COUNT(*) AS BIGINT) AS n_media,
       CAST(SUM(tc) AS BIGINT) AS sum_text_chars,
       CAST(MAX(tc) AS BIGINT) AS max_text_chars
FROM nb GROUP BY direction, neighbor_kind""",
    "zscore_events": """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(FLOOR(AVG(value) * 1000000 + 0.5) AS BIGINT) AS mean_micro,
       CAST(FLOOR(stddev_pop(value) * 1000000 + 0.5) AS BIGINT) AS std_micro
FROM events GROUP BY event_type""",
    "sample_fixed_k": f"""
SELECT lang, doc_id, h, rnk FROM (
  SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
         CAST((doc_id * 2654435761) % 4294967296 AS BIGINT) AS h,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id)
         AS BIGINT) AS rnk
  FROM documents)
WHERE rnk <= {SAMPLE_K}""",
    "label_centroids": """
WITH dims AS (SELECT UNNEST(generate_series(1, 64)) AS i)
SELECT CAST(label AS BIGINT) AS label,
       CAST(i - 1 AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(FLOOR(AVG(CAST(embedding[i] AS DOUBLE)) * 1000000 + 0.5)
            AS BIGINT) AS centroid_micro
FROM embeddings CROSS JOIN dims
GROUP BY label, i""",
    "vocab_topk": r"""
WITH words AS (
  SELECT UNNEST(regexp_split_to_array(TRIM(lower(text)), '\s+')) AS term
  FROM documents WHERE TRIM(text) <> ''
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS n
FROM words GROUP BY term
ORDER BY n DESC, term LIMIT 20""",
    "corpus_build":
        "SELECT * FROM read_parquet('/tmp/graft_expected/corpus_build.parquet')",
    "bm25_search": (r"""
WITH words AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(TRIM(lower(text)), '\s+')) AS term
  FROM documents WHERE TRIM(text) <> ''
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id),
n AS (SELECT COUNT(*) AS n FROM documents),
tot AS (SELECT COUNT(*) AS t FROM words),
q(query_id, term) AS (VALUES """ + ", ".join(
        f"('{qid}', '{t}')" for qid, terms in BM25_QUERIES for t in terms
    ) + r"""),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM words GROUP BY 1, 2),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
       FROM words GROUP BY 1),
scored AS (
  SELECT q.query_id, tf.doc_id,
         SUM(LN((n.n - df.df + 0.5) / (df.df + 0.5) + 1) * tf.tf
             * (1.2 + 1)
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                               / (CAST(tot.t AS DOUBLE) / n.n)))) AS s
  FROM q JOIN tf ON q.term = tf.term
         JOIN df ON q.term = df.term
         JOIN dl ON tf.doc_id = dl.doc_id
         CROSS JOIN n CROSS JOIN tot
  GROUP BY 1, 2
)
SELECT query_id, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(FLOOR(s * 1000000 + 0.5) AS BIGINT) AS score_micro,
       CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY FLOOR(s * 1000000 + 0.5) DESC, doc_id) AS rnk
      FROM scored)
WHERE rnk <= 10"""),
    "inactive_customers": """
SELECT CAST(c_custkey AS BIGINT) AS custkey,
       CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_totalprice > 450000.0)""",
    "events_rollup": """
SELECT event_type, date_trunc('day', ts) AS day,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY ROLLUP(event_type, day)""",
    "events_funnel": """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_conv FROM (
  SELECT c.event_id, c.user_id
  FROM events c
  WHERE c.event_type = 'click' AND EXISTS (
    SELECT 1 FROM events v
    WHERE v.user_id = c.user_id AND v.event_type = 'view'
      AND v.ts <= c.ts AND v.ts > c.ts - INTERVAL 10 MINUTE)
) GROUP BY user_id""",
    "events_lag": """
SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
       CAST(FLOOR((value - LAG(value) OVER (
              PARTITION BY user_id ORDER BY ts, event_id)) * 1000 + 0.5)
            AS BIGINT) AS delta_milli
FROM events""",
    "layer_stats": f"""
WITH v AS (
  SELECT doc_id, span_idx, CAST(geom_type AS BIGINT) AS gt, layer,
         UNNEST(xs) AS x, UNNEST(ys) AS y, UNNEST(ring_of) AS ring,
         UNNEST(generate_series(1, len(xs))) AS pos
  FROM {_GEOMS}
),
seg AS (
  SELECT doc_id, span_idx, gt, layer, ring, x, y,
         COALESCE(LEAD(x) OVER w, FIRST_VALUE(x) OVER w) AS wx,
         COALESCE(LEAD(y) OVER w, FIRST_VALUE(y) OVER w) AS wy,
         LEAD(x) OVER w AS nx, LEAD(y) OVER w AS ny
  FROM v WINDOW w AS (PARTITION BY doc_id, span_idx, ring ORDER BY pos)
),
feat AS (
  SELECT doc_id, span_idx, gt, layer,
         CASE WHEN gt = 3 THEN CAST(FLOOR(ABS(SUM(x * wy - wx * y)) / 2
                                          * 1000000 + 0.5) AS BIGINT)
              ELSE 0 END AS area_micro,
         CASE WHEN gt = 2 THEN CAST(FLOOR(COALESCE(
                  SUM(SQRT((nx - x) * (nx - x) + (ny - y) * (ny - y))), 0)
                  * 1000000 + 0.5) AS BIGINT)
              ELSE 0 END AS len_micro
  FROM seg GROUP BY doc_id, span_idx, gt, layer
)
SELECT layer,
       CAST(SUM(CASE WHEN gt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_points,
       CAST(SUM(CASE WHEN gt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN gt = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_polys,
       CAST(SUM(len_micro) AS BIGINT) AS total_len_micro,
       CAST(SUM(area_micro) AS BIGINT) AS total_area_micro
FROM feat GROUP BY layer""",
}


# round-3 extension queries (TPC-H-style relational breadth + the window /
# NTILE / interpolated-quantile / n-gram families) live in queries_ext.py
from .queries_ext import QUERIES_EXT, ORACLE_SQL_EXT  # noqa: E402
from .queries_rel import QUERIES_REL, ORACLE_SQL_REL  # noqa: E402
from .queries_rel2 import QUERIES_REL2, ORACLE_SQL_REL2  # noqa: E402
from .queries_rel3 import QUERIES_REL3, ORACLE_SQL_REL3  # noqa: E402
from .queries_win import QUERIES_WIN, ORACLE_SQL_WIN  # noqa: E402
from .queries_cstats import QUERIES_CSTATS, ORACLE_SQL_CSTATS  # noqa: E402
from .queries_emb import QUERIES_EMB, ORACLE_SQL_EMB  # noqa: E402
from .queries_evt import QUERIES_EVT, ORACLE_SQL_EVT  # noqa: E402
from .queries_geo import QUERIES_GEO, _oracle_sql_geo  # noqa: E402

QUERIES.update(QUERIES_EXT)
ORACLE_SQL.update(ORACLE_SQL_EXT)
QUERIES.update(QUERIES_REL)
ORACLE_SQL.update(ORACLE_SQL_REL)
QUERIES.update(QUERIES_REL2)
ORACLE_SQL.update(ORACLE_SQL_REL2)
QUERIES.update(QUERIES_REL3)
ORACLE_SQL.update(ORACLE_SQL_REL3)
QUERIES.update(QUERIES_WIN)
ORACLE_SQL.update(ORACLE_SQL_WIN)
QUERIES.update(QUERIES_CSTATS)
ORACLE_SQL.update(ORACLE_SQL_CSTATS)
QUERIES.update(QUERIES_EMB)
ORACLE_SQL.update(ORACLE_SQL_EMB)
QUERIES.update(QUERIES_EVT)
ORACLE_SQL.update(ORACLE_SQL_EVT)
QUERIES.update(QUERIES_GEO)
ORACLE_SQL.update(_oracle_sql_geo())
from .queries_ml import QUERIES_ML, _oracle_sql_ml  # noqa: E402

QUERIES.update(QUERIES_ML)
ORACLE_SQL.update(_oracle_sql_ml())

from .queries_ts import QUERIES_TS, ORACLE_SQL_TS  # noqa: E402
from .queries_geo2 import QUERIES_GEO2, _oracle_sql_geo2  # noqa: E402

QUERIES.update(QUERIES_TS)
ORACLE_SQL.update(ORACLE_SQL_TS)
QUERIES.update(QUERIES_GEO2)
ORACLE_SQL.update(_oracle_sql_geo2())
from .queries_fuzzy import QUERIES_FUZZY, ORACLE_SQL_FUZZY  # noqa: E402

QUERIES.update(QUERIES_FUZZY)
ORACLE_SQL.update(ORACLE_SQL_FUZZY)
from .queries_geo3 import QUERIES_GEO3, _oracle_sql_geo3  # noqa: E402

QUERIES.update(QUERIES_GEO3)
ORACLE_SQL.update(_oracle_sql_geo3())
from .queries_media import QUERIES_MEDIA, ORACLE_SQL_MEDIA  # noqa: E402

QUERIES.update(QUERIES_MEDIA)
ORACLE_SQL.update(ORACLE_SQL_MEDIA)
