"""Round-4 ML/curation queries: hashed-BoW linear quality scoring (the
batched model-inference shape of a fastText-style quality filter),
DSIR-flavored target-domain affinity weights, cosine range search over
embeddings, and exact polygon-area statistics from the engine's own WKB
decode path.

Scale contract: the quality/affinity scorers are pure map-side
vectorized passes (one prefix-hash pass per batch, integer arithmetic
throughout — exact across engines); the affinity target histogram is a
fixed D=4096-bucket array built on a worker from block refs and
broadcast once (decontaminate pattern, zero shuffles); range search is
a map-side filter against a broadcast query matrix (no top-k shuffle at
all — the output is the predicate's row set); polygon areas are one
ragged-numpy shoelace pass per batch over int64 micro-degree coords.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..geom import ops as geo_ops
from ..geom import wkb as wkbmod
from ..stages import corpus as corpus_stage

ANN_RANGE_THRESHOLD = 0.25


def q_quality_score(sf_dir: str):
    """Linear quality classifier over hashed bag-of-words features
    (weights = deterministic integer table, score = Σ weight[hash(w)%D]
    over raw word occurrences): the batched model-inference stage every
    corpus-curation pipeline runs, in integer-exact form. Oracled by an
    independent scalar Counter implementation (oracle/expected.py)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return docs.map_batches(corpus_stage.hashed_bow_quality,
                            batch_format="pyarrow")


def q_target_affinity(sf_dir: str):
    """DSIR-flavored importance weights: affinity of every doc to the
    lang='en' target domain = integer inner product of the doc's hashed
    unigram counts with the target's ppm distribution. The target
    histogram is built from block refs on a worker and broadcast once;
    scoring is one vectorized map pass."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    target = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["text", "lang"]) \
        .filter(expr="lang == 'en'")
    return corpus_stage.target_affinity(docs, target)


def q_ann_range(sf_dir: str):
    """Cosine range search: every (query, vector) pair with similarity
    >= 0.25 for the fixed query set (vec_id < 4 — same protocol as
    ann_topk). Pure map-side filter against the broadcast query matrix:
    no shuffle, no top-k state; the scale path is the scan itself."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    qrows = emb.filter(expr="vec_id < 4").take_all()
    qids = np.asarray([r["vec_id"] for r in qrows], np.int64)
    qm = np.asarray([r["embedding"] for r in qrows], np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    ref = ray.put({"ids": qids, "matrix": qm})
    thr = ANN_RANGE_THRESHOLD

    def scan(b: pa.Table) -> pa.Table:
        from ..stages.ann import _to_matrix
        q = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _to_matrix(b["embedding"], dtype=np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        s = q["matrix"] @ (m / n).T  # [nq, nb]
        qi, bi = np.nonzero(s >= thr)
        return pa.table({
            "query_id": pa.array(q["ids"][qi], pa.int64()),
            "vec_id": pa.array(ids[bi], pa.int64()),
            "score": pa.array(np.round(s[qi, bi], 4), pa.float64()),
        })

    return emb.map_batches(scan, batch_format="pyarrow")


HARD_K = 5


def q_hard_negatives(sf_dir: str):
    """Contrastive pair mining: for each query vector (vec_id < 6) the
    HARD_K hardest negatives (different label, HIGHEST cosine — the
    confusable impostors) and hardest positives (same label, LOWEST
    cosine — the stretched in-class examples), the pair-selection stage
    of contrastive/metric-learning data curation. Map-side scoring
    against the broadcast query matrix emits per-batch partial
    extrema (k rows per query×polarity×batch, never the corpus); the
    only exchange is the tiny (query, polarity) groupby. Exact — same
    float64-cosine + ROUND(...,4) contract as ann_topk/ann_range."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.filter(expr="vec_id < 6").take_all()
    qids = np.asarray([r["vec_id"] for r in qrows], np.int64)
    qlab = np.asarray([r["label"] for r in qrows], np.int64)
    qm = np.asarray([r["embedding"] for r in qrows], np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    ref = ray.put({"ids": qids, "labels": qlab, "matrix": qm})

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.ann import _to_matrix
        q = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _to_matrix(b["embedding"], dtype=np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        s = q["matrix"] @ (m / n).T                        # [nq, nb]
        same = q["labels"][:, None] == lab[None, :]
        not_self = q["ids"][:, None] != ids[None, :]
        out_q, out_p, out_v, out_s = [], [], [], []
        for qi in range(len(q["ids"])):
            for pol, mask, sign in (("neg", ~same[qi], -1.0),
                                    ("pos", same[qi], 1.0)):
                cand = np.nonzero(mask & not_self[qi])[0]
                if not len(cand):
                    continue
                # extremal-k candidates; ties on score resolved later
                # by the deterministic (score, vec_id) global sort
                k = min(HARD_K, len(cand))
                sel = cand[np.argpartition(sign * s[qi, cand],
                                           k - 1)[:k]]
                out_q.append(np.full(k, q["ids"][qi], np.int64))
                out_p.extend([pol] * k)
                out_v.append(ids[sel])
                out_s.append(s[qi, sel])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "polarity": pa.array([], pa.string()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "polarity": pa.array(out_p, pa.string()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "score": pa.array(np.concatenate(out_s), pa.float64()),
        })

    def final(g: pa.Table) -> pa.Table:
        pol = g["polarity"][0].as_py()
        order = pc.sort_indices(g, sort_keys=[
            ("score", "descending" if pol == "neg" else "ascending"),
            ("vec_id", "ascending")])[:HARD_K]
        out = g.take(order)
        return pa.table({
            "query_id": out["query_id"],
            "polarity": out["polarity"],
            "vec_id": out["vec_id"],
            "rank": pa.array(np.arange(1, len(out) + 1), pa.int64()),
            "score": pc.round(out["score"], 4),
        })

    return emb.map_batches(partial, batch_format="pyarrow",
                           batch_size=4096) \
        .groupby(["query_id", "polarity"]) \
        .map_groups(final, batch_format="pyarrow")


def q_polygon_area(sf_dir: str):
    """Per-polygon shoelace statistics (ring count, vertex count, sum of
    absolute 2×ring-areas in micro-deg²) computed from the engine's own
    WKB decode path — exact integer arithmetic mirrored by the DuckDB
    oracle over the ground-truth vertex table (pre-WKB coords, so the
    check also covers the WKB codec round-trip)."""
    from .queries import _features_ds

    polys = _features_ds(sf_dir).filter(expr="geom_type == 3")

    def area(b: pa.Table) -> pa.Table:
        blobs = [v.as_py() for v in b["geom_wkb"]]
        gb = wkbmod.decode_wkb_batch(blobs)
        n_rings, n_vertices, area2 = geo_ops.polygon_area2_micro(gb)
        return pa.table({
            "doc_id": b["doc_id"],
            "span_idx": pc.cast(b["span_idx"], pa.int64()),
            "n_rings": pa.array(n_rings, pa.int64()),
            "n_vertices": pa.array(n_vertices, pa.int64()),
            "area2_sum": pa.array(area2, pa.int64()),
        })

    return polys.map_batches(area, batch_format="pyarrow")


def q_polygon_edges(sf_dir: str):
    """Per-polygon ring-edge statistics in EXACT integer micro-degrees
    (edge count, Manhattan perimeter, longest-edge squared length) from
    the engine's own WKB decode path — the vertex-density / sliver
    signal simplification thresholds are tuned on (a huge max_edge2
    next to a small manh_perim flags a degenerate spike). Vertices are
    micro-integerized per the float-parity rule so the DuckDB mirror
    over the ground-truth vertex table is bit-identical; the closing
    wraparound edge of each (unclosed-stored) ring is included on both
    sides. Pure map_batches — no shuffle."""
    from .queries import _features_ds

    polys = _features_ds(sf_dir).filter(expr="geom_type == 3")

    def edges(b: pa.Table) -> pa.Table:
        blobs = [v.as_py() for v in b["geom_wkb"]]
        gb = wkbmod.decode_wkb_batch(blobs)
        n_edges, manh, max2 = geo_ops.polygon_edge_stats_micro(gb)
        return pa.table({
            "doc_id": b["doc_id"],
            "span_idx": pc.cast(b["span_idx"], pa.int64()),
            "n_edges": pa.array(n_edges, pa.int64()),
            "manh_perim": pa.array(manh, pa.int64()),
            "max_edge2": pa.array(max2, pa.int64()),
        })

    return polys.map_batches(edges, batch_format="pyarrow")


def q_polygon_fill(sf_dir: str):
    """Per-polygon bounding-box fill ratio in EXACT integers — the
    compactness / sliver signal (a road sliver fills ~0 of its bbox, a
    building ~1): shoelace Σ|2·ring area| (holes ADD, same contract as
    polygon_area) against twice the bbox rectangle area, ratio in ppm.
    area2·1e6 exceeds int64, so the bounded per-row division runs on
    Python ints (object dtype — the polygon_centroid int128 precedent)
    with DuckDB HUGEINT `//` truncation parity (numerators are
    non-negative, so trunc == floor). Degenerate zero-extent bboxes
    report 0 on both engines. Pure map_batches — no shuffle."""
    from .queries import _features_ds

    polys = _features_ds(sf_dir).filter(expr="geom_type == 3")

    def fill(b: pa.Table) -> pa.Table:
        blobs = [v.as_py() for v in b["geom_wkb"]]
        gb = wkbmod.decode_wkb_batch(blobs)
        _nr, _nv, area2 = geo_ops.polygon_area2_micro(gb)
        n = len(gb.types)
        xi = np.floor(gb.coords[:, 0] * 1e6 + 0.5).astype(np.int64)
        yi = np.floor(gb.coords[:, 1] * 1e6 + 0.5).astype(np.int64)
        ro = np.asarray(gb.ring_offsets, np.int64)
        go = np.asarray(gb.geom_offsets, np.int64)
        starts = ro[go[:-1]]
        stops = ro[go[1:]]
        nz = stops > starts
        mnx = np.zeros(n, np.int64)
        mxx = np.zeros(n, np.int64)
        mny = np.zeros(n, np.int64)
        mxy = np.zeros(n, np.int64)
        if nz.any():
            mnx[nz] = np.minimum.reduceat(xi, starts[nz])
            mxx[nz] = np.maximum.reduceat(xi, starts[nz])
            mny[nz] = np.minimum.reduceat(yi, starts[nz])
            mxy[nz] = np.maximum.reduceat(yi, starts[nz])
        bbox2 = 2 * (mxx - mnx) * (mxy - mny)     # ≤ 1.3e17, int64-safe
        fill_ppm = np.zeros(n, np.int64)
        pos = bbox2 > 0
        if pos.any():
            num = area2[pos].astype(object) * 1_000_000
            fill_ppm[pos] = (num // bbox2[pos].astype(object)) \
                .astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "span_idx": pc.cast(b["span_idx"], pa.int64()),
            "bbox_area2": pa.array(bbox2, pa.int64()),
            "fill_ppm": pa.array(fill_ppm, pa.int64()),
        })

    return polys.map_batches(fill, batch_format="pyarrow")


def q_polygon_centroid(sf_dir: str):
    """Per-polygon outer-ring shoelace centroid in EXACT integer
    micro-degrees (the 'label point' every map renderer needs), from
    the engine's own WKB decode path — invariant under the codec's
    ring rotation/reversal, mirrored by a DuckDB HUGEINT oracle over
    the ground-truth vertex table. Degenerate (zero-area) outer rings
    are excluded on both sides. Pure map_batches — no shuffle."""
    from .queries import _features_ds

    polys = _features_ds(sf_dir).filter(expr="geom_type == 3")

    def cent(b: pa.Table) -> pa.Table:
        blobs = [v.as_py() for v in b["geom_wkb"]]
        gb = wkbmod.decode_wkb_batch(blobs)
        cx, cy, a2o, valid = geo_ops.polygon_centroid_micro(gb)
        keep = pa.array(valid)
        return pa.table({
            "doc_id": b["doc_id"].filter(keep),
            "span_idx": pc.cast(b["span_idx"], pa.int64()).filter(keep),
            "cx_micro": pa.array(cx[valid], pa.int64()),
            "cy_micro": pa.array(cy[valid], pa.int64()),
            "area2_outer": pa.array(a2o[valid], pa.int64()),
        })

    return polys.map_batches(cent, batch_format="pyarrow")


BLOOM_SHIP_LO = "1995-01-01"
BLOOM_SHIP_HI = "1995-04-01"


def q_bloom_semi_join(sf_dir: str):
    """Bloom-accelerated semi join: orders with at least one lineitem
    shipped in [1995-01-01, 1995-04-01). The 128 KiB Bloom bitmap over
    the qualifying orderkeys is built on a worker from block refs and
    broadcast; the map-side pre-filter drops the orders that cannot
    match BEFORE the exact hash semi join, so the exchange carries only
    plausible probe rows (the 100-TB semi-join shape). Output is exact:
    Bloom false positives are removed by the verify join."""
    from ..stages import relational

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    lo = np.datetime64(BLOOM_SHIP_LO, "us").astype(np.int64)
    hi = np.datetime64(BLOOM_SHIP_HI, "us").astype(np.int64)

    def li_keys(b: pa.Table) -> pa.Table:
        sd = relational._ts_us(b["l_shipdate"])
        keep = (sd >= lo) & (sd < hi)
        keys = np.unique(
            relational._np(b["l_orderkey"]).astype(np.int64)[keep])
        return pa.table({"k": pa.array(keys, pa.int64())})

    keys_ds = li.map_batches(li_keys, batch_format="pyarrow")

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])

    def ord_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
            "o_orderpriority": b["o_orderpriority"],
        })

    slim = orders.map_batches(ord_slim, batch_format="pyarrow")
    prefiltered = relational.bloom_semi_filter(slim, keys_ds,
                                               key="o_orderkey")
    return relational.hash_join_i64(
        prefiltered, keys_ds.map_batches(
            lambda b: pa.table({"o_orderkey": b["k"]}),
            batch_format="pyarrow"),
        key="o_orderkey",
        left_carry={"o_orderpriority": pa.string()},
        right_carry={}, how="semi",
        P=relational.adaptive_parts(sf_dir))


def q_line_length(sf_dir: str):
    """Per-linestring geodesic length (haversine per segment, integer
    millimetres floored per segment — the knn/radius cross-engine
    contract — then integer-summed) plus segment count, from the
    engine's own WKB decode path; SQL parity via the haversine macro
    over the ground-truth vertex table."""
    from .queries import _features_ds

    lines = _features_ds(sf_dir).filter(expr="geom_type == 2")

    def length(b: pa.Table) -> pa.Table:
        blobs = [v.as_py() for v in b["geom_wkb"]]
        gb = wkbmod.decode_wkb_batch(blobs)
        n_segments, mm = geo_ops.linestring_length_mm(gb)
        keep = n_segments > 0  # SQL's segment join drops 1-vertex lines
        t = pa.table({
            "doc_id": b["doc_id"],
            "span_idx": pc.cast(b["span_idx"], pa.int64()),
            "n_segments": pa.array(n_segments, pa.int64()),
            "length_mm": pa.array(mm, pa.int64()),
        })
        return t.filter(pa.array(keep))

    return lines.map_batches(length, batch_format="pyarrow")


PMI_TOPK = 100


def q_bigram_pmi(sf_dir: str):
    """Pointwise-mutual-information association scores for the top-100
    corpus bigrams (collocation mining — the lexical-association pass of
    a corpus-analysis pipeline). All counting is distributed (per-block
    dictionary-encode partials → vocabulary-sized groupbys, the corpus
    never moves); only the bounded top-k bigram list and its ≤2k member
    unigram counts reach the driver, where the PMI ratio is computed in
    arbitrary-precision integers: pmi_micro = floor(c_xy·Nu²·1e6 /
    (Nb·c_x·c_y)) — exact across engines (DuckDB mirrors it in
    HUGEINT)."""
    from ray.data.aggregate import Sum

    from ..stages.corpus import _batch_terms

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])

    def uni_partial(b: pa.Table) -> pa.Table:
        _, _, codes, dictionary = _batch_terms(b, "text")
        cnt = np.bincount(codes, minlength=len(dictionary))
        return pa.table({"term": dictionary,
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    def bi_partial(b: pa.Table) -> pa.Table:
        flat, doc_of, _, _ = _batch_terms(b, "text")
        L = len(flat)
        if L < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        pairs = pc.binary_join_element_wise(
            flat.slice(0, L - 1), flat.slice(1, L - 1), " ")
        same_doc = doc_of[1:] == doc_of[:-1]
        pairs = pairs.filter(pa.array(same_doc))
        enc = pc.dictionary_encode(pairs)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table({"bigram": enc.dictionary,
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    uni = docs.map_batches(uni_partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n", alias_name="n")) \
        .materialize()  # vocabulary-sized; reused for total + lookup
    bi = docs.map_batches(bi_partial, batch_format="pyarrow") \
        .groupby("bigram").aggregate(Sum("n", alias_name="n")) \
        .materialize()

    nu = int(uni.sum("n"))
    nb = int(bi.sum("n"))
    top = bi.sort(["n", "bigram"], descending=[True, False]) \
        .limit(PMI_TOPK).take_all()
    words = sorted({w for r in top for w in r["bigram"].split(" ")})
    wset = pa.array(words, pa.string())

    def keep_terms(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["term"], value_set=wset))

    cu = {r["term"]: int(r["n"])
          for r in uni.map_batches(keep_terms,
                                   batch_format="pyarrow").take_all()}
    out_b, out_n, out_p = [], [], []
    for r in top:
        w1, w2 = r["bigram"].split(" ")
        c_xy = int(r["n"])
        pmi = c_xy * nu * nu * 1_000_000 // (nb * cu[w1] * cu[w2])
        out_b.append(r["bigram"])
        out_n.append(c_xy)
        out_p.append(pmi)
    return pa.table({
        "bigram": pa.array(out_b, pa.string()),
        "n": pa.array(out_n, pa.int64()),
        "pmi_micro": pa.array(out_p, pa.int64()),
    })


PAGERANK_ITERS = 20
PAGERANK_SCALE = 1_000_000


def q_type_pagerank(sf_dir: str):
    """PageRank over the event-type transition graph (nodes = event
    types, edge weights = Markov transition counts from
    type_transitions' one-user-hash-shuffle kernel). The graph is
    O(types²) by construction, so the fixed-point iteration runs on the
    collected edge list in EXACT integer arithmetic (rank mass in
    micro-units, floor division per edge, damping 85/100) — the same
    bounded-driver-state contract as kmeans' k-row centroids. Oracled by
    an independent scalar reimplementation from the raw events
    (oracle/expected.py)."""
    from .queries_evt import q_type_transitions

    edges = q_type_transitions(sf_dir).take_all()
    nodes = sorted({r["from_type"] for r in edges}
                   | {r["to_type"] for r in edges})
    idx = {t: i for i, t in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "rank_micro": pa.array([], pa.int64())})
    w = np.zeros((n, n), np.int64)
    for r in edges:
        w[idx[r["from_type"]], idx[r["to_type"]]] = int(r["n"])
    out_w = w.sum(axis=1)
    rank = np.full(n, PAGERANK_SCALE // n, np.int64)
    base = 15 * PAGERANK_SCALE // (100 * n)
    for _ in range(PAGERANK_ITERS):
        nxt = np.full(n, base, np.int64)
        for u in range(n):
            if out_w[u] == 0:
                continue  # dangling: its 85% mass is dropped (spec'd)
            contrib = (85 * int(rank[u]) * w[u]) // (100 * int(out_w[u]))
            nxt += contrib
        rank = nxt
    return pa.table({
        "event_type": pa.array(nodes, pa.string()),
        "rank_micro": pa.array(rank, pa.int64()),
    })


SMOOTH_Z = 10


def q_cell_smooth(sf_dir: str):
    """3×3 focal (neighborhood) sum over the occupied z-10 tile grid —
    raster-style smoothing of point density on the XYZ grid (hot-spot
    detection input). Distributed shape: per-batch point→tile partials →
    one count groupby (O(occupied tiles) rows), then each occupied tile
    emits its 9 neighbor contributions and a second groupby sums them —
    O(9·occupied), corpus never moves twice. Output keeps occupied
    tiles only, so grid-boundary semantics never arise (both engines sum
    over the same occupied set)."""
    from ray.data.aggregate import Sum

    from ..index.xyz import tile_xy
    from .queries import _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")
    z = SMOOTH_Z

    def tiles(b: pa.Table) -> pa.Table:
        lon = b["bbox_minx"].to_numpy(zero_copy_only=False)
        lat = b["bbox_miny"].to_numpy(zero_copy_only=False)
        x, y = tile_xy(lon, lat, z)
        key = (x.astype(np.int64) << 32) | y.astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(uk, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    occ = pts.map_batches(tiles, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n", alias_name="n"))

    def fan_out(b: pa.Table) -> pa.Table:
        """Each occupied tile contributes its count to its 9 neighbors;
        the center row additionally carries cn=n so ONE groupby yields
        both the focal sum and the tile's own count (n > 0 ⇔ occupied —
        no driver-side key set, no second join)."""
        k = b["k"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = k >> 32, k & 0xFFFFFFFF
        ks, ns, cs = [], [], []
        # +1 coordinate shift keeps every neighbor key non-negative at
        # grid edges (x or y == 0)
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                ks.append(((x + dx) << 32) | (y + dy))
                ns.append(n)
                cs.append(n if dx == 1 and dy == 1
                          else np.zeros(len(n), np.int64))
        return pa.table({"k": pa.array(np.concatenate(ks), pa.int64()),
                         "n": pa.array(np.concatenate(ns), pa.int64()),
                         "cn": pa.array(np.concatenate(cs), pa.int64())})

    smooth = occ.map_batches(fan_out, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n", alias_name="smoothed"),
                                Sum("cn", alias_name="n"))

    def widen(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b["n"], 0))  # occupied tiles only
        kk = t["k"].to_numpy(zero_copy_only=False)
        return pa.table({
            "z": pa.array(np.full(len(kk), z, np.int64), pa.int64()),
            "x": pa.array((kk >> 32) - 1, pa.int64()),
            "y": pa.array((kk & 0xFFFFFFFF) - 1, pa.int64()),
            "n": pc.cast(t["n"], pa.int64()),
            "smoothed": pc.cast(t["smoothed"], pa.int64()),
        })

    return smooth.map_batches(widen, batch_format="pyarrow")


def _grid_autocorr_terms(sf_dir: str):
    """Shared spatial-autocorrelation machinery for Moran's I and
    Geary's C: point counts on the occupied SMOOTH_Z tile grid with
    8-neighborhood sums. Distributed shape: per-block count partials,
    one groupby, then the 9-cell fan-out + one more groupby (same
    exchange as cell_smooth); only the occupied-tile aggregate (≤ 2^20
    rows by construction at z-10) is collected. Returns
    (N, k_i, n_i, nb_i, deg_i, nb2_i, S) — per-tile shifted grid key
    (x+1)<<32|(y+1), own count, neighbor count sum, occupied-neighbor
    degree, neighbor count-square sum, and the global point total — or
    None when no tiles are occupied."""
    from ray.data.aggregate import Sum

    from ..index.xyz import tile_xy
    from .queries import _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")
    z = SMOOTH_Z

    def tiles(b: pa.Table) -> pa.Table:
        lon = b["bbox_minx"].to_numpy(zero_copy_only=False)
        lat = b["bbox_miny"].to_numpy(zero_copy_only=False)
        x, y = tile_xy(lon, lat, z)
        key = (x.astype(np.int64) << 32) | y.astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(uk, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    occ = pts.map_batches(tiles, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n", alias_name="n"))

    def fan_out(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = k >> 32, k & 0xFFFFFFFF
        n2 = n * n   # ≤ (total points)² per tile — int64 guard below
        if len(n) and int(n.max()) > 1_000_000_000:  # 8·n² ≤ 8e18 < 2^63
            raise ValueError("autocorr: per-tile count exceeds n² guard")
        ks, ns, os_, cs, sq = [], [], [], [], []
        one = np.ones(len(n), np.int64)
        zero = np.zeros(len(n), np.int64)
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                center = dx == 1 and dy == 1
                ks.append(((x + dx) << 32) | (y + dy))
                ns.append(zero if center else n)   # neighbor count sum
                os_.append(zero if center else one)  # neighbor degree
                cs.append(n if center else zero)   # own count
                sq.append(zero if center else n2)  # neighbor count²
        return pa.table({
            "k": pa.array(np.concatenate(ks), pa.int64()),
            "nb": pa.array(np.concatenate(ns), pa.int64()),
            "deg": pa.array(np.concatenate(os_), pa.int64()),
            "cn": pa.array(np.concatenate(cs), pa.int64()),
            "nb2": pa.array(np.concatenate(sq), pa.int64()),
        })

    agg = occ.map_batches(fan_out, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("nb", alias_name="nb"),
                                Sum("deg", alias_name="deg"),
                                Sum("cn", alias_name="n"),
                                Sum("nb2", alias_name="nb2"))

    # global S and N first (tiny second pass over the same aggregate
    # would re-execute; collect the bounded per-tile terms instead — the
    # occupied z-10 grid is ≤ 2^20 rows by construction)
    rows = agg.map_batches(
        lambda b: b.filter(pc.greater(b["n"], 0)),
        batch_format="pyarrow").take_all()
    N = len(rows)
    if N == 0:
        return None
    k_i = np.asarray([r["k"] for r in rows], np.int64)
    n_i = np.asarray([r["n"] for r in rows], np.int64)
    nb_i = np.asarray([r["nb"] for r in rows], np.int64)
    deg_i = np.asarray([r["deg"] for r in rows], np.int64)
    nb2_i = np.asarray([r["nb2"] for r in rows], np.int64)
    S = int(n_i.sum())
    return N, k_i, n_i, nb_i, deg_i, nb2_i, S


def q_moran_i(sf_dir: str):
    """Moran's I spatial autocorrelation of point density over the
    occupied z-10 tile grid (8-neighborhood weights, occupied tiles
    only) — the clustering-vs-dispersion statistic of spatial analysis,
    in EXACT integer arithmetic via cross-multiplication: with
    N = occupied tiles, S = Σn, deviations scale to d_i = N·n_i − S, and
    I = (N / W) · Σ_ij d_i d_j / Σ d_i² over neighbor pairs. Distributed
    shape: the same 9-cell fan-out + one groupby as cell_smooth (each
    tile also contributes a 1 so deg_i arrives in the same pass);
    per-tile terms are int64-guarded partial sums, the final ratio is
    arbitrary-precision Python int (DuckDB HUGEINT mirror). Output is
    one row: (n_tiles, w_pairs, moran_micro = floor(N·num·1e6 /
    (W·den)))."""
    terms = _grid_autocorr_terms(sf_dir)
    if terms is None:
        return pa.table({"n_tiles": pa.array([], pa.int64()),
                         "w_pairs": pa.array([], pa.int64()),
                         "moran_micro": pa.array([], pa.int64())})
    N, _k_i, n_i, nb_i, deg_i, _nb2_i, S = terms
    d = N * n_i - S
    # Σ_j∈nbr d_j = N·nb_i − deg_i·S (exact); int64 guards
    dn = N * nb_i - deg_i * S
    if np.abs(d).max(initial=0) > 1 << 40 or \
            np.abs(dn).max(initial=0) > 1 << 45:
        raise ValueError("moran_i: deviation terms exceed int64 guard")
    num = int(np.sum([int(a) * int(b) for a, b in zip(d, dn)]))
    den = int(np.sum([int(a) * int(a) for a in d]))
    W = int(deg_i.sum())
    # DuckDB's // TRUNCATES toward zero while Python's floors — match
    # the SQL by truncating explicitly (num may be negative)
    if W and den:
        q = abs(N * num * 1_000_000) // (W * den)
        moran = q if num >= 0 else -q
    else:
        moran = 0
    return pa.table({
        "n_tiles": pa.array([N], pa.int64()),
        "w_pairs": pa.array([W], pa.int64()),
        "moran_micro": pa.array([moran], pa.int64()),
    })


def q_geary_c(sf_dir: str):
    """Geary's C spatial autocorrelation of point density over the
    occupied SMOOTH_Z tile grid (8-neighborhood weights) — the
    local-contrast companion statistic to Moran's I (C < 1 clustered,
    C > 1 dispersed), in EXACT integer arithmetic:

        C = (N−1) · Σ_ij w_ij (n_i − n_j)² / (2W · Σ_i (n_i − x̄)²)

    Per-tile Σ_j∈nbr (n_i−n_j)² = deg_i·n_i² − 2·n_i·nb_i + nb2_i needs
    only the same fan-out aggregate as Moran plus the neighbor
    count-square sum (nb2), so both statistics share one distributed
    pass (_grid_autocorr_terms). Mean-centering is cleared by N²:
    C = (N−1)·N²·num2 / (2W·Σd²) with d_i = N·n_i − S; the final ratio
    is arbitrary-precision Python int (DuckDB HUGEINT mirror). Output
    one row: (n_tiles, w_pairs, geary_micro = (num·1e6) // den)."""
    terms = _grid_autocorr_terms(sf_dir)
    if terms is None:
        return pa.table({"n_tiles": pa.array([], pa.int64()),
                         "w_pairs": pa.array([], pa.int64()),
                         "geary_micro": pa.array([], pa.int64())})
    N, _k_i, n_i, nb_i, deg_i, nb2_i, S = terms
    num2 = sum(int(dg) * int(n) * int(n) - 2 * int(n) * int(nb) + int(q2)
               for dg, n, nb, q2 in zip(deg_i, n_i, nb_i, nb2_i))
    d = [N * int(n) - S for n in n_i]
    den = sum(x * x for x in d)
    W = int(deg_i.sum())
    geary = ((N - 1) * N * N * num2 * 1_000_000) // (2 * W * den) \
        if W and den else 0
    return pa.table({
        "n_tiles": pa.array([N], pa.int64()),
        "w_pairs": pa.array([W], pa.int64()),
        "geary_micro": pa.array([geary], pa.int64()),
    })


HOTSPOT_K = 20


def q_getis_hotspots(sf_dir: str):
    """Getis-Ord G*-style hotspot detection over the occupied SMOOTH_Z
    tile grid: for each occupied tile the self-inclusive neighborhood
    mass g_i = n_i + nb_i is compared against its CSR expectation
    (deg_i+1)·S/N in EXACT integer cross-multiplied form,

        excess_i = N·(n_i + nb_i) − (deg_i + 1)·S

    (positive ⇒ the 3×3 neighborhood holds more points than a uniform
    spread would give it — the G* numerator minus its expectation, the
    standard hotspot ranking). Shares the single fan-out pass of
    Moran/Geary (_grid_autocorr_terms); isolated tiles (deg = 0) stay
    candidates with excess = N·n_i − S. int64 is safe by construction:
    N ≤ 2^20 occupied z-10 tiles and the fan-out guards n_i ≤ 1e9, so
    N·g ≤ 2^20·9e9 < 2^63. Output: top-HOTSPOT_K tiles by excess desc
    (ties: tile_x, tile_y asc) with their own count."""
    terms = _grid_autocorr_terms(sf_dir)
    if terms is None:
        return pa.table({"tile_x": pa.array([], pa.int64()),
                         "tile_y": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "excess": pa.array([], pa.int64())})
    N, k_i, n_i, nb_i, deg_i, _nb2_i, S = terms
    excess = N * (n_i + nb_i) - (deg_i + 1) * S
    x = (k_i >> 32) - 1          # fan-out keys are shifted by (+1, +1)
    y = (k_i & 0xFFFFFFFF) - 1
    top = np.lexsort((y, x, -excess))[:HOTSPOT_K]
    return pa.table({
        "tile_x": pa.array(x[top], pa.int64()),
        "tile_y": pa.array(y[top], pa.int64()),
        "n": pa.array(n_i[top], pa.int64()),
        "excess": pa.array(excess[top], pa.int64()),
    })


def q_lisa_quadrants(sf_dir: str):
    """LISA (local Moran) quadrant census over the occupied SMOOTH_Z
    tile grid: each tile is classified by the signs of its own deviation
    and its neighborhood deviation — HH (hot core), LL (cold core),
    HL (hot outlier), LH (cold outlier), NS (either side exactly at the
    mean, incl. isolated tiles whose empty neighborhood sums to zero).
    Exact integer cross-multiplication clears the mean: with
    d_i = N·n_i − S and Σ_j∈nbr d_j = N·nb_i − deg_i·S both sign-exact,
    no float ever enters. Same single distributed fan-out pass as
    Moran/Geary/Getis. Output: (quadrant, n_tiles) for the labels
    present."""
    terms = _grid_autocorr_terms(sf_dir)
    if terms is None:
        return pa.table({"quadrant": pa.array([], pa.string()),
                         "n_tiles": pa.array([], pa.int64())})
    N, _k_i, n_i, nb_i, deg_i, _nb2_i, S = terms
    d = N * n_i - S
    dn = N * nb_i - deg_i * S
    lab = np.where((d > 0) & (dn > 0), 0,
                   np.where((d < 0) & (dn < 0), 1,
                            np.where((d > 0) & (dn < 0), 2,
                                     np.where((d < 0) & (dn > 0), 3, 4))))
    names = np.array(["HH", "LL", "HL", "LH", "NS"])
    u, c = np.unique(lab, return_counts=True)
    return pa.table({
        "quadrant": pa.array(names[u], pa.string()),
        "n_tiles": pa.array(c.astype(np.int64), pa.int64()),
    })


def q_flow_directions(sf_dir: str):
    """D8-style density-ascent direction census over the occupied
    SMOOTH_Z tile grid: each occupied tile flows toward its
    highest-count 8-neighbor if that neighbor STRICTLY exceeds the
    tile's own count, else it is a local mode (direction −1) — the
    hydrology flow-direction / mean-shift mode-seeking primitive on a
    raster. Directions are coded 0..7 by (dx,dy) lexicographic order
    with ties broken toward the smallest code on both engines.
    Distributed shape: one point→tile count groupby, then each tile
    ships its count to its 8 neighbors in direction-tagged value
    columns so a SINGLE second groupby yields every tile's full
    neighbor vector (the cell_smooth exchange, widened to 8 lanes);
    the argmax and the final direction histogram stay distributed —
    nothing is collected but the ≤9-row result."""
    from ray.data.aggregate import Sum

    from ..index.xyz import tile_xy
    from .queries import _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")
    z = SMOOTH_Z

    def tiles(b: pa.Table) -> pa.Table:
        lon = b["bbox_minx"].to_numpy(zero_copy_only=False)
        lat = b["bbox_miny"].to_numpy(zero_copy_only=False)
        x, y = tile_xy(lon, lat, z)
        key = (x.astype(np.int64) << 32) | y.astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(uk, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    occ = pts.map_batches(tiles, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n", alias_name="n"))

    def fan_out(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = k >> 32, k & 0xFFFFFFFF
        m = len(n)
        zero = np.zeros(m, np.int64)
        ks, cols = [], {f"d{i}": [] for i in range(8)}
        cn = []
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                ks.append(((x + dx) << 32) | (y + dy))
                if dx == 1 and dy == 1:
                    cn.append(n)
                    for i in range(8):
                        cols[f"d{i}"].append(zero)
                    continue
                cn.append(zero)
                # direction FROM the receiving tile TO this sender
                ddx, ddy = 1 - dx, 1 - dy
                idx9 = (ddx + 1) * 3 + (ddy + 1)
                d = idx9 if idx9 < 4 else idx9 - 1
                for i in range(8):
                    cols[f"d{i}"].append(n if i == d else zero)
        out = {"k": pa.array(np.concatenate(ks), pa.int64()),
               "cn": pa.array(np.concatenate(cn), pa.int64())}
        for i in range(8):
            out[f"d{i}"] = pa.array(np.concatenate(cols[f"d{i}"]),
                                    pa.int64())
        return pa.table(out)

    agg = occ.map_batches(fan_out, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("cn", alias_name="cn"),
                                *[Sum(f"d{i}", alias_name=f"d{i}")
                                  for i in range(8)])

    def classify(b: pa.Table) -> pa.Table:
        cn = b["cn"].to_numpy(zero_copy_only=False)
        keep = cn > 0
        D = np.stack([b[f"d{i}"].to_numpy(zero_copy_only=False)[keep]
                      for i in range(8)])
        cn = cn[keep]
        if len(cn) == 0:
            return pa.table({"direction": pa.array([], pa.int64()),
                             "n_tiles": pa.array([], pa.int64())})
        best = D.max(axis=0)
        flow = np.where(best > cn, D.argmax(axis=0), -1)
        u, c = np.unique(flow, return_counts=True)
        return pa.table({"direction": pa.array(u, pa.int64()),
                         "n_tiles": pa.array(c.astype(np.int64),
                                             pa.int64())})

    return agg.map_batches(classify, batch_format="pyarrow") \
        .groupby("direction").aggregate(Sum("n_tiles",
                                            alias_name="n_tiles"))


def q_layer_centroids(sf_dir: str):
    """Per-layer mean point position as exact integers: n points,
    micro-degree coordinate sums, and the truncated integer mean
    (DuckDB ``//`` parity via sign/abs). One groupby over the layer
    domain; coordinates integer-ized per row (float-parity rule)."""
    from ray.data.aggregate import Sum

    from .queries import _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")

    def partial(b: pa.Table) -> pa.Table:
        xm = np.floor(b["bbox_minx"].to_numpy(zero_copy_only=False)
                      * 1e6 + 0.5).astype(np.int64)
        ym = np.floor(b["bbox_miny"].to_numpy(zero_copy_only=False)
                      * 1e6 + 0.5).astype(np.int64)
        layer = b["layer"]
        if isinstance(layer, pa.ChunkedArray):
            layer = layer.combine_chunks()
        enc = pc.dictionary_encode(layer)
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        k = len(enc.dictionary)
        return pa.table({
            "layer": enc.dictionary,
            "n_points": pa.array(np.bincount(codes, minlength=k)
                                 .astype(np.int64), pa.int64()),
            "sum_x": pa.array(np.bincount(codes, xm, k)
                              .astype(np.int64), pa.int64()),
            "sum_y": pa.array(np.bincount(codes, ym, k)
                              .astype(np.int64), pa.int64()),
        })

    agg = pts.map_batches(partial, batch_format="pyarrow") \
        .groupby("layer").aggregate(Sum("n_points", alias_name="n_points"),
                                    Sum("sum_x", alias_name="sum_x"),
                                    Sum("sum_y", alias_name="sum_y"))

    def mean(b: pa.Table) -> pa.Table:
        n = b["n_points"].to_numpy(zero_copy_only=False)
        sx = b["sum_x"].to_numpy(zero_copy_only=False)
        sy = b["sum_y"].to_numpy(zero_copy_only=False)
        cx = np.where(sx >= 0, np.abs(sx) // n, -(np.abs(sx) // n))
        cy = np.where(sy >= 0, np.abs(sy) // n, -(np.abs(sy) // n))
        return pa.table({
            "layer": b["layer"],
            "n_points": pc.cast(b["n_points"], pa.int64()),
            "cx_micro": pa.array(cx, pa.int64()),
            "cy_micro": pa.array(cy, pa.int64()),
        })

    return agg.map_batches(mean, batch_format="pyarrow")


def q_degree_census(sf_dir: str):
    """Occupied-tile 8-neighbor degree histogram at SMOOTH_Z — the grid
    connectivity profile (share of isolated tiles vs interior tiles;
    the statistic behind grid_morphology's erosion count, per level).
    Reuses the single shared autocorr fan-out pass; output is
    (degree ∈ 0..8, n_tiles)."""
    terms = _grid_autocorr_terms(sf_dir)
    if terms is None:
        return pa.table({"degree": pa.array([], pa.int64()),
                         "n_tiles": pa.array([], pa.int64())})
    _N, _k_i, _n_i, _nb_i, deg_i, _nb2_i, _S = terms
    u, c = np.unique(deg_i, return_counts=True)
    return pa.table({"degree": pa.array(u, pa.int64()),
                     "n_tiles": pa.array(c.astype(np.int64), pa.int64())})


def q_local_clustering(sf_dir: str):
    """Joint (degree, closed-wedge) census of the occupied-tile
    8-adjacency graph at SMOOTH_Z — the local-clustering-coefficient
    profile of the grid graph in exact integers (tri_pairs /
    C(degree,2) is each tile's local clustering coefficient; the
    census keeps the integer numerator and the degree instead of a
    float ratio, per the float-parity rule). Rides the shared autocorr
    fan-out + the packed-adjacency probe (the collected occupied-tile
    aggregate is ≤ 2^20 z-10 rows by construction); whether two of a
    tile's neighbor SLOTS are themselves grid-adjacent is a static
    property of the direction pair, so closed wedges per node are a
    vectorized AND-sum over the 8·7/2 direction pairs — no extra
    shuffle beyond the one shared exchange. SQL mirror: ordered
    neighbor-pair self-join."""
    terms = _grid_autocorr_terms(sf_dir)
    if terms is None:
        return pa.table({"degree": pa.array([], pa.int64()),
                         "tri_pairs": pa.array([], pa.int64()),
                         "n_tiles": pa.array([], pa.int64())})
    _N, k_i, _n_i, _nb_i, _deg_i, _nb2_i, _S = terms
    keys = np.sort(k_i)
    _nbr_idx, nbr_ok = _packed_adjacency(keys)
    deg = nbr_ok.sum(axis=0).astype(np.int64)
    tp = np.zeros(len(keys), np.int64)
    for i, (ax, ay) in enumerate(_DIRS):
        for j in range(i + 1, len(_DIRS)):
            bx, by = _DIRS[j]
            if max(abs(ax - bx), abs(ay - by)) <= 1:
                tp += nbr_ok[i] & nbr_ok[j]
    fused = deg * 64 + tp                     # tp ≤ C(8,2) = 28 < 64
    u, c = np.unique(fused, return_counts=True)
    return pa.table({
        "degree": pa.array(u >> 6, pa.int64()),
        "tri_pairs": pa.array(u & 63, pa.int64()),
        "n_tiles": pa.array(c.astype(np.int64), pa.int64()),
    })


DIAM_NODE_CAP = 4096  # exact all-pairs BFS guard per component


def q_component_diameters(sf_dir: str):
    """Connected-component shape census of the occupied tile grid:
    for every 8-connected component, its size and EXACT graph diameter
    (max BFS eccentricity), histogrammed as (n_tiles, diameter,
    n_components) — the cluster-elongation profile (a diameter ≈ size
    component is a road-like string, diameter ≈ √size a blob). Exact
    all-pairs BFS per component with a loud DIAM_NODE_CAP guard (at
    scale the double-sweep lower bound replaces exactness — documented
    divergence, not silent). Oracle: independent scalar BFS in
    oracle/expected.py over the ground-truth vertex table."""
    terms = _grid_autocorr_terms(sf_dir)
    if terms is None:
        return pa.table({"n_tiles": pa.array([], pa.int64()),
                         "diameter": pa.array([], pa.int64()),
                         "n_components": pa.array([], pa.int64())})
    _N, k_i, _n_i, _nb_i, _deg_i, _nb2_i, _S = terms
    keys = np.sort(k_i)
    nbr_idx, nbr_ok = _packed_adjacency(keys)
    N = len(keys)

    def bfs(start_set: np.ndarray, restrict: np.ndarray | None = None):
        """Vectorized frontier BFS; returns dist array (-1 where
        unreached)."""
        dist = np.full(N, -1, np.int64)
        dist[start_set] = 0
        frontier = start_set
        d = 0
        while len(frontier):
            d += 1
            nxt = []
            for dd in range(8):
                ok = nbr_ok[dd][frontier]
                nxt.append(nbr_idx[dd][frontier][ok])
            cand = np.unique(np.concatenate(nxt)) if nxt else \
                np.empty(0, np.int64)
            cand = cand[dist[cand] < 0]
            dist[cand] = d
            frontier = cand
        return dist

    seen = np.zeros(N, bool)
    hist: dict = {}
    isolated = ~nbr_ok.any(axis=0)   # singleton fast path: most of a
    n_iso = int(isolated.sum())      # sparse grid is isolated tiles
    if n_iso:
        hist[(1, 0)] = n_iso
        seen[isolated] = True
    for v in range(N):
        if seen[v]:
            continue
        dist = bfs(np.asarray([v], np.int64))
        comp = np.nonzero(dist >= 0)[0]
        seen[comp] = True
        if len(comp) > DIAM_NODE_CAP:
            raise ValueError("component_diameters: component exceeds "
                             f"DIAM_NODE_CAP={DIAM_NODE_CAP}")
        diam = 0
        for u in comp:
            du = bfs(np.asarray([u], np.int64))
            diam = max(diam, int(du[comp].max()))
        k = (len(comp), diam)
        hist[k] = hist.get(k, 0) + 1
    items = sorted(hist.items())
    return pa.table({
        "n_tiles": pa.array([s for (s, _), _ in items], pa.int64()),
        "diameter": pa.array([d for (_, d), _ in items], pa.int64()),
        "n_components": pa.array([c for _, c in items], pa.int64()),
    })


DT_CAP = 256  # BFS depth guard (components are cluster-sized at z-10)


def q_grid_distance_transform(sf_dir: str):
    """Grid distance transform: 8-connected BFS hop distance of every
    occupied SMOOTH_Z tile from the density PEAKS (all tiles holding
    the global maximum count) — the raster proximity operation behind
    'how far is everything from the hotspot'. Unreachable tiles (other
    connected components) report −1. Same bounded-aggregate shape as
    k_core (ONE shared fan-out pass, ≤ 2^20 occupied z-10 tiles,
    vectorized frontier rounds); a deeper-zoom variant would run the
    tile_clusters-style distributed propagation instead. Output:
    (dist, n_tiles) histogram. Depth is guarded at DT_CAP so the
    recursive-CTE oracle's iteration bound is provably equivalent."""
    terms = _grid_autocorr_terms(sf_dir)
    if terms is None:
        return pa.table({"dist": pa.array([], pa.int64()),
                         "n_tiles": pa.array([], pa.int64())})
    N, k_i, n_i, _nb_i, _deg_i, _nb2_i, _S = terms
    order = np.argsort(k_i)
    keys, n = k_i[order], n_i[order]
    nbr_idx, nbr_ok = _packed_adjacency(keys)
    dist = np.full(N, -1, np.int64)
    frontier = np.nonzero(n == n.max())[0]
    dist[frontier] = 0
    d = 0
    while len(frontier):
        d += 1
        if d > DT_CAP:
            raise ValueError("grid_distance_transform: depth exceeds "
                             f"DT_CAP={DT_CAP}")
        nxt = []
        for dd in range(8):
            ok = nbr_ok[dd][frontier]
            nxt.append(nbr_idx[dd][frontier][ok])
        cand = np.unique(np.concatenate(nxt)) if nxt else \
            np.empty(0, np.int64)
        cand = cand[dist[cand] < 0]
        dist[cand] = d
        frontier = cand
    u, c = np.unique(dist, return_counts=True)
    return pa.table({"dist": pa.array(u, pa.int64()),
                     "n_tiles": pa.array(c.astype(np.int64), pa.int64())})


def _packed_adjacency(keys: np.ndarray):
    """8-neighbor adjacency over SORTED packed tile keys via 8
    vectorized searchsorted probes. Packed-lane arithmetic:
    key + (dx<<32) + dy is exact because the shifted y lane stays in
    [0, 2^20+1] (no borrow/carry). Returns (nbr_idx, nbr_ok) of shape
    (8, N)."""
    N = len(keys)
    nbr_idx = np.empty((8, N), np.int64)
    nbr_ok = np.zeros((8, N), bool)
    d = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            want = keys + ((dx << 32) + dy)
            pos = np.searchsorted(keys, want)
            ok = (pos < N)
            ok[ok] = keys[pos[ok]] == want[ok]
            nbr_idx[d] = np.where(ok, pos, 0)
            nbr_ok[d] = ok
            d += 1
    return nbr_idx, nbr_ok


def q_k_core(sf_dir: str):
    """k-core decomposition of the occupied-tile 8-adjacency graph at
    SMOOTH_Z: a tile's core number is the largest k such that it
    survives iterated removal of tiles with fewer than k surviving
    neighbors — the density-peeling hierarchy (cluster cores vs fringe)
    that SQL cannot express (aggregation inside recursion); the oracle
    is an independent scalar reimplementation (oracle/expected.py).
    Distributed shape: ONE shared autocorr fan-out pass produces the
    occupied-tile aggregate (≤ 2^20 rows at z-10 by construction);
    adjacency is 8 vectorized searchsorted probes on the packed keys
    and the peeling runs vectorized on that bounded domain (max core ≤
    8, so ≤ 8 levels). Output: (core_k, n_tiles) histogram."""
    terms = _grid_autocorr_terms(sf_dir)
    if terms is None:
        return pa.table({"core_k": pa.array([], pa.int64()),
                         "n_tiles": pa.array([], pa.int64())})
    N, k_i, _n_i, _nb_i, _deg_i, _nb2_i, _S = terms
    keys = np.sort(k_i)
    nbr_idx, nbr_ok = _packed_adjacency(keys)
    deg = nbr_ok.sum(axis=0).astype(np.int64)
    core = np.zeros(N, np.int64)
    alive = np.ones(N, bool)
    for k in range(1, 9):
        while True:
            rm = alive & (deg < k)
            if not rm.any():
                break
            core[rm] = k - 1
            alive[rm] = False
            for dd in range(8):
                tgt = nbr_idx[dd][rm & nbr_ok[dd]]
                np.subtract.at(deg, tgt, 1)
        if not alive.any():
            break
        core[alive] = k
    u, c = np.unique(core, return_counts=True)
    return pa.table({"core_k": pa.array(u, pa.int64()),
                     "n_tiles": pa.array(c.astype(np.int64), pa.int64())})


def q_customer_order_full(sf_dir: str):
    """FULL OUTER hash join: positive-balance customers vs per-customer
    order counts — keeps customers who never ordered (null n_orders)
    AND ordering customers whose balance filter dropped them from the
    left side (null acctbal_cents). Exercises hash_join_i64's
    ``how="full"`` mode (union + hash-partition + per-partition
    searchsorted resolve; unmatched right rows emitted once from their
    owning partition)."""
    from ray.data.aggregate import Sum

    from ..stages import relational

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"])

    def left_prep(b: pa.Table) -> pa.Table:
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False)
        keep = pa.array(bal > 0)
        cents = np.floor(bal * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "c_custkey": pc.cast(b["c_custkey"], pa.int64()).filter(keep),
            "acctbal_cents": pa.array(cents[bal > 0], pa.int64()),
        })

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def cnt_partial(b: pa.Table) -> pa.Table:
        k, c = np.unique(
            b["o_custkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64), return_counts=True)
        return pa.table({"c_custkey": pa.array(k, pa.int64()),
                         "n_orders": pa.array(c.astype(np.int64),
                                              pa.int64())})

    right = orders.map_batches(cnt_partial, batch_format="pyarrow") \
        .groupby("c_custkey").aggregate(Sum("n_orders",
                                            alias_name="n_orders"))

    return relational.hash_join_i64(
        cust.map_batches(left_prep, batch_format="pyarrow"), right,
        key="c_custkey",
        left_carry={"acctbal_cents": pa.int64()},
        right_carry={"n_orders": pa.int64()},
        how="full")


RFM_R_DAYS = (365, 1095)       # recency bucket edges (days before anchor)
RFM_F = (15, 8)                # frequency edges (orders)
RFM_M_CENTS = (350_000_000, 150_000_000)  # monetary edges (cents)


def q_rfm_segments(sf_dir: str):
    """RFM customer segmentation: per customer, Recency (days from last
    order to the global anchor = max order date), Frequency (orders)
    and Monetary (exact cents), each classified into 3 fixed buckets;
    output is the segment census (r,f,m → customers) every CRM report
    starts from. Distributed shape: one customer-domain groupby over
    orders (count / cents-sum / max-day in one pass), materialized once
    (it is orders-of-magnitude smaller than the fact table) so the tiny
    anchor aggregate does not re-execute the lineage; bucketing and the
    27-key census stay distributed. All arithmetic integer-exact."""
    from ray.data.aggregate import Count, Max, Sum

    from ..stages import relational

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice",
                                      "o_orderdate"])

    def prep(b: pa.Table) -> pa.Table:
        cents = np.floor(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            + 0.5).astype(np.int64)
        day = relational._ts_us(b["o_orderdate"]) // 86_400_000_000
        return pa.table({
            "ck": pc.cast(b["o_custkey"], pa.int64()),
            "cents": pa.array(cents, pa.int64()),
            "day": pa.array(day, pa.int64()),
        })

    cust = orders.map_batches(prep, batch_format="pyarrow") \
        .groupby("ck").aggregate(Count(alias_name="f"),
                                 Sum("cents", alias_name="m"),
                                 Max("day", alias_name="lastd")) \
        .materialize()
    anchor = int(cust.max("lastd"))

    def bucket(b: pa.Table) -> pa.Table:
        f = b["f"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = b["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        rec = anchor - b["lastd"].to_numpy(zero_copy_only=False)
        rb = np.where(rec < RFM_R_DAYS[0], 2,
                      np.where(rec < RFM_R_DAYS[1], 1, 0))
        fb = np.where(f >= RFM_F[0], 2, np.where(f >= RFM_F[1], 1, 0))
        mb = np.where(m >= RFM_M_CENTS[0], 2,
                      np.where(m >= RFM_M_CENTS[1], 1, 0))
        key = rb * 100 + fb * 10 + mb
        u, c = np.unique(key, return_counts=True)
        return pa.table({
            "seg": pa.array(u, pa.int64()),
            "n": pa.array(c.astype(np.int64), pa.int64()),
        })

    from ray.data.aggregate import Sum as Sum2

    agg = cust.map_batches(bucket, batch_format="pyarrow") \
        .groupby("seg").aggregate(Sum2("n", alias_name="n_customers"))

    def split(b: pa.Table) -> pa.Table:
        seg = b["seg"].to_numpy(zero_copy_only=False)
        return pa.table({
            "r_bucket": pa.array(seg // 100, pa.int64()),
            "f_bucket": pa.array(seg // 10 % 10, pa.int64()),
            "m_bucket": pa.array(seg % 10, pa.int64()),
            "n_customers": pc.cast(b["n_customers"], pa.int64()),
        })

    return agg.map_batches(split, batch_format="pyarrow")


QUADKEY_Z = 12


def q_quadkey_cells(sf_dir: str):
    """Bing-style quadkey addresses for point features at z-12 (the
    interleaved-bit tile naming used by Bing/Azure maps; the base-4
    string prefix property gives ancestor containment for free). Fully
    vectorized: digit matrix from bit shifts, one tobytes/frombuffer
    reshape to fixed-width strings — no per-row loop."""
    from ..index.xyz import tile_xy
    from .queries import _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")
    z = QUADKEY_Z

    def keys(b: pa.Table) -> pa.Table:
        lon = b["bbox_minx"].to_numpy(zero_copy_only=False)
        lat = b["bbox_miny"].to_numpy(zero_copy_only=False)
        x, y = tile_xy(lon, lat, z)
        x = x.astype(np.int64)
        y = y.astype(np.int64)
        n = len(x)
        digits = np.empty((n, z), np.uint8)
        for i in range(1, z + 1):  # z=12 iterations, each vectorized
            digits[:, i - 1] = (((x >> (z - i)) & 1)
                                + 2 * ((y >> (z - i)) & 1) + 48)
        qk = np.frombuffer(digits.tobytes(), dtype=f"S{z}")
        return pa.table({
            "doc_id": b["doc_id"],
            "span_idx": pc.cast(b["span_idx"], pa.int64()),
            "quadkey": pa.array([s.decode() for s in qk], pa.string()),
        })

    return pts.map_batches(keys, batch_format="pyarrow")


def q_grid_morphology(sf_dir: str):
    """Morphological profile of the occupied z-10 tile grid — the
    raster dilation/erosion pass (coverage growth / interior core) in
    one 9-cell fan-out + one groupby: n_occupied, n_dilated (occupied ∪
    8-neighborhood), n_eroded (occupied tiles whose 8 neighbors are all
    occupied). One summary row; SQL parity via DISTINCT self-joins."""
    from ray.data.aggregate import Sum

    from ..index.xyz import tile_xy
    from .queries import _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")
    z = SMOOTH_Z

    def tiles(b: pa.Table) -> pa.Table:
        lon = b["bbox_minx"].to_numpy(zero_copy_only=False)
        lat = b["bbox_miny"].to_numpy(zero_copy_only=False)
        x, y = tile_xy(lon, lat, z)
        key = (x.astype(np.int64) << 32) | y.astype(np.int64)
        uk = np.unique(key)
        return pa.table({"k": pa.array(uk, pa.int64()),
                         "one": pa.array(np.ones(len(uk), np.int64),
                                         pa.int64())})

    occ = pts.map_batches(tiles, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("one", alias_name="one"))

    def fan_out(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        x, y = k >> 32, k & 0xFFFFFFFF
        one = np.ones(len(k), np.int64)
        zero = np.zeros(len(k), np.int64)
        ks, degs, cns = [], [], []
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                center = dx == 1 and dy == 1
                ks.append(((x + dx) << 32) | (y + dy))
                degs.append(zero if center else one)
                cns.append(one if center else zero)
        return pa.table({
            "k": pa.array(np.concatenate(ks), pa.int64()),
            "deg": pa.array(np.concatenate(degs), pa.int64()),
            "cn": pa.array(np.concatenate(cns), pa.int64()),
        })

    agg = occ.map_batches(fan_out, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("deg", alias_name="deg"),
                                Sum("cn", alias_name="cn"))

    def summarize(b: pa.Table) -> pa.Table:
        cn = b["cn"].to_numpy(zero_copy_only=False)
        deg = b["deg"].to_numpy(zero_copy_only=False)
        occ_n = int((cn > 0).sum())
        dil = len(cn)  # every key the fan-out touched
        ero = int(((cn > 0) & (deg == 8)).sum())
        return pa.table({
            "n_occupied": pa.array([occ_n], pa.int64()),
            "n_dilated": pa.array([dil], pa.int64()),
            "n_eroded": pa.array([ero], pa.int64()),
        })

    parts = agg.map_batches(summarize, batch_format="pyarrow").take_all()
    return pa.table({
        "n_occupied": pa.array(
            [sum(r["n_occupied"] for r in parts)], pa.int64()),
        "n_dilated": pa.array(
            [sum(r["n_dilated"] for r in parts)], pa.int64()),
        "n_eroded": pa.array(
            [sum(r["n_eroded"] for r in parts)], pa.int64()),
    })


CLUSTER_MINPTS = 2
CLUSTER_MAX_ITERS = 24


def q_tile_clusters(sf_dir: str):
    """Grid-density clustering (the DBSCAN shape on the tile grid):
    connected components of 8-adjacent z-10 tiles holding >= 2 points.
    Distributed min-label propagation exactly like dedup_clusters: each
    round every core tile broadcasts its label to its 9-cell
    neighborhood through ONE fan-out + groupby-min (the center row
    carries the old label and the point count), and the loop stops when
    no label changed (diameter-bounded; loud error past the iteration
    cap). Output: one row per cluster (root tile coords, tile count,
    point count). Exact — the DuckDB oracle is a recursive-CTE
    transitive closure."""
    from ray.data.aggregate import Max, Min, Sum

    from ..index.xyz import tile_xy
    from .queries import _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")
    z = SMOOTH_Z

    def tiles(b: pa.Table) -> pa.Table:
        lon = b["bbox_minx"].to_numpy(zero_copy_only=False)
        lat = b["bbox_miny"].to_numpy(zero_copy_only=False)
        x, y = tile_xy(lon, lat, z)
        key = (x.astype(np.int64) << 32) | y.astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(uk, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    occ = pts.map_batches(tiles, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n", alias_name="n"))

    def core_init(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["n"], CLUSTER_MINPTS))
        return pa.table({
            "k": t["k"],
            "label": t["k"],
            "n": pc.cast(t["n"], pa.int64()),
        })

    state = occ.map_batches(core_init,
                            batch_format="pyarrow").materialize()

    def fan_out(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        lab = b["label"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = k >> 32, k & 0xFFFFFFFF
        zero = np.zeros(len(k), np.int64)
        ks, ls, olds, cns, ns = [], [], [], [], []
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                center = dx == 1 and dy == 1
                ks.append(((x + dx) << 32) | (y + dy))
                ls.append(lab)
                olds.append(lab if center else zero)
                cns.append(np.ones(len(k), np.int64) if center else zero)
                ns.append(n if center else zero)
        return pa.table({
            "k": pa.array(np.concatenate(ks), pa.int64()),
            "label": pa.array(np.concatenate(ls), pa.int64()),
            "old": pa.array(np.concatenate(olds), pa.int64()),
            "cn": pa.array(np.concatenate(cns), pa.int64()),
            "n": pa.array(np.concatenate(ns), pa.int64()),
        })

    def keep_core(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b["cn"], 0))
        kk = t["k"].to_numpy(zero_copy_only=False)
        # undo the +1 fan-out shift so state keys stay stable
        real = (((kk >> 32) - 1) << 32) | ((kk & 0xFFFFFFFF) - 1)
        return pa.table({
            "k": pa.array(real, pa.int64()),
            "label": pc.cast(t["label"], pa.int64()),
            "old": pc.cast(t["old"], pa.int64()),
            "n": pc.cast(t["n"], pa.int64()),
        })

    for _ in range(CLUSTER_MAX_ITERS):
        nxt = state.map_batches(fan_out, batch_format="pyarrow") \
            .groupby("k").aggregate(Min("label", alias_name="label"),
                                    Max("old", alias_name="old"),
                                    Sum("cn", alias_name="cn"),
                                    Sum("n", alias_name="n")) \
            .map_batches(keep_core, batch_format="pyarrow").materialize()
        changed = nxt.map_batches(
            lambda b: pa.table({"c": pa.array(
                [int(pc.sum(pc.cast(pc.less(b["label"], b["old"]),
                                    pa.int64())).as_py() or 0)],
                pa.int64())}),
            batch_format="pyarrow").sum("c")
        state = nxt.drop_columns(["old"]).materialize()
        if not changed:
            break
    else:
        raise RuntimeError(
            f"tile_clusters: no convergence in {CLUSTER_MAX_ITERS} "
            "iterations (cluster diameter exceeds the cap)")

    def final(b: pa.Table) -> pa.Table:
        return pa.table({"label": b["label"],
                         "one": pa.array(np.ones(b.num_rows, np.int64),
                                         pa.int64()),
                         "n": b["n"]})

    agg = state.map_batches(final, batch_format="pyarrow") \
        .groupby("label").aggregate(Sum("one", alias_name="n_tiles"),
                                    Sum("n", alias_name="n_points"))

    def widen(b: pa.Table) -> pa.Table:
        lab = b["label"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cluster_x": pa.array(lab >> 32, pa.int64()),
            "cluster_y": pa.array(lab & 0xFFFFFFFF, pa.int64()),
            "n_tiles": pc.cast(b["n_tiles"], pa.int64()),
            "n_points": pc.cast(b["n_points"], pa.int64()),
        })

    return agg.map_batches(widen, batch_format="pyarrow")


def q_sliding_distinct(sf_dir: str):
    """Distinct users per sliding 1h window (every 30 min) — windowed
    COUNT DISTINCT: each event lands in two windows, (window, user)
    pairs dedupe block-locally into fused int64 keys, ONE pair shuffle,
    then the per-window count — the pair-dedup distinct pattern applied
    to overlapping windows (the shuffle carries distinct pairs, never
    events)."""
    from ray.data.aggregate import Count, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def pairs(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[s]").astype(np.int64)
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(u) and (u.max() >= 1 << 32 or u.min() < 0):
            raise ValueError("sliding_distinct: user_id outside [0, 2^32)")
        ws0 = (epoch // 1800) * 1800
        if len(ws0) and ws0.max() >= 1 << 31:
            raise ValueError("sliding_distinct: epoch >= 2^31")
        ws = np.concatenate([ws0, ws0 - 1800])
        uu = np.concatenate([u, u])
        fused = np.unique((ws << 32) | uu)
        return pa.table({"k": pa.array(fused, pa.int64())})

    dedup = ev.map_batches(pairs, batch_format="pyarrow") \
        .groupby("k").aggregate(Count(alias_name="_c"))

    def per_window(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        ws, cnt = np.unique(k >> 32, return_counts=True)
        return pa.table({"ws": pa.array(ws, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    agg = dedup.map_batches(per_window, batch_format="pyarrow") \
        .groupby("ws").aggregate(Sum("n", alias_name="n_users"))

    def widen(b: pa.Table) -> pa.Table:
        ws = b["ws"].to_numpy(zero_copy_only=False)
        return pa.table({
            "window_start": pa.array((ws * 1_000_000)
                                     .astype("datetime64[us]"),
                                     pa.timestamp("us")),
            "n_users": pc.cast(b["n_users"], pa.int64()),
        })

    return agg.map_batches(widen, batch_format="pyarrow")


def q_conversion_latency(sf_dir: str):
    """Per-user conversion-latency profile: click events as-of joined to
    the user's most recent prior view (the events_asof kernel), latency
    in whole seconds, grouped per user into (n_conv, min_s, max_s,
    sum_s) — all integer-exact. DuckDB mirrors with ASOF JOIN."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..stages import join as join_stage

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    clicks = ev.filter(expr="event_type == 'click'")
    views = ev.filter(expr="event_type == 'view'") \
        .map_batches(lambda b: b.append_column("view_ts", b["ts"]),
                     batch_format="pyarrow")
    out = join_stage.asof_join(
        clicks, views, by="user_id", on="ts",
        left_cols=["event_id"], right_cols=["view_ts"])

    def latency(b: pa.Table) -> pa.Table:
        lt = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        rt_raw = b["right_view_ts"].to_numpy(zero_copy_only=False)
        matched = ~pd_isnull(rt_raw)
        rt = np.where(matched,
                      rt_raw.astype("datetime64[us]").astype(np.int64), 0)
        lat_s = (lt - rt) // 1_000_000
        t = pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "lat_s": pa.array(lat_s, pa.int64()),
        })
        return t.filter(pa.array(matched))

    lats = out.map_batches(latency, batch_format="pyarrow")
    agg = lats.groupby("user_id").aggregate(
        Count(alias_name="n_conv"),
        Min("lat_s", alias_name="min_s"),
        Max("lat_s", alias_name="max_s"),
        Sum("lat_s", alias_name="sum_s"))

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "n_conv": pc.cast(b["n_conv"], pa.int64()),
            "min_s": pc.cast(b["min_s"], pa.int64()),
            "max_s": pc.cast(b["max_s"], pa.int64()),
            "sum_s": pc.cast(b["sum_s"], pa.int64()),
        })

    return agg.map_batches(widen, batch_format="pyarrow")


def pd_isnull(arr):
    import pandas as pd

    return pd.isnull(arr)


CONC_TOPK = 10


def q_revenue_concentration(sf_dir: str):
    """Per-nation revenue-concentration curve point: total order revenue
    (integer cents), the top-10-customer slice, and its share in ppm —
    the whale-account concentration report. Distributed: per-block
    (custkey, cents) partials → custkey join to the customer dimension
    for nationkey → fused (nation, customer) groupby → per-nation
    top-k + totals in ONE map_groups over the 25 nation groups
    (cents-desc, custkey-asc tie-break, mirrored in the SQL window);
    share_ppm = floor(top10·1e6 / total) in exact integers."""
    from ray.data.aggregate import Sum

    from ..stages import relational

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def ord_partial(b: pa.Table) -> pa.Table:
        ck = relational._np(b["o_custkey"]).astype(np.int64)
        cents = np.floor(relational._np(b["o_totalprice"]) * 100.0
                         + 0.5).astype(np.int64)
        order = np.argsort(ck, kind="stable")
        ck_s, c_s = ck[order], cents[order]
        starts = np.ones(len(ck_s), bool)
        starts[1:] = ck_s[1:] != ck_s[:-1]
        idx = np.nonzero(starts)[0]
        return pa.table({
            "custkey": pa.array(ck_s[idx], pa.int64()),
            "cents": pa.array(np.add.reduceat(c_s, idx), pa.int64()),
        })

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])

    def cust_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": pc.cast(b["c_custkey"], pa.int64()),
            "nk": pc.cast(b["c_nationkey"], pa.int64()),
        })

    j = relational.hash_join_i64(
        orders.map_batches(ord_partial, batch_format="pyarrow"),
        cust.map_batches(cust_slim, batch_format="pyarrow"),
        key="custkey",
        left_carry={"cents": pa.int64()},
        right_carry={"nk": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    def part2(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_nk", pc.cast(b["nk"], pa.int32()))

    def per_nation(t: pa.Table) -> pa.Table:
        ck = t["custkey"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        nk = int(t["nk"][0].as_py())
        # collapse duplicate custkeys (join emits one row per partial)
        order = np.lexsort((ck,))
        ck_s, c_s = ck[order], cents[order]
        starts = np.ones(len(ck_s), bool)
        starts[1:] = ck_s[1:] != ck_s[:-1]
        idx = np.nonzero(starts)[0]
        cust_cents = np.add.reduceat(c_s, idx)
        cust_ids = ck_s[idx]
        total = int(cust_cents.sum())
        rank = np.lexsort((cust_ids, -cust_cents))[:CONC_TOPK]
        top = int(cust_cents[rank].sum())
        share = top * 1_000_000 // total if total else 0
        return pa.table({
            "nk": pa.array([nk], pa.int64()),
            "total_cents": pa.array([total], pa.int64()),
            "top10_cents": pa.array([top], pa.int64()),
            "share_ppm": pa.array([share], pa.int64()),
        })

    per_nk = j.map_batches(part2, batch_format="pyarrow") \
        .groupby("_nk").map_groups(per_nation, batch_format="pyarrow")

    import pyarrow.parquet as _pq

    nation = _pq.read_table(f"{sf_dir}/nation.parquet",
                            columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nation["n_nationkey"].to_pylist(),
                    nation["n_name"].to_pylist()))

    def widen(b: pa.Table) -> pa.Table:
        nk = b["nk"].to_pylist()
        return pa.table({
            "n_name": pa.array([nmap[k] for k in nk], pa.string()),
            "total_cents": b["total_cents"],
            "top10_cents": b["top10_cents"],
            "share_ppm": b["share_ppm"],
        })

    return per_nk.map_batches(widen, batch_format="pyarrow")


def q_revenue_gini(sf_dir: str):
    """Per-nation Gini coefficient of customer revenue in exact integer
    ppm: G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over ascending sorted
    customer revenues (custkey tie-break) — numerator and denominator
    are exact integer sums, the ratio truncates to ppm identically to
    the DuckDB HUGEINT mirror. Same join shape as
    revenue_concentration; one map_groups over the 25 nation groups."""
    from ..stages import relational

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def ord_partial(b: pa.Table) -> pa.Table:
        ck = relational._np(b["o_custkey"]).astype(np.int64)
        cents = np.floor(relational._np(b["o_totalprice"]) * 100.0
                         + 0.5).astype(np.int64)
        order = np.argsort(ck, kind="stable")
        ck_s, c_s = ck[order], cents[order]
        starts = np.ones(len(ck_s), bool)
        starts[1:] = ck_s[1:] != ck_s[:-1]
        idx = np.nonzero(starts)[0]
        return pa.table({
            "custkey": pa.array(ck_s[idx], pa.int64()),
            "cents": pa.array(np.add.reduceat(c_s, idx), pa.int64()),
        })

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])

    def cust_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": pc.cast(b["c_custkey"], pa.int64()),
            "nk": pc.cast(b["c_nationkey"], pa.int64()),
        })

    j = relational.hash_join_i64(
        orders.map_batches(ord_partial, batch_format="pyarrow"),
        cust.map_batches(cust_slim, batch_format="pyarrow"),
        key="custkey",
        left_carry={"cents": pa.int64()},
        right_carry={"nk": pa.int64()},
        P=relational.adaptive_parts(sf_dir))

    def per_nation(t: pa.Table) -> pa.Table:
        ck = t["custkey"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        nk = int(t["nk"][0].as_py())
        order = np.lexsort((ck,))
        ck_s, c_s = ck[order], cents[order]
        starts = np.ones(len(ck_s), bool)
        starts[1:] = ck_s[1:] != ck_s[:-1]
        idx = np.nonzero(starts)[0]
        x = np.add.reduceat(c_s, idx)
        ids = ck_s[idx]
        asc = np.lexsort((ids, x))  # ascending revenue, custkey tie-break
        xs = x[asc]
        n = len(xs)
        sx = int(xs.sum())
        # Σ i·x_(i), i = 1..n — python ints (n·x can pass 2^63 at scale)
        ix = sum((i + 1) * int(v) for i, v in enumerate(xs))
        num = 2 * ix - (n + 1) * sx
        den = n * sx
        gini = num * 1_000_000 // den if den else 0
        return pa.table({
            "nk": pa.array([nk], pa.int64()),
            "n_customers": pa.array([n], pa.int64()),
            "gini_ppm": pa.array([gini], pa.int64()),
        })

    per_nk = j.map_batches(
        lambda b: b.append_column("_nk", pc.cast(b["nk"], pa.int32())),
        batch_format="pyarrow") \
        .groupby("_nk").map_groups(per_nation, batch_format="pyarrow")

    import pyarrow.parquet as _pq

    nation = _pq.read_table(f"{sf_dir}/nation.parquet",
                            columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nation["n_nationkey"].to_pylist(),
                    nation["n_name"].to_pylist()))

    def widen(b: pa.Table) -> pa.Table:
        nk = b["nk"].to_pylist()
        return pa.table({
            "n_name": pa.array([nmap[k] for k in nk], pa.string()),
            "n_customers": b["n_customers"],
            "gini_ppm": b["gini_ppm"],
        })

    return per_nk.map_batches(widen, batch_format="pyarrow")


def q_tile_hhi(sf_dir: str):
    """Spatial concentration of point density: the Simpson / HHI index
    over occupied z-10 tiles, hhi_ppm = floor(Σ n_i² · 1e6 / S²) — the
    integer-exact evenness statistic (1e6/occupied = perfectly even,
    →1e6 = all points in one tile). One tile-count groupby, one
    partial-sums pass; ratio in arbitrary-precision integers."""
    from ray.data.aggregate import Sum

    from ..index.xyz import tile_xy
    from .queries import _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")
    z = SMOOTH_Z

    def tiles(b: pa.Table) -> pa.Table:
        lon = b["bbox_minx"].to_numpy(zero_copy_only=False)
        lat = b["bbox_miny"].to_numpy(zero_copy_only=False)
        x, y = tile_xy(lon, lat, z)
        key = (x.astype(np.int64) << 32) | y.astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(uk, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    occ = pts.map_batches(tiles, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n", alias_name="n"))

    def partials(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "s": pa.array([int(n.sum())], pa.int64()),
            "sq": pa.array([int((n * n).sum())], pa.int64()),
            "tiles": pa.array([len(n)], pa.int64()),
        })

    parts = occ.map_batches(partials, batch_format="pyarrow").take_all()
    s = sum(int(r["s"]) for r in parts)
    sq = sum(int(r["sq"]) for r in parts)
    tiles_n = sum(int(r["tiles"]) for r in parts)
    hhi = sq * 1_000_000 // (s * s) if s else 0
    return pa.table({
        "n_tiles": pa.array([tiles_n], pa.int64()),
        "n_points": pa.array([s], pa.int64()),
        "hhi_ppm": pa.array([hhi], pa.int64()),
    })


_DIRS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
         if (dx, dy) != (0, 0)]


def _tri_table() -> np.ndarray:
    """256-entry lookup: for an 8-bit neighbor-occupancy mask (bit i =
    neighbor in direction _DIRS[i] occupied), the number of occupied
    neighbor PAIRS that are themselves 8-adjacent — i.e. triangles
    through this vertex."""
    adj_pairs = []
    for i, (ax, ay) in enumerate(_DIRS):
        for j in range(i + 1, len(_DIRS)):
            bx, by = _DIRS[j]
            if abs(ax - bx) <= 1 and abs(ay - by) <= 1:
                adj_pairs.append((i, j))
    out = np.zeros(256, np.int64)
    for m in range(256):
        out[m] = sum(1 for i, j in adj_pairs
                     if (m >> i) & 1 and (m >> j) & 1)
    return out


def q_tile_triangles(sf_dir: str):
    """Distributed triangle counting on the occupied-tile 8-adjacency
    graph (the clustering-structure primitive of graph analytics, on
    the grid graph): ONE fan-out where each occupied tile sends a
    DIRECTION BIT to each neighbor slot, one groupby summing bits into
    an 8-bit occupancy mask per tile, then a 256-entry lookup counts
    the adjacent neighbor pairs (triangles through that vertex); the
    global count divides by 3. Edges come from the same mask
    (popcount/2). SQL mirror: ordered three-way self-join."""
    from ray.data.aggregate import Sum

    from ..index.xyz import tile_xy
    from .queries import _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")
    z = SMOOTH_Z

    def tiles(b: pa.Table) -> pa.Table:
        lon = b["bbox_minx"].to_numpy(zero_copy_only=False)
        lat = b["bbox_miny"].to_numpy(zero_copy_only=False)
        x, y = tile_xy(lon, lat, z)
        uk = np.unique((x.astype(np.int64) << 32) | y.astype(np.int64))
        return pa.table({"k": pa.array(uk, pa.int64()),
                         "one": pa.array(np.ones(len(uk), np.int64),
                                         pa.int64())})

    occ = pts.map_batches(tiles, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("one", alias_name="one"))

    def fan_out(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        x, y = k >> 32, k & 0xFFFFFFFF
        one = np.ones(len(k), np.int64)
        zero = np.zeros(len(k), np.int64)
        ks, bits, cns = [], [], []
        # center marker
        ks.append(((x + 1) << 32) | (y + 1))
        bits.append(zero)
        cns.append(one)
        for i, (dx, dy) in enumerate(_DIRS):
            # this tile occupies the neighbor's OPPOSITE direction slot
            ks.append(((x + dx + 1) << 32) | (y + dy + 1))
            opp = _DIRS.index((-dx, -dy))
            bits.append(np.full(len(k), 1 << opp, np.int64))
            cns.append(zero)
        return pa.table({
            "k": pa.array(np.concatenate(ks), pa.int64()),
            "bit": pa.array(np.concatenate(bits), pa.int64()),
            "cn": pa.array(np.concatenate(cns), pa.int64()),
        })

    agg = occ.map_batches(fan_out, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("bit", alias_name="mask"),
                                Sum("cn", alias_name="cn"))
    tri_tab = _tri_table()
    pop = np.array([bin(m).count("1") for m in range(256)], np.int64)

    def partials(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b["cn"], 0))
        mask = t["mask"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "tiles": pa.array([len(mask)], pa.int64()),
            "deg2": pa.array([int(pop[mask].sum())], pa.int64()),
            "tri3": pa.array([int(tri_tab[mask].sum())], pa.int64()),
        })

    parts = agg.map_batches(partials, batch_format="pyarrow").take_all()
    n_tiles = sum(int(r["tiles"]) for r in parts)
    deg2 = sum(int(r["deg2"]) for r in parts)
    tri3 = sum(int(r["tri3"]) for r in parts)
    assert deg2 % 2 == 0 and tri3 % 3 == 0
    return pa.table({
        "n_tiles": pa.array([n_tiles], pa.int64()),
        "n_edges": pa.array([deg2 // 2], pa.int64()),
        "n_triangles": pa.array([tri3 // 3], pa.int64()),
    })


TREND_TOPK = 3


def q_trending_parts(sf_dir: str):
    """Daily trending parts: the top-3 parts per ship-day by lineitem
    count (count-desc, partkey-asc tie-break) — the per-window top-k
    'trending items' analytic. Per-block fused (day, part) partials →
    one groupby → per-day top-k in a map_groups over day groups (the
    day domain is bounded); SQL mirror is the ROW_NUMBER window."""
    from ray.data.aggregate import Sum

    from ..stages import relational

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        pk = relational._np(b["l_partkey"]).astype(np.int64)
        day = relational._ts_us(b["l_shipdate"]) // 86_400_000_000
        if len(pk) and pk.max() >= 1 << 31:
            raise ValueError("trending_parts: partkey >= 2^31")
        fused = (day << 32) | pk
        uk, cnt = np.unique(fused, return_counts=True)
        return pa.table({"k": pa.array(uk, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    agg = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n", alias_name="n"))

    def addday(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "_day", pa.array((k >> 32).astype(np.int32), pa.int32()))

    def topk(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = int(k[0] >> 32)
        pk = k & 0xFFFFFFFF
        order = np.lexsort((pk, -n))[:TREND_TOPK]
        ranks = np.arange(1, len(order) + 1, dtype=np.int64)
        return pa.table({
            "day_us": pa.array(
                np.full(len(order), day, np.int64) * 86_400_000_000,
                pa.int64()),
            "l_partkey": pa.array(pk[order], pa.int64()),
            "n": pa.array(n[order], pa.int64()),
            "rank": pa.array(ranks, pa.int64()),
        })

    out = agg.map_batches(addday, batch_format="pyarrow") \
        .groupby("_day").map_groups(topk, batch_format="pyarrow")

    def widen(b: pa.Table) -> pa.Table:
        d = b["day_us"].to_numpy(zero_copy_only=False)
        return pa.table({
            "ship_day": pa.array(d.astype("datetime64[us]"),
                                 pa.timestamp("us")),
            "l_partkey": b["l_partkey"],
            "n": b["n"],
            "rank": b["rank"],
        })

    return out.map_batches(widen, batch_format="pyarrow")


def q_daily_value_median(sf_dir: str):
    """Time-sliced distribution dashboard: per (event_type, day) exact
    median of value in integer milli-units (quantile_disc semantics) —
    the fused-key composition of the value-count histogram shuffle
    (stages/stats.group_quantiles), split back after the quantile pass.
    \\x1f fuse separator per the repo convention."""
    from ..stages import stats as stats_stage

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy(zero_copy_only=False)
        day = (ts.astype("datetime64[us]").astype(np.int64)
               // 86_400_000_000)
        vm = np.floor(b["value"].to_numpy(zero_copy_only=False) * 1000.0
                      + 0.5).astype(np.int64)
        et = b["event_type"]
        g = pc.binary_join_element_wise(
            et, pa.array([str(d) for d in day], pa.string()), "\x1f")
        return pa.table({"g": g, "vm": pa.array(vm, pa.int64())})

    rows = stats_stage.group_quantiles(
        ev.map_batches(prep, batch_format="pyarrow"),
        "g", "vm", [0.5], ["p50_milli"])

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["g"], "\x1f")
        day = np.asarray(
            [int(v) for v in pc.list_element(parts, 1).to_pylist()],
            np.int64) * 86_400_000_000
        return pa.table({
            "event_type": pc.list_element(parts, 0),
            "day": pa.array(day.astype("datetime64[us]"),
                            pa.timestamp("us")),
            "n_rows": pc.cast(b["n_rows"], pa.int64()),
            "p50_milli": pc.cast(b["p50_milli"], pa.int64()),
        })

    return rows.map_batches(split, batch_format="pyarrow")


def q_winsorized_sum(sf_dir: str):
    """Robust-statistics prep: per event_type, the p05/p95 fences
    (quantile_disc, integer milli) and the winsorized sum — every value
    clipped into [p05, p95] before summing. Two composed passes: the
    histogram-quantile shuffle for the fences (broadcast — the type
    domain is tiny), then one clip+sum scan; all integers, exact."""
    from ray.data.aggregate import Count, Sum

    from ..stages import stats as stats_stage

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        vm = np.floor(b["value"].to_numpy(zero_copy_only=False) * 1000.0
                      + 0.5).astype(np.int64)
        return pa.table({"event_type": b["event_type"],
                         "vm": pa.array(vm, pa.int64())})

    prepped = ev.map_batches(prep, batch_format="pyarrow")
    fences = stats_stage.group_quantiles(
        prepped, "event_type", "vm", [0.05, 0.95],
        ["p05_milli", "p95_milli"]).take_all()
    lo = {r["event_type"]: int(r["p05_milli"]) for r in fences}
    hi = {r["event_type"]: int(r["p95_milli"]) for r in fences}
    ref = ray.put((lo, hi))

    def clip(b: pa.Table) -> pa.Table:
        l, h = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        et = b["event_type"].to_pylist()
        vm = b["vm"].to_numpy(zero_copy_only=False)
        lo_v = np.fromiter((l[t] for t in et), np.int64, count=len(et))
        hi_v = np.fromiter((h[t] for t in et), np.int64, count=len(et))
        c = np.clip(vm, lo_v, hi_v)
        return pa.table({"event_type": b["event_type"],
                         "c": pa.array(c, pa.int64())})

    agg = prepped.map_batches(clip, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Count(alias_name="n"),
            Sum("c", alias_name="winsorized_sum_milli"))

    def widen(b: pa.Table) -> pa.Table:
        l, h = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        et = b["event_type"].to_pylist()
        return pa.table({
            "event_type": b["event_type"],
            "n": pc.cast(b["n"], pa.int64()),
            "p05_milli": pa.array([l[t] for t in et], pa.int64()),
            "p95_milli": pa.array([h[t] for t in et], pa.int64()),
            "winsorized_sum_milli": pc.cast(b["winsorized_sum_milli"],
                                            pa.int64()),
        })

    return agg.map_batches(widen, batch_format="pyarrow")


def q_arrival_dispersion(sf_dir: str):
    """Burstiness profile: per event_type, the Fano factor of
    inter-arrival gaps (variance/mean) in exact integer ppm via
    cross-multiplication — fano_ppm = floor((n·Σd² − (Σd)²)·1e6 /
    ((n−1)·Σd·n/n)) computed as (nΣd² − (Σd)²)·1e6 // ((n−1)·Σd) over
    whole-second gaps ordered by (ts, event_id). One type-hash shuffle
    (the type domain is tiny) + one lexsort per group; the final ratio
    is arbitrary-precision Python int."""
    from ..stages import relational

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type"])
    P = 8

    def addpart(b: pa.Table) -> pa.Table:
        import zlib

        et = b["event_type"].to_pylist()
        part = np.fromiter((zlib.crc32(t.encode()) % P for t in et),
                           np.int32, count=len(et))
        return b.append_column("_part", pa.array(part, pa.int32()))

    def disp(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_pylist()
        ts = relational._ts_us(t["ts"])
        eid = relational._np(t["event_id"]).astype(np.int64)
        codes = pa.array(et).dictionary_encode()
        dc = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        names = codes.dictionary.to_pylist()
        order = np.lexsort((eid, ts, dc))
        dc_s, ts_s = dc[order], ts[order]
        same = np.zeros(len(dc_s), bool)
        same[1:] = dc_s[1:] == dc_s[:-1]
        idx = np.nonzero(same)[0]
        d = (ts_s[idx] - ts_s[idx - 1]) // 1_000_000  # whole seconds
        gd = dc_s[idx]
        out_t, out_n, out_s, out_f = [], [], [], []
        for code in np.unique(gd):
            ds_ = d[gd == code]
            n = len(ds_)
            sd = int(ds_.sum())
            sq = sum(int(v) * int(v) for v in ds_)
            fano = ((n * sq - sd * sd) * 1_000_000 // ((n - 1) * sd)
                    if n > 1 and sd else 0)
            out_t.append(names[int(code)])
            out_n.append(n)
            out_s.append(sd)
            out_f.append(fano)
        return pa.table({
            "event_type": pa.array(out_t, pa.string()),
            "n_gaps": pa.array(out_n, pa.int64()),
            "sum_gap_s": pa.array(out_s, pa.int64()),
            "fano_ppm": pa.array(out_f, pa.int64()),
        })

    return ev.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(disp, batch_format="pyarrow")


def q_lang_centroids(sf_dir: str):
    """Cross-table text×vector analytics: per-LANGUAGE embedding
    centroids — embeddings hash-joined to the documents dimension on
    vec_id = doc_id (embeddings ride the shuffle as single binary
    blobs, the list-column pitfall), then the label_centroids
    binary-blob partial-sum aggregate keyed by lang. Long-form output
    (lang, dim, n, centroid_micro) with the final-scalar micro rounding
    contract of label_centroids."""
    from ray.data.aggregate import Sum

    from ..stages import relational
    from ..stages.ann import _to_matrix

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])

    def emb_slim(b: pa.Table) -> pa.Table:
        M = _to_matrix(b["embedding"], dtype=np.float64)
        return pa.table({
            "id": pc.cast(b["vec_id"], pa.int64()),
            "eblob": pa.array([r.tobytes() for r in M], pa.binary()),
        })

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])

    def doc_slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "id": pc.cast(b["doc_id"], pa.int64()),
            "lang": b["lang"],
        })

    j = relational.hash_join_i64(
        emb.map_batches(emb_slim, batch_format="pyarrow"),
        docs.map_batches(doc_slim, batch_format="pyarrow"),
        key="id",
        left_carry={"eblob": pa.binary()},
        right_carry={"lang": pa.string()},
        P=relational.adaptive_parts(sf_dir))

    def partial(b: pa.Table) -> pa.Table:
        blobs = b["eblob"].to_pylist()
        M = np.frombuffer(b"".join(blobs), np.float64) \
            .reshape(len(blobs), -1)
        lang = b["lang"].to_pylist()
        enc = pa.array(lang).dictionary_encode()
        inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        sums = np.zeros((k, M.shape[1]), np.float64)
        np.add.at(sums, inv, M)
        n = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.table({
            "lang": enc.dictionary,
            "n": pa.array(n, pa.int64()),
            "vsum": pa.array([s.tobytes() for s in sums], pa.binary()),
        })

    def merge(t: pa.Table) -> pa.Table:
        blobs = t["vsum"].to_pylist()
        mat = np.frombuffer(b"".join(blobs), np.float64) \
            .reshape(len(blobs), -1)
        total = mat.sum(axis=0)
        n = int(t["n"].to_numpy(zero_copy_only=False).sum())
        d = mat.shape[1]
        mean = total / n
        return pa.table({
            "lang": pa.array([t["lang"][0].as_py()] * d, pa.string()),
            "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
            "n": pa.array(np.full(d, n, np.int64), pa.int64()),
            "centroid_micro": pa.array(
                np.floor(mean * 1e6 + 0.5).astype(np.int64), pa.int64()),
        })

    return j.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang").map_groups(merge, batch_format="pyarrow")


def q_pip_counts(sf_dir: str):
    """Spatial aggregation: contained-point count per polygon — the
    canonical choropleth query, composed as the size-switched PIP join
    followed by a per-polygon count groupby (pairs collapse to one row
    per polygon before leaving the join stage's output)."""
    from ray.data.aggregate import Sum

    from ..stages import join as join_stage
    from .queries import _features_ds

    polys = _features_ds(sf_dir).filter(expr="geom_type == 3")
    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")
    out = join_stage.pip_join_auto(pts, polys)

    def partial(b: pa.Table) -> pa.Table:
        enc = b["polygon_id"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table({
            "polygon_id": enc.dictionary,
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    agg = out.map_batches(partial, batch_format="pyarrow") \
        .groupby("polygon_id").aggregate(Sum("n", alias_name="n_points"))

    def widen(b: pa.Table) -> pa.Table:
        return pa.table({
            "polygon_id": b["polygon_id"],
            "n_points": pc.cast(b["n_points"], pa.int64()),
        })

    return agg.map_batches(widen, batch_format="pyarrow")


def q_span_path_length(sf_dir: str):
    """Per-document trajectory length: the geodesic path through the
    doc's POINT spans in SPAN ORDER (the interleaved input_hint's
    span-sequence invariant made load-bearing — reordering spans changes
    the answer). One doc-hash shuffle + lexsort by (doc, span_idx) +
    per-segment integer-mm haversine, exactly the window-kernel shape;
    docs with < 2 point spans drop out (mirrors SQL's LAG inner
    pairing)."""
    from ..geom.ops import haversine_m
    from ..stages import relational
    from .queries import _features_ds

    pts = _features_ds(sf_dir).filter(expr="geom_type == 1")
    P = 16

    def addpart(b: pa.Table) -> pa.Table:
        import zlib

        doc = b["doc_id"].to_pylist()
        part = np.fromiter(
            (zlib.crc32(d.encode()) % P for d in doc), np.int32,
            count=len(doc))
        return b.append_column("_part", pa.array(part, pa.int32()))

    def paths(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_pylist()
        si = t["span_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = t["bbox_minx"].to_numpy(zero_copy_only=False)
        lat = t["bbox_miny"].to_numpy(zero_copy_only=False)
        codes, uniq = pa.array(doc).dictionary_encode().indices, None
        dcode = codes.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((si, dcode))
        dc, lon_s, lat_s = dcode[order], lon[order], lat[order]
        n = len(dc)
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.string()),
                             "n_pts": pa.array([], pa.int64()),
                             "path_mm": pa.array([], pa.int64())})
        same = np.zeros(n, bool)
        same[1:] = dc[1:] == dc[:-1]
        s = np.nonzero(same)[0]  # segment end indices
        d = haversine_m(lon_s[s - 1], lat_s[s - 1], lon_s[s], lat_s[s])
        mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
        seg_doc = dc[s]
        uk, inv = np.unique(seg_doc, return_inverse=True)
        path = np.zeros(len(uk), np.int64)
        np.add.at(path, inv, mm)
        n_segs = np.bincount(inv)
        docs_sorted = pa.array(doc).take(pa.array(order))
        first_of = np.searchsorted(dc, uk)
        return pa.table({
            "doc_id": docs_sorted.take(pa.array(first_of)),
            "n_pts": pa.array(n_segs.astype(np.int64) + 1, pa.int64()),
            "path_mm": pa.array(path, pa.int64()),
        })

    out = pts.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(paths, batch_format="pyarrow")
    return out.map_batches(
        lambda b: b.select(["doc_id", "n_pts", "path_mm"]),
        batch_format="pyarrow")


ANOMALY_MILLI = 100_000  # value > 100.0


def q_anomaly_runs(sf_dir: str):
    """Gaps-and-islands anomaly detection: per user, the maximal runs
    of consecutive events (ordered by ts, event_id) whose value exceeds
    the threshold — run count, longest run, total anomalous events.
    One user-hash shuffle + one lexsort + run-length arithmetic per
    partition (the islands never leave their partition); integer-milli
    threshold compares identically across engines. SQL parity is the
    classic two-ROW_NUMBER islands trick."""
    from ..stages import relational

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    P = relational.adaptive_parts(sf_dir)

    def addpart(b: pa.Table) -> pa.Table:
        u = relational._np(b["user_id"]).astype(np.int64)
        return b.append_column(
            "_part", pa.array((u % P).astype(np.int32), pa.int32()))

    def runs(t: pa.Table) -> pa.Table:
        u = relational._np(t["user_id"]).astype(np.int64)
        ts = relational._ts_us(t["ts"])
        eid = relational._np(t["event_id"]).astype(np.int64)
        vm = np.floor(relational._np(t["value"]) * 1000.0
                      + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u_s, hot = u[order], vm[order] > ANOMALY_MILLI
        n = len(u_s)
        if n == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_runs": pa.array([], pa.int64()),
                             "longest_run": pa.array([], pa.int64()),
                             "n_anomalous": pa.array([], pa.int64())})
        new_user = np.ones(n, bool)
        new_user[1:] = u_s[1:] != u_s[:-1]
        prev_hot = np.zeros(n, bool)
        prev_hot[1:] = hot[:-1]
        start = hot & (new_user | ~prev_hot)
        s_idx = np.nonzero(start)[0]
        # run end: next index where hot stops or user changes
        stop = np.nonzero(~hot | new_user)[0]
        ends = np.searchsorted(stop, s_idx, side="right")
        e_idx = np.where(ends < len(stop), stop[np.minimum(
            ends, len(stop) - 1)], n)
        run_len = e_idx - s_idx
        run_user = u_s[s_idx]
        uk, inv = np.unique(run_user, return_inverse=True)
        n_runs = np.bincount(inv)
        longest = np.zeros(len(uk), np.int64)
        np.maximum.at(longest, inv, run_len)
        total = np.bincount(inv, weights=run_len).astype(np.int64)
        return pa.table({
            "user_id": pa.array(uk, pa.int64()),
            "n_runs": pa.array(n_runs.astype(np.int64), pa.int64()),
            "longest_run": pa.array(longest, pa.int64()),
            "n_anomalous": pa.array(total, pa.int64()),
        })

    out = ev.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(runs, batch_format="pyarrow")

    def widen(b: pa.Table) -> pa.Table:
        return b.select(["user_id", "n_runs", "longest_run",
                         "n_anomalous"])

    return out.map_batches(widen, batch_format="pyarrow")


BASKET_TOPK = 50


def q_basket_pairs(sf_dir: str):
    """Market-basket analysis: top-50 co-ordered part pairs with lift
    (the association-mining shape — PMI's transactional sibling).
    Distributed: one orderkey hash shuffle co-locates each order's
    items, pair expansion is a vectorized triangular fan-out (orders
    hold ≤7 items in TPC-H, so the fan-out is O(21·orders) worst case),
    then a fused-pair-key groupby. Only the bounded top-k list and its
    member parts' order counts reach the driver; lift is computed in
    arbitrary-precision integers (DuckDB HUGEINT mirror):
    lift_micro = floor(c_ab · n_orders · 1e6 / (c_a · c_b))."""
    from ray.data.aggregate import Sum

    from ..stages import relational

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    P = relational.adaptive_parts(sf_dir)

    def addpart(b: pa.Table) -> pa.Table:
        ok = relational._np(b["l_orderkey"]).astype(np.int64)
        return b.append_column(
            "_part", pa.array((ok % P).astype(np.int32), pa.int32()))

    def pairs(t: pa.Table) -> pa.Table:
        ok = relational._np(t["l_orderkey"]).astype(np.int64)
        pk = relational._np(t["l_partkey"]).astype(np.int64)
        if pk.max(initial=0) >= 1 << 31:
            raise ValueError("basket_pairs: partkey >= 2^31 breaks the "
                             "fused pair key")
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        # distinct (order, part)
        keep = np.ones(len(ok), bool)
        keep[1:] = (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])
        ok, pk = ok[keep], pk[keep]
        n = len(ok)
        if n == 0:
            return pa.table({"pair": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # triangular pair fan-out: element at p pairs with the `rem[p]`
        # same-order elements after it
        new_grp = np.ones(n, bool)
        new_grp[1:] = ok[1:] != ok[:-1]
        starts = np.nonzero(new_grp)[0]
        glen = np.diff(np.append(starts, n))
        gend = np.repeat(starts + glen, glen)
        rem = gend - np.arange(n) - 1
        total = int(rem.sum())
        if total:
            L = np.repeat(np.arange(n), rem)
            cum = np.cumsum(rem)
            r_off = np.arange(total) - np.repeat(cum - rem, rem) + 1
            R = L + r_off
            # pk[L] < pk[R] within an order
            fused = (pk[L] << 32) | pk[R]
            uk, cnt = np.unique(fused, return_counts=True)
        else:
            uk = np.empty(0, np.int64)
            cnt = np.empty(0, np.int64)
        # per-part distinct-order counts ride the SAME shuffle: partkeys
        # are >= 1 in TPC-H, so key = pk << 32 (pb = 0) never collides
        # with a real pair key
        upk, pcnt_loc = np.unique(pk, return_counts=True)
        return pa.table({
            "pair": pa.array(np.concatenate([uk, upk << 32]), pa.int64()),
            "n": pa.array(np.concatenate(
                [cnt, pcnt_loc]).astype(np.int64), pa.int64()),
        })

    pcnt = li.map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(pairs, batch_format="pyarrow") \
        .groupby("pair").aggregate(Sum("n", alias_name="n")) \
        .materialize()  # pair-vocabulary sized; consumed twice below
    def real_pairs(b: pa.Table) -> pa.Table:
        k = b["pair"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array((k & 0xFFFFFFFF) != 0))

    top = pcnt.map_batches(real_pairs, batch_format="pyarrow") \
        .sort(["n", "pair"], descending=[True, False]) \
        .limit(BASKET_TOPK).take_all()

    # member parts' order counts from the sentinel rows, filtered map-side
    members = sorted({int(r["pair"]) >> 32 for r in top}
                     | {int(r["pair"]) & 0xFFFFFFFF for r in top})
    mkeys = pa.array([m << 32 for m in members], pa.int64())

    def member_rows(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["pair"], value_set=mkeys))

    ccnt = {int(r["pair"]) >> 32: int(r["n"])
            for r in pcnt.map_batches(member_rows,
                                      batch_format="pyarrow").take_all()}
    import pyarrow.parquet as _pq

    n_orders = _pq.ParquetFile(f"{sf_dir}/orders.parquet") \
        .metadata.num_rows
    out_a, out_b, out_n, out_l = [], [], [], []
    for r in top:
        fused, c_ab = int(r["pair"]), int(r["n"])
        a, b = fused >> 32, fused & 0xFFFFFFFF
        lift = c_ab * n_orders * 1_000_000 // (ccnt[a] * ccnt[b])
        out_a.append(a)
        out_b.append(b)
        out_n.append(c_ab)
        out_l.append(lift)
    return pa.table({
        "pa": pa.array(out_a, pa.int64()),
        "pb": pa.array(out_b, pa.int64()),
        "n": pa.array(out_n, pa.int64()),
        "lift_micro": pa.array(out_l, pa.int64()),
    })


def _skyline2d(price: np.ndarray, size: np.ndarray):
    """Indices of the 2-D Pareto frontier (minimize price, maximize
    size). b dominates a iff b.price<=a.price, b.size>=a.size and one
    inequality is strict; ties on BOTH axes are all kept. One lexsort +
    running-max scan."""
    n = len(price)
    if n == 0:
        return np.empty(0, np.int64)
    order = np.lexsort((-size, price))
    p_s, s_s = price[order], size[order]
    keep = np.zeros(n, bool)
    best = np.iinfo(np.int64).min
    i = 0
    while i < n:
        j = i
        while j < n and p_s[j] == p_s[i]:
            j += 1
        gmax = s_s[i]  # sorted size-desc within the price group
        if gmax > best:
            k = i
            while k < j and s_s[k] == gmax:
                keep[k] = True
                k += 1
            best = gmax
        i = j
    return order[np.nonzero(keep)[0]]


def q_part_skyline(sf_dir: str):
    """Pareto frontier of the part table (minimize retail price,
    maximize size) — the skyline-query shape. Distributed by the
    skyline closure property: each block reduces to its LOCAL frontier
    (one lexsort + scan, typically O(log n) rows), and the global
    frontier is the frontier of the union of local frontiers — computed
    on the collected candidates (bounded by blocks × local frontier
    size). Price is integer cents on both engines."""
    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_retailprice",
                                     "p_size"])

    def local(b: pa.Table) -> pa.Table:
        pk = b["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = np.floor(
            b["p_retailprice"].to_numpy(zero_copy_only=False) * 100.0
            + 0.5).astype(np.int64)
        size = b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = _skyline2d(price, size)
        return pa.table({
            "p_partkey": pa.array(pk[idx], pa.int64()),
            "price_cents": pa.array(price[idx], pa.int64()),
            "p_size": pa.array(size[idx], pa.int64()),
        })

    cand = parts.map_batches(local, batch_format="pyarrow").take_all()
    pk = np.asarray([r["p_partkey"] for r in cand], np.int64)
    price = np.asarray([r["price_cents"] for r in cand], np.int64)
    size = np.asarray([r["p_size"] for r in cand], np.int64)
    idx = _skyline2d(price, size)
    by_pk = idx[np.argsort(pk[idx])]
    return pa.table({
        "p_partkey": pa.array(pk[by_pk], pa.int64()),
        "price_cents": pa.array(price[by_pk], pa.int64()),
        "p_size": pa.array(size[by_pk], pa.int64()),
    })


QUERIES_ML = {
    "cell_smooth": q_cell_smooth,
    "moran_i": q_moran_i,
    "geary_c": q_geary_c,
    "getis_hotspots": q_getis_hotspots,
    "lisa_quadrants": q_lisa_quadrants,
    "flow_directions": q_flow_directions,
    "layer_centroids": q_layer_centroids,
    "degree_census": q_degree_census,
    "k_core": q_k_core,
    "component_diameters": q_component_diameters,
    "grid_distance_transform": q_grid_distance_transform,
    "rfm_segments": q_rfm_segments,
    "customer_order_full": q_customer_order_full,
    "tile_clusters": q_tile_clusters,
    "quadkey_cells": q_quadkey_cells,
    "grid_morphology": q_grid_morphology,
    "anomaly_runs": q_anomaly_runs,
    "sliding_distinct": q_sliding_distinct,
    "conversion_latency": q_conversion_latency,
    "span_path_length": q_span_path_length,
    "pip_counts": q_pip_counts,
    "revenue_concentration": q_revenue_concentration,
    "revenue_gini": q_revenue_gini,
    "tile_hhi": q_tile_hhi,
    "tile_triangles": q_tile_triangles,
    "trending_parts": q_trending_parts,
    "daily_value_median": q_daily_value_median,
    "winsorized_sum": q_winsorized_sum,
    "arrival_dispersion": q_arrival_dispersion,
    "lang_centroids": q_lang_centroids,
    "basket_pairs": q_basket_pairs,
    "part_skyline": q_part_skyline,
    "bloom_semi_join": q_bloom_semi_join,
    "line_length": q_line_length,
    "bigram_pmi": q_bigram_pmi,
    "type_pagerank": q_type_pagerank,
    "quality_score": q_quality_score,
    "target_affinity": q_target_affinity,
    "ann_range": q_ann_range,
    "hard_negatives": q_hard_negatives,
    "polygon_area": q_polygon_area,
    "polygon_centroid": q_polygon_centroid,
    "polygon_edges": q_polygon_edges,
    "polygon_fill": q_polygon_fill,
    "local_clustering": q_local_clustering,
}


def _oracle_sql_ml() -> dict[str, str]:
    from .queries import _GEOMS, _HAVERSINE, _TILE_XY, _TILE_Y, ORACLE_SQL

    pip_counts_sql = f"""
SELECT polygon_id, CAST(COUNT(*) AS BIGINT) AS n_points
FROM ({ORACLE_SQL["pip_join"]})
GROUP BY polygon_id"""

    tx = _TILE_XY.format(lon="pts.lon")
    ty = _TILE_Y.format(lat="pts.lat")
    cell_smooth_sql = f"""
WITH zz AS (SELECT {SMOOTH_Z} AS z),
pts AS (SELECT xs[1] AS lon, ys[1] AS lat
        FROM {_GEOMS} WHERE geom_type = 1),
cnt AS (
  SELECT {tx} AS x, {ty} AS y, CAST(COUNT(*) AS BIGINT) AS n
  FROM pts, zz GROUP BY 1, 2)
SELECT CAST(zz.z AS BIGINT) AS z, a.x, a.y, a.n,
       CAST(SUM(b.n) AS BIGINT) AS smoothed
FROM cnt a
JOIN cnt b ON b.x BETWEEN a.x - 1 AND a.x + 1
          AND b.y BETWEEN a.y - 1 AND a.y + 1, zz
GROUP BY zz.z, a.x, a.y, a.n"""

    hav = _HAVERSINE.format(lat1="v.y", lon1="v.x", lat2="w.y", lon2="w.x")
    line_length_sql = f"""
WITH lb AS (
  SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx, xs, ys
  FROM {_GEOMS} WHERE geom_type = 2
),
verts AS (
  SELECT doc_id, span_idx, UNNEST(xs) AS x, UNNEST(ys) AS y,
         UNNEST(generate_series(1, len(xs))) AS pos
  FROM lb
),
segs AS (
  SELECT v.doc_id, v.span_idx,
         CAST(FLOOR(({hav}) * 1000.0 + 0.5) AS BIGINT) AS mm
  FROM verts v
  JOIN verts w ON w.doc_id = v.doc_id AND w.span_idx = v.span_idx
              AND w.pos = v.pos + 1
)
SELECT doc_id, span_idx,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(mm) AS BIGINT) AS length_mm
FROM segs GROUP BY doc_id, span_idx"""

    bloom_semi_sql = f"""
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderpriority
FROM orders WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{BLOOM_SHIP_LO}'
    AND l_shipdate < TIMESTAMP '{BLOOM_SHIP_HI}')"""

    polygon_area_sql = f"""
WITH pb AS (
  SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx, xs, ys, ring_of
  FROM {_GEOMS} WHERE geom_type = 3
),
verts AS (
  SELECT doc_id, span_idx,
         CAST(FLOOR(UNNEST(xs) * 1000000 + 0.5) AS BIGINT) AS xi,
         CAST(FLOOR(UNNEST(ys) * 1000000 + 0.5) AS BIGINT) AS yi,
         UNNEST(ring_of) AS rid,
         UNNEST(generate_series(1, len(xs))) AS pos
  FROM pb
),
ring_info AS (
  SELECT doc_id, span_idx, rid, MIN(pos) AS mn
  FROM verts GROUP BY doc_id, span_idx, rid
),
segs AS (
  SELECT v.doc_id, v.span_idx, v.rid, v.xi AS x1, v.yi AS y1,
         COALESCE(w.xi, f.xi) AS x2, COALESCE(w.yi, f.yi) AS y2
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
rings AS (
  SELECT doc_id, span_idx, rid,
         ABS(SUM(x1 * y2 - x2 * y1)) AS a2,
         COUNT(*) AS nv
  FROM segs GROUP BY doc_id, span_idx, rid
)
SELECT doc_id, span_idx,
       CAST(COUNT(*) AS BIGINT) AS n_rings,
       CAST(SUM(nv) AS BIGINT) AS n_vertices,
       CAST(SUM(a2) AS BIGINT) AS area2_sum
FROM rings GROUP BY doc_id, span_idx"""

    polygon_edges_sql = f"""
WITH pb AS (
  SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx, xs, ys, ring_of
  FROM {_GEOMS} WHERE geom_type = 3
),
verts AS (
  SELECT doc_id, span_idx,
         CAST(FLOOR(UNNEST(xs) * 1000000 + 0.5) AS BIGINT) AS xi,
         CAST(FLOOR(UNNEST(ys) * 1000000 + 0.5) AS BIGINT) AS yi,
         UNNEST(ring_of) AS rid,
         UNNEST(generate_series(1, len(xs))) AS pos
  FROM pb
),
ring_info AS (
  SELECT doc_id, span_idx, rid, MIN(pos) AS mn
  FROM verts GROUP BY doc_id, span_idx, rid
),
segs AS (
  SELECT v.doc_id, v.span_idx,
         COALESCE(w.xi, f.xi) - v.xi AS dx,
         COALESCE(w.yi, f.yi) - v.yi AS dy
  FROM verts v
  JOIN ring_info ri
    ON ri.doc_id = v.doc_id AND ri.span_idx = v.span_idx AND ri.rid = v.rid
  LEFT JOIN verts w
    ON w.doc_id = v.doc_id AND w.span_idx = v.span_idx AND w.rid = v.rid
       AND w.pos = v.pos + 1
  JOIN verts f
    ON f.doc_id = v.doc_id AND f.span_idx = v.span_idx AND f.rid = v.rid
       AND f.pos = ri.mn
)
SELECT doc_id, span_idx,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(ABS(dx) + ABS(dy)) AS BIGINT) AS manh_perim,
       CAST(MAX(dx * dx + dy * dy) AS BIGINT) AS max_edge2
FROM segs GROUP BY doc_id, span_idx"""

    polygon_fill_sql = f"""
WITH areas AS ({polygon_area_sql}),
pb AS (
  SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx, xs, ys
  FROM {_GEOMS} WHERE geom_type = 3
),
verts AS (
  SELECT doc_id, span_idx,
         CAST(FLOOR(UNNEST(xs) * 1000000 + 0.5) AS BIGINT) AS xi,
         CAST(FLOOR(UNNEST(ys) * 1000000 + 0.5) AS BIGINT) AS yi
  FROM pb
),
bb AS (
  SELECT doc_id, span_idx,
         MIN(xi) AS mnx, MAX(xi) AS mxx,
         MIN(yi) AS mny, MAX(yi) AS mxy
  FROM verts GROUP BY doc_id, span_idx
)
SELECT a.doc_id, a.span_idx,
       CAST(2 * (mxx - mnx) * (mxy - mny) AS BIGINT) AS bbox_area2,
       CAST(CASE WHEN (mxx - mnx) * (mxy - mny) = 0 THEN 0
            ELSE (CAST(a.area2_sum AS HUGEINT) * 1000000)
                 // (2 * (mxx - mnx) * (mxy - mny)) END AS BIGINT)
         AS fill_ppm
FROM areas a
JOIN bb ON bb.doc_id = a.doc_id AND bb.span_idx = a.span_idx"""

    ann_range_sql = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings WHERE vec_id < 4)
SELECT CAST(q.query_id AS BIGINT) AS query_id,
       CAST(e.vec_id AS BIGINT) AS vec_id,
       ROUND(CAST(list_cosine_similarity(q.qe, e.embedding) AS DOUBLE), 4)
         AS score
FROM q CROSS JOIN embeddings e
WHERE list_cosine_similarity(q.qe, e.embedding) >= {ANN_RANGE_THRESHOLD}"""

    bigram_pmi_sql = r"""
WITH words AS (
  SELECT regexp_split_to_array(TRIM(lower(text)), '\s+') AS ws
  FROM documents WHERE TRIM(text) <> ''),
uni AS (SELECT UNNEST(ws) AS term FROM words),
ucnt AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cu FROM uni GROUP BY term),
big AS (
  SELECT UNNEST([ws[i] || ' ' || ws[i+1]
                 for i in generate_series(1, len(ws) - 1)]) AS bigram
  FROM words WHERE len(ws) >= 2),
bcnt AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
         FROM big GROUP BY bigram),
top AS (SELECT bigram, n FROM bcnt ORDER BY n DESC, bigram LIMIT 100),
tot AS (SELECT (SELECT COUNT(*) FROM uni) AS nu,
               (SELECT COUNT(*) FROM big) AS nb)
SELECT t.bigram, t.n,
       CAST((CAST(t.n AS HUGEINT) * nu * nu * 1000000)
            // (CAST(nb AS HUGEINT) * u1.cu * u2.cu) AS BIGINT)
         AS pmi_micro
FROM top t, tot, ucnt u1, ucnt u2
WHERE u1.term = split_part(t.bigram, ' ', 1)
  AND u2.term = split_part(t.bigram, ' ', 2)"""

    moran_sql = f"""
WITH zz AS (SELECT {SMOOTH_Z} AS z),
pts AS (SELECT xs[1] AS lon, ys[1] AS lat
        FROM {_GEOMS} WHERE geom_type = 1),
cnt AS (
  SELECT {tx} AS x, {ty} AS y, CAST(COUNT(*) AS BIGINT) AS n
  FROM pts, zz GROUP BY 1, 2),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nt,
               CAST(SUM(n) AS HUGEINT) AS s FROM cnt),
nbr AS (
  SELECT a.x, a.y, a.n,
         CAST(SUM(b.n) AS HUGEINT) AS nb,
         CAST(COUNT(*) AS HUGEINT) AS deg
  FROM cnt a JOIN cnt b
    ON b.x BETWEEN a.x - 1 AND a.x + 1
   AND b.y BETWEEN a.y - 1 AND a.y + 1
   AND NOT (b.x = a.x AND b.y = a.y)
  GROUP BY a.x, a.y, a.n),
sums AS (
  SELECT SUM((tot.nt * nbr.n - tot.s)
             * (tot.nt * nbr.nb - nbr.deg * tot.s)) AS num,
         SUM(nbr.deg) AS w
  FROM nbr, tot),
dd AS (
  SELECT SUM((tot.nt * cnt.n - tot.s) * (tot.nt * cnt.n - tot.s)) AS den
  FROM cnt, tot)
SELECT CAST(tot.nt AS BIGINT) AS n_tiles,
       CAST(sums.w AS BIGINT) AS w_pairs,
       CAST((tot.nt * sums.num * 1000000) // (sums.w * dd.den) AS BIGINT)
         AS moran_micro
FROM tot, sums, dd"""

    geary_sql = f"""
WITH zz AS (SELECT {SMOOTH_Z} AS z),
pts AS (SELECT xs[1] AS lon, ys[1] AS lat
        FROM {_GEOMS} WHERE geom_type = 1),
cnt AS (
  SELECT {tx} AS x, {ty} AS y, CAST(COUNT(*) AS BIGINT) AS n
  FROM pts, zz GROUP BY 1, 2),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nt,
               CAST(SUM(n) AS HUGEINT) AS s FROM cnt),
nbr AS (
  SELECT a.x, a.y, a.n,
         CAST(SUM(b.n) AS HUGEINT) AS nb,
         CAST(COUNT(*) AS HUGEINT) AS deg,
         CAST(SUM(CAST(b.n AS HUGEINT) * b.n) AS HUGEINT) AS nb2
  FROM cnt a JOIN cnt b
    ON b.x BETWEEN a.x - 1 AND a.x + 1
   AND b.y BETWEEN a.y - 1 AND a.y + 1
   AND NOT (b.x = a.x AND b.y = a.y)
  GROUP BY a.x, a.y, a.n),
sums AS (
  SELECT SUM(nbr.deg * CAST(nbr.n AS HUGEINT) * nbr.n
             - 2 * CAST(nbr.n AS HUGEINT) * nbr.nb + nbr.nb2) AS num2,
         SUM(nbr.deg) AS w
  FROM nbr),
dd AS (
  SELECT SUM((tot.nt * cnt.n - tot.s) * (tot.nt * cnt.n - tot.s)) AS den
  FROM cnt, tot)
SELECT CAST(tot.nt AS BIGINT) AS n_tiles,
       CAST(sums.w AS BIGINT) AS w_pairs,
       CAST(((tot.nt - 1) * tot.nt * tot.nt * sums.num2 * 1000000)
            // (2 * sums.w * dd.den) AS BIGINT) AS geary_micro
FROM tot, sums, dd"""

    centroid_sql = f"""
WITH pb AS (
  SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx, xs, ys, ring_of
  FROM {_GEOMS} WHERE geom_type = 3
),
verts AS (
  SELECT doc_id, span_idx,
         CAST(FLOOR(UNNEST(xs) * 1000000 + 0.5) AS BIGINT) AS xi,
         CAST(FLOOR(UNNEST(ys) * 1000000 + 0.5) AS BIGINT) AS yi,
         UNNEST(ring_of) AS rid,
         UNNEST(generate_series(1, len(xs))) AS pos
  FROM pb
),
r0 AS (SELECT * FROM verts WHERE rid = 0),
ri AS (SELECT doc_id, span_idx, MIN(pos) AS mn
       FROM r0 GROUP BY doc_id, span_idx),
segs AS (
  SELECT v.doc_id, v.span_idx, v.xi AS x1, v.yi AS y1,
         COALESCE(w.xi, f.xi) AS x2, COALESCE(w.yi, f.yi) AS y2
  FROM r0 v
  JOIN ri ON ri.doc_id = v.doc_id AND ri.span_idx = v.span_idx
  LEFT JOIN r0 w
    ON w.doc_id = v.doc_id AND w.span_idx = v.span_idx
       AND w.pos = v.pos + 1
  JOIN r0 f
    ON f.doc_id = v.doc_id AND f.span_idx = v.span_idx
       AND f.pos = ri.mn
),
rings AS (
  SELECT doc_id, span_idx,
         SUM(CAST(x1 AS HUGEINT) * y2 - CAST(x2 AS HUGEINT) * y1) AS a2,
         SUM((CAST(x1 AS HUGEINT) + x2)
             * (CAST(x1 AS HUGEINT) * y2 - CAST(x2 AS HUGEINT) * y1))
           AS numx,
         SUM((CAST(y1 AS HUGEINT) + y2)
             * (CAST(x1 AS HUGEINT) * y2 - CAST(x2 AS HUGEINT) * y1))
           AS numy
  FROM segs GROUP BY doc_id, span_idx
)
SELECT doc_id, span_idx,
       CAST(numx // (3 * a2) AS BIGINT) AS cx_micro,
       CAST(numy // (3 * a2) AS BIGINT) AS cy_micro,
       CAST(ABS(a2) AS BIGINT) AS area2_outer
FROM rings WHERE a2 <> 0"""

    # per-tile outputs must keep isolated tiles (no occupied neighbor),
    # so unlike moran/geary the neighbor CTE is a LEFT join with
    # COALESCE'd sums (COUNT(b.n) counts only matched rows)
    _nbr_left = f"""
cnt AS (
  SELECT {tx} AS x, {ty} AS y, CAST(COUNT(*) AS BIGINT) AS n
  FROM pts, zz GROUP BY 1, 2),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nt,
               CAST(SUM(n) AS HUGEINT) AS s FROM cnt),
nbr AS (
  SELECT a.x, a.y, a.n,
         CAST(COALESCE(SUM(b.n), 0) AS HUGEINT) AS nb,
         CAST(COUNT(b.n) AS HUGEINT) AS deg
  FROM cnt a LEFT JOIN cnt b
    ON b.x BETWEEN a.x - 1 AND a.x + 1
   AND b.y BETWEEN a.y - 1 AND a.y + 1
   AND NOT (b.x = a.x AND b.y = a.y)
  GROUP BY a.x, a.y, a.n)"""

    layer_centroids_sql = f"""
WITH pts AS (
  SELECT layer,
         CAST(FLOOR(xs[1] * 1000000 + 0.5) AS BIGINT) AS xm,
         CAST(FLOOR(ys[1] * 1000000 + 0.5) AS BIGINT) AS ym
  FROM {_GEOMS} WHERE geom_type = 1)
SELECT layer, CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(xm) // COUNT(*) AS BIGINT) AS cx_micro,
       CAST(SUM(ym) // COUNT(*) AS BIGINT) AS cy_micro
FROM pts GROUP BY layer"""

    degree_census_sql = f"""
WITH zz AS (SELECT {SMOOTH_Z} AS z),
pts AS (SELECT xs[1] AS lon, ys[1] AS lat
        FROM {_GEOMS} WHERE geom_type = 1),
{_nbr_left}
SELECT CAST(deg AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_tiles
FROM nbr GROUP BY deg"""

    getis_sql = f"""
WITH zz AS (SELECT {SMOOTH_Z} AS z),
pts AS (SELECT xs[1] AS lon, ys[1] AS lat
        FROM {_GEOMS} WHERE geom_type = 1),
{_nbr_left}
SELECT CAST(nbr.x AS BIGINT) AS tile_x,
       CAST(nbr.y AS BIGINT) AS tile_y,
       nbr.n AS n,
       CAST(tot.nt * (nbr.n + nbr.nb) - (nbr.deg + 1) * tot.s AS BIGINT)
         AS excess
FROM nbr, tot
ORDER BY excess DESC, tile_x, tile_y
LIMIT {HOTSPOT_K}"""

    lisa_sql = f"""
WITH zz AS (SELECT {SMOOTH_Z} AS z),
pts AS (SELECT xs[1] AS lon, ys[1] AS lat
        FROM {_GEOMS} WHERE geom_type = 1),
{_nbr_left},
devs AS (
  SELECT tot.nt * nbr.n - tot.s AS d,
         tot.nt * nbr.nb - nbr.deg * tot.s AS dn
  FROM nbr, tot),
q AS (
  SELECT CASE WHEN d > 0 AND dn > 0 THEN 'HH'
              WHEN d < 0 AND dn < 0 THEN 'LL'
              WHEN d > 0 AND dn < 0 THEN 'HL'
              WHEN d < 0 AND dn > 0 THEN 'LH'
              ELSE 'NS' END AS quadrant
  FROM devs)
SELECT quadrant, CAST(COUNT(*) AS BIGINT) AS n_tiles
FROM q GROUP BY quadrant"""

    flow_sql = f"""
WITH zz AS (SELECT {SMOOTH_Z} AS z),
pts AS (SELECT xs[1] AS lon, ys[1] AS lat
        FROM {_GEOMS} WHERE geom_type = 1),
cnt AS (
  SELECT {tx} AS x, {ty} AS y, CAST(COUNT(*) AS BIGINT) AS n
  FROM pts, zz GROUP BY 1, 2),
nbr AS (
  SELECT a.x, a.y, a.n, b.n AS bn,
         CASE WHEN (b.x - a.x + 1) * 3 + (b.y - a.y + 1) > 4
              THEN (b.x - a.x + 1) * 3 + (b.y - a.y + 1) - 1
              ELSE (b.x - a.x + 1) * 3 + (b.y - a.y + 1) END AS dir
  FROM cnt a JOIN cnt b
    ON b.x BETWEEN a.x - 1 AND a.x + 1
   AND b.y BETWEEN a.y - 1 AND a.y + 1
   AND NOT (b.x = a.x AND b.y = a.y)),
best AS (
  SELECT x, y, n, bn, dir,
         ROW_NUMBER() OVER (PARTITION BY x, y
                            ORDER BY bn DESC, dir) AS rn
  FROM nbr),
fl AS (
  SELECT a.x, a.y,
         COALESCE(CASE WHEN b.bn > b.n THEN b.dir END, -1) AS direction
  FROM cnt a LEFT JOIN best b ON b.x = a.x AND b.y = a.y AND b.rn = 1)
SELECT CAST(direction AS BIGINT) AS direction,
       CAST(COUNT(*) AS BIGINT) AS n_tiles
FROM fl GROUP BY direction"""

    dist_transform_sql = f"""
WITH RECURSIVE zz AS (SELECT {SMOOTH_Z} AS z),
pts AS (SELECT xs[1] AS lon, ys[1] AS lat
        FROM {_GEOMS} WHERE geom_type = 1),
cnt AS (
  SELECT {tx} AS x, {ty} AS y, CAST(COUNT(*) AS BIGINT) AS n
  FROM pts, zz GROUP BY 1, 2),
mx AS (SELECT MAX(n) AS mn FROM cnt),
reach(x, y, d) AS (
  SELECT x, y, 0 FROM cnt, mx WHERE n = mx.mn
  UNION
  SELECT b.x, b.y, r.d + 1
  FROM reach r JOIN cnt b
    ON b.x BETWEEN r.x - 1 AND r.x + 1
   AND b.y BETWEEN r.y - 1 AND r.y + 1
  WHERE r.d < {DT_CAP}
),
best AS (SELECT x, y, MIN(d) AS d FROM reach GROUP BY x, y)
SELECT CAST(COALESCE(best.d, -1) AS BIGINT) AS dist,
       CAST(COUNT(*) AS BIGINT) AS n_tiles
FROM cnt LEFT JOIN best ON best.x = cnt.x AND best.y = cnt.y
GROUP BY 1"""

    tile_clusters_sql = f"""
WITH RECURSIVE zz AS (SELECT {SMOOTH_Z} AS z),
pts AS (SELECT xs[1] AS lon, ys[1] AS lat
        FROM {_GEOMS} WHERE geom_type = 1),
cnt AS (
  SELECT {tx} AS x, {ty} AS y, CAST(COUNT(*) AS BIGINT) AS n
  FROM pts, zz GROUP BY 1, 2),
core AS (SELECT x, y, x * 4294967296 + y AS k, n
         FROM cnt WHERE n >= {CLUSTER_MINPTS}),
edges AS (
  SELECT a.k AS src, b.k AS dst
  FROM core a JOIN core b
    ON b.x BETWEEN a.x - 1 AND a.x + 1
   AND b.y BETWEEN a.y - 1 AND a.y + 1),
reach(a, b) AS (
  SELECT k, k FROM core
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
labels AS (SELECT a, MIN(b) AS label FROM reach GROUP BY a)
SELECT CAST(label // 4294967296 AS BIGINT) AS cluster_x,
       CAST(label % 4294967296 AS BIGINT) AS cluster_y,
       CAST(COUNT(*) AS BIGINT) AS n_tiles,
       CAST(SUM(core.n) AS BIGINT) AS n_points
FROM labels JOIN core ON core.k = labels.a
GROUP BY label"""

    quadkey_sql = f"""
WITH zz AS (SELECT {QUADKEY_Z} AS z),
pts AS (SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
               xs[1] AS lon, ys[1] AS lat
        FROM {_GEOMS} WHERE geom_type = 1),
t AS (SELECT doc_id, span_idx, {tx} AS x, {ty} AS y, zz.z AS z
      FROM pts, zz)
SELECT doc_id, span_idx,
       array_to_string(
         [CAST(((x >> (z - i)) & 1) + 2 * ((y >> (z - i)) & 1)
               AS VARCHAR) for i in generate_series(1, z)], '') AS quadkey
FROM t"""

    morphology_sql = f"""
WITH zz AS (SELECT {SMOOTH_Z} AS z),
pts AS (SELECT xs[1] AS lon, ys[1] AS lat
        FROM {_GEOMS} WHERE geom_type = 1),
occ AS (SELECT DISTINCT {tx} AS x, {ty} AS y FROM pts, zz),
offs(d) AS (VALUES (-1), (0), (1)),
dil AS (SELECT DISTINCT a.x + dx.d AS x, a.y + dy.d AS y
        FROM occ a, offs dx, offs dy),
ero AS (
  SELECT a.x, a.y FROM occ a
  JOIN occ b ON b.x BETWEEN a.x - 1 AND a.x + 1
            AND b.y BETWEEN a.y - 1 AND a.y + 1
            AND NOT (b.x = a.x AND b.y = a.y)
  GROUP BY a.x, a.y HAVING COUNT(*) = 8)
SELECT CAST((SELECT COUNT(*) FROM occ) AS BIGINT) AS n_occupied,
       CAST((SELECT COUNT(*) FROM dil) AS BIGINT) AS n_dilated,
       CAST((SELECT COUNT(*) FROM ero) AS BIGINT) AS n_eroded"""

    return {
        "hard_negatives": f"""
WITH q AS (SELECT vec_id AS query_id, label AS ql, embedding AS qe
           FROM embeddings WHERE vec_id < 6),
s AS (SELECT q.query_id, q.ql, e.vec_id, e.label,
             list_cosine_similarity(q.qe, e.embedding) AS score
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id),
neg AS (SELECT query_id, 'neg' AS polarity, vec_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, vec_id) AS rank
        FROM s WHERE label <> ql),
pos AS (SELECT query_id, 'pos' AS polarity, vec_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score ASC, vec_id) AS rank
        FROM s WHERE label = ql)
SELECT CAST(query_id AS BIGINT) AS query_id, polarity,
       CAST(vec_id AS BIGINT) AS vec_id, CAST(rank AS BIGINT) AS rank,
       ROUND(CAST(score AS DOUBLE), 4) AS score
FROM (SELECT * FROM neg UNION ALL SELECT * FROM pos)
WHERE rank <= {HARD_K}""",
        "polygon_area": polygon_area_sql,
        "polygon_centroid": centroid_sql,
        "polygon_edges": polygon_edges_sql,
        "polygon_fill": polygon_fill_sql,
        "moran_i": moran_sql,
        "geary_c": geary_sql,
        "getis_hotspots": getis_sql,
        "lisa_quadrants": lisa_sql,
        "flow_directions": flow_sql,
        "layer_centroids": layer_centroids_sql,
        "degree_census": degree_census_sql,
        "grid_distance_transform": dist_transform_sql,
        "customer_order_full": """
WITH l AS (SELECT c_custkey,
                  CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
                    AS acctbal_cents
           FROM customer WHERE c_acctbal > 0),
r AS (SELECT o_custkey AS c_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1)
SELECT c_custkey, l.acctbal_cents, r.n_orders
FROM l FULL OUTER JOIN r USING (c_custkey)""",
        "rfm_segments": f"""
WITH c AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS f,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS m,
         MAX(CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT))
           AS lastd
  FROM orders GROUP BY 1),
a AS (SELECT MAX(lastd) AS anchor FROM c),
b AS (SELECT
  CASE WHEN a.anchor - lastd < {RFM_R_DAYS[0]} THEN 2
       WHEN a.anchor - lastd < {RFM_R_DAYS[1]} THEN 1 ELSE 0 END AS rb,
  CASE WHEN f >= {RFM_F[0]} THEN 2
       WHEN f >= {RFM_F[1]} THEN 1 ELSE 0 END AS fb,
  CASE WHEN m >= {RFM_M_CENTS[0]} THEN 2
       WHEN m >= {RFM_M_CENTS[1]} THEN 1 ELSE 0 END AS mb
  FROM c, a)
SELECT CAST(rb AS BIGINT) AS r_bucket, CAST(fb AS BIGINT) AS f_bucket,
       CAST(mb AS BIGINT) AS m_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM b GROUP BY 1, 2, 3""",
        "tile_clusters": tile_clusters_sql,
        "quadkey_cells": quadkey_sql,
        "grid_morphology": morphology_sql,
        "pip_counts": pip_counts_sql,
        "revenue_concentration": f"""
WITH cr AS (
  SELECT c_nationkey AS nk, o_custkey AS ck,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
r AS (
  SELECT nk, ck, cents,
         ROW_NUMBER() OVER (PARTITION BY nk
                            ORDER BY cents DESC, ck) AS rn
  FROM cr),
agg AS (
  SELECT nk, SUM(cents) AS total,
         SUM(CASE WHEN rn <= {CONC_TOPK} THEN cents ELSE 0 END) AS top10
  FROM r GROUP BY nk)
SELECT n_name,
       CAST(total AS BIGINT) AS total_cents,
       CAST(top10 AS BIGINT) AS top10_cents,
       CAST((CAST(top10 AS HUGEINT) * 1000000) // total AS BIGINT)
         AS share_ppm
FROM agg JOIN nation ON n_nationkey = agg.nk""",
        "lang_centroids": """
WITH dims AS (SELECT UNNEST(generate_series(1, 64)) AS i)
SELECT d.lang, CAST(i - 1 AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(FLOOR(AVG(CAST(e.embedding[i] AS DOUBLE)) * 1000000 + 0.5)
            AS BIGINT) AS centroid_micro
FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
CROSS JOIN dims
GROUP BY d.lang, i""",
        "winsorized_sum": """
WITH v AS (
  SELECT event_type, CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events),
f AS (
  SELECT event_type,
         CAST(quantile_disc(vm, 0.05) AS BIGINT) AS p05,
         CAST(quantile_disc(vm, 0.95) AS BIGINT) AS p95
  FROM v GROUP BY event_type)
SELECT v.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       f.p05 AS p05_milli, f.p95 AS p95_milli,
       CAST(SUM(LEAST(GREATEST(vm, f.p05), f.p95)) AS BIGINT)
         AS winsorized_sum_milli
FROM v JOIN f ON v.event_type = f.event_type
GROUP BY v.event_type, f.p05, f.p95""",
        "arrival_dispersion": """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - epoch_us(LAG(ts) OVER w)) // 1000000 AS d
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
v AS (SELECT event_type, CAST(d AS HUGEINT) AS d
      FROM g WHERE d IS NOT NULL)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(d) AS BIGINT) AS sum_gap_s,
       CAST(CASE WHEN COUNT(*) > 1 AND SUM(d) > 0 THEN
              (COUNT(*) * SUM(d * d) - SUM(d) * SUM(d)) * 1000000
              // ((COUNT(*) - 1) * SUM(d))
            ELSE 0 END AS BIGINT) AS fano_ppm
FROM v GROUP BY event_type""",
        "daily_value_median": """
WITH v AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events)
SELECT event_type, CAST(day AS TIMESTAMP) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(quantile_disc(vm, 0.5) AS BIGINT) AS p50_milli
FROM v GROUP BY event_type, day""",
        "trending_parts": f"""
WITH d AS (
  SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
         date_trunc('day', l_shipdate) AS ship_day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1, 2),
r AS (
  SELECT ship_day, l_partkey, n,
         ROW_NUMBER() OVER (PARTITION BY ship_day
                            ORDER BY n DESC, l_partkey) AS rank
  FROM d)
SELECT CAST(ship_day AS TIMESTAMP) AS ship_day, l_partkey, n,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {TREND_TOPK}""",
        "revenue_gini": """
WITH cr AS (
  SELECT c_nationkey AS nk, o_custkey AS ck,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
r AS (
  SELECT nk, cents,
         ROW_NUMBER() OVER (PARTITION BY nk
                            ORDER BY cents ASC, ck ASC) AS i
  FROM cr),
agg AS (
  SELECT nk, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(cents) AS HUGEINT) AS sx,
         CAST(SUM(CAST(i AS HUGEINT) * cents) AS HUGEINT) AS ix
  FROM r GROUP BY nk)
SELECT n_name, CAST(n AS BIGINT) AS n_customers,
       CAST((2 * ix - (n + 1) * sx) * 1000000 // (n * sx) AS BIGINT)
         AS gini_ppm
FROM agg JOIN nation ON n_nationkey = agg.nk""",
        "tile_hhi": f"""
WITH zz AS (SELECT {SMOOTH_Z} AS z),
pts AS (SELECT xs[1] AS lon, ys[1] AS lat
        FROM {_GEOMS} WHERE geom_type = 1),
cnt AS (
  SELECT {tx} AS x, {ty} AS y, CAST(COUNT(*) AS BIGINT) AS n
  FROM pts, zz GROUP BY 1, 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_tiles,
       CAST(SUM(n) AS BIGINT) AS n_points,
       CAST((SUM(CAST(n AS HUGEINT) * n) * 1000000)
            // (CAST(SUM(n) AS HUGEINT) * SUM(n)) AS BIGINT) AS hhi_ppm
FROM cnt""",
        "span_path_length": f"""
WITH p AS (
  SELECT doc_id, CAST(span_idx AS BIGINT) AS si, xs[1] AS lon, ys[1] AS lat
  FROM {_GEOMS} WHERE geom_type = 1),
seg AS (
  SELECT doc_id, lon, lat,
         LAG(lon) OVER w AS plon, LAG(lat) OVER w AS plat
  FROM p WINDOW w AS (PARTITION BY doc_id ORDER BY si)),
d AS (
  SELECT doc_id,
         CAST(FLOOR(({_HAVERSINE.format(lat1='seg.plat', lon1='seg.plon',
                                        lat2='seg.lat', lon2='seg.lon')})
                    * 1000.0 + 0.5) AS BIGINT) AS mm
  FROM seg WHERE plon IS NOT NULL)
SELECT doc_id, CAST(COUNT(*) + 1 AS BIGINT) AS n_pts,
       CAST(SUM(mm) AS BIGINT) AS path_mm
FROM d GROUP BY doc_id""",
        "sliding_distinct": """
WITH p AS (
  SELECT DISTINCT ws, user_id FROM (
    SELECT UNNEST([
             CAST(FLOOR(epoch(ts) / 1800) * 1800 AS BIGINT),
             CAST(FLOOR(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT)
           ]) AS ws, user_id
    FROM events))
SELECT CAST(to_timestamp(ws) AS TIMESTAMP) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM p GROUP BY ws""",
        "conversion_latency": """
WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
v AS (SELECT * FROM events WHERE event_type = 'view'),
j AS (
  SELECT c.user_id,
         (epoch_us(c.ts) - epoch_us(v.ts)) // 1000000 AS lat_s
  FROM c ASOF JOIN v
    ON c.user_id = v.user_id AND c.ts >= v.ts)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_conv,
       CAST(MIN(lat_s) AS BIGINT) AS min_s,
       CAST(MAX(lat_s) AS BIGINT) AS max_s,
       CAST(SUM(lat_s) AS BIGINT) AS sum_s
FROM j GROUP BY user_id""",
        "anomaly_runs": f"""
WITH e AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, event_id, ts,
         CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events),
m AS (
  SELECT user_id, (vm > {ANOMALY_MILLI}) AS hot,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         ROW_NUMBER() OVER (PARTITION BY user_id, (vm > {ANOMALY_MILLI})
                            ORDER BY ts, event_id) AS rnh
  FROM e),
isl AS (
  SELECT user_id, rn - rnh AS grp, CAST(COUNT(*) AS BIGINT) AS len
  FROM m WHERE hot GROUP BY user_id, rn - rnh)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(MAX(len) AS BIGINT) AS longest_run,
       CAST(SUM(len) AS BIGINT) AS n_anomalous
FROM isl GROUP BY user_id""",
        "ann_range": ann_range_sql,
        "line_length": line_length_sql,
        "bloom_semi_join": bloom_semi_sql,
        "tile_triangles": f"""
WITH zz AS (SELECT {SMOOTH_Z} AS z),
pts AS (SELECT xs[1] AS lon, ys[1] AS lat
        FROM {_GEOMS} WHERE geom_type = 1),
occ AS (SELECT DISTINCT {tx} AS x, {ty} AS y FROM pts, zz),
edges AS (
  SELECT a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by
  FROM occ a JOIN occ b
    ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
   AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))),
tris AS (
  SELECT 1 AS one
  FROM edges e JOIN occ c
    ON abs(e.ax - c.x) <= 1 AND abs(e.ay - c.y) <= 1
   AND abs(e.bx - c.x) <= 1 AND abs(e.by - c.y) <= 1
   AND (e.bx < c.x OR (e.bx = c.x AND e.by < c.y)))
SELECT CAST((SELECT COUNT(*) FROM occ) AS BIGINT) AS n_tiles,
       CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM tris) AS BIGINT) AS n_triangles""",
        "local_clustering": f"""
WITH zz AS (SELECT {SMOOTH_Z} AS z),
pts AS (SELECT xs[1] AS lon, ys[1] AS lat
        FROM {_GEOMS} WHERE geom_type = 1),
occ AS (SELECT DISTINCT {tx} AS x, {ty} AS y FROM pts, zz),
nbr AS (
  SELECT a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by
  FROM occ a JOIN occ b
    ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
   AND NOT (a.x = b.x AND a.y = b.y)),
deg AS (SELECT ax, ay, CAST(COUNT(*) AS BIGINT) AS degree
        FROM nbr GROUP BY ax, ay),
tp AS (
  SELECT n1.ax, n1.ay, CAST(COUNT(*) AS BIGINT) AS tri_pairs
  FROM nbr n1 JOIN nbr n2
    ON n1.ax = n2.ax AND n1.ay = n2.ay
   AND (n1.bx < n2.bx OR (n1.bx = n2.bx AND n1.by < n2.by))
   AND abs(n1.bx - n2.bx) <= 1 AND abs(n1.by - n2.by) <= 1
  GROUP BY n1.ax, n1.ay),
pern AS (
  SELECT o.x, o.y,
         COALESCE(d.degree, 0) AS degree,
         COALESCE(t.tri_pairs, 0) AS tri_pairs
  FROM occ o
  LEFT JOIN deg d ON d.ax = o.x AND d.ay = o.y
  LEFT JOIN tp t ON t.ax = o.x AND t.ay = o.y)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(tri_pairs AS BIGINT) AS tri_pairs,
       CAST(COUNT(*) AS BIGINT) AS n_tiles
FROM pern GROUP BY degree, tri_pairs""",
        "bigram_pmi": bigram_pmi_sql,
        "cell_smooth": cell_smooth_sql,
        "part_skyline": """
WITH p AS (
  SELECT p_partkey,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS p_size
  FROM part)
SELECT a.p_partkey, a.price_cents, a.p_size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_cents <= a.price_cents AND b.p_size >= a.p_size
    AND (b.price_cents < a.price_cents OR b.p_size > a.p_size))""",
        "basket_pairs": f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
pcnt AS (SELECT pa, pb, CAST(COUNT(*) AS BIGINT) AS n
         FROM pairs GROUP BY pa, pb),
top AS (SELECT * FROM pcnt ORDER BY n DESC, pa, pb LIMIT {BASKET_TOPK}),
icnt AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
         FROM items GROUP BY l_partkey),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS no FROM orders)
SELECT CAST(t.pa AS BIGINT) AS pa, CAST(t.pb AS BIGINT) AS pb, t.n,
       CAST((CAST(t.n AS HUGEINT) * no * 1000000) // (ia.c * ib.c)
            AS BIGINT) AS lift_micro
FROM top t, tot, icnt ia, icnt ib
WHERE ia.l_partkey = t.pa AND ib.l_partkey = t.pb""",
        "type_pagerank":
            "SELECT * FROM read_parquet('/tmp/graft_expected/type_pagerank.parquet')",
        # independent scalar ground truths (oracle/expected.py)
        "quality_score":
            "SELECT * FROM read_parquet('/tmp/graft_expected/quality_score.parquet')",
        "target_affinity":
            "SELECT * FROM read_parquet('/tmp/graft_expected/target_affinity.parquet')",
        "k_core":
            "SELECT * FROM read_parquet('/tmp/graft_expected/k_core.parquet')",
        "component_diameters":
            "SELECT * FROM read_parquet("
            "'/tmp/graft_expected/component_diameters.parquet')",
    }
