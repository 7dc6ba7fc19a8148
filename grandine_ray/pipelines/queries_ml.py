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


QUERIES_ML = {
    "bloom_semi_join": q_bloom_semi_join,
    "line_length": q_line_length,
    "quality_score": q_quality_score,
    "target_affinity": q_target_affinity,
    "ann_range": q_ann_range,
    "polygon_area": q_polygon_area,
}


def _oracle_sql_ml() -> dict[str, str]:
    from .queries import _GEOMS, _HAVERSINE

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

    ann_range_sql = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings WHERE vec_id < 4)
SELECT CAST(q.query_id AS BIGINT) AS query_id,
       CAST(e.vec_id AS BIGINT) AS vec_id,
       ROUND(CAST(list_cosine_similarity(q.qe, e.embedding) AS DOUBLE), 4)
         AS score
FROM q CROSS JOIN embeddings e
WHERE list_cosine_similarity(q.qe, e.embedding) >= {ANN_RANGE_THRESHOLD}"""

    return {
        "polygon_area": polygon_area_sql,
        "ann_range": ann_range_sql,
        "line_length": line_length_sql,
        "bloom_semi_join": bloom_semi_sql,
        # independent scalar ground truths (oracle/expected.py)
        "quality_score":
            "SELECT * FROM read_parquet('/tmp/graft_expected/quality_score.parquet')",
        "target_affinity":
            "SELECT * FROM read_parquet('/tmp/graft_expected/target_affinity.parquet')",
    }
