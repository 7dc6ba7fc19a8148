"""Round-3 embedding-analytics queries: LSH-bucketed ANN (the second
scale path beyond IVF), exact per-label moment aggregates, and the
label-affinity matrix derived from centroids.

Scale contract: vector math is matrix ops over broadcast state
(hyperplanes / query matrices via ray.put); per-label aggregates ship
vector sums as single binary blobs (list<float> columns re-serialize
their whole value buffer in shuffles — CLAUDE.md round-1 pitfall); the
only driver-side collection is the labels×dims centroid table (≤ a few
thousand rows by construction).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages import ann as ann_stage


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed approximate cosine top-k for the fixed query set
    (vec_id < 4, same protocol as ann_topk/ann_ivf). Approximate by
    design → rows-only driver check; the recall property (≥0.9 on a
    planted clustered corpus, self-recall 1.0) is pinned in pytest
    (tests/test_queries_emb.py)."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.filter(expr="vec_id < 4").take_all()
    qids = [r["vec_id"] for r in qrows]
    qm = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    out = ann_stage.lsh_topk(emb, qids, qm, k=10)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score"] = g["score"].round(4)
        return g[["query_id", "vec_id", "rank", "score"]]

    return out.map_batches(final, batch_format="pandas")


def q_label_moments(sf_dir: str):
    """Exact per-(label, dim) n / Σv / Σv² in integer micro units —
    the variance profile of each label's embedding cluster."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["label", "embedding"])
    return ann_stage.label_moments(emb)


def q_vector_norms(sf_dir: str):
    """Per-vector EXACT squared L2 norm in micro² units: each element
    integer-izes once (floor(v·1e6+0.5), the repo float-parity rule)
    and the square-sum is pure int64 (micro ≤ 2e6, 64 dims ⇒ ≤ 2.6e14)
    — the norm table every cosine/IP ANN layout precomputes next to
    the vectors. Zero-copy list decode, one map_batches, no shuffle."""
    from ..stages.ann import _to_matrix

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])

    def norms(b: pa.Table) -> pa.Table:
        M = _to_matrix(b["embedding"], np.float64)
        mi = np.floor(M * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            "vec_id": pc.cast(b["vec_id"], pa.int64()),
            "norm2_micro2": pa.array((mi * mi).sum(axis=1), pa.int64()),
        })

    return emb.map_batches(norms, batch_format="pyarrow")


def q_label_affinity(sf_dir: str):
    """Pairwise label-centroid dot products (the label-confusion /
    affinity matrix): centroids come from the streaming
    label_centroids aggregate in integer micro units; the pair matrix
    is computed on the collected labels×dims table (tiny by
    construction) with one int64 matmul — micro² · dims stays far
    below 2^63 for unit-norm-ish embeddings."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["label", "embedding"])
    cent = ann_stage.label_centroids(emb).take_all()
    labels = sorted({r["label"] for r in cent})
    dims = 1 + max(r["dim"] for r in cent)
    C = np.zeros((len(labels), dims), np.int64)
    lpos = {lb: i for i, lb in enumerate(labels)}
    for r in cent:
        C[lpos[r["label"]], r["dim"]] = r["centroid_micro"]
    dots = C @ C.T
    i, j = np.triu_indices(len(labels), k=1)
    return pa.table({
        "label_a": pa.array([labels[a] for a in i], pa.int64()),
        "label_b": pa.array([labels[b] for b in j], pa.int64()),
        "dot_micro2": pa.array(dots[i, j], pa.int64()),
    })


QUERIES_EMB = {
    "ann_lsh": q_ann_lsh,
    "vector_norms": q_vector_norms,
    "label_moments": q_label_moments,
    "label_affinity": q_label_affinity,
}


ORACLE_SQL_EMB = {
    # ann_lsh: approximate by design — rows-only driver check; recall
    # property pinned in pytest.
    "vector_norms": """
WITH dims AS (SELECT UNNEST(generate_series(1, 64)) AS i),
v AS (SELECT vec_id,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5)
                  AS BIGINT) AS vm
      FROM embeddings CROSS JOIN dims)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(SUM(vm * vm) AS BIGINT) AS norm2_micro2
FROM v GROUP BY vec_id""",
    "label_moments": """
WITH dims AS (SELECT UNNEST(generate_series(1, 64)) AS i),
v AS (SELECT label, i,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5)
                  AS BIGINT) AS vm
      FROM embeddings CROSS JOIN dims)
SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(vm) AS BIGINT) AS sum_micro,
       CAST(SUM(vm * vm) AS BIGINT) AS ssq_micro
FROM v GROUP BY label, i""",
    "label_affinity": """
WITH dims AS (SELECT UNNEST(generate_series(1, 64)) AS i),
cent AS (SELECT label, i AS dim,
                CAST(FLOOR(AVG(CAST(embedding[i] AS DOUBLE)) * 1000000
                           + 0.5) AS BIGINT) AS c
         FROM embeddings CROSS JOIN dims GROUP BY label, i)
SELECT CAST(a.label AS BIGINT) AS label_a,
       CAST(b.label AS BIGINT) AS label_b,
       CAST(SUM(a.c * b.c) AS BIGINT) AS dot_micro2
FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
GROUP BY a.label, b.label""",
}
