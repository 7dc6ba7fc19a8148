"""Embedding analytics (queries_emb.py / stages/ann.py additions):
DuckDB parity for the exact aggregates, planted-cluster recall for the
LSH search, and blob-merge integrity for label_moments."""
import duckdb
import numpy as np
import pyarrow as pa
import pytest

from grandine_ray.pipelines import queries_emb
from grandine_ray.stages import ann as ann_stage

SF = "/root/testdata/sf0.001"


def _cmp(got_df, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    want = con.execute(sql).df()
    g = got_df.reindex(sorted(got_df.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    assert len(g) == len(w)
    gs = sorted(map(tuple, g.astype(str).values.tolist()))
    ws = sorted(map(tuple, w.astype(str).values.tolist()))
    assert gs == ws


def test_label_moments_parity(ray_session):
    got = queries_emb.q_label_moments(SF).to_pandas()
    _cmp(got, queries_emb.ORACLE_SQL_EMB["label_moments"])


def test_label_affinity_parity(ray_session):
    got = queries_emb.q_label_affinity(SF).to_pandas()
    _cmp(got, queries_emb.ORACLE_SQL_EMB["label_affinity"])


def _planted(n_clusters=8, per=40, dim=32, noise=0.05, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, per, axis=0) \
        + noise * rng.standard_normal((n_clusters * per, dim))
    return vecs.astype(np.float32)


def test_lsh_topk_recall_on_planted_clusters(ray_session):
    import ray.data as rd

    vecs = _planted()
    n = len(vecs)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl)
    qids = [0, 45, 130, 299]
    qm = vecs[qids].astype(np.float64)

    # ground truth: exact brute force
    M = vecs.astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    Q = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    S = Q @ M.T
    got = ann_stage.lsh_topk(ds, qids, qm, k=10).to_pandas()
    recalls = []
    for pos, qid in enumerate(qids):
        true = set(np.argsort(-S[pos])[:10].tolist())
        mine = set(got[got.query_id == qid].vec_id.tolist())
        # self-recall is structural (Hamming distance 0 to itself)
        assert qid in mine
        recalls.append(len(true & mine) / 10)
    assert np.mean(recalls) >= 0.9, recalls


def test_lsh_topk_ranks_are_dense_and_scored_desc(ray_session):
    got = queries_emb.q_ann_lsh(SF).to_pandas()
    for qid, g in got.groupby("query_id"):
        g = g.sort_values("rank")
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        assert (np.diff(g["score"].values) <= 1e-12).all()
        # rank 1 is the query vector itself (cosine 1.0)
        assert g.iloc[0]["vec_id"] == qid


def test_label_moments_blob_merge_multiblock(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((300, 8)).astype(np.float32)
    labels = rng.integers(0, 3, 300).astype(np.int64)
    tbl = pa.table({
        "label": pa.array(labels, pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(7)
    got = ann_stage.label_moments(ds).to_pandas()
    Mi = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    for lb in range(3):
        sel = labels == lb
        for d in range(8):
            row = got[(got.label == lb) & (got.dim == d)].iloc[0]
            assert row.n == sel.sum()
            assert row.sum_micro == Mi[sel, d].sum()
            assert row.ssq_micro == (Mi[sel, d] ** 2).sum()

def test_embedding_near_dup_lsh_equals_exact_on_planted(ray_session):
    """The size-switched LSH bucket path must find exactly the planted
    near-dup pairs the exact all-pairs join finds (same pairs, same
    rounded cosines): precision is structurally exact (in-bucket exact
    re-score) and the fixture's cos≈0.99 dups make the multi-table
    recall bound ~1-7e-7 — deterministic under the fixed seeds."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    base = rng.standard_normal((50, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup = base + 0.02 * rng.standard_normal(base.shape)
    vecs = np.concatenate([base, dup]).astype(np.float32)
    n = len(vecs)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })

    def run(force):
        ds = rd.from_arrow(tbl)
        out = ann_stage.embedding_near_dup_auto(
            ds, threshold=0.9, round_dp=3, force=force).to_pandas()
        return {(int(a), int(b)): float(c) for a, b, c in
                zip(out.vec_a, out.vec_b, out.cosine)}

    exact = run("exact")
    lsh = run("lsh")
    assert len(exact) >= 50  # every planted dup found by the exact path
    assert lsh == exact


def test_embedding_near_dup_auto_switches_on_size(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    base = rng.standard_normal((10, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = np.concatenate(
        [base, base + 0.02 * rng.standard_normal(base.shape)]
    ).astype(np.float32)
    n = len(vecs)

    def mk():
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }))

    # at exact_max_vecs >= n the exact path runs; one vector fewer and
    # the auto switch picks LSH — both paths agree on this dup fixture
    small = ann_stage.embedding_near_dup_auto(
        mk(), threshold=0.9, exact_max_vecs=n).to_pandas()
    big = ann_stage.embedding_near_dup_auto(
        mk(), threshold=0.9, exact_max_vecs=n - 1).to_pandas()
    key = lambda df: sorted(zip(df.vec_a, df.vec_b, df.cosine))
    assert key(small) == key(big)
    assert len(small) > 0


def test_vector_norms_brute(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    got = queries_emb.q_vector_norms(SF).to_pandas().set_index("vec_id")
    for vid, emb in zip(t["vec_id"].to_pylist(),
                        t["embedding"].to_pylist()):
        mi = [int(np.floor(float(v) * 1e6 + 0.5)) for v in emb]
        assert got.loc[vid].norm2_micro2 == sum(m * m for m in mi)
    assert len(got) == t.num_rows


def test_ivfpq_topk_recall_on_planted_clusters(ray_session, tmp_path):
    """IVF-PQ (compressed index: 8-byte ADC codes, no raw vectors) must
    hold recall@10 >= 0.9 vs exact brute force on the planted-cluster
    fixture — the ann_lsh bound, now for the product-quantized scale
    path. Also asserts the index really is compressed: no float
    embedding column in the persisted partitions."""
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    vecs = _planted()
    n = len(vecs)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl)
    qids = [0, 45, 130, 299]
    qm = vecs[qids].astype(np.float64)

    M = vecs.astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    Q = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    S = Q @ M.T
    idx_dir = str(tmp_path / "ivfpq")
    got = ann_stage.ivfpq_topk(ds, qids, qm, k=10,
                               index_dir=idx_dir).to_pandas()
    recalls = []
    for pos, qid in enumerate(qids):
        true = set(np.argsort(-S[pos])[:10].tolist())
        mine = set(got[got.query_id == qid].vec_id.tolist())
        recalls.append(len(true & mine) / 10)
    assert np.mean(recalls) >= 0.9, recalls
    # compression contract: the persisted index holds codes, not vectors
    part = glob.glob(f"{idx_dir}/partition=*/*.parquet")[0]
    schema = pq.read_schema(part)
    assert "embedding" not in schema.names
    assert "code" in schema.names
    t = pq.read_table(part)
    code_bytes = sum(len(v.as_py()) for v in t["code"])
    # 8 B ADC code + 8 B refine code per vector vs 128 B raw float32
    assert code_bytes == 16 * t.num_rows
