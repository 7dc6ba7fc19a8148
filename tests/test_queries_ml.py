"""Round-4 ML/curation queries (queries_ml.py): hashed-BoW quality
scoring, DSIR-style target affinity, cosine range search, polygon
areas — kernel unit tests plus end-to-end invariants at sf0.001."""
import numpy as np
import pyarrow as pa

from grandine_ray.geom import ops as geo_ops
from grandine_ray.pipelines import queries_ml
from grandine_ray.stages import corpus as corpus_stage

SF = "/root/testdata/sf0.001"


def test_polygon_area2_micro_known_values():
    class GB:
        pass

    gb = GB()
    gb.types = np.array([3, 3], np.uint8)
    # unit square; triangle with a small triangular hole
    gb.coords = np.array(
        [[0, 0], [1, 0], [1, 1], [0, 1],
         [0, 0], [3, 0], [0, 3], [1, 1], [1.5, 1], [1, 1.5]], float)
    gb.ring_offsets = np.array([0, 4, 7, 10])
    gb.geom_offsets = np.array([0, 1, 3])
    n_rings, n_vertices, area2 = geo_ops.polygon_area2_micro(gb)
    assert n_rings.tolist() == [1, 2]
    assert n_vertices.tolist() == [4, 6]
    # 2*area of the unit square in micro-deg^2
    assert area2[0] == 2 * 10**12
    # outer 2*area 9e12 plus the hole ring's absolute 2*area 0.25e12
    assert area2[1] == 9 * 10**12 + 250_000_000_000


def test_polygon_area2_micro_winding_invariant():
    class GB:
        pass

    for reverse in (False, True):
        gb = GB()
        gb.types = np.array([3], np.uint8)
        ring = [[0, 0], [2, 0], [2, 2], [0, 2]]
        if reverse:
            ring = ring[::-1]
        gb.coords = np.array(ring, float)
        gb.ring_offsets = np.array([0, 4])
        gb.geom_offsets = np.array([0, 1])
        _, _, area2 = geo_ops.polygon_area2_micro(gb)
        assert area2[0] == 8 * 10**12  # |2*area| independent of winding


def test_quality_weights_deterministic_and_bounded():
    w = corpus_stage.quality_weights()
    assert len(w) == corpus_stage.QS_BUCKETS
    assert w.min() >= -1000 and w.max() <= 1000
    # scalar mirror (oracle/expected.py recomputes this independently)
    from grandine_ray.oracle.expected import _qs_weight

    for b in (0, 1, 17, 4095):
        assert w[b] == _qs_weight(b)


def test_hashed_bow_quality_kernel_scalar_parity():
    from grandine_ray.oracle.expected import _poly, _qs_weight

    texts = ["hello world hello", "", "  one  two ", "solo"]
    batch = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                      "text": pa.array(texts, pa.string())})
    out = corpus_stage.hashed_bow_quality(batch).to_pydict()
    for i, t in enumerate(texts):
        words = t.lower().split()
        want = sum(_qs_weight(_poly(w) % 4096) for w in words)
        assert out["n_words"][i] == len(words)
        assert out["score"][i] == want
        assert out["keep"][i] == int(want > 0)


def test_quality_score_end_to_end(ray_session):
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    got = queries_ml.q_quality_score(SF).to_pandas()
    assert len(got) == n_docs
    assert ((got.keep == 1) == (got.score > 0)).all()
    assert (got.n_words >= 0).all()


def test_target_affinity_end_to_end(ray_session):
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    got = queries_ml.q_target_affinity(SF).to_pandas()
    assert len(got) == n_docs
    assert (got.affinity >= 0).all()
    # en docs score strictly positive (they contribute to the target
    # distribution themselves); affinity bounded by n_words * 1e6
    assert (got.affinity <= got.n_words * 1_000_000).all()
    import pyarrow.parquet as pq

    langs = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "lang"]).to_pandas()
    m = got.merge(langs, on="doc_id")
    en = m[(m.lang == "en") & (m.n_words > 0)]
    assert (en.affinity > 0).all()


def test_ann_range_matches_brute_force(ray_session):
    import pyarrow.parquet as pq

    got = queries_ml.q_ann_range(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet")
    E = np.asarray(t["embedding"].to_pylist(), np.float64)
    ids = t["vec_id"].to_numpy()
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    Q = En[ids < 4]
    S = Q @ En.T
    qi, bi = np.nonzero(S >= queries_ml.ANN_RANGE_THRESHOLD)
    want = sorted(zip(ids[ids < 4][qi].tolist(), ids[bi].tolist()))
    assert sorted(zip(got.query_id, got.vec_id)) == want
    # self-pairs present with score 1.0
    self_rows = got[got.query_id == got.vec_id]
    assert len(self_rows) == 4 and (self_rows.score == 1.0).all()


def test_polygon_area_end_to_end(ray_session):
    got = queries_ml.q_polygon_area(SF).to_pandas()
    assert len(got) > 0
    assert (got.n_rings >= 1).all()
    assert (got.n_vertices >= 3).all()
    assert (got.area2_sum > 0).all()
