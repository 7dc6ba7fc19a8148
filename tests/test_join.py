"""Spatial join correctness: brute-force oracles (FIXTURES.md §4.3)."""
import numpy as np
import pytest

from grandine_ray.geom import wkb
from grandine_ray.geom.predicates import point_in_rings
from grandine_ray.index.rtree import STRtree
from grandine_ray.sources import synth


def test_strtree_matches_bruteforce():
    rng = np.random.default_rng(5)
    n = 500
    minx = rng.uniform(-100, 90, n)
    miny = rng.uniform(-80, 70, n)
    boxes = np.stack([minx, miny, minx + rng.uniform(0, 20, n),
                      miny + rng.uniform(0, 20, n)], axis=1)
    tree = STRtree(boxes)
    for _ in range(30):
        qx1, qy1 = rng.uniform(-100, 80), rng.uniform(-80, 60)
        qx2, qy2 = qx1 + rng.uniform(0, 30), qy1 + rng.uniform(0, 30)
        got = set(tree.query(qx1, qy1, qx2, qy2).tolist())
        exp = set(np.nonzero(
            ~((boxes[:, 0] > qx2) | (boxes[:, 2] < qx1)
              | (boxes[:, 1] > qy2) | (boxes[:, 3] < qy1))
        )[0].tolist())
        assert got == exp


def test_strtree_empty_and_single():
    assert STRtree(np.empty((0, 4))).query(0, 0, 1, 1).tolist() == []
    t = STRtree(np.array([[0.0, 0.0, 1.0, 1.0]]))
    assert t.query(0.5, 0.5, 2, 2).tolist() == [0]
    assert t.query(5, 5, 6, 6).tolist() == []


@pytest.mark.usefixtures("ray_session")
def test_pip_join_matches_bruteforce():
    import ray.data as rd

    from grandine_ray.stages.extract import extract_features
    from grandine_ray.stages.join import pip_join, pip_join_bruteforce

    corpus = synth.ensure_corpus(400)
    feats = rd.read_parquet(f"{corpus}/documents.parquet").map_batches(
        extract_features, batch_format="pyarrow"
    )
    rows = feats.take_all()
    points = [
        (r["doc_id"], r["span_idx"], r["bbox_minx"], r["bbox_miny"])
        for r in rows if r["geom_type"] == 1
    ]
    polys = []
    for r in rows:
        if r["geom_type"] == 3:
            gb = wkb.decode_wkb_batch([r["geom_wkb"]])
            polys.append((f"{r['doc_id']}#{r['span_idx']}", gb.rings_of(0)))
    assert points and polys

    pts_ds = feats.filter(expr="geom_type == 1")
    got_rows = pip_join(
        pts_ds, [p[0] for p in polys],
        [wkb.encode_polygon(p[1]) for p in polys], concurrency=(1, 2),
    ).take_all()
    got = {(r["doc_id"], r["span_idx"], r["polygon_id"]) for r in got_rows}
    exp = pip_join_bruteforce(points, polys)
    assert got == exp
    assert exp  # non-degenerate: at least one containment in 400 docs


@pytest.mark.usefixtures("ray_session")
def test_pip_join_partitioned_equals_broadcast():
    import ray.data as rd

    from grandine_ray.stages.extract import extract_features
    from grandine_ray.stages.join import pip_join, pip_join_partitioned

    corpus = synth.ensure_corpus(400)
    feats = rd.read_parquet(f"{corpus}/documents.parquet").map_batches(
        extract_features, batch_format="pyarrow"
    )
    polys_rows = feats.filter(expr="geom_type == 3").take_all()
    pts = feats.filter(expr="geom_type == 1")
    broadcast = {
        (r["doc_id"], r["span_idx"], r["polygon_id"])
        for r in pip_join(
            pts, [f"{r['doc_id']}#{r['span_idx']}" for r in polys_rows],
            [r["geom_wkb"] for r in polys_rows],
        ).take_all()
    }
    partitioned = {
        (r["doc_id"], r["span_idx"], r["polygon_id"])
        for r in pip_join_partitioned(
            pts, feats.filter(expr="geom_type == 3")
        ).take_all()
    }
    assert partitioned == broadcast and broadcast


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("mode", ["broadcast", "partitioned"])
def test_pip_join_auto_both_paths(mode):
    """The size-switched entry (VERDICT r2 wrong #1) through BOTH forced
    paths: identical result sets, and the broadcast payload is compiled
    in a worker task from block refs (no driver take_all)."""
    import ray.data as rd

    from grandine_ray.stages.extract import extract_features
    from grandine_ray.stages.join import pip_join, pip_join_auto

    corpus = synth.ensure_corpus(400)
    feats = rd.read_parquet(f"{corpus}/documents.parquet").map_batches(
        extract_features, batch_format="pyarrow"
    )
    polys_rows = feats.filter(expr="geom_type == 3").take_all()
    pts = feats.filter(expr="geom_type == 1")
    expected = {
        (r["doc_id"], r["span_idx"], r["polygon_id"])
        for r in pip_join(
            pts, [f"{r['doc_id']}#{r['span_idx']}" for r in polys_rows],
            [r["geom_wkb"] for r in polys_rows],
        ).take_all()
    }
    got = {
        (r["doc_id"], r["span_idx"], r["polygon_id"])
        for r in pip_join_auto(
            pts, feats.filter(expr="geom_type == 3"), force=mode
        ).take_all()
    }
    assert got == expected and expected


@pytest.mark.usefixtures("ray_session")
def test_knn_matches_bruteforce():
    import ray.data as rd

    from grandine_ray.geom.ops import haversine_m
    from grandine_ray.stages.extract import extract_features
    from grandine_ray.stages.join import knn_topk

    corpus = synth.ensure_corpus(400)
    feats = rd.read_parquet(f"{corpus}/documents.parquet").map_batches(
        extract_features, batch_format="pyarrow"
    )
    pts = feats.filter(expr="geom_type == 1")
    rows = pts.take_all()
    qids = ["a", "b"]
    qx = [13.4, -74.0]
    qy = [52.5, 40.7]
    got = knn_topk(pts, qids, qx, qy, k=5, concurrency=(1, 2)).take_all()

    for qi, qid in enumerate(qids):
        dists = sorted(
            (float(haversine_m(qx[qi], qy[qi], r["bbox_minx"], r["bbox_miny"])),
             r["doc_id"], r["span_idx"])
            for r in rows
        )[:5]
        exp_ids = [(d[1], d[2]) for d in dists]
        got_q = sorted((r for r in got if r["query_id"] == qid),
                       key=lambda r: r["rank"])
        assert [(r["doc_id"], r["span_idx"]) for r in got_q] == exp_ids


@pytest.mark.usefixtures("ray_session")
def test_ann_matches_bruteforce():
    import ray.data as rd

    from grandine_ray.stages.ann import brute_force_topk, normalize

    emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.take_all()
    qrows = rows[:3]
    qm = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    got = brute_force_topk(
        emb, [r["vec_id"] for r in qrows], qm, k=5, concurrency=(1, 2)
    ).take_all()

    m = normalize(np.asarray([r["embedding"] for r in rows], dtype=np.float32))
    ids = np.asarray([r["vec_id"] for r in rows])
    qn = normalize(qm.astype(np.float32))
    for qi, qr in enumerate(qrows):
        scores = qn[qi] @ m.T
        order = sorted(zip(-scores, ids), key=lambda t: (t[0], t[1]))[:5]
        exp = [int(t[1]) for t in order]
        got_q = sorted((r for r in got if r["query_id"] == qr["vec_id"]),
                       key=lambda r: r["rank"])
        assert [r["vec_id"] for r in got_q] == exp


def test_hyperplane_lsh_buckets_deterministic():
    from grandine_ray.stages.ann import HyperplaneLSH, normalize

    rng = np.random.default_rng(1)
    m = normalize(rng.standard_normal((100, 16)).astype(np.float32))
    l1 = HyperplaneLSH(16, seed=42)
    l2 = HyperplaneLSH(16, seed=42)
    assert (l1.bucket_of(m) == l2.bucket_of(m)).all()
    # near-identical vectors share buckets far more often than random pairs
    m2 = normalize(m + rng.standard_normal(m.shape).astype(np.float32) * 0.01)
    same_near = (l1.bucket_of(m) == l1.bucket_of(m2)).mean()
    assert same_near > 0.5


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall_vs_bruteforce():
    # clustered corpus (where an inverted file is meaningful): 8 gaussian
    # clusters in 16-d; queries drawn from cluster centers
    import ray.data as rd

    from grandine_ray.stages.ann import brute_force_topk, ivf_topk

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 16)) * 4
    vecs = np.concatenate(
        [c + rng.standard_normal((250, 16)) * 0.3 for c in centers]
    )
    emb = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(len(vecs))]
    )
    qids = [0, 300, 700, 1100, 1900]
    qm = vecs[qids]
    exact = brute_force_topk(emb, qids, qm, k=10).take_all()
    approx = ivf_topk(emb, qids, qm, k=10, nlist=8, nprobe=2,
                      train_sample=1000).take_all()
    recalls = []
    for qid in qids:
        e = {r["vec_id"] for r in exact if r["query_id"] == qid}
        a = {r["vec_id"] for r in approx if r["query_id"] == qid}
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.9, recalls


@pytest.mark.usefixtures("ray_session")
def test_knn_chunked_equals_plain():
    import ray.data as rd

    from grandine_ray.stages.extract import extract_features
    from grandine_ray.stages.join import knn_topk, knn_topk_chunked

    corpus = synth.ensure_corpus(400)
    pts = rd.read_parquet(f"{corpus}/documents.parquet").map_batches(
        extract_features, batch_format="pyarrow"
    ).filter(expr="geom_type == 1")
    qids = ["a", "b", "c"]
    qx = [13.4, -74.0, 139.7]
    qy = [52.5, 40.7, 35.7]
    plain = {(r["query_id"], r["rank"], r["doc_id"], r["span_idx"])
             for r in knn_topk(pts, qids, qx, qy, k=4).take_all()}
    chunked = {(r["query_id"], r["rank"], r["doc_id"], r["span_idx"])
               for r in knn_topk_chunked(pts, qids, qx, qy, k=4, chunk=2).take_all()}
    assert plain == chunked


def test_bbox_joiner_matches_bruteforce(ray_session):
    """Vectorized tree-pruned joiner ≡ brute-force double loop."""
    import pyarrow as pa
    import ray.data as rd

    from grandine_ray.stages.join import bbox_join

    rng = np.random.default_rng(7)
    n, t = 500, 37
    fx = rng.uniform(-10, 10, n)
    fy = rng.uniform(-10, 10, n)
    feats = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n)], pa.string()),
        "span_idx": pa.array(np.zeros(n, np.int32), pa.int32()),
        "bbox_minx": pa.array(fx), "bbox_miny": pa.array(fy),
        "bbox_maxx": pa.array(fx + rng.uniform(0, 2, n)),
        "bbox_maxy": pa.array(fy + rng.uniform(0, 2, n)),
    })
    tx = rng.uniform(-10, 10, t)
    ty = rng.uniform(-10, 10, t)
    tb = np.c_[tx, ty, tx + rng.uniform(0, 3, t), ty + rng.uniform(0, 3, t)]
    tids = [f"t{i}" for i in range(t)]

    got = bbox_join(rd.from_arrow(feats), tids, tb).to_pandas()
    got_pairs = set(zip(got["doc_id"], got["target_id"]))

    exp = set()
    f = feats.to_pandas()
    for ti in range(t):
        m = ~((f["bbox_minx"] > tb[ti, 2]) | (f["bbox_maxx"] < tb[ti, 0])
              | (f["bbox_miny"] > tb[ti, 3]) | (f["bbox_maxy"] < tb[ti, 1]))
        for d in f["doc_id"][m]:
            exp.add((d, tids[ti]))
    assert got_pairs == exp and len(exp) > 50


@pytest.mark.usefixtures("ray_session")
def test_ivf_search_prunes_io(tmp_path):
    """The persisted IVF index reads only probed partitions: rows entering
    the scorer must be well under the corpus size (I/O pruning, not just
    compute masking)."""
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    from grandine_ray.stages.ann import IVFIndex, ivf_build, ivf_search, normalize

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, 16)) * 4
    vecs = np.concatenate(
        [c + rng.standard_normal((250, 16)) * 0.3 for c in centers]
    )
    emb = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(len(vecs))]
    )
    idx_dir = str(tmp_path / "ivf")
    ivf_build(emb, idx_dir, nlist=8, train_sample=1000)

    total = sum(pq.read_metadata(f).num_rows
                for f in glob.glob(f"{idx_dir}/partition=*/*.parquet"))
    assert total == len(vecs)

    qm = vecs[[0, 300]]
    centroids = np.load(f"{idx_dir}/centroids.npy")
    idx = IVFIndex(centroids.shape[1]); idx.centroids = centroids
    probed = np.unique(idx.probe(normalize(qm.astype(np.float32)), 2))
    probed_rows = sum(
        pq.read_metadata(f).num_rows
        for j in probed
        for f in glob.glob(f"{idx_dir}/partition={int(j)}/*.parquet"))
    assert probed_rows < total * 0.7, (probed_rows, total)

    out = ivf_search(idx_dir, [0, 300], qm, k=10, nprobe=2).take_all()
    assert len(out) == 20


def test_to_matrix_zero_copy_equals_boxed():
    """_to_matrix's flat-buffer reshape must equal the boxed to_pylist
    path for list<float32>, fixed_size_list and a sliced chunked array."""
    import pyarrow as pa

    from grandine_ray.stages.ann import _to_matrix

    rng = np.random.default_rng(11)
    m = rng.standard_normal((50, 8)).astype(np.float32)
    lst = pa.array(m.tolist(), pa.list_(pa.float32()))
    assert np.array_equal(_to_matrix(lst), m)
    fsl = pa.FixedSizeListArray.from_arrays(pa.array(m.ravel()), 8)
    assert np.array_equal(_to_matrix(fsl), m)
    chunked = pa.chunked_array([lst.slice(0, 20), lst.slice(20, 30)])
    assert np.array_equal(_to_matrix(chunked), m)
    sliced = lst.slice(5, 10)
    assert np.array_equal(_to_matrix(sliced), m[5:15])
    # float64 widening matches the old boxed float64 conversion exactly
    assert np.array_equal(_to_matrix(lst, dtype=np.float64),
                          np.asarray(m.tolist(), dtype=np.float64))
    # ragged embeddings are invalid input (numpy refuses, as before)
    ragged = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32()))
    with pytest.raises(ValueError):
        _to_matrix(ragged)


def test_ivf_search_all_probed_lists_empty(tmp_path, ray_session):
    """Probing only empty lists must return an empty typed result, not
    crash on read_parquet([]) (ADVICE r2)."""
    import ray.data as rd

    from grandine_ray.stages.ann import IVFIndex

    idx_dir = tmp_path / "ivf_empty"
    idx_dir.mkdir()
    # hand-built index: 4 trained centroids, NO partition dirs at all
    centroids = np.eye(4, 8, dtype=np.float32)
    np.save(f"{idx_dir}/centroids.npy", centroids)
    from grandine_ray.stages.ann import ivf_search

    out = ivf_search(str(idx_dir), [0], np.ones((1, 8)), k=5, nprobe=2)
    rows = out.take_all()
    assert rows == []


def test_asof_join_semantics(ray_session):
    """LEFT as-of inclusive semantics: latest right.ts <= left.ts per key;
    no prior right row -> nulls; equal timestamps match; stale rows from a
    previous key must not leak across key boundaries."""
    import pandas as pd
    import ray.data as rd

    from grandine_ray.stages.join import asof_join

    left = pd.DataFrame({
        "user_id": [1, 1, 2, 3, 3],
        "ts": [10, 25, 5, 7, 8],
        "event_id": [100, 101, 102, 103, 104],
    })
    right = pd.DataFrame({
        "user_id": [1, 1, 2, 9],
        "ts": [10, 20, 6, 1],
        "event_id": [200, 201, 202, 203],
        "value": [1.5, 2.5, 3.5, 9.9],
    })
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        by="user_id", on="ts",
        left_cols=["event_id"], right_cols=["event_id", "value"],
        num_partitions=4,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    # 100: ts=10 matches right ts=10 (inclusive); 101: ts=25 -> ts=20
    # 102: ts=5 < all right ts for user 2 -> null (and user 9's ts=1 row
    # must NOT leak); 103/104: user 3 has no right rows -> null
    assert out["event_id"].tolist() == [100, 101, 102, 103, 104]
    got = out["right_event_id"].tolist()
    assert got[0] == 200 and got[1] == 201
    assert pd.isna(got[2]) and pd.isna(got[3]) and pd.isna(got[4])
    assert out["right_value"].tolist()[0] == 1.5
    assert out["right_value"].tolist()[1] == 2.5


@pytest.mark.usefixtures("ray_session")
def test_pip_join_partitioned_salted_equals_unsalted():
    """Skewed fixture: ~50% of points pile into ONE z6 cell. Salting that
    hot cell must leave the join output byte-identical (each point still
    meets every polygon of its cell exactly once) while spreading the hot
    cell's work over salt_k sub-groups. Mirrors the hash_join_i64 salt
    tests."""
    import pyarrow as pa
    import ray.data as rd

    from grandine_ray.index import xyz
    from grandine_ray.stages.join import pip_join_partitioned

    rng = np.random.default_rng(5)
    n = 400
    # half the points inside a 1-degree box (one hot z6 cell), half spread
    hot_x = 10.2 + rng.uniform(0, 0.8, n // 2)
    hot_y = 48.1 + rng.uniform(0, 0.8, n // 2)
    cold_x = rng.uniform(-170, 170, n - n // 2)
    cold_y = rng.uniform(-80, 80, n - n // 2)
    px = np.concatenate([hot_x, cold_x])
    py = np.concatenate([hot_y, cold_y])

    def feats_table(ids, minx, miny, maxx, maxy, wkbs, gtype):
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "span_idx": pa.array(np.zeros(len(ids), np.int32), pa.int32()),
            "geom_type": pa.array([gtype] * len(ids), pa.int32()),
            "geom_wkb": pa.array(wkbs, pa.binary()),
            "bbox_minx": pa.array(minx), "bbox_miny": pa.array(miny),
            "bbox_maxx": pa.array(maxx), "bbox_maxy": pa.array(maxy),
        })

    points = feats_table([f"p{i}" for i in range(n)], px, py, px, py,
                         [b""] * n, 1)

    def box_wkb(x0, y0, x1, y1):
        ring = np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)],
                        dtype=np.float64)
        return wkb.encode_polygon([ring])

    # polygons: two covering chunks of the hot box + a few cold ones
    polys = []
    pminx, pminy, pmaxx, pmaxy, wkbs = [], [], [], [], []
    boxes = [(10.1, 48.0, 10.7, 48.6), (10.5, 48.3, 11.1, 49.0),
             (-60.0, -20.0, -40.0, 0.0), (100.0, 10.0, 120.0, 30.0)]
    for i, (x0, y0, x1, y1) in enumerate(boxes):
        polys.append(f"g{i}")
        pminx.append(x0); pminy.append(y0); pmaxx.append(x1); pmaxy.append(y1)
        wkbs.append(box_wkb(x0, y0, x1, y1))
    polygons = feats_table(polys, pminx, pminy, pmaxx, pmaxy, wkbs, 3)

    # the planted hot cell really is hot (>=40% of points share it)
    cx, cy = xyz.tile_xy(px, py, 6)
    cells = (cx << np.int64(32)) | cy
    vals, counts = np.unique(cells, return_counts=True)
    hot = vals[counts >= n * 0.4]
    assert len(hot) == 1

    def run(**kw):
        return sorted(
            (r["doc_id"], r["span_idx"], r["polygon_id"])
            for r in pip_join_partitioned(
                rd.from_arrow(points), rd.from_arrow(polygons), 6, **kw
            ).take_all())

    plain = run()
    salted = run(hot_cells=hot, salt_k=8)
    assert plain and salted == plain
    # sanity: hot points matched the overlapping polygons
    assert any(pid == "g0#0" for _, _, pid in plain)


def test_ann_filtered_respects_predicate_and_ranks(ray_session):
    """Filtered vector search: every hit's label passes the predicate,
    and per query the hits equal the brute-force numpy top-k over ONLY
    the allowed rows (sf0.001 embeddings)."""
    import numpy as np
    import pandas as pd

    from grandine_ray.pipelines.queries import (ANN_FILTER_LABELS,
                                                q_ann_filtered)

    sf = "/root/testdata/sf0.001"
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    got = q_ann_filtered(sf).to_pandas()

    allowed = emb[emb["label"].isin(ANN_FILTER_LABELS)]
    labels = emb.set_index("vec_id")["label"]
    assert got["vec_id"].map(labels).isin(ANN_FILTER_LABELS).all()

    M = np.stack(allowed["embedding"].to_numpy())
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = allowed["vec_id"].to_numpy()
    for qid in sorted(got["query_id"].unique()):
        q = np.asarray(
            emb.loc[emb["vec_id"] == qid, "embedding"].iloc[0], float)
        s = Mn @ (q / np.linalg.norm(q))
        order = np.lexsort((ids, -s))[:10]
        want = list(ids[order])
        have = got[got["query_id"] == qid].sort_values("rank")
        assert list(have["vec_id"]) == want
        np.testing.assert_allclose(
            have["score"].to_numpy(), np.round(s[order], 4), atol=1e-4)
