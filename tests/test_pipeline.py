"""End-to-end tiler pipeline tests over the deterministic synth corpus."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from grandine_ray.geom import wkb
from grandine_ray.index import xyz
from grandine_ray.sources import synth
from grandine_ray.stages import mvt
from grandine_ray.stages.extract import extract_features


@pytest.fixture(scope="module")
def corpus_dir():
    return synth.ensure_corpus(300)


@pytest.fixture(scope="module")
def docs_table(corpus_dir):
    return pq.read_table(f"{corpus_dir}/documents.parquet")


@pytest.fixture(scope="module")
def geoms_table(corpus_dir):
    return pq.read_table(f"{corpus_dir}/geoms.parquet")


def test_extract_matches_groundtruth(docs_table, geoms_table):
    feats = extract_features(docs_table)
    assert feats.num_rows == geoms_table.num_rows
    got = feats.to_pydict()
    exp = geoms_table.to_pydict()
    assert got["doc_id"] == exp["doc_id"]
    assert got["span_idx"] == exp["span_idx"]
    assert got["geom_type"] == exp["geom_type"]
    assert got["layer"] == exp["layer"]
    # bbox from WKB parse == bbox from raw pre-WKB vertex lists
    for i in range(feats.num_rows):
        assert got["bbox_minx"][i] == pytest.approx(min(exp["xs"][i]))
        assert got["bbox_maxy"][i] == pytest.approx(max(exp["ys"][i]))


def test_span_sequence_invariant(docs_table):
    """Pipeline never mutates documents; assert spans list round-trips
    losslessly through Arrow take/filter plumbing (BASELINE.json:15)."""
    spans_before = docs_table["spans"].to_pylist()
    feats = extract_features(docs_table)  # noqa: F841  (reads, never writes)
    spans_after = docs_table["spans"].to_pylist()
    assert spans_before == spans_after
    for doc in spans_before[:50]:
        offs = [s["offset"] for s in doc]
        assert offs == sorted(offs)


def _scalar_tile_sets(geoms_table, zooms):
    """Trusted scalar mirror of lib/tile/bbox.go Coverage over raw coords."""
    expected = set()
    t = geoms_table.to_pydict()
    for i in range(len(t["doc_id"])):
        xs = t["xs"][i]
        ys = t["ys"][i]
        minx, maxx = min(xs), max(xs)
        miny, maxy = min(ys), max(ys)
        for z in zooms:
            x1, y1 = xyz.tile_xy(minx, maxy, z)
            x2, y2 = xyz.tile_xy(maxx, miny, z)
            for xx in range(int(x1), int(x2) + 1):
                for yy in range(int(y1), int(y2) + 1):
                    expected.add((t["doc_id"][i], t["span_idx"][i], z, xx, yy))
    return expected


@pytest.mark.usefixtures("ray_session")
def test_tile_assignment_parity(corpus_dir, geoms_table):
    import ray.data as rd

    from grandine_ray.pipelines.tiler import features_dataset
    from grandine_ray.stages.coverage import make_coverage_fn

    zooms = [0, 2, 4, 6]
    docs = rd.read_parquet(f"{corpus_dir}/documents.parquet")
    tiled = features_dataset(docs).map_batches(
        make_coverage_fn(zooms), batch_format="pyarrow"
    )
    rows = tiled.take_all()
    got = set()
    for r in rows:
        z, x, y = (int(v) for v in xyz.tile_key_unpack(np.uint64(r["tile_key"])))
        got.add((r["doc_id"], r["span_idx"], z, x, y))
    assert got == _scalar_tile_sets(geoms_table, zooms)


@pytest.mark.usefixtures("ray_session")
def test_tiles_end_to_end(corpus_dir, geoms_table):
    import ray.data as rd

    from grandine_ray.pipelines.tiler import tile_dataset

    zooms = [0, 3, 5]
    docs = rd.read_parquet(f"{corpus_dir}/documents.parquet")
    tiles = tile_dataset(docs, zooms=zooms).take_all()
    assert tiles
    seen = {(r["z"], r["x"], r["y"]) for r in tiles}
    assert len(seen) == len(tiles)  # one row per tile
    # every non-empty expected tile appears (empty = all features clip away,
    # possible only for features exactly on tile borders)
    expected_keys = {(z, x, y) for (_, _, z, x, y) in _scalar_tile_sets(geoms_table, zooms)}
    assert seen <= expected_keys
    missing = expected_keys - seen
    assert len(missing) <= 0.02 * len(expected_keys)
    # every tile decodes and contains >=1 feature
    for r in tiles[:50]:
        layers = mvt.decode_tile(r["mvt"])
        assert layers
        n = sum(len(l["features"]) for l in layers.values())
        assert n >= 1


@pytest.mark.usefixtures("ray_session")
def test_salted_path_equals_plain(corpus_dir):
    import ray.data as rd

    from grandine_ray.pipelines.tiler import tile_dataset

    zooms = [0, 4]
    docs = rd.read_parquet(f"{corpus_dir}/documents.parquet")
    plain = {
        (r["z"], r["x"], r["y"]): r["mvt"]
        for r in tile_dataset(docs, zooms=zooms).take_all()
    }
    # force salting of every key with k=3
    all_keys = np.asarray(sorted({xyz.tile_key(z, x, y) for (z, x, y) in plain}),
                          dtype=np.uint64)
    salted = {
        (r["z"], r["x"], r["y"]): r["mvt"]
        for r in tile_dataset(docs, zooms=zooms, salt=True, salt_k=3,
                              hot_keys=all_keys).take_all()
    }
    assert set(plain) == set(salted)
    same = sum(plain[k] == salted[k] for k in plain)
    # identical canonical ordering → identical bytes
    assert same == len(plain), f"{same}/{len(plain)} tiles byte-identical"


@pytest.mark.usefixtures("ray_session")
def test_run_tiler_resume(tmp_path, corpus_dir):
    from grandine_ray.pipelines.tiler import run_tiler
    from grandine_ray.state.checkpoint import completed_partitions

    out1 = str(tmp_path / "full")
    m1 = run_tiler(f"{corpus_dir}/documents.parquet", out_dir=out1, zooms=[0, 3])
    rows1 = m1.take_all()
    assert all(r["status"] == "done" for r in rows1)
    done = completed_partitions(out1)
    assert done

    # simulate a partial run: copy half the partitions, resume, compare
    import shutil

    out2 = str(tmp_path / "resumed")
    (tmp_path / "resumed").mkdir()
    shutil.copytree(out1 + "/tiles", out2 + "/tiles")
    shutil.copytree(out1 + "/manifest", out2 + "/manifest")
    # drop half of the partitions from the "crashed" run
    import os

    kill = sorted(done)[::2]
    for pid in kill:
        os.remove(f"{out2}/tiles/p{pid}.parquet")
        os.remove(f"{out2}/manifest/p{pid}.json")
    m2 = run_tiler(f"{corpus_dir}/documents.parquet", out_dir=out2, zooms=[0, 3])
    m2.take_all()
    # resumed output identical to uninterrupted run
    assert completed_partitions(out2) == done
    for pid in sorted(done):
        t1 = pq.read_table(f"{out1}/tiles/p{pid}.parquet")
        t2 = pq.read_table(f"{out2}/tiles/p{pid}.parquet")
        assert t1.equals(t2), f"partition {pid} differs after resume"


@pytest.mark.usefixtures("ray_session")
def test_detect_hot_cells_collects_only_hot(corpus_dir):
    """The skew pre-pass must collect O(hot) rows to the driver, never the
    full per-tile count aggregate (up to ~2.7e8 rows at z14 planet scale)."""
    import ray.data as rd

    from grandine_ray.pipelines.tiler import detect_hot_cells, features_dataset
    from grandine_ray.stages.coverage import make_coverage_fn

    zooms = [0, 4, 6]
    docs = rd.read_parquet(f"{corpus_dir}/documents.parquet")
    feats = features_dataset(docs)
    n_tiles = (
        feats.map_batches(make_coverage_fn(zooms), batch_format="pyarrow")
        .select_columns(["tile_key"]).unique("tile_key")
    )
    n_tiles = len(n_tiles)
    assert n_tiles > 50  # the aggregate domain is genuinely larger

    stats: dict = {}
    hot = detect_hot_cells(None, zooms, sample_fraction=1.0, threshold=30,
                           features=feats, stats=stats)
    # the driver saw exactly the hot keys, nothing more
    assert stats["collected_rows"] == len(hot)
    assert len(hot) < n_tiles / 4
    # and the keys it found really are the hot ones (full-count ground truth)
    cov = feats.map_batches(make_coverage_fn(zooms),
                            batch_format="pyarrow").to_pandas()
    counts = cov.groupby("tile_key").size()
    want = set(counts[counts >= 30].index.astype(np.uint64))
    assert set(hot.tolist()) == want
