"""Remaining operator-surface tests: topology, zoom filter, center, fs seam."""
import numpy as np
import pyarrow as pa
import pytest

from grandine_ray.geom import wkb
from grandine_ray.geom.ops import line_center
from grandine_ray.geom.predicates import valid_topology
from grandine_ray.index import xyz
from grandine_ray.stages.coverage import make_coverage_fn


def test_valid_topology():
    # polygon_test.go:116-122
    assert valid_topology([np.array([[3, 4], [2, 9], [1, 4]], float)]) is True
    assert valid_topology([np.array([[3, 4], [2, 9], [1, 4], [1, 5]], float)]) is False


def test_line_center():
    # square centroid
    cx, cy = line_center(np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float))
    assert (round(cx, 9), round(cy, 9)) == (2.0, 2.0)


def test_coverage_zoom_visibility():
    # renderable semantics (tiler.go:230-248): zoom_min/max filter per zoom
    batch = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "span_idx": pa.array([0, 0, 0], pa.int32()),
            "geom_type": pa.array([1, 1, 1], pa.uint8()),
            "geom_wkb": pa.array([wkb.encode_point(10, 10)] * 3, pa.binary()),
            "bbox_minx": pa.array([10.0] * 3),
            "bbox_miny": pa.array([10.0] * 3),
            "bbox_maxx": pa.array([10.0] * 3),
            "bbox_maxy": pa.array([10.0] * 3),
            "layer": pa.array(["default"] * 3),
            "zoom_min": pa.array([0, 5, 0], pa.int8()),
            "zoom_max": pa.array([99, 99, 3], pa.int8()),
        }
    )
    out = make_coverage_fn([0, 4, 6])(batch)
    z, _, _ = xyz.tile_key_unpack(out["tile_key"].to_numpy(zero_copy_only=False))
    seen = sorted(zip(out["doc_id"].to_pylist(), z.tolist()))
    # a: all zooms; b: only z>=5 → 6; c: only z<=3 → 0
    assert seen == [("a", 0), ("a", 4), ("a", 6), ("b", 6), ("c", 0)]


def test_tile_writer_fs_seam(tmp_path):
    from grandine_ray.state.tilefs import TileWriter

    w = TileWriter(str(tmp_path))
    w.write_tile(3, 4, 5, b"abc", ext="mvt")
    assert (tmp_path / "3" / "4" / "5.mvt").read_bytes() == b"abc"
    # gzip variant (reference -compress flag, tiler.go:269-294)
    w2 = TileWriter(str(tmp_path), compress=True)
    w2.write_tile(3, 4, 6, b"abcabcabc", ext="mvt")
    import gzip

    assert gzip.decompress((tmp_path / "3" / "4" / "6.mvt.gz").read_bytes()) == b"abcabcabc"


def test_span_type_runs_brute_force(ray_session):
    """Longest same-kind run per doc == scalar RLE over the interleaved
    spans (earliest-run tie-break)."""
    import glob

    import pyarrow.parquet as pq

    from grandine_ray.pipelines.queries import q_span_type_runs
    from grandine_ray.sources import synth

    SF = "/root/testdata/sf0.001"
    corpus = synth.corpus_for_sf(SF)
    want = {}
    for f in sorted(glob.glob(f"{corpus}/documents/*.parquet")):
        t = pq.read_table(f, columns=["doc_id", "spans"])
        for did, spans in zip(t["doc_id"].to_pylist(),
                              t["spans"].to_pylist()):
            if not spans:
                continue
            best = (0, 0, None)  # (len, -start, kind) maximized
            cur_k, cur_len, cur_st = None, 0, 0
            for i, sp in enumerate(spans + [{"kind": None}]):
                k = sp["kind"]
                if k == cur_k:
                    cur_len += 1
                    continue
                if cur_k is not None and \
                        (cur_len, -cur_st) > (best[0], best[1]):
                    best = (cur_len, -cur_st, cur_k)
                cur_k, cur_len, cur_st = k, 1, i
            want[did] = (best[0], best[2])
    got = q_span_type_runs(SF).to_pandas()
    mine = {r.doc_id: (r.max_run, r.run_kind) for r in got.itertuples()}
    assert mine == want
    assert len(mine) > 0


def test_span_kind_bigrams_brute_force(ray_session):
    """Transition census == scalar pair count over the interleaved
    spans in span order."""
    import glob
    from collections import Counter

    import pyarrow.parquet as pq

    from grandine_ray.pipelines.queries import q_span_kind_bigrams
    from grandine_ray.sources import synth

    SF = "/root/testdata/sf0.001"
    corpus = synth.corpus_for_sf(SF)
    want: Counter = Counter()
    for f in sorted(glob.glob(f"{corpus}/documents/*.parquet")):
        t = pq.read_table(f, columns=["spans"])
        for spans in t["spans"].to_pylist():
            kinds = [sp["kind"] for sp in spans or []]
            for a, b in zip(kinds, kinds[1:]):
                want[(a, b)] += 1
    got = q_span_kind_bigrams(SF).to_pandas()
    mine = {(r.kind_a, r.kind_b): r.n_pairs for r in got.itertuples()}
    assert mine == dict(want) and len(mine) > 0


def test_media_ref_census_brute_force(ray_session):
    """Hot-asset histogram == scalar distinct-(doc, ref) count."""
    import glob
    from collections import Counter

    import pyarrow.parquet as pq

    from grandine_ray.pipelines.queries import q_media_ref_census
    from grandine_ray.sources import synth

    SF = "/root/testdata/sf0.001"
    corpus = synth.corpus_for_sf(SF)
    per_ref: Counter = Counter()
    for f in sorted(glob.glob(f"{corpus}/documents/*.parquet")):
        t = pq.read_table(f, columns=["doc_id", "spans"])
        for did, spans in zip(t["doc_id"].to_pylist(),
                              t["spans"].to_pylist()):
            refs = {sp["media_ref"] for sp in spans or []
                    if sp["media_ref"]}
            for r in refs:
                per_ref[r] += 1
    want = Counter(per_ref.values())
    got = q_media_ref_census(SF).to_pandas()
    mine = {r.n_docs: r.n_refs for r in got.itertuples()}
    assert mine == dict(want) and len(mine) > 0


def test_caption_context_brute_force(ray_session):
    """Media-neighbor census == scalar walk over spans in span order
    (neighbor kind incl. 'none' at doc edges; caption chars counted
    only for text-kind neighbors — geom spans carry WKB hex in .text
    and must contribute 0)."""
    import glob
    from collections import defaultdict

    import pyarrow.parquet as pq

    from grandine_ray.pipelines.queries import q_caption_context
    from grandine_ray.sources import synth

    SF = "/root/testdata/sf0.001"
    corpus = synth.corpus_for_sf(SF)
    acc = defaultdict(lambda: [0, 0, 0])        # n, sum_chars, max_chars
    for f in sorted(glob.glob(f"{corpus}/documents/*.parquet")):
        t = pq.read_table(f, columns=["spans"])
        for spans in t["spans"].to_pylist():
            spans = spans or []
            for i, sp in enumerate(spans):
                if sp["kind"] != "media":
                    continue
                for d, j in (("before", i - 1), ("after", i + 1)):
                    if 0 <= j < len(spans):
                        nk = spans[j]["kind"]
                        tc = len(spans[j]["text"]) if nk == "text" else 0
                    else:
                        nk, tc = "none", 0
                    a = acc[(d, nk)]
                    a[0] += 1
                    a[1] += tc
                    a[2] = max(a[2], tc)
    got = q_caption_context(SF).to_pandas()
    mine = {(r.direction, r.neighbor_kind):
            [r.n_media, r.sum_text_chars, r.max_text_chars]
            for r in got.itertuples()}
    assert mine == {k: list(v) for k, v in acc.items()} and len(mine) > 0
