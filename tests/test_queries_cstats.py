"""Corpus-statistics queries (queries_cstats.py): end-to-end DuckDB
parity at sf0.001 plus a brute-force cross-check of the source-overlap
pair expansion."""
import duckdb
import numpy as np
import pytest

from grandine_ray.pipelines import queries_cstats

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["events", "documents"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def _cmp(got_df, sql):
    want = _con().execute(sql).df()
    g = got_df.reindex(sorted(got_df.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    assert len(g) == len(w)
    assert sorted(g.columns) == sorted(w.columns)
    gs = sorted(map(tuple, g.astype(str).values.tolist()))
    ws = sorted(map(tuple, w.astype(str).values.tolist()))
    assert gs == ws


@pytest.mark.parametrize(
    "name",
    sorted(n for n in queries_cstats.QUERIES_CSTATS
           # expected-parquet oracles are pinned to the driver's sf0.01
           # inputs; their sf0.001 checks are the brute-force tests below
           if n not in ("compression_ratio", "pack_multimodal",
                        "video_frames", "audio_windows",
                        "lang_confusion", "simhash_hamming_pairs")))
def test_cstats_query_parity(ray_session, name):
    got = queries_cstats.QUERIES_CSTATS[name](SF).to_pandas()
    _cmp(got, queries_cstats.ORACLE_SQL_CSTATS[name])


def test_compression_ratio_brute_force(ray_session):
    import zlib

    import pyarrow.parquet as pq

    got = queries_cstats.q_compression_ratio(SF).to_pandas() \
        .set_index("doc_id")
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        row = got.loc[did]
        raw = len(txt.encode())
        comp = len(zlib.compress(txt.encode(), 6))
        assert row.raw_len == raw and row.zlib_len == comp
        assert row.ratio_micro == int(np.floor(comp / raw * 1e6 + 0.5))


def test_source_overlap_brute_force(ray_session):
    # independent oracle: python set intersections per source pair
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["source", "text"])
    vocab = {}
    for src, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        vocab.setdefault(src, set()).update(txt.lower().split())
    want = {}
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            n = len(vocab[a] & vocab[b])
            if n:
                want[(a, b)] = n
    got = queries_cstats.q_source_overlap(SF).to_pandas()
    got_map = {(r.src_a, r.src_b): r.n_common
               for r in got.itertuples()}
    assert got_map == want


def test_pack_multimodal_brute_force(ray_session):
    # scalar greedy packer over the sf0.001 interleaved corpus must
    # match the distributed pipeline exactly
    import pyarrow.parquet as pq

    from grandine_ray.oracle.expected import expected_pack_multimodal
    from grandine_ray.sources import synth

    corpus = synth.corpus_for_sf(SF)
    want = expected_pack_multimodal(corpus).to_pandas()
    got = queries_cstats.q_pack_multimodal(SF).to_pandas()
    g = sorted(map(tuple, got[["doc_id", "pack_id", "pack_pos",
                               "n_cost"]].values.tolist()))
    w = sorted(map(tuple, want[["doc_id", "pack_id", "pack_pos",
                                "n_cost"]].values.tolist()))
    assert g == w
    # every pack respects the budget unless it is a single oversized doc
    per = got.groupby("pack_id").agg(total=("n_cost", "sum"),
                                     k=("n_cost", "size"))
    bad = per[(per.total > queries_cstats.MM_BUDGET) & (per.k > 1)]
    assert len(bad) == 0


def test_video_frames_brute_force(ray_session):
    from grandine_ray.oracle.expected import expected_video_frames
    from grandine_ray.sources import synth

    corpus = synth.corpus_for_sf(SF)
    want = expected_video_frames(corpus).to_pandas()
    got = queries_cstats.q_video_frames(SF).to_pandas()
    cols = ["doc_id", "span_idx", "media_ref", "f0", "f1", "f2", "f3"]
    g = sorted(map(tuple, got[cols].values.tolist()))
    w = sorted(map(tuple, want[cols].values.tolist()))
    assert g == w and len(g) > 0


def test_audio_windows_brute_force(ray_session):
    from grandine_ray.oracle.expected import expected_audio_windows
    from grandine_ray.sources import synth

    corpus = synth.corpus_for_sf(SF)
    want = expected_audio_windows(corpus).to_pandas()
    got = queries_cstats.q_audio_windows(SF).to_pandas()
    cols = ["doc_id", "span_idx", "media_ref", "win_idx", "energy"]
    g = sorted(map(tuple, got[cols].values.tolist()))
    w = sorted(map(tuple, want[cols].values.tolist()))
    assert g == w and len(g) > 0
    # 256-byte payload, window 64, hop 32 ⇒ exactly 7 windows per span
    assert got.groupby(["doc_id", "span_idx"]).size().eq(7).all()


def test_pairs_within_groups_vs_itertools():
    import itertools

    import pyarrow as pa

    rng = np.random.default_rng(9)
    groups, items = [], []
    want = set()
    for g in range(30):
        k = int(rng.integers(1, 9))
        members = sorted({f"it{v:02d}" for v in
                          rng.choice(40, k, replace=False)})
        for m in members:
            groups.append(f"g{g}")
            items.append(m)
        for a, b in itertools.combinations(members, 2):
            want.add((f"g{g}", f"{a}\x1f{b}"))
    t = pa.table({"grp": groups, "item": items})
    got = queries_cstats.pairs_within_groups(t, "grp", "item")
    # pairs are per-group; recover group by re-deriving from the fixture
    from collections import Counter

    got_pairs = Counter(got["pair"].to_pylist())
    want_pairs = Counter(p for _, p in want)
    assert got_pairs == want_pairs


def test_lang_confusion_brute_force(ray_session):
    from grandine_ray.oracle.expected import expected_lang_confusion

    want = expected_lang_confusion(f"{SF}/documents.parquet").to_pandas()
    got = queries_cstats.q_lang_confusion(SF).to_pandas()
    g = sorted(map(tuple, got[["lang_pred", "lang", "n"]]
                   .values.tolist()))
    w = sorted(map(tuple, want[["lang_pred", "lang", "n"]]
                   .values.tolist()))
    assert g == w and len(g) > 0
    # totals must cover every document
    import pyarrow.parquet as pq
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert got.n.sum() == n_docs


def test_lexical_stats_brute_force(ray_session):
    # independent oracle: python Counter per source
    from collections import Counter

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["source", "text"])
    cnt: dict[str, Counter] = {}
    for src, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        cnt.setdefault(src, Counter()).update(txt.lower().split())
    got = queries_cstats.q_lexical_stats(SF).to_pandas() \
        .set_index("source")
    assert sorted(got.index) == sorted(s for s in cnt if cnt[s])
    for src, c in cnt.items():
        if not c:
            continue
        r = got.loc[src]
        tok, typ = sum(c.values()), len(c)
        hap = sum(1 for v in c.values() if v == 1)
        assert (r.n_tokens, r.n_types, r.n_hapax) == (tok, typ, hap)
        assert r.ttr_ppm == typ * 1_000_000 // tok
        assert r.hapax_ppm == hap * 1_000_000 // typ


def test_simhash_hamming_pairs_brute_force(ray_session):
    """Banded join == O(n²) popcount recompute over the ENGINE's own
    signatures at sf0.001 (the expected-parquet oracle covers the
    independent-signature check at sf0.01)."""
    from grandine_ray.pipelines import queries

    sigs = queries.q_simhash(SF).to_pandas()
    h = sigs.simhash.values.astype(np.uint64)
    did = sigs.doc_id.values.astype(np.int64)
    n = len(h)
    want = {}
    for i in range(n):
        x = np.bitwise_xor(h[i], h[i + 1:])
        ham = np.array([bin(int(v)).count("1") for v in x])
        for j in np.nonzero(ham <= queries_cstats.SIMHASH_HAM_T)[0]:
            a, b = did[i], did[i + 1 + j]
            want[(min(a, b), max(a, b))] = int(ham[j])
    got = queries_cstats.q_simhash_hamming_pairs(SF).to_pandas()
    mine = {(r.doc_a, r.doc_b): r.hamming for r in got.itertuples()}
    assert mine == want
    assert len(mine) > 0  # synth corpus plants duplicates
