"""Text-analysis operator tests: dedup, minhash recall, simhash, tokens."""
import numpy as np
import pyarrow as pa
import pytest

from grandine_ray.stages import text


def _batch(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_content_hash_exact_dedup():
    b = text.content_hash(_batch(["abc", "abc", "xyz", ""]))
    h = b["content_hash"].to_pylist()
    assert h[0] == h[1] != h[2]
    assert len({h[0], h[2], h[3]}) == 3


def test_token_counter():
    tc = text.TokenCounter()
    out = tc(_batch(["one two  three", "", "   ", "a,b c"]))
    assert out["n_tokens_ws"].to_pylist() == [3, 0, 0, 2]
    assert out["n_tokens_bpe"].to_pylist()[0] == 3
    assert out["n_tokens_bpe"].to_pylist()[3] == 4  # a , b c


def test_quality_scorer():
    qs = text.QualityScorer()
    out = qs(_batch(["the cat and the dog", "!!!!"]))
    assert out["doc_len"].to_pylist() == [19, 4]
    assert out["stop_ratio"].to_pylist()[0] == pytest.approx(3 / 5)
    assert out["alpha_ratio"].to_pylist()[1] == 0.0


def test_lang_id():
    out = text.LangId()(_batch([
        "the quick fox is in the barn and it is fine",
        "der Hund und die Katze das ist nicht gut",
    ]))
    assert out["lang_pred"].to_pylist() == ["en", "de"]


def test_minhash_jaccard_estimation():
    mh = text.MinHasher(n_perm=128)
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("lazy", "sleepy")
    c = "completely different content about other things entirely " * 5
    sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
    est_ab = (sa == sb).mean()
    est_ac = (sa == sc).mean()
    true_ab = text.jaccard(a, b)
    assert abs(est_ab - true_ab) < 0.15
    assert est_ac < 0.1 < est_ab


def test_minhash_lsh_finds_planted_near_dups():
    base = "this is a long document about geospatial data processing " * 8
    texts = [base, base.replace("data", "info"),
             "unrelated text entirely different " * 8]
    mh = text.MinHasher()
    sigs = mh(_batch(texts))
    bands = text.lsh_bands(sigs, id_col="doc_id")
    import collections

    buckets = collections.defaultdict(set)
    for r in bands.to_pylist():
        buckets[(r["band_id"], r["band_hash"])].add(r["doc_id"])
    pairs = {tuple(sorted(p)) for b in buckets.values() if len(b) > 1
             for i, p1 in enumerate(sorted(b)) for p2 in sorted(b)[i + 1:]
             for p in [(p1, p2)]}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_near_dup_low_hamming():
    sh = text.SimHasher()
    base = "the quick brown fox jumps over the lazy dog " * 10
    out = sh(_batch([base, base + " extra tail", "something wholly different " * 10]))
    h = out["simhash"].to_pylist()
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(h[0], h[1]) < 10
    assert ham(h[0], h[2]) > 15


def test_rolling_fingerprint_deterministic():
    b1 = text.rolling_fingerprint(_batch(["hello world " * 10, "short"]))
    b2 = text.rolling_fingerprint(_batch(["hello world " * 10, "short"]))
    assert b1["fingerprint"].to_pylist() == b2["fingerprint"].to_pylist()


def test_lsh_bands_shape():
    mh = text.MinHasher(n_perm=64)
    sigs = mh(_batch(["a" * 50, "b" * 50]))
    bands = text.lsh_bands(sigs, n_bands=16, id_col="doc_id")
    assert bands.num_rows == 2 * 16


def test_minhash_short_doc_deterministic_across_processes(ray_session):
    """<k-char docs must hash identically in separate Ray worker processes.

    Guards the blake2b fix in _shingles: Python hash() is SipHash with a
    per-process seed, which made tiny-doc signatures nondeterministic.
    """
    import ray

    @ray.remote(max_calls=1)  # max_calls=1 forces a fresh worker process
    def sig(t):
        from grandine_ray.stages.text import MinHasher
        return MinHasher().signature(t).tolist()

    for t in ["ab", "", "x", "abc "]:
        a = ray.get(sig.remote(t))
        b = ray.get(sig.remote(t))
        assert a == b, f"nondeterministic signature for short doc {t!r}"


def test_lsh_candidate_cap_keeps_megabucket_connected(ray_session):
    """A bucket of identical docs larger than band_cap must produce a
    CONNECTED candidate graph with O(B*cap) pairs, not O(B^2)."""
    import ray.data as rd

    n = 40
    docs = rd.from_arrow(_batch(["identical document text " * 5] * n))
    sigs = docs.map_batches(text.minhasher_batch, batch_format="pyarrow")
    bands = sigs.map_batches(lambda b: text.lsh_bands(b, id_col="doc_id"),
                             batch_format="pyarrow")
    cand = text.lsh_candidate_pairs(bands, band_cap=8).to_pandas()
    # bounded: far fewer than the 780 all-pairs
    assert len(cand) < 40 * 8
    # connected: union-find over the pairs reaches all 40 docs
    parent = list(range(n))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        parent[find(int(a))] = find(int(b))
    assert len({find(i) for i in range(n)}) == 1


def test_minhash_near_dup_matches_planted(ray_session):
    """End-to-end distributed pipeline finds the planted near-dup pair."""
    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog " * 8
    texts = [base, base + "extra tail.", "completely different content here " * 8,
             "unrelated words that share nothing with the fox sentences " * 6]
    out = text.minhash_near_dup(
        rd.from_arrow(_batch(texts)), threshold=0.5).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in pairs
    assert all({a, b} == {0, 1} for a, b in pairs)


def test_dedup_clusters_known_graph(ray_session):
    """Chain 1-2-3-4, triangle 10-11-12, pair 20-21: min-label propagation
    must converge to the component minimum for every node."""
    import pyarrow as pa
    import ray.data as rd

    pairs = pa.table({
        "doc_a": pa.array([1, 2, 3, 10, 11, 10, 20], pa.int64()),
        "doc_b": pa.array([2, 3, 4, 11, 12, 12, 21], pa.int64()),
    })
    out = text.dedup_clusters(rd.from_arrow(pairs)).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_jaccard_exact_matches_bruteforce_both_paths(ray_session):
    """The prefix-filter inverted-index join must reproduce brute-force
    all-pairs n-gram Jaccard exactly, through BOTH verify paths
    (broadcast signature payload and partitioned blob joins)."""
    import ray.data as rd

    base = "large scale training data pipelines need deduplication " * 6
    texts = [
        base,
        base.replace("data", "info"),                  # near-dup of 0
        base + " with an extra suffix sentence",       # near-dup of 0
        "completely different content about tiles " * 6,
        "another unrelated document on encoders " * 6,
        "short",
        "short",                                       # exact dup of 5
    ]
    ids = list(range(len(texts)))
    # brute force ground truth
    expected = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if text.jaccard(texts[i], texts[j]) >= 0.5:
                expected.add((i, j))
    assert (0, 1) in expected and (5, 6) in expected

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    for mode in ("broadcast", "partitioned"):
        out = text.jaccard_near_dup_exact(
            docs, threshold=0.5, num_partitions=4, force=mode)
        got = {(r["doc_a"], r["doc_b"]) for r in out.take_all()}
        assert got == expected, mode


def test_jaccard_exact_jaccard_values_match_scalar(ray_session):
    """Co-count/(|A|+|B|-co) from signature blobs must equal the scalar
    jaccard() helper to 4 decimals."""
    import ray.data as rd

    a = "alpha beta gamma delta epsilon zeta eta theta " * 4
    b = a.replace("delta", "kappa")
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([a, b], pa.string()),
    }))
    out = text.jaccard_near_dup_exact(docs, threshold=0.0).take_all()
    pair = [r for r in out if r["doc_a"] == 1 and r["doc_b"] == 2]
    assert len(pair) == 1
    assert pair[0]["jaccard"] == round(text.jaccard(a, b), 4)


def test_cluster_size_hist_matches_union_find(ray_session):
    """q_cluster_size_hist must equal an independent union-find over the
    same near-dup pair set (sf0.001 documents)."""
    import ray.data as rd

    from grandine_ray.pipelines.queries import (q_cluster_size_hist,
                                                q_dedup_clusters)

    sf = "/root/testdata/sf0.001"
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = text.minhash_near_dup(docs, threshold=0.5).to_pandas()
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    from collections import Counter
    sizes = Counter(find(x) for x in list(parent))
    want = Counter(sizes.values())

    got = q_cluster_size_hist(sf).to_pandas()
    assert dict(zip(got["cluster_size"], got["n_clusters"])) == dict(want)
    # and the labels themselves agree with the union-find roots
    lab = q_dedup_clusters(sf).to_pandas()
    assert {int(d): int(c) for d, c in
            zip(lab["doc_id"], lab["cluster_id"])} \
        == {x: find(x) for x in list(parent)}


def test_mix_sources_matches_pandas_recompute(ray_session):
    """Temperature mixing: quota, keep mask and per-source sums must
    equal a direct pandas recomputation of the documented rule."""
    import math

    import pandas as pd

    from grandine_ray.pipelines.queries import q_mix_sources

    sf = "/root/testdata/sf0.001"
    df = pd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"])
    n = df.groupby("source")["doc_id"].count()
    quota = n.combine(n, lambda v, _: min(v, 3 * math.isqrt(int(v))))
    h = ((df["doc_id"] % 4194304) * 2654435761) % 4294967296
    keep = df[(h % df["source"].map(n)) < df["source"].map(quota)]
    want = keep.groupby("source").agg(
        n_kept=("doc_id", "count"), chars_kept=("n_chars", "sum"))

    got = q_mix_sources(sf).to_pandas().set_index("source").sort_index()
    assert list(got.index) == sorted(want.index)
    assert got["n_kept"].tolist() == want.sort_index()["n_kept"].tolist()
    assert got["chars_kept"].tolist() == \
        want.sort_index()["chars_kept"].tolist()
    assert got["n_total"].tolist() == [int(n[s]) for s in got.index]
    assert got["quota"].tolist() == [int(quota[s]) for s in got.index]
    # the flattening actually bites: every source kept strictly fewer
    assert (got["n_kept"] < got["n_total"]).any()


def test_passage_dedup_matches_bruteforce(ray_session):
    """q_passage_dedup must equal a pure-python brute-force pass over
    the whole sf0.001 corpus (independent of both DuckDB and the Ray
    kernels): chunk in 10-word windows, first corpus-wide occurrence by
    (doc_id, chunk_idx) wins, docs rebuilt from surviving chunks."""
    import pandas as pd

    from grandine_ray.pipelines.queries import PASSAGE_W, q_passage_dedup

    sf = "/root/testdata/sf0.001"
    df = pd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]) \
        .sort_values("doc_id")
    seen = {}
    want = {}
    for doc, text in zip(df["doc_id"], df["text"]):
        toks = text.split(" ")
        kept = []
        for ci in range(0, len(toks), PASSAGE_W):
            chunk = " ".join(toks[ci:ci + PASSAGE_W])
            key = (int(doc), ci // PASSAGE_W)
            if seen.setdefault(chunk, key) == key:
                kept.append(chunk)
        if kept:
            want[int(doc)] = (" ".join(kept), len(kept))

    got = q_passage_dedup(sf).to_pandas()
    assert len(got) == len(want)
    for doc, text, n in zip(got["doc_id"], got["text_dedup"],
                            got["n_chunks_kept"]):
        assert want[int(doc)] == (text, int(n)), doc
    # dedup actually bites at this scale: some doc must lose a chunk
    assert any(want[int(d)][0] != t
               for d, t in zip(df["doc_id"], df["text"])
               if int(d) in want)


def test_cluster_representatives_argmin_rule(ray_session):
    """The representative of every cluster must be its member with the
    most chars, ties to the smallest doc_id (recomputed directly from
    the labels + documents in pandas)."""
    import pandas as pd

    from grandine_ray.pipelines.queries import (q_cluster_representatives,
                                                q_dedup_clusters)

    sf = "/root/testdata/sf0.001"
    lab = q_dedup_clusters(sf).to_pandas()
    nchars = pd.read_parquet(f"{sf}/documents.parquet",
                             columns=["doc_id", "n_chars"]) \
        .set_index("doc_id")["n_chars"]
    want = {}
    for cid, grp in lab.groupby("cluster_id"):
        members = sorted((-int(nchars[d]), int(d))
                         for d in grp["doc_id"])
        want[int(cid)] = (members[0][1], -members[0][0], len(grp))

    got = q_cluster_representatives(sf).to_pandas()
    assert len(got) == len(want)
    for cid, rep, nc, sz in zip(got["cluster_id"], got["rep_doc_id"],
                                got["rep_n_chars"], got["cluster_size"]):
        assert want[int(cid)] == (int(rep), int(nc), int(sz)), cid


def test_substring_dedup_matches_bruteforce(ray_session):
    """q_substring_dedup must equal a pure-python brute-force pass over
    the whole sf0.001 corpus (independent of both DuckDB and the Ray
    kernels): every 8-word sliding window counted corpus-wide, windows
    seen >=2 times marked, consecutive marked offsets merged into
    maximal runs per doc."""
    from collections import Counter

    import pandas as pd

    from grandine_ray.pipelines.queries import SUBSTR_W, q_substring_dedup

    sf = "/root/testdata/sf0.001"
    df = pd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"])
    wins = []            # (doc, i) in corpus order
    counts = Counter()
    for doc, text in zip(df["doc_id"], df["text"]):
        toks = text.split(" ")
        for i in range(len(toks) - SUBSTR_W + 1):
            gram = " ".join(toks[i:i + SUBSTR_W])
            wins.append((int(doc), i + 1, gram))
            counts[gram] += 1
    per_doc: dict[int, list[int]] = {}
    for doc, i, gram in wins:
        if counts[gram] >= 2:
            per_doc.setdefault(doc, []).append(i)
    want = {}
    for doc, offs in per_doc.items():
        runs = []
        lo = prev = offs[0]
        for i in offs[1:]:
            if i != prev + 1:
                runs.append((lo, prev))
                lo = i
            prev = i
        runs.append((lo, prev))
        lens = [hi - lo + SUBSTR_W for lo, hi in runs]
        want[doc] = (len(runs), sum(lens), max(lens))

    got = q_substring_dedup(sf).to_pandas()
    assert len(got) == len(want) and len(want) > 0
    for doc, nr, dt, mr in zip(got["doc_id"], got["n_runs"],
                               got["dup_tokens"], got["max_run_tokens"]):
        assert want[int(doc)] == (int(nr), int(dt), int(mr)), doc
    # sliding windows actually merge: some run must be LONGER than one
    # window (the capability passage_dedup's fixed chunks lack)
    assert got["max_run_tokens"].max() > SUBSTR_W


def test_incremental_dedup_matches_union_dedup(ray_session):
    """incremental_dedup (bloom prefilter + anti join against the
    persisted fingerprint snapshot) must equal brute-force 'dedup of
    batch ∪ snapshot, restricted to batch newcomers' computed in pure
    pandas — and must keep working from the cached snapshot on a second
    call."""
    import shutil

    import pandas as pd

    from grandine_ray.pipelines.queries import (SNAP_MOD, SNAP_PREFIX_W,
                                                q_incremental_dedup)

    sf = "/root/testdata/sf0.001"
    shutil.rmtree("/tmp/graft_snapshots/sf0.001_fp", ignore_errors=True)
    df = pd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"])
    df["fp"] = [" ".join(t.split(" ")[:SNAP_PREFIX_W]) for t in df["text"]]
    snap_fps = set(df[df["doc_id"] % SNAP_MOD != 0]["fp"])
    batch = df[df["doc_id"] % SNAP_MOD == 0]
    grp = batch.groupby("fp")["doc_id"].agg(["min", "count"])
    want = {int(r["min"]): int(r["count"])
            for fp, r in grp.iterrows() if fp not in snap_fps}

    for attempt in ("cold", "cached"):
        got = q_incremental_dedup(sf).to_pandas()
        assert len(got) == len(want) and len(want) > 0, attempt
        for doc, n in zip(got["doc_id"], got["n_batch_dups"]):
            assert want[int(doc)] == int(n), (attempt, doc)
    # the snapshot actually bites: some batch doc must have been dropped
    assert len(want) < batch["fp"].nunique()
