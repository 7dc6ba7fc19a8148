"""Corpus-hygiene stages: vectorized word-n-gram hashing vs scalar string
sets, decontamination end-to-end, packing invariants, Gopher signals."""
import numpy as np
import pyarrow as pa
import pytest

from grandine_ray.stages import corpus

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "",
    "   ",
    "one",
    "a a a a a a a a",
    "Mixed CASE and   irregular   spacing here",
    "tab\tand\nnewline separated words go here too",
    "ünïcode wörds höher än ascii",
    "the quick brown fox jumps over the lazy dog",  # dup of [0]
    "quick brown fox jumps over the lazy",          # 7-word sub-slice
]


def _scalar_ngrams(text, n):
    import re
    words = re.sub(r"\s+", " ", (text or "").lower()).strip().split(" ")
    if words == [""]:
        words = []
    return {tuple(words[i:i + n]) for i in range(len(words) - n + 1)}


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_ngram_hashes_match_string_sets(n):
    H, doc_of = corpus.batch_word_ngram_hashes(TEXTS, n)
    for i, t in enumerate(TEXTS):
        want = len(_scalar_ngrams(t, n))
        got = int(np.count_nonzero(doc_of == i))
        assert got == want, (i, t)
    # identical docs produce identical hash sets; distinct docs distinct
    h0 = set(H[doc_of == 0].tolist())
    h8 = set(H[doc_of == 8].tolist())
    assert h0 == h8
    h9 = set(H[doc_of == 9].tolist())
    if n <= 7:
        assert h9 <= h0


def test_ngram_hashes_random_corpus_counts():
    rng = np.random.default_rng(42)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 40)))
             for _ in range(200)]
    for n in (2, 5):
        H, doc_of = corpus.batch_word_ngram_hashes(texts, n)
        for i, t in enumerate(texts):
            assert int(np.count_nonzero(doc_of == i)) == \
                len(_scalar_ngrams(t, n))


def test_decontaminate_bruteforce(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(1)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, rng.integers(5, 25)))
             for _ in range(120)]
    ids = np.arange(120, dtype=np.int64)
    bench_mask = ids % 9 == 0
    tbl = pa.table({"doc_id": ids, "text": texts})
    docs = rd.from_arrow(tbl).repartition(4)
    bench = rd.from_arrow(tbl.filter(pa.array(bench_mask)))
    train = rd.from_arrow(tbl.filter(pa.array(~bench_mask)))
    out = {r["doc_id"]: r["n_hits"]
           for r in corpus.decontaminate(train, bench, n=3).take_all()}
    bench_set = set()
    for i in np.nonzero(bench_mask)[0]:
        bench_set |= _scalar_ngrams(texts[i], 3)
    for i in np.nonzero(~bench_mask)[0]:
        hits = len(_scalar_ngrams(texts[i], 3) & bench_set)
        assert out.get(int(i), 0) == hits


def test_pack_sequences_invariants(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(2)
    ids = np.arange(437, dtype=np.int64)
    toks = rng.integers(1, 90, len(ids)).astype(np.int64)
    toks[17] = 500  # oversized doc
    ds = rd.from_arrow(pa.table({"doc_id": ids, "n_tokens": toks})) \
        .repartition(6)
    out = corpus.pack_sequences(ds, budget=256, shard_size=50).take_all()
    assert len(out) == len(ids)
    rows = sorted((r["pack_id"], r["pack_pos"], r["doc_id"], r["n_tokens"])
                  for r in out)
    by_pack: dict = {}
    for pid, pos, did, nt in rows:
        by_pack.setdefault(pid, []).append((pos, did, nt))
    for pid, members in by_pack.items():
        members.sort()
        # contiguous positions, doc order, shard bound, budget respected
        assert [p for p, _, _ in members] == list(range(len(members)))
        dids = [d for _, d, _ in members]
        assert dids == sorted(dids)
        assert len({d // 50 for d in dids}) == 1
        tot = sum(t for _, _, t in members)
        assert tot <= 256 or len(members) == 1
    # greedy: a pack closes only because the NEXT doc would overflow
    pids = sorted(by_pack)
    for a, b in zip(pids, pids[1:]):
        if a // 1_000_000 != b // 1_000_000:
            continue
        first_next = min(by_pack[b])[2]
        tot_a = sum(t for _, _, t in by_pack[a])
        assert tot_a + first_next > 256


def test_gopher_stats_scalar_parity():
    from collections import Counter
    import math
    import re

    batch = pa.table({"doc_id": np.arange(len(TEXTS), dtype=np.int64),
                      "text": TEXTS})
    out = corpus.gopher_stats(batch)
    for i, t in enumerate(TEXTS):
        words = re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        if words == [""]:
            words = []
        n = len(words)
        grams = [tuple(words[j:j + 2]) for j in range(n - 1)]
        top = max(Counter(grams).values()) if grams else 0
        um = math.floor(len(set(words)) / n * 1e6 + 0.5) if n else 0
        tm = math.floor(top / len(grams) * 1e6 + 0.5) if grams else 0
        assert out["n_words"][i].as_py() == n
        assert out["uniq_word_micro"][i].as_py() == um
        assert out["top2gram_micro"][i].as_py() == tm
        keep = int(n >= 15 and um >= 300_000 and tm <= 200_000)
        assert out["keep"][i].as_py() == keep


def test_tfidf_top_terms_bruteforce(ray_session):
    import math
    from collections import Counter

    import ray.data as rd

    rng = np.random.default_rng(8)
    vocab = [f"w{i:02d}" for i in range(25)]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 40)))
             for _ in range(150)]
    ids = np.arange(150, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts})) \
        .repartition(5)
    out = corpus.tfidf_top_terms(ds, n_docs=150, k=3).take_all()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["rnk"], r["term"], r["tf"], r["score_micro"]))
    df = Counter()
    for t in texts:
        df.update(set(t.split()))
    for i, t in enumerate(texts):
        tf = Counter(t.split())
        scored = sorted(
            ((-math.floor(c * math.log(150 / df[w]) * 1e6 + 0.5), w, c)
             for w, c in tf.items()))
        want = [(j + 1, w, c, -s) for j, (s, w, c) in enumerate(scored[:3])]
        assert sorted(got[int(i)]) == want, i


def test_bm25_bruteforce(ray_session):
    import math
    from collections import Counter

    import ray.data as rd

    rng = np.random.default_rng(33)
    vocab = [f"w{i:02d}" for i in range(20)]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 30)))
             for _ in range(120)]
    ids = np.arange(120, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts})) \
        .repartition(4)
    queries = [("a", ["w00", "w07"]), ("b", ["w15"])]
    total = sum(len(t.split()) for t in texts)
    out = corpus.bm25_search(ds, queries, n_docs=120, total_tokens=total,
                             k=5).take_all()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append(
            (r["rnk"], r["doc_id"], r["score_micro"]))
    # scalar reference
    N, avgdl = 120, total / 120
    df = Counter()
    for t in texts:
        df.update(set(t.split()))
    k1, b = 1.2, 0.75
    for qid, terms in queries:
        scored = []
        for i, t in enumerate(texts):
            tf = Counter(t.split())
            if not any(tf[w] for w in terms):
                continue
            s = 0.0
            dl = len(t.split())
            for w in terms:
                idf = math.log((N - df[w] + 0.5) / (df[w] + 0.5) + 1)
                s += idf * tf[w] * (k1 + 1) / (
                    tf[w] + k1 * (1 - b + b * dl / avgdl))
            scored.append((-math.floor(s * 1e6 + 0.5), i))
        scored.sort()
        want = [(j + 1, i, -s) for j, (s, i) in enumerate(scored[:5])]
        assert sorted(got[qid]) == want, qid
