"""Training-data text operators over the documents table.

All operators are vectorized ``map_batches`` kernels or pre-aggregated
groupbys; stateful ones (compiled regexes, stopword sets, hash seeds) are
actor-pool callables with state built in ``__init__``.

Operators: exact dedup, token counting, quality scoring, language-ID
(n-gram heuristic), MinHash+LSH near-dup, SimHash, n-gram Jaccard verify,
rolling-hash fingerprinting.
"""
from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

_WS = re.compile(r"\s+")
_WORD = re.compile(r"\w+", re.UNICODE)

STOPWORDS = {
    "the", "and", "of", "a", "to", "in", "is", "it", "that", "was", "for",
    "on", "are", "as", "with", "at", "by", "an", "be", "this", "or", "from",
}

# tiny per-language character/stopword profiles for the n-gram heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is"},
    "de": {"der", "die", "und", "das", "ist", "nicht"},
    "fr": {"le", "la", "et", "les", "des", "est"},
    "es": {"el", "la", "de", "los", "que", "es"},
}


def content_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    """Add a stable 64-bit content hash column (exact-dedup key).

    Emitted as int64 (same bits as the blake2b uint64): Ray's groupby
    materializes group keys as Python ints, and values > 2^63 overflow
    the Arrow int64 rebuild, silently demoting downstream blocks to
    pickled object arrays (r3 pitfall, CLAUDE.md)."""
    texts = batch[col].to_pylist()
    hashes = np.fromiter(
        (int.from_bytes(hashlib.blake2b(
            (t or "").encode("utf-8"), digest_size=8).digest(), "little")
         for t in texts),
        dtype=np.uint64,
        count=len(texts),
    )
    return batch.append_column("content_hash",
                               pa.array(hashes.view(np.int64), pa.int64()))


class TokenCounter:
    """Whitespace + BPE-ish regex token counts (actor: compiled regexes)."""

    def __init__(self):
        self.ws = _WS
        self.bpe = re.compile(r"[A-Za-z]+|\d|[^\sA-Za-z\d]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_ws = np.fromiter(
            (len(self.ws.split(t.strip())) if t and t.strip() else 0 for t in texts),
            dtype=np.int64, count=len(texts),
        )
        n_bpe = np.fromiter(
            (len(self.bpe.findall(t)) if t else 0 for t in texts),
            dtype=np.int64, count=len(texts),
        )
        return batch.append_column("n_tokens_ws", pa.array(n_ws)).append_column(
            "n_tokens_bpe", pa.array(n_bpe)
        )


class QualityScorer:
    """Length / punctuation / stopword-ratio quality features."""

    def __init__(self):
        self.word = _WORD
        self.stop = STOPWORDS

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        length = np.empty(n, dtype=np.int64)
        alpha_ratio = np.empty(n, dtype=np.float64)
        stop_ratio = np.empty(n, dtype=np.float64)
        mean_word_len = np.empty(n, dtype=np.float64)
        for i, t in enumerate(texts):
            t = t or ""
            length[i] = len(t)
            words = self.word.findall(t.lower())
            n_alpha = sum(c.isalpha() for c in t)
            alpha_ratio[i] = n_alpha / len(t) if t else 0.0
            stop_ratio[i] = (
                sum(w in self.stop for w in words) / len(words) if words else 0.0
            )
            mean_word_len[i] = (
                sum(len(w) for w in words) / len(words) if words else 0.0
            )
        return (
            batch.append_column("doc_len", pa.array(length))
            .append_column("alpha_ratio", pa.array(np.round(alpha_ratio, 6)))
            .append_column("stop_ratio", pa.array(np.round(stop_ratio, 6)))
            .append_column("mean_word_len", pa.array(np.round(mean_word_len, 6)))
        )


class LangId:
    """Stopword-profile language heuristic (no external models)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = []
        for t in texts:
            words = set(_WORD.findall((t or "").lower()[:1000]))
            best, score = "unknown", 0
            for lang, profile in _LANG_PROFILES.items():
                s = len(words & profile)
                if s > score:
                    best, score = lang, s
            out.append(best)
        return batch.append_column("lang_pred", pa.array(out, pa.string()))


# ------------------------------------------------------------------ MinHash
#
# Shingle/word hashing is a seeded POLYNOMIAL hash over Unicode code
# points, H(s) = Σ_i (ord(s_i)+1)·B^i (mod 2^64), B odd — not blake2b:
# the prefix-sum factorization H(s[a:b]) = (A[b]−A[a])·B^−a (B is
# invertible mod 2^64) lets ONE cumulative numpy pass over a batch's
# concatenated code points produce every k-gram hash of every document
# (classic Rabin–Karp rolling hash; same family as rolling_fingerprint
# below). Deterministic across processes — no SipHash seeding issues.

_POLY_B = 0x9E3779B97F4A7C15          # odd ⇒ invertible mod 2**64
_POLY_BINV = pow(_POLY_B, -1, 1 << 64)
_U64_MASK = (1 << 64) - 1


def _poly_hash_str(s: str) -> int:
    """Scalar reference of the batch hash (tests / tiny inputs)."""
    h = 0
    bp = 1
    for c in s:
        h = (h + (ord(c) + 1) * bp) & _U64_MASK
        bp = (bp * _POLY_B) & _U64_MASK
    return h


_POW_BLOCK = 4096
_POW_CACHE: dict = {}


def _powers(base: int, m: int) -> np.ndarray:
    """[base^0 … base^(m-1)] mod 2^64 — numpy cumprod over uint64 is a
    slow scalar loop, so powers are built block-wise: one cached
    _POW_BLOCK-long cumprod + an outer product with the cached
    (base^block)^j ladder (one vectorized multiply over m elements)."""
    blk = _POW_CACHE.get(base)
    if blk is None:
        b = np.empty(_POW_BLOCK, np.uint64)
        b[0] = 1
        np.cumprod(np.full(_POW_BLOCK - 1, base, np.uint64), out=b[1:])
        step = int(b[-1]) * base & _U64_MASK  # base^block
        blk = _POW_CACHE[base] = (b, step)
    b, step = blk
    if m <= _POW_BLOCK:
        return b[:m]
    n_blocks = -(-m // _POW_BLOCK)
    ladder = np.empty(n_blocks, np.uint64)
    ladder[0] = 1
    if n_blocks > 1:
        np.cumprod(np.full(n_blocks - 1, step, np.uint64), out=ladder[1:])
    return (ladder[:, None] * b[None, :]).reshape(-1)[:m]


def _poly_prefix(cp: np.ndarray):
    """Prefix machinery over a concatenated code-point array: returns
    (A, Binvpow) with A[j] = Σ_{i<j} (cp_i+1)·B^i and Binvpow[j] = B^−j,
    all mod 2^64 (numpy uint64 wraparound)."""
    total = len(cp)
    A = np.zeros(total + 1, np.uint64)
    if total:
        np.cumsum((cp.astype(np.uint64) + np.uint64(1))
                  * _powers(_POLY_B, total), out=A[1:])
    return A, _powers(_POLY_BINV, total + 1)


def _hash_slices(A, Binvpow, starts, stops):
    """H of each [start, stop) slice via the prefix factorization."""
    return (A[stops] - A[starts]) * Binvpow[starts]


def _codepoints(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


def _batch_shingle_hashes(texts, k: int = 5, unique: bool = True):
    """All k-gram hashes of ALL docs in one vectorized pass.

    Returns ``(hashes, offsets)``: per-doc shingle hashes concatenated in
    doc order (doc i owns hashes[offsets[i]:offsets[i+1]]); sorted-unique
    per doc when ``unique`` (set-semantics consumers: Jaccard), raw
    in-text order otherwise (min-semantics consumers: MinHash — dup
    shingles can't change a min, and skipping the sort is ~25 % of the
    pass). Docs shorter than k contribute the single whole-string hash;
    every doc contributes at least one hash (empty string hashes to 0).

    The window hashes come from CONTIGUOUS prefix-array slices —
    ``(A[k:] − A[:−k]) · B^−s`` over the whole concatenated corpus — with
    windows straddling a doc boundary masked out afterwards; no gather in
    the hot path.
    """
    n = len(texts)
    if n == 0:
        return np.empty(0, np.uint64), np.zeros(1, np.int64)
    cps = [_codepoints(_WS.sub(" ", (t or "").lower()).strip())
           for t in texts]
    lens = np.fromiter((len(c) for c in cps), np.int64, count=n)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    total = int(offs[-1])
    cp = np.concatenate(cps) if total else np.empty(0, np.uint32)
    A, Binvpow = _poly_prefix(cp)
    counts = np.where(lens >= k, lens - k + 1, 1)
    n_win_all = max(total - k + 1, 0)
    if n_win_all:
        Hall = (A[k:] - A[:-k]) * Binvpow[:n_win_all]
        # windows fully inside one doc: delta-mask over start positions
        delta = np.zeros(n_win_all + 1, np.int32)
        long_docs = np.nonzero(lens >= k)[0]
        np.add.at(delta, offs[long_docs], 1)
        np.add.at(delta, offs[long_docs] + counts[long_docs], -1)
        valid = np.cumsum(delta[:-1]) > 0
    short_docs = np.nonzero(lens < k)[0]
    if len(short_docs) == 0 and n_win_all:
        H = Hall[valid]
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    else:
        # rare path: some docs are shorter than k — merge their single
        # whole-string hash into doc order with one stable argsort
        H_short = _hash_slices(A, Binvpow, offs[short_docs],
                               offs[short_docs + 1])
        H_long = Hall[valid] if n_win_all else np.empty(0, np.uint64)
        long_docs = np.nonzero(lens >= k)[0]
        d_all = np.concatenate([
            np.repeat(long_docs, counts[long_docs]), short_docs])
        H_all = np.concatenate([H_long, H_short])
        order = np.argsort(d_all, kind="stable")
        H = H_all[order]
        doc_of = d_all[order]
    out_offs = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=out_offs[1:])
    if not unique:
        return H, out_offs
    # per-doc sorted unique: one lexsort over (doc, hash), adjacent dedup
    order = np.lexsort((H, doc_of))
    H = H[order]
    doc_of = doc_of[order]
    keep = np.ones(len(H), bool)
    if len(H) > 1:
        keep[1:] = (H[1:] != H[:-1]) | (doc_of[1:] != doc_of[:-1])
    H = H[keep]
    doc_of = doc_of[keep]
    out_offs = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(doc_of, minlength=n), out=out_offs[1:])
    return H, out_offs


def _shingles(text: str, k: int = 5) -> np.ndarray:
    """Sorted-unique k-gram hashes of one doc (scalar convenience)."""
    h, _ = _batch_shingle_hashes([text], k)
    return h


def word_window_hashes(col, L: int):
    """All L-word sliding-window hashes of a string column — zero Python
    loops, two chained polynomial prefix passes.

    Tokenization is ``split_pattern(col, " ")`` (DuckDB ``string_split``
    parity — empty tokens from doubled spaces survive on both sides).
    Level 1 hashes every token straight from the flattened utf8 value
    buffer (``_hash_slices`` over the byte prefix array); level 2 runs
    the same prefix machinery over the token-hash sequence, so a window
    hash covers the exact token SEQUENCE (boundaries included for free:
    tokens are atomic level-2 symbols). Windows straddling a row
    boundary are delta-masked out like _batch_shingle_hashes.

    Returns ``(row_idx, i, h)``: int64 row index into the column, int64
    1-based word offset (SQL ``generate_series`` parity), uint64 window
    hash. Rows with fewer than L words emit nothing. 64-bit exact-key
    contract: a collision merges two distinct grams (same contract as
    exact_dedup's blake2b keys; ~1e-7 at 10^6 windows).
    """
    if isinstance(col, pa.ChunkedArray):
        col = (col.combine_chunks() if col.num_chunks != 1
               else col.chunk(0))
    toks = pc.split_pattern(col, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()                      # offset-aware (ADVICE r3)
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    total = int(n.sum())
    empty = (np.empty(0, np.int64), np.empty(0, np.int64),
             np.empty(0, np.uint64))
    if total < L:
        return empty
    # token byte hashes from the shared utf8 value buffer
    fo = np.frombuffer(flat.buffers()[1], np.int32)[
        flat.offset:flat.offset + len(flat) + 1].astype(np.int64)
    dbuf = flat.buffers()[2]
    data = (np.frombuffer(dbuf, np.uint8) if dbuf is not None
            else np.empty(0, np.uint8))
    A, Binv = _poly_prefix(data)
    th = _hash_slices(A, Binv, fo[:-1], fo[1:])
    # level-2 prefix over the token-hash sequence
    A2, Binv2 = _poly_prefix(th)
    n_win_all = total - L + 1
    Hall = (A2[L:] - A2[:-L]) * Binv2[:n_win_all]
    tok_start = np.zeros(len(n) + 1, np.int64)
    np.cumsum(n, out=tok_start[1:])
    counts = np.maximum(n - L + 1, 0)
    long_rows = np.nonzero(n >= L)[0]
    if len(long_rows) == 0:
        return empty
    delta = np.zeros(n_win_all + 1, np.int32)
    np.add.at(delta, tok_start[long_rows], 1)
    np.add.at(delta, tok_start[long_rows] + counts[long_rows], -1)
    valid = np.cumsum(delta[:-1]) > 0
    H = Hall[valid]
    row_of = np.repeat(long_rows, counts[long_rows])
    cum = np.zeros(len(long_rows), np.int64)
    np.cumsum(counts[long_rows][:-1], out=cum[1:])
    i1 = np.arange(len(H), dtype=np.int64) - np.repeat(cum, counts[long_rows]) + 1
    return row_of, i1, H


class MinHasher:
    """Per-doc minhash signature (n_perm hashes) as a fixed-size list col.

    State: the random permutation parameters, built once per actor.
    """

    def __init__(self, n_perm: int = 64, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 2**61 - 1, n_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**61 - 1, n_perm, dtype=np.uint64)
        self.p = np.uint64((1 << 61) - 1)
        self.n_perm = n_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text)
        # (a*x + b) mod 2^64 per permutation (a odd ⇒ a bijection of the
        # shingle-hash space — a valid minwise permutation family) —
        # vectorized [n_sh, n_perm]
        vals = sh[:, None] * self.a[None, :] + self.b[None, :]
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        if not n:
            sigs = np.empty((0, self.n_perm), dtype=np.uint64)
        else:
            # one vectorized shingle pass for the whole batch, then a
            # per-permutation segmented min (reduceat over doc offsets) —
            # no per-substring Python hashing anywhere. unique=False:
            # duplicate shingles cannot change a min.
            hashes, offs = _batch_shingle_hashes(texts, unique=False)
            starts = offs[:-1]
            sigs = np.empty((n, self.n_perm), dtype=np.uint64)
            x = np.empty_like(hashes)
            for j in range(self.n_perm):
                np.multiply(hashes, self.a[j], out=x)
                np.add(x, self.b[j], out=x)
                sigs[:, j] = np.minimum.reduceat(x, starts)
        return batch.append_column(
            "minhash", pa.array(list(sigs), pa.list_(pa.uint64(), self.n_perm))
        )


def lsh_bands(batch: pa.Table, n_bands: int = 16, id_col: str = "doc_id") -> pa.Table:
    """Explode signatures to (band_id, band_hash, id) rows for the LSH groupby."""
    sigs = np.asarray(batch["minhash"].to_pylist(), dtype=np.uint64)
    n, n_perm = sigs.shape if sigs.size else (0, 0)
    rows_per = n_perm // n_bands if n_bands else 0
    ids = batch[id_col].to_pylist()
    band_id = []
    band_hash = []
    out_ids = []
    for i in range(n):
        for b in range(n_bands):
            chunk = sigs[i, b * rows_per:(b + 1) * rows_per]
            h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
            band_id.append(b)
            band_hash.append(int.from_bytes(h, "little"))
            out_ids.append(ids[i])
    return pa.table(
        {
            "band_id": pa.array(band_id, pa.int32()),
            "band_hash": pa.array(band_hash, pa.uint64()),
            id_col: pa.array(out_ids),
        }
    )


def _jaccard_sorted(sa: np.ndarray, sb: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique hash arrays."""
    if not len(sa) and not len(sb):
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / (len(sa) + len(sb) - inter)


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    h, offs = _batch_shingle_hashes([text_a, text_b], k)
    return _jaccard_sorted(h[offs[0]:offs[1]], h[offs[1]:offs[2]])


class SimHasher:
    """64-bit SimHash over word features, batch-vectorized: all words of
    all docs are hashed in ONE polynomial-prefix pass, bit votes are
    segmented sums (reduceat over doc word offsets)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        out = np.zeros(n, dtype=np.uint64)
        cps: list[np.ndarray] = []
        spans: list[tuple[int, int]] = []
        counts = np.zeros(n, np.int64)
        doc_off = 0
        for i, t in enumerate(texts):
            tl = (t or "").lower()
            # word hashes come from the DOC's prefix array (span slices
            # are position-independent under the B^−s factorization), so
            # only match spans are collected — no per-word array churn
            c = 0
            for m in _WORD.finditer(tl):
                spans.append((doc_off + m.start(), doc_off + m.end()))
                c += 1
            counts[i] = c
            cps.append(_codepoints(tl))
            doc_off += len(tl)
        W = int(counts.sum())
        if W:
            sp = np.asarray(spans, np.int64)
            cp = np.concatenate(cps)
            A, Binvpow = _poly_prefix(cp)
            hs = _hash_slices(A, Binvpow, sp[:, 0], sp[:, 1])
            # per-bit popcounts: 64 × (shift + mask + FLAT reduceat over
            # the contiguous word axis). Matrix forms (axis-aware
            # reduceat, cumsum over [W,64]) measure 50–100× slower —
            # numpy's axis machinery takes a generic inner loop; the flat
            # contiguous reduceat is the fast path.
            nz = np.nonzero(counts)[0]
            seg_starts = np.zeros(n, np.int64)
            np.cumsum(counts[:-1], out=seg_starts[1:])
            s_nz = seg_starts[nz]
            c_nz = counts[nz].astype(np.uint64)
            sig_nz = np.zeros(len(nz), np.uint64)
            one = np.uint64(1)
            for b in range(64):
                col = (hs >> np.uint64(b)) & one
                pos = np.add.reduceat(col, s_nz)
                sig_nz |= ((pos * np.uint64(2)) > c_nz).astype(np.uint64) \
                    << np.uint64(b)
            out[nz] = sig_nz
        return batch.append_column("simhash", pa.array(out, pa.uint64()))


# Task-form wrappers: state (compiled regexes, permutation tables) is
# cached per *worker process* in a module global — actor-like amortization
# with elastic task scheduling (no pool spin-up for short jobs).
_WORKER_CACHE: dict = {}


def _inst(cls):
    inst = _WORKER_CACHE.get(cls)
    if inst is None:
        inst = _WORKER_CACHE[cls] = cls()
    return inst


def token_counter_batch(batch: pa.Table) -> pa.Table:
    return _inst(TokenCounter)(batch)


def quality_scorer_batch(batch: pa.Table) -> pa.Table:
    return _inst(QualityScorer)(batch)


def minhasher_batch(batch: pa.Table) -> pa.Table:
    return _inst(MinHasher)(batch)


def langid_batch(batch: pa.Table) -> pa.Table:
    return _inst(LangId)(batch)


def simhasher_batch(batch: pa.Table) -> pa.Table:
    return _inst(SimHasher)(batch)


def rolling_fingerprint(batch: pa.Table, window: int = 16) -> pa.Table:
    """Rabin-style rolling-hash document fingerprint (min-sampled)."""
    texts = batch["text"].to_pylist()
    out = np.empty(len(texts), dtype=np.uint64)
    B = np.uint64(257)
    for i, t in enumerate(texts):
        data = (t or "").encode("utf-8")
        if len(data) <= window:
            out[i] = int.from_bytes(
                hashlib.blake2b(data, digest_size=8).digest(), "little")
            continue
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        powers = B ** np.arange(window, dtype=np.uint64)
        # rolling window hashes via strided dot (mod 2^64 wraparound is fine)
        n_win = len(arr) - window + 1
        strided = np.lib.stride_tricks.sliding_window_view(arr, window)
        hashes = (strided * powers[None, :]).sum(axis=1)
        out[i] = hashes.min()
    return batch.append_column("fingerprint", pa.array(out, pa.uint64()))


# --------------------------------------------------- distributed LSH dedup


def lsh_candidate_pairs(bands, band_cap: int | None = 512):
    """(band_id, band_hash) buckets → distinct candidate pairs, distributed.

    In-band all-pairs is O(B²); a mega-bucket (e.g. millions of identical
    docs) is capped at ``band_cap`` ids per chunk — pairs are generated
    within each chunk and consecutive chunks are chain-linked by their
    first element, so the candidate *graph* keeps every member of a
    mega-bucket connected (what dedup clustering needs) while the pair
    count stays O(B·band_cap). Buckets smaller than band_cap (the normal
    case) are exhaustive and unchanged.

    EXACTNESS CONTRACT: pair *output* (minhash_near_dup) is exhaustive
    only for buckets ≤ band_cap. In a capped bucket, only chunk-internal
    and chain-link pairs are generated/verified, so a skewed corpus (one
    band hash shared by > band_cap docs) may drop true near-dup pairs
    from the pair list while cluster connectivity is preserved. Callers
    needing exhaustive pairs on skewed data pass ``band_cap=None``
    (uncapped, O(B²) in the bucket size) or cluster first and expand
    pairs within clusters.
    """
    from ray.data.aggregate import Count

    def pairs(t: pa.Table) -> pa.Table:
        ids = np.unique(t["doc_id"].to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        a_l, b_l = [], []
        cap = band_cap if band_cap is not None else len(ids)
        chunks = [ids[i:i + cap] for i in range(0, len(ids), cap)]
        for ci, ch in enumerate(chunks):
            ii, jj = np.triu_indices(len(ch), k=1)
            a_l.append(ch[ii])
            b_l.append(ch[jj])
            if ci:
                a_l.append(chunks[ci - 1][:1])
                b_l.append(ch[:1])
        return pa.table({"doc_a": pa.array(np.concatenate(a_l), pa.int64()),
                         "doc_b": pa.array(np.concatenate(b_l), pa.int64())})

    cand = bands.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pyarrow"
    )
    # distinct (a pair collides in many bands): tiny groupby on the pairs
    distinct = cand.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="_nb")
    )
    return distinct.drop_columns(["_nb"])


def _attach_text(cand, docs, key_col: str, out_col: str, carry: list[str],
                 P: int, val_col: str = "text",
                 val_type: pa.DataType = None):
    """Distributed hash join (union + part groupby + ONE searchsorted per
    partition — same pattern as pipelines/spatialize.py). Used instead of
    Dataset.join: Ray 2.49's hash-join aggregator raises ArrowInvalid when
    a left partition is empty (schema lost), which any sparse candidate
    set triggers. ``val_col``/``val_type`` generalize the attached payload
    column (string text by default; binary signature blobs for the exact
    Jaccard join).
    """
    if val_type is None:
        val_type = pa.string()
    carry_all = ["doc_a", "doc_b"] + carry

    def doc_side(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        n = len(did)
        cols = {"_key": pa.array(did, pa.int64())}
        for c in carry_all:
            cols[c] = (pa.array(np.zeros(n, np.int64), pa.int64())
                       if c in ("doc_a", "doc_b")
                       else pa.nulls(n, val_type))
        cols["_text"] = b[val_col]
        cols["_side"] = pa.array(np.zeros(n, np.int8), pa.int8())
        cols["_part"] = pa.array((did % P).astype(np.int32), pa.int32())
        return pa.table(cols)

    def cand_side(b: pa.Table) -> pa.Table:
        key = b[key_col].to_numpy(zero_copy_only=False)
        n = len(key)
        cols = {"_key": pa.array(key, pa.int64())}
        for c in carry_all:
            cols[c] = b[c]
        cols["_text"] = pa.nulls(n, val_type)
        cols["_side"] = pa.array(np.ones(n, np.int8), pa.int8())
        cols["_part"] = pa.array((key % P).astype(np.int32), pa.int32())
        return pa.table(cols)

    unioned = cand.map_batches(cand_side, batch_format="pyarrow").union(
        docs.map_batches(doc_side, batch_format="pyarrow")
    )

    def resolve(t: pa.Table) -> pa.Table:
        side = t["_side"].to_numpy(zero_copy_only=False)
        dmask = side == 0
        dkey = t["_key"].to_numpy(zero_copy_only=False)[dmask]
        order = np.argsort(dkey, kind="stable")
        dkey_s = dkey[order]
        dtext = t["_text"].filter(pa.array(dmask)).take(pa.array(order))
        cmask = ~dmask
        ct = t.filter(pa.array(cmask))
        ckey = ct["_key"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dkey_s, ckey)
        ok = ((pos < len(dkey_s))
              & (dkey_s[np.minimum(pos, max(len(dkey_s) - 1, 0))] == ckey)
              if len(dkey_s) else np.zeros(len(ckey), bool))
        sel = np.nonzero(ok)[0]
        cols = {c: ct[c].take(pa.array(sel)) for c in carry_all}
        cols[out_col] = dtext.take(pa.array(pos[sel]))
        return pa.table(cols)

    return unioned.groupby("_part").map_groups(resolve, batch_format="pyarrow")


def verify_jaccard(cand, docs, threshold: float = 0.5,
                   num_partitions: int = 8):
    """Attach both texts with two distributed hash joins and compute exact
    n-gram Jaccard inside map_batches — no driver-side text fetch."""
    j = _attach_text(cand, docs, "doc_a", "text_a", [], num_partitions)
    j = _attach_text(j, docs, "doc_b", "text_b", ["text_a"], num_partitions)

    def score(b: pa.Table) -> pa.Table:
        va = b["text_a"].to_pylist()
        vb = b["text_b"].to_pylist()
        m = len(va)
        # ONE vectorized shingle pass over both text columns; per-pair
        # exact Jaccard on the sorted-unique hash slices
        h, offs = _batch_shingle_hashes(va + vb)
        jac = np.round([
            _jaccard_sorted(h[offs[i]:offs[i + 1]],
                            h[offs[m + i]:offs[m + i + 1]])
            for i in range(m)
        ], 4)
        out = pa.table({"doc_a": b["doc_a"], "doc_b": b["doc_b"],
                        "jaccard": pa.array(jac, pa.float64())})
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return j.map_batches(score, batch_format="pyarrow")


def minhash_near_dup(docs, threshold: float = 0.5,
                     band_cap: int | None = 512, num_partitions: int = 8):
    """Full distributed MinHash+LSH near-dup pipeline:
    signatures → bands → capped in-band pairs → distinct → Jaccard verify.
    band_cap=None disables the mega-bucket cap (exhaustive pairs; see the
    exactness contract on lsh_candidate_pairs).
    """
    sigs = docs.map_batches(minhasher_batch, batch_format="pyarrow")
    bands = sigs.map_batches(
        lambda b: lsh_bands(b, id_col="doc_id"), batch_format="pyarrow"
    )
    # pin the (tiny: id pairs) candidate set in LOCAL mode only — its
    # groupby would otherwise share one streaming graph with the two join
    # operators and starve them of CPU slots at low parallelism (measured
    # deadlock at 8 cpus); multi-node streams (pin_local contract)
    from ..state.runtime import pin_local

    cand = pin_local(lsh_candidate_pairs(bands, band_cap=band_cap))
    return verify_jaccard(cand, docs, threshold=threshold,
                          num_partitions=num_partitions)


# --------------------------------------- exact n-gram Jaccard join (no LSH)


def _decode_binary_col(col):
    """Binary column → (flat uint64 hash array, per-row element counts),
    zero-copy-ish (one contiguity copy of the value range)."""
    if isinstance(col, pa.ChunkedArray):
        col = (col.combine_chunks() if col.num_chunks != 1
               else col.chunk(0))
    if isinstance(col, pa.ChunkedArray):
        col = (col.chunk(0) if col.num_chunks
               else pa.array([], pa.binary()))
    boff = np.frombuffer(col.buffers()[1], np.int32)[
        col.offset: col.offset + len(col) + 1]
    data = np.frombuffer(col.buffers()[2] or b"", np.uint8)
    hashes = np.frombuffer(data[boff[0]:boff[-1]].tobytes(), np.uint64)
    sizes = (np.diff(boff) // 8).astype(np.int64)
    return hashes, sizes


def _pairs_jaccard_table(doc_a, doc_b, ha, na, hb, nb,
                         threshold: float) -> pa.Table:
    """Vectorized exact Jaccard for m pairs given each side's concatenated
    sorted-unique hash arrays + per-pair counts: tag every hash with its
    pair ordinal, one lexsort, count (pair, hash) duplicates → |A∩B|.
    No per-pair Python loop, no re-shingling."""
    m = len(na)
    pid = np.concatenate([
        np.repeat(np.arange(m, dtype=np.int64), na),
        np.repeat(np.arange(m, dtype=np.int64), nb)])
    hh = np.concatenate([ha, hb])
    order = np.lexsort((hh, pid))
    pid_s, hh_s = pid[order], hh[order]
    dup = np.zeros(len(hh_s), bool)
    if len(hh_s) > 1:
        dup[1:] = (hh_s[1:] == hh_s[:-1]) & (pid_s[1:] == pid_s[:-1])
    co = np.bincount(pid_s[dup], minlength=m).astype(np.int64)
    jac = np.round(co / np.maximum(na + nb - co, 1), 4)
    out = pa.table({"doc_a": doc_a, "doc_b": doc_b,
                    "jaccard": pa.array(jac, pa.float64())})
    return out.filter(pc.greater_equal(out["jaccard"], threshold))


@ray.remote
def _sig_payload_task(*blocks) -> dict:
    """Assemble the broadcast signature payload from BLOCK REFS on a
    worker — the driver never holds a signature row (the pip_join_auto
    pattern, VERDICT r2 wrong #1)."""
    tables = [b for b in blocks if b.num_rows]
    if not tables:
        return {"ids": np.empty(0, np.int64), "h": np.empty(0, np.uint64),
                "starts": np.zeros(1, np.int64),
                "sizes": np.empty(0, np.int64)}
    t = pa.concat_tables(tables)
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    h, sizes = _decode_binary_col(t["sig"])
    order = np.argsort(ids, kind="stable")
    starts_in = np.zeros(len(ids) + 1, np.int64)
    np.cumsum(sizes, out=starts_in[1:])
    # ragged gather into id-sorted layout
    counts = sizes[order]
    base = np.repeat(starts_in[order], counts)
    within = (np.arange(counts.sum())
              - np.repeat(np.cumsum(counts) - counts, counts))
    starts = np.zeros(len(ids) + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    return {"ids": ids[order], "h": h[base + within],
            "starts": starts, "sizes": counts}


_SIG_PAYLOADS: dict = {}


def _cached_sig_payload(ref):
    key = ref.hex()
    if key not in _SIG_PAYLOADS:
        _SIG_PAYLOADS[key] = ray.get(ref)
    return _SIG_PAYLOADS[key]


JACCARD_BROADCAST_MAX_DOCS = 500_000   # ~2 KB/sig ⇒ ≲1 GB payload


def jaccard_near_dup_exact(docs, threshold: float = 0.5, k: int = 5,
                           num_partitions: int = 8,
                           bucket_cap: int | None = None,
                           broadcast_max_docs: int =
                           JACCARD_BROADCAST_MAX_DOCS,
                           force: str | None = None):
    """EXACT all-pairs n-gram Jaccard self-join — no sketches, no LSH —
    via the published prefix-filter inverted index (Chaudhuri et al.
    SSJoin / Bayardo et al. All-Pairs):

    1. per-doc sorted-unique k-gram hashes → postings ``(h, doc_id)``
       (one vectorized polynomial-hash pass per batch);
    2. partition postings by ``h`` → per-partition document frequency
       (df) attached to every posting; df==1 postings can never pair;
    3. re-partition by ``doc_id`` → order each doc's shingles by the
       GLOBAL (df, h) total order and keep the prefix of length
       ``|A| - ceil(t·|A|) + 1`` (computed on the FULL set size, so
       dropping df==1 emissions cannot cause false negatives: the
       smallest-ranked common shingle of any qualifying pair lies in
       both prefixes and has df ≥ 2 — the standard prefix-filter
       theorem);
    4. partition prefix postings by ``h`` → in-bucket candidate pairs →
       distinct;
    5. exact Jaccard verification on the attached texts
       (``verify_jaccard``) — prefix filtering has recall 1.0, so the
       verified output IS the exact all-pairs result.

    Prefix shingles are globally-rarest by construction, so candidate
    buckets stay small on natural corpora; ``bucket_cap`` (default
    None = exact) mirrors ``lsh_candidate_pairs``'s mega-bucket
    contract for adversarially skewed corpora (thousands of identical
    docs): connectivity preserved, individual pairs may drop.
    """
    from ray.data.aggregate import Count

    P = num_partitions

    def postings(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        h, offs = _batch_shingle_hashes(texts, k=k, unique=True)
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        counts = (offs[1:] - offs[:-1]).astype(np.int64)
        doc_of = np.repeat(did, counts)
        return pa.table({
            "h": pa.array(h, pa.uint64()),
            "doc_id": pa.array(doc_of, pa.int64()),
            "_part": pa.array((h % np.uint64(P)).astype(np.int32),
                              pa.int32()),
        })

    def attach_df(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        # group sizes along the sorted hash axis → df per posting
        boundary = np.ones(len(hs), bool)
        if len(hs) > 1:
            boundary[1:] = hs[1:] != hs[:-1]
        gid = np.cumsum(boundary) - 1
        df_per_group = np.bincount(gid)
        df_sorted = df_per_group[gid]
        df = np.empty(len(h), np.int64)
        df[order] = df_sorted
        return pa.table({
            "h": t["h"],
            "doc_id": t["doc_id"],
            "df": pa.array(df, pa.int64()),
            "_part": pa.array(
                (t["doc_id"].to_numpy(zero_copy_only=False)
                 % P).astype(np.int32), pa.int32()),
        })

    def prefix(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        df = t["df"].to_numpy(zero_copy_only=False)
        # global order inside each doc: (df asc, h asc) — rarest first
        order = np.lexsort((h, df, did))
        did_s, h_s, df_s = did[order], h[order], df[order]
        # per-doc rank along the sorted axis
        boundary = np.ones(len(did_s), bool)
        if len(did_s) > 1:
            boundary[1:] = did_s[1:] != did_s[:-1]
        gid = np.cumsum(boundary) - 1
        sizes = np.bincount(gid)
        starts = np.zeros(len(sizes), np.int64)
        np.cumsum(sizes[:-1], out=starts[1:])
        rank = np.arange(len(did_s)) - starts[gid]
        # prefix length on the FULL set size |A|
        p_len = sizes - np.ceil(threshold * sizes).astype(np.int64) + 1
        keep = (rank < p_len[gid]) & (df_s >= 2)
        return pa.table({
            "h": pa.array(h_s[keep], pa.uint64()),
            "doc_id": pa.array(did_s[keep], pa.int64()),
            # rank + full set size ride along for the positional filter
            "rnk": pa.array(rank[keep].astype(np.int32), pa.int32()),
            "sz": pa.array(sizes[gid][keep].astype(np.int32), pa.int32()),
            "_part": pa.array((h_s[keep] % np.uint64(P)).astype(np.int32),
                              pa.int32()),
        })

    def bucket_pairs(t: pa.Table) -> pa.Table:
        """In-bucket pair emission, deduped IN-PARTITION and packed into a
        single uint64 key (a<<32 | b) — the global distinct groupby then
        shuffles one numeric column of already-unique-per-partition rows
        instead of the raw quadratic emission stream."""
        h = t["h"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        rnk = t["rnk"].to_numpy(zero_copy_only=False).astype(np.int64)
        sz = t["sz"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((did, h))
        hs, ds = h[order], did[order]
        rs, ss = rnk[order], sz[order]
        boundary = np.ones(len(hs), bool)
        if len(hs) > 1:
            boundary[1:] = hs[1:] != hs[:-1]
        starts = np.nonzero(boundary)[0]
        stops = np.append(starts[1:], len(hs))
        a_l, b_l = [], []
        for s0, s1 in zip(starts, stops):
            ids = ds[s0:s1]
            if len(ids) < 2:
                continue
            rr, zz = rs[s0:s1], ss[s0:s1]
            cap = bucket_cap if bucket_cap is not None else len(ids)
            for c0 in range(0, len(ids), cap):
                ch, cr, cz = (ids[c0:c0 + cap], rr[c0:c0 + cap],
                              zz[c0:c0 + cap])
                ii, jj = np.triu_indices(len(ch), k=1)
                # positional filter (PPJoin): the overlap reachable from
                # this shared element is min(|A|-pa, |B|-pb); a qualifying
                # pair's FIRST common element satisfies the bound, so
                # dropping emissions that fail it keeps recall 1.0
                alpha = np.ceil(threshold / (1.0 + threshold)
                                * (cz[ii] + cz[jj]))
                ok = np.minimum(cz[ii] - cr[ii], cz[jj] - cr[jj]) >= alpha
                a_l.append(ch[ii][ok])
                b_l.append(ch[jj][ok])
                if c0:
                    a_l.append(ids[c0 - cap:c0][:1])
                    b_l.append(ch[:1])
        if not a_l:
            return pa.table({"_pk": pa.array([], pa.uint64())})
        pk = (np.concatenate(a_l).astype(np.uint64) << np.uint64(32)) \
            | np.concatenate(b_l).astype(np.uint64)
        return pa.table({"_pk": pa.array(np.unique(pk), pa.uint64())})

    def unpack(t: pa.Table) -> pa.Table:
        pk = t["_pk"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_a": pa.array((pk >> np.uint64(32)).astype(np.int64),
                              pa.int64()),
            "doc_b": pa.array((pk & np.uint64(0xFFFFFFFF)).astype(np.int64),
                              pa.int64()),
        })

    def signatures(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        h, offs = _batch_shingle_hashes(texts, k=k, unique=True)
        blobs = [h[offs[i]:offs[i + 1]].tobytes() for i in range(len(texts))]
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "sig": pa.array(blobs, pa.binary()),
        })

    def score_attached(b: pa.Table) -> pa.Table:
        ha, na = _decode_binary_col(b["sig_a"])
        hb, nb = _decode_binary_col(b["sig_b"])
        return _pairs_jaccard_table(b["doc_a"], b["doc_b"],
                                    ha, na, hb, nb, threshold)

    post = docs.map_batches(postings, batch_format="pyarrow")
    with_df = post.groupby("_part").map_groups(
        attach_df, batch_format="pyarrow")
    pref = with_df.groupby("_part").map_groups(
        prefix, batch_format="pyarrow")
    cand = pref.groupby("_part").map_groups(
        bucket_pairs, batch_format="pyarrow")
    distinct = cand.groupby("_pk").aggregate(
        Count(alias_name="_nb")).drop_columns(["_nb"])
    pairs = distinct.map_batches(unpack, batch_format="pyarrow")
    # pin the id-pair set before the verify graph in LOCAL mode only (same
    # CPU-starvation avoidance as minhash_near_dup; multi-node streams)
    from ..state.runtime import pin_local

    pairs = pin_local(pairs)
    sigs = docs.map_batches(signatures, batch_format="pyarrow")

    n_docs = docs.count()
    mode = force or ("broadcast" if n_docs <= broadcast_max_docs
                     else "partitioned")
    if mode == "broadcast":
        # size-switched fast path: signatures fit the object store as ONE
        # broadcast payload (≈2 KB/doc) — verification is a single
        # map_batches over the pair list, no per-pair blob shuffle.
        smat = sigs.materialize()
        ref = _sig_payload_task.remote(*smat.get_internal_block_refs())

        def score_broadcast(b: pa.Table) -> pa.Table:
            p = _cached_sig_payload(ref)
            da = b["doc_a"].to_numpy(zero_copy_only=False)
            db = b["doc_b"].to_numpy(zero_copy_only=False)
            ia = np.searchsorted(p["ids"], da)
            ib = np.searchsorted(p["ids"], db)
            na, nb = p["sizes"][ia], p["sizes"][ib]

            def ragged(ixs, counts):
                base = np.repeat(p["starts"][ixs], counts)
                within = (np.arange(counts.sum())
                          - np.repeat(np.cumsum(counts) - counts, counts))
                return p["h"][base + within]

            return _pairs_jaccard_table(
                b["doc_a"], b["doc_b"],
                ragged(ia, na), na, ragged(ib, nb), nb, threshold)

        return pairs.map_batches(score_broadcast, batch_format="pyarrow")

    # scale path: two distributed hash joins attach the signature blobs
    j = _attach_text(pairs, sigs, "doc_a", "sig_a", [], num_partitions,
                     val_col="sig", val_type=pa.binary())
    j = _attach_text(j, sigs, "doc_b", "sig_b", ["sig_a"], num_partitions,
                     val_col="sig", val_type=pa.binary())
    return j.map_batches(score_attached, batch_format="pyarrow")


# ------------------------------------------- dedup clustering (conn. comp.)


def dedup_clusters(pairs, num_partitions: int = 8, max_iters: int = 50):
    """Connected components over near-duplicate pairs → (doc_id,
    cluster_id) with cluster_id = min doc id reachable (the canonical
    "keep" representative for each duplicate cluster).

    Distributed min-label propagation: labels live as a Dataset keyed by
    doc; each round joins edge endpoints to current labels (the
    union + part-groupby + searchsorted join pattern) and takes the
    per-node min over {own label} ∪ {neighbours' labels}; converged when
    an aggregate reports zero label changes. Rounds needed = cluster
    diameter (tiny for dup clusters); the edge set — dedup OUTPUT, far
    smaller than the corpus — is what shuffles each round.
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    P = num_partitions

    def sym_edges(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy(zero_copy_only=False)
        bb = b["doc_b"].to_numpy(zero_copy_only=False)
        src = np.concatenate([a, bb])
        dst = np.concatenate([bb, a])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64()),
                         "_part": pa.array((src % P).astype(np.int32),
                                           pa.int32())})

    # Iterative-reuse pin (NOT gated by pin_local): the pair set feeds the
    # initial labels AND every propagation round below — unpinned, each
    # round would re-execute the caller's whole candidate-generation graph
    # (LSH bands + verify) from scratch. Pin the caller's pairs ONCE (the
    # dedup OUTPUT, orders smaller than the corpus) and keep the symmetric
    # edge doubling lazy — a trivial map recomputed per round from the
    # pinned pairs, halving the pinned bytes vs pinning edges.
    pairs = pairs.materialize()
    edges = pairs.map_batches(sym_edges, batch_format="pyarrow")

    def init_labels(b: pa.Table) -> pa.Table:
        n = np.unique(np.concatenate([
            b["doc_a"].to_numpy(zero_copy_only=False),
            b["doc_b"].to_numpy(zero_copy_only=False)]))
        return pa.table({"doc_id": pa.array(n, pa.int64()),
                         "label": pa.array(n, pa.int64())})

    labels = pairs.map_batches(init_labels, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Min("label", alias_name="label")) \
        .materialize()

    def label_side(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        n = len(d)
        return pa.table({
            "_key": pa.array(d, pa.int64()),
            "dst": pa.array(np.zeros(n, np.int64), pa.int64()),
            "label": b["label"],
            "_side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "_part": pa.array((d % P).astype(np.int32), pa.int32()),
        })

    def edge_side(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        n = len(s)
        return pa.table({
            "_key": pa.array(s, pa.int64()),
            "dst": b["dst"],
            "label": pa.array(np.zeros(n, np.int64), pa.int64()),
            "_side": pa.array(np.ones(n, np.int8), pa.int8()),
            "_part": b["_part"],
        })

    def propagate(t: pa.Table) -> pa.Table:
        """Partition-level: every edge (src→dst) emits src's current
        label as a candidate for dst; labels also re-emit themselves."""
        side = t["_side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        lkey = t["_key"].to_numpy(zero_copy_only=False)[lmask]
        order = np.argsort(lkey, kind="stable")
        lkey_s = lkey[order]
        lval = t["label"].to_numpy(zero_copy_only=False)[lmask][order]
        emask = ~lmask
        ekey = t["_key"].to_numpy(zero_copy_only=False)[emask]
        edst = t["dst"].to_numpy(zero_copy_only=False)[emask]
        pos = np.searchsorted(lkey_s, ekey)
        ok = ((pos < len(lkey_s))
              & (lkey_s[np.minimum(pos, max(len(lkey_s) - 1, 0))] == ekey)
              if len(lkey_s) else np.zeros(len(ekey), bool))
        return pa.table({
            "doc_id": pa.array(np.concatenate([lkey_s, edst[ok]]), pa.int64()),
            "label": pa.array(np.concatenate([lval, lval[pos[ok]]]),
                              pa.int64()),
        })

    # labels only ever decrease (min over {self} ∪ neighbours), so the
    # label SUM strictly decreases on any change — convergence is one
    # tiny aggregate per round, no old/new join needed. Partial sums are
    # emitted as decimal strings and combined as Python ints so the probe
    # is exact at any id/count scale (an int64 Sum aggregate could wrap).
    def _label_sum(lab) -> int:
        def psum(b: pa.Table) -> pa.Table:
            v = b["label"].to_numpy(zero_copy_only=False)
            s = int(np.sum(v.astype(object))) if len(v) else 0
            return pa.table({"s": pa.array([str(s)], pa.string())})

        parts = lab.map_batches(psum, batch_format="pyarrow").take_all()
        return sum(int(r["s"]) for r in parts)

    prev_sum = _label_sum(labels)
    converged = False
    for _ in range(max_iters):
        unioned = labels.map_batches(label_side, batch_format="pyarrow") \
            .union(edges.map_batches(edge_side, batch_format="pyarrow"))
        cand = unioned.groupby("_part").map_groups(
            propagate, batch_format="pyarrow")
        labels = cand.groupby("doc_id").aggregate(
            Min("label", alias_name="label")).materialize()
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iters} rounds "
            "(cluster diameter exceeds max_iters); raise max_iters")

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"],
                         "cluster_id": b["label"]})

    return labels.map_batches(rename, batch_format="pyarrow")
