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
    """Add a stable 64-bit content hash column (exact-dedup key)."""
    texts = batch[col].to_pylist()
    hashes = np.fromiter(
        (int.from_bytes(hashlib.blake2b(
            (t or "").encode("utf-8"), digest_size=8).digest(), "little")
         for t in texts),
        dtype=np.uint64,
        count=len(texts),
    )
    return batch.append_column("content_hash", pa.array(hashes, pa.uint64()))


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


def _shingles(text: str, k: int = 5) -> np.ndarray:
    t = _WS.sub(" ", (text or "").lower()).strip()
    if len(t) < k:
        # blake2b, not hash(): SipHash is seeded per-process, so hash() would
        # give the same short doc different signatures in different Ray workers
        h = int.from_bytes(
            hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "little")
        return np.array([h], dtype=np.uint64)
    views = [t[i:i + k] for i in range(len(t) - k + 1)]
    return np.unique(
        np.fromiter(
            (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                            "little") for s in views),
            dtype=np.uint64, count=len(views),
        )
    )


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
        # (a*x + b) mod p per permutation — vectorized [n_sh, n_perm]
        vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) % self.p
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) if texts else \
            np.empty((0, self.n_perm), dtype=np.uint64)
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


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa = set(_shingles(text_a, k).tolist())
    sb = set(_shingles(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


class SimHasher:
    """64-bit SimHash over word features."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = np.empty(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            words = _WORD.findall((t or "").lower())
            if not words:
                out[i] = 0
                continue
            hs = np.fromiter(
                (int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(),
                                "little") for w in words),
                dtype=np.uint64, count=len(words),
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            out[i] = np.packbits((v > 0)[::-1]).view(">u8")[0]
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
