"""Round-5 multimodal dedup queries: perceptual average-hash (aHash)
signatures over decoded media spans and the exact near-duplicate pair
set at Hamming ≤ AHASH_HAM_T — the image-side member of the dedup
family (exact/minhash/simhash cover text, embedding_dedup covers
vectors; this covers media payloads).

Scale contract: the decode+hash stage is a map-side actor pool over
media spans (payload × batch × concurrency bounded, binary columns
never cross pandas); the pair stage is the banded-pigeonhole
self-join of simhash_hamming_pairs — with 4 disjoint 16-bit bands, a
pair within Hamming 3 agrees exactly on ≥ 1 band, so candidates form
only inside band buckets and the verify is an exact popcount. Shuffle
payloads are fused int64s (band key, ref id, signature); media_ref
strings are reconstructed from the 64-bit id after the final groupby,
so no string keys ever enter an exchange (round-1 pitfall). Oracle:
independent scalar recomputation + O(n²) brute-force pair scan
(oracle/expected.py), read from /tmp/graft_expected.

Reference parity note: the reference engine has no media dedup (it is
a vector-tile engine); this family is part of the NORTH-RULE
training-data extensions, same contract as stages/media.py.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.media import (
    AHASH_HAM_T,
    AverageHasher,
    fetch_media_variants,
    media_span_rows,
)

_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b).view(np.uint8).reshape(-1, 8)
    return _POPCNT8[x].sum(axis=1).astype(np.int64)


def _ahash_ds(sf_dir: str, with_span: bool):
    """documents → media spans → variant payloads → 64-bit aHash."""
    from .queries import _docs_ds

    ds = _docs_ds(sf_dir).map_batches(media_span_rows,
                                      batch_format="pyarrow")
    ds = ds.map_batches(fetch_media_variants, batch_format="pyarrow",
                        batch_size=1024)
    ds = ds.map_batches(AverageHasher, batch_format="pyarrow",
                        batch_size=1024, concurrency=(1, 4),
                        fn_constructor_kwargs={"deterministic_fake": True})
    keep = (["doc_id", "span_idx", "ahash"] if with_span
            else ["media_ref", "ahash"])
    return ds.select_columns(keep)


def q_media_ahash(sf_dir: str):
    """Per-media-span 64-bit average-hash signature table (the dedup
    primitive; oracled row-exactly by the scalar recomputation in
    oracle/expected.py — same pattern as simhash/fingerprint)."""
    def widen(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "span_idx": pc.cast(b["span_idx"], pa.int64()),
            "ahash": b["ahash"],
        })

    return _ahash_ds(sf_dir, with_span=True) \
        .map_batches(widen, batch_format="pyarrow")


def _neardup_pairs_i64(sf_dir: str):
    """The media near-dup pair graph on 64-bit asset ids (signed views
    of the uint64 ids): banded-pigeonhole candidates → exact popcount
    verify → per-pair Min(hamming). Shared by q_media_neardup (string
    output) and q_media_dup_clusters (connected components)."""
    from ray.data.aggregate import Min

    sigs = _ahash_ds(sf_dir, with_span=False)

    def band_fan_out(b: pa.Table) -> pa.Table:
        refs = b["media_ref"].to_pylist()
        # "media://%016x" → the 64-bit asset id (shuffle key; the string
        # is reconstructed after the final groupby)
        rid = np.array([int(r[8:], 16) for r in refs],
                       np.uint64).view(np.int64)
        h = b["ahash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(h)
        bands = np.empty(4 * n, np.int64)
        for i in range(4):
            val = (h >> np.uint64(16 * i)) & np.uint64(0xFFFF)
            bands[i * n:(i + 1) * n] = (np.int64(i) << 16) | \
                val.astype(np.int64)
        return pa.table({
            "band": pa.array(bands, pa.int64()),
            "ref": pa.array(np.tile(rid, 4), pa.int64()),
            "sig": pa.array(np.tile(h, 4).view(np.int64), pa.int64()),
        })

    def addpart(b: pa.Table) -> pa.Table:
        v = b["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = ((v * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(48)) \
            % np.uint64(32)
        return b.append_column("_part", pa.array(p.astype(np.int32),
                                                 pa.int32()))

    def bucket_pairs(t: pa.Table) -> pa.Table:
        band = t["band"].to_numpy(zero_copy_only=False)
        rid = t["ref"].to_numpy(zero_copy_only=False)
        sig = t["sig"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((rid, band))
        band, rid, sig = band[order], rid[order], sig[order]
        starts = np.searchsorted(band, np.unique(band), "left")
        bounds = np.append(starts, len(band))
        out_a, out_b, out_h = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = e - s
            if m < 2:
                continue
            i, j = np.triu_indices(m, k=1)
            ham = _hamming64(sig[s + i], sig[s + j])
            # a<b as UNSIGNED asset ids (the lexsort ordered the signed
            # view; same-ref rows (i==j impossible here) never pair)
            keep = (ham <= AHASH_HAM_T) & \
                (rid[s + i].view(np.uint64) != rid[s + j].view(np.uint64))
            ia, ib = rid[s + i[keep]], rid[s + j[keep]]
            ua, ub = ia.view(np.uint64), ib.view(np.uint64)
            swap = ua > ub
            ia2 = np.where(swap, ib, ia)
            ib2 = np.where(swap, ia, ib)
            out_a.append(ia2)
            out_b.append(ib2)
            out_h.append(ham[keep])
        if not out_a:
            return pa.table({"ra": pa.array([], pa.int64()),
                             "rb": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        return pa.table({
            "ra": pa.array(np.concatenate(out_a), pa.int64()),
            "rb": pa.array(np.concatenate(out_b), pa.int64()),
            "hamming": pa.array(np.concatenate(out_h), pa.int64()),
        })

    return sigs.map_batches(band_fan_out, batch_format="pyarrow") \
        .map_batches(addpart, batch_format="pyarrow") \
        .groupby("_part").map_groups(bucket_pairs, batch_format="pyarrow") \
        .groupby(["ra", "rb"]).aggregate(Min("hamming",
                                             alias_name="hamming"))


def q_media_neardup(sf_dir: str):
    """EXACT media near-duplicate pairs: every pair of media_refs whose
    aHash signatures differ in ≤ AHASH_HAM_T bits. Banded pigeonhole
    (4 × 16-bit bands) exactly as simhash_hamming_pairs — no O(n²)
    self-join; hot band buckets (a corpus dominated by one asset)
    would take the pip_join salting treatment at scale."""
    pairs = _neardup_pairs_i64(sf_dir)

    def to_refs(b: pa.Table) -> pa.Table:
        ra = b["ra"].to_numpy(zero_copy_only=False).view(np.uint64)
        rb = b["rb"].to_numpy(zero_copy_only=False).view(np.uint64)
        return pa.table({
            "ref_a": pa.array(["media://%016x" % v for v in ra],
                              pa.string()),
            "ref_b": pa.array(["media://%016x" % v for v in rb],
                              pa.string()),
            "hamming": pc.cast(b["hamming"], pa.int64()),
        })

    return pairs.map_batches(to_refs, batch_format="pyarrow")


_SIGN_FLIP = np.int64(np.uint64(1) << np.uint64(63))


def q_media_dup_clusters(sf_dir: str):
    """Media duplicate-cluster assignment: connected components over
    the aHash near-dup pair graph → (media_ref, cluster_ref) with the
    cluster representative = min asset id reachable (the canonical
    keep-asset — the media-side twin of dedup_clusters). Reuses the
    distributed min-label propagation of stages/text.py verbatim; asset
    ids pass through an order-preserving uint64→int64 map (u XOR 2^63)
    so the propagated MIN label selects the true minimum UNSIGNED ref.
    Singleton assets (no near-dup pair) are not graph nodes and are
    absent, matching dedup_clusters' contract."""
    from ..stages.text import dedup_clusters

    pairs = _neardup_pairs_i64(sf_dir)

    def to_nodes(b: pa.Table) -> pa.Table:
        ra = b["ra"].to_numpy(zero_copy_only=False)
        rb = b["rb"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_a": pa.array(ra ^ _SIGN_FLIP, pa.int64()),
            "doc_b": pa.array(rb ^ _SIGN_FLIP, pa.int64()),
        })

    labels = dedup_clusters(pairs.map_batches(to_nodes,
                                              batch_format="pyarrow"))

    def to_refs(b: pa.Table) -> pa.Table:
        d = (b["doc_id"].to_numpy(zero_copy_only=False)
             ^ _SIGN_FLIP).view(np.uint64)
        c = (b["cluster_id"].to_numpy(zero_copy_only=False)
             ^ _SIGN_FLIP).view(np.uint64)
        return pa.table({
            "media_ref": pa.array(["media://%016x" % v for v in d],
                                  pa.string()),
            "cluster_ref": pa.array(["media://%016x" % v for v in c],
                                    pa.string()),
        })

    return labels.map_batches(to_refs, batch_format="pyarrow")


def q_media_cluster_hist(sf_dir: str):
    """Media duplicate-cluster size distribution (the dedup-benefit
    shape report for assets: how many 2-clusters vs mega-clusters) —
    chains the CC labels through two count reduces exactly like the
    text-side cluster_size_hist. Singletons are absent on both engines
    (same contract). Oracle: genuine SQL aggregation over the
    independently-generated cluster table."""
    from ray.data.aggregate import Sum

    labels = q_media_dup_clusters(sf_dir)

    def size_partial(b: pa.Table) -> pa.Table:
        col = b["cluster_ref"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = pc.dictionary_encode(col)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table({"c": enc.dictionary,
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    sizes = labels.map_batches(size_partial, batch_format="pyarrow") \
        .groupby("c").aggregate(Sum("n", alias_name="sz"))

    def hist_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(
            b["sz"].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True)
        return pa.table({"cluster_size": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    return sizes.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("cluster_size") \
        .aggregate(Sum("n", alias_name="n_clusters")) \
        .map_batches(lambda b: pa.table({
            "cluster_size": pc.cast(b["cluster_size"], pa.int64()),
            "n_clusters": pc.cast(b["n_clusters"], pa.int64())}),
            batch_format="pyarrow")


QUERIES_MEDIA = {
    "media_ahash": q_media_ahash,
    "media_neardup": q_media_neardup,
    "media_dup_clusters": q_media_dup_clusters,
    "media_cluster_hist": q_media_cluster_hist,
}


ORACLE_SQL_MEDIA = {
    "media_ahash":
        "SELECT * FROM read_parquet('/tmp/graft_expected/media_ahash.parquet')",
    "media_neardup":
        "SELECT * FROM read_parquet('/tmp/graft_expected/media_neardup.parquet')",
    "media_dup_clusters":
        "SELECT * FROM read_parquet("
        "'/tmp/graft_expected/media_dup_clusters.parquet')",
    "media_cluster_hist": """
WITH c AS (
  SELECT cluster_ref, CAST(COUNT(*) AS BIGINT) AS sz
  FROM read_parquet('/tmp/graft_expected/media_dup_clusters.parquet')
  GROUP BY cluster_ref)
SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM c GROUP BY sz""",
}
