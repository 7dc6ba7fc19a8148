"""Media aHash near-dup family: hash kernel vs scalar reference, real
PNG decode path, and banded-pigeonhole exactness vs in-test brute force."""
import numpy as np
import pyarrow as pa

from grandine_ray.stages.media import (
    AHASH_HAM_T,
    AverageHasher,
    fetch_media_variants,
)
from grandine_ray.stages import imagecodec


def _scalar_ahash(gray_flat):
    s = sum(int(v) for v in gray_flat)
    h = 0
    for i, v in enumerate(gray_flat):
        if int(v) * 64 > s:
            h |= 1 << i
    return h


def test_ahash_kernel_matches_scalar():
    refs = [f"media://{i:016x}" for i in range(57)]
    batch = pa.table({"media_ref": pa.array(refs, pa.string())})
    batch = fetch_media_variants(batch)
    out = AverageHasher(deterministic_fake=True)(batch)
    hasher = AverageHasher(deterministic_fake=True)
    for i, p in enumerate(batch["payload"].to_pylist()):
        g = hasher._gray8(p).reshape(-1)
        assert out["ahash"][i].as_py() == _scalar_ahash(g)


def test_variant_store_gives_near_duplicates():
    # many refs → some land in the same asset family; within-family
    # hashes must be close (≤ 2 perturbed pixels each side + threshold
    # drift), cross-family ~32 bits apart
    refs = [f"media://{i:016x}" for i in range(4000)]
    batch = fetch_media_variants(
        pa.table({"media_ref": pa.array(refs, pa.string())}))
    fams = [int.from_bytes(p[:8], "little")
            for p in batch["payload"].to_pylist()]
    out = AverageHasher(deterministic_fake=True)(batch)
    h = out["ahash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    by_fam = {}
    for f, hh in zip(fams, h):
        by_fam.setdefault(f, []).append(int(hh))
    sizes = [len(v) for v in by_fam.values()]
    assert max(sizes) >= 2, "no family collisions in 4000 refs"
    close = total = 0
    for v in by_fam.values():
        for i in range(len(v)):
            for j in range(i + 1, len(v)):
                total += 1
                if bin(v[i] ^ v[j]).count("1") <= AHASH_HAM_T:
                    close += 1
    assert total > 50
    assert close / total > 0.2, f"only {close}/{total} family pairs close"


def test_real_png_path_matches_scalar_ahash():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    png = imagecodec.png_encode(rgb)
    out = AverageHasher(deterministic_fake=False)(
        pa.table({"payload": pa.array([png], pa.binary())}))
    gray = rgb.astype(np.int64).sum(axis=2) // 3
    small = gray[::2, ::2].reshape(-1)
    assert out["ahash"][0].as_py() == _scalar_ahash(small)


def test_neardup_query_matches_brute_force(ray_session):
    from grandine_ray.pipelines.queries_media import (
        _ahash_ds,
        q_media_neardup,
    )

    sf = "/root/testdata/sf0.001"
    sigs = {r["media_ref"]: r["ahash"]
            for r in _ahash_ds(sf, with_span=False).take_all()}
    want = set()
    items = sorted(sigs.items(), key=lambda kv: int(kv[0][8:], 16))
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            d = bin(items[i][1] ^ items[j][1]).count("1")
            if d <= AHASH_HAM_T:
                want.add((items[i][0], items[j][0], d))
    got = {(r["ref_a"], r["ref_b"], r["hamming"])
           for r in q_media_neardup(sf).take_all()}
    assert got == want
    assert len(want) > 0, "sf0.001 corpus produced no near-dup pairs"


def test_media_dup_clusters_invariants(ray_session):
    """CC labels agree with the pair graph: both endpoints of every
    near-dup pair share a cluster, and each cluster's representative
    is its minimum (unsigned) member."""
    from grandine_ray.pipelines.queries_media import (q_media_dup_clusters,
                                                      q_media_neardup)

    SF = "/root/testdata/sf0.001"
    lab = {r.media_ref: r.cluster_ref
           for r in q_media_dup_clusters(SF).to_pandas().itertuples()}
    pairs = q_media_neardup(SF).to_pandas()
    assert len(pairs) > 0 and len(lab) > 0
    for r in pairs.itertuples():
        assert lab[r.ref_a] == lab[r.ref_b]
    members = {}
    for ref, c in lab.items():
        members.setdefault(c, []).append(ref)
    for c, ms in members.items():
        assert c == min(ms, key=lambda s: int(s[8:], 16))
        assert c in lab and lab[c] == c


def test_media_cluster_hist_consistent(ray_session):
    """Histogram == recount of the labels table; Σ(size·count) equals
    the number of labeled assets."""
    from collections import Counter

    from grandine_ray.pipelines.queries_media import (
        q_media_cluster_hist, q_media_dup_clusters)

    SF = "/root/testdata/sf0.001"
    lab = q_media_dup_clusters(SF).to_pandas()
    want = Counter(Counter(lab.cluster_ref).values())
    got = {r.cluster_size: r.n_clusters
           for r in q_media_cluster_hist(SF).to_pandas().itertuples()}
    assert got == dict(want) and len(got) > 0
    assert sum(s * n for s, n in got.items()) == len(lab)
    assert min(got) >= 2                    # singletons are not nodes
