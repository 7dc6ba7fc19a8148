"""Independent ground-truth generators for the non-SQL-expressible queries.

Each function here is a from-scratch scalar reimplementation of the
operator's SPEC (RDP, scanline fill, S2/hex cell math, SimHash, rolling
fingerprint, exact n-gram Jaccard) using only the stdlib + element-wise
numpy — deliberately NOT importing the engine's vectorized kernels, so a
vectorization or distribution bug in the engine cannot cancel out in the
oracle. ``ensure_expected`` materializes them once per corpus version as
parquet files under /tmp/graft_expected/; ``ORACLE_SQL`` then checks the
Ray pipelines against them with a plain ``SELECT`` (full rows + schema +
value-hash driver gate, per VERDICT r1 item 8).

Inputs: the synthetic ground-truth vertex table (geoms.parquet — written
from the PRE-WKB coordinates, so these oracles never touch the engine's
WKB codec) and the driver's sf0.01 documents table.
"""
from __future__ import annotations

import hashlib
import math
import os
import re
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EXPECTED_DIR = "/tmp/graft_expected"
_VERSION = "v19"  # v19: +media_dup_clusters (v18: +media_ahash, +media_neardup)

_WORD = re.compile(r"\w+", re.UNICODE)
_WS = re.compile(r"\s+")


def _h8(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(),
                          "little")


# ------------------------------------------------------------ geometry maths


def _seg_dist(ax, ay, bx, by, px, py):
    """Distance from p to SEGMENT ab (projection clamped to [0, 1] —
    the reference semantics, line.go:351-380)."""
    cx, cy = bx - ax, by - ay
    len_sq = cx * cx + cy * cy
    if len_sq == 0:
        t = 0.0
    else:
        t = ((px - ax) * cx + (py - ay) * cy) / len_sq
    t = min(1.0, max(0.0, t))
    qx, qy = ax + t * cx, ay + t * cy
    return math.hypot(px - qx, py - qy)


def _rdp(pts, eps):
    """Ramer–Douglas–Peucker over (x, y) tuple lists (first-max split)."""
    if len(pts) < 3:
        return list(pts)
    ax, ay = pts[0]
    bx, by = pts[-1]
    best, best_d = 0, -1.0
    for i in range(1, len(pts) - 1):
        d = _seg_dist(ax, ay, bx, by, pts[i][0], pts[i][1])
        if d > best_d:
            best, best_d = i, d
    if best_d > eps:
        left = _rdp(pts[:best + 1], eps)
        right = _rdp(pts[best:], eps)
        return left[:-1] + right
    return [pts[0], pts[-1]]


def _scanline_fill_fraction(rings, size, extent):
    """Even-odd scanline fill over pixel centers; mirrors the documented
    raster semantics (pixel center (row + 0.5)/scale; runs between sorted
    crossing pairs, pixel index range [ceil(x*s - .5), floor(x*s - .5)])."""
    scale = size / extent
    filled = 0
    for row in range(size):
        ycv = (row + 0.5) / scale
        xs_cross = []
        for ring in rings:
            n = len(ring)
            for k in range(n):
                x1, y1 = ring[k]
                x2, y2 = ring[(k + 1) % n]
                if (y1 <= ycv < y2) or (y2 <= ycv < y1):
                    t = (ycv - y1) / (y2 - y1)
                    xs_cross.append(x1 + t * (x2 - x1))
        xs_cross.sort()
        for j in range(0, len(xs_cross) - 1, 2):
            lo = max(0, math.ceil(xs_cross[j] * scale - 0.5))
            hi = min(size - 1, math.floor(xs_cross[j + 1] * scale - 0.5))
            if hi >= lo:
                filled += hi - lo + 1
    return round(filled / (size * size), 6)


def _point_in_rings_evenodd(x, y, rings):
    cnt = 0
    for ring in rings:
        n = len(ring)
        for k in range(n):
            x1, y1 = ring[k]
            x2, y2 = ring[(k + 1) % n]
            if (y1 > y) != (y2 > y):
                xin = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
                if x < xin:
                    cnt += 1
    return cnt % 2 == 1


def _s2_cell(lon, lat, level=12):
    """Scalar S2-style cell id (public face/uv/st + Hilbert xy2d formulas)."""
    phi = math.radians(lat)
    lam = math.radians(lon)
    x = math.cos(phi) * math.cos(lam)
    y = math.cos(phi) * math.sin(lam)
    z = math.sin(phi)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x > 0 else 3
    elif ay >= ax and ay >= az:
        face = 1 if y > 0 else 4
    else:
        face = 2 if z > 0 else 5
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z

    def st(uu):
        r = 0.5 * math.sqrt(1.0 + 3.0 * abs(uu))
        return r if uu >= 0 else 1.0 - r

    n = 1 << level
    i = min(n - 1, max(0, int(st(u) * n)))
    j = min(n - 1, max(0, int(st(v) * n)))
    # Hilbert xy2d, standard public iterative form (MSB-first).
    code = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (i & s) else 0
        ry = 1 if (j & s) else 0
        code += s * s * ((3 * rx) ^ ry)
        low = s - 1
        if ry == 0:
            if rx == 1:
                i, j = low - (j & low), low - (i & low)
            else:
                i, j = (j & low), (i & low)
        else:
            i, j = i & low, j & low
        s >>= 1
    return (face << (2 * level + 5)) | (code << 5) | level


_MERC_MAX = 20037508.342789244


def _hex_cell(lon, lat, res=9):
    mx = math.radians(lon) * 6378137.0
    clat = min(89.9, max(-89.9, lat))
    my = math.log(math.tan(math.radians(clat) / 2.0 + math.pi / 4.0)) * 6378137.0
    size = _MERC_MAX / (2.0 ** res)
    q = (math.sqrt(3.0) / 3.0 * mx - 1.0 / 3.0 * my) / size
    r = (2.0 / 3.0 * my) / size
    s = -q - r
    rq, rr, rs = round(q), round(r), round(s)
    dq, dr, ds = abs(rq - q), abs(rr - r), abs(rs - s)
    if dq > dr and dq > ds:
        rq = -rr - rs
    elif dr > ds:
        rr = -rq - rs
    return (res << 56) | ((rq + (1 << 27)) << 28) | (rr + (1 << 27))


# --------------------------------------------------------------- text maths


# the engine's shingle/word hash spec (stages/text.py): seeded polynomial
# hash over Unicode code points, H(s) = Σ_i (ord(s_i)+1)·B^i mod 2^64 —
# reimplemented here as a plain per-character Python loop (the engine
# computes it as one cumulative prefix pass; a factorization bug there
# cannot cancel out against this scalar form)
_PB = 0x9E3779B97F4A7C15
_PMASK = (1 << 64) - 1


def _poly(s: str) -> int:
    h = 0
    bp = 1
    for c in s:
        h = (h + (ord(c) + 1) * bp) & _PMASK
        bp = (bp * _PB) & _PMASK
    return h


def _shingle_set(text, k=5):
    t = _WS.sub(" ", (text or "").lower()).strip()
    if len(t) < k:
        return {_poly(t)}
    return {_poly(t[i:i + k]) for i in range(len(t) - k + 1)}


def _simhash(text):
    words = _WORD.findall((text or "").lower())
    if not words:
        return 0
    votes = [0] * 64
    for w in words:
        h = _poly(w)
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if votes[b] > 0:
            out |= 1 << b
    return out


def _fingerprint(text, window=16):
    data = (text or "").encode("utf-8")
    if len(data) <= window:
        return _h8(data)
    mask = (1 << 64) - 1
    best = None
    # rolling polynomial hash sum(byte[i+k] * 257^k) mod 2^64
    powers = [pow(257, k, 1 << 64) for k in range(window)]
    h = 0
    for k in range(window):
        h = (h + data[k] * powers[k]) & mask
    best = h
    inv = None
    for i in range(1, len(data) - window + 1):
        # recompute from scratch is O(n*w); cheap enough at oracle scale is
        # fine, but keep the rolling update: h' = (h - d[i-1]) / 257 + ...
        h = (h - data[i - 1]) & mask
        # division by 257 mod 2^64 via modular inverse (257 is odd)
        if inv is None:
            inv = pow(257, -1, 1 << 64)
        h = (h * inv) & mask
        h = (h + data[i + window - 1] * powers[window - 1]) & mask
        if h < best:
            best = h
    return best


# ----------------------------------------------------------- table builders


def _geom_rows(corpus_dir):
    t = pq.read_table(f"{corpus_dir}/geoms.parquet")
    cols = t.to_pydict()
    for i in range(t.num_rows):
        rings = {}
        for x, y, r in zip(cols["xs"][i], cols["ys"][i], cols["ring_of"][i]):
            rings.setdefault(r, []).append((x, y))
        yield (cols["doc_id"][i], cols["span_idx"][i], cols["geom_type"][i],
               [rings[k] for k in sorted(rings)])


def expected_simplify(corpus_dir) -> pa.Table:
    doc, span, n_in, n_out = [], [], [], []
    for d, s, gt, rings in _geom_rows(corpus_dir):
        if gt != 2:
            continue
        pts = rings[0]
        doc.append(d)
        span.append(s)
        n_in.append(len(pts))
        n_out.append(len(_rdp(pts, 0.01)))
    return pa.table({
        "doc_id": pa.array(doc, pa.string()),
        "span_idx": pa.array(span, pa.int64()),
        "n_points_in": pa.array(n_in, pa.int64()),
        "n_points_simplified": pa.array(n_out, pa.int64()),
    })


def expected_raster_stats(corpus_dir) -> pa.Table:
    doc, span, fills = [], [], []
    for d, s, gt, rings in _geom_rows(corpus_dir):
        if gt != 3:
            continue
        # per-ring min-shift + global extent (matches the registered query's
        # normalization, pipelines/queries.py::q_raster_stats)
        shifted = []
        extent = 1e-9
        for r in rings:
            mx = min(p[0] for p in r)
            my = min(p[1] for p in r)
            rr = [(p[0] - mx, p[1] - my) for p in r]
            extent = max(extent, max(max(p[0], p[1]) for p in rr))
            shifted.append(rr)
        doc.append(d)
        span.append(s)
        fills.append(_scanline_fill_fraction(shifted, 32, extent))
    return pa.table({
        "doc_id": pa.array(doc, pa.string()),
        "span_idx": pa.array(span, pa.int64()),
        "fill_fraction": pa.array(fills, pa.float64()),
    })


def expected_cell_index(corpus_dir) -> pa.Table:
    doc, span, s2c, h3c = [], [], [], []
    for d, s, gt, rings in _geom_rows(corpus_dir):
        if gt != 1:
            continue
        lon, lat = rings[0][0]
        doc.append(d)
        span.append(s)
        s2c.append(_s2_cell(lon, lat, 12))
        h3c.append(_hex_cell(lon, lat, 9))
    return pa.table({
        "doc_id": pa.array(doc, pa.string()),
        "span_idx": pa.array(span, pa.int64()),
        "s2_cell": pa.array(s2c, pa.uint64()),
        "h3_cell": pa.array(h3c, pa.uint64()),
    })


def _doc_texts(docs_parquet):
    t = pq.read_table(docs_parquet, columns=["doc_id", "text"])
    return t["doc_id"].to_pylist(), t["text"].to_pylist()


def expected_simhash(docs_parquet) -> pa.Table:
    ids, texts = _doc_texts(docs_parquet)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "simhash": pa.array([_simhash(t) for t in texts], pa.uint64()),
    })


def expected_fingerprint(docs_parquet) -> pa.Table:
    ids, texts = _doc_texts(docs_parquet)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fingerprint": pa.array([_fingerprint(t) for t in texts],
                                pa.uint64()),
    })


def expected_minhash_pairs(docs_parquet, threshold=0.5) -> pa.Table:
    """EXACT all-pairs n-gram Jaccard (no sketches, no LSH): every pair of
    documents with true Jaccard >= threshold. The registered query's
    MinHash+LSH pipeline must find exactly these on the fixed corpus (its
    LSH parameters give recall 1.0 there — asserted at generation time by
    the caller)."""
    ids, texts = _doc_texts(docs_parquet)
    sets = [_shingle_set(t) for t in texts]
    a_l, b_l, j_l = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            si, sj = sets[i], sets[j]
            inter = len(si & sj)
            if inter == 0:
                continue
            jac = inter / len(si | sj)
            if round(jac, 4) >= threshold:
                a, b = ids[i], ids[j]
                if a > b:
                    a, b = b, a
                a_l.append(a)
                b_l.append(b)
                j_l.append(round(jac, 4))
    return pa.table({
        "doc_a": pa.array(a_l, pa.int64()),
        "doc_b": pa.array(b_l, pa.int64()),
        "jaccard": pa.array(j_l, pa.float64()),
    })


def _fake_payload(ref: str, n: int = 256) -> bytes:
    """The deterministic fake-store payload contract (chained blake2b of
    "ref:i") — defined once for every media oracle."""
    payload = b""
    i = 0
    while len(payload) < n:
        payload += hashlib.blake2b(f"{ref}:{i}".encode(),
                                   digest_size=32).digest()
        i += 1
    return payload[:n]


def expected_media_features(corpus_dir) -> pa.Table:
    """Media pipeline ground truth: per-doc span walk in plain Python (the
    engine derives span_idx with vectorized list offsets — this checks it
    row by row), fake store bytes + decode + nearest-neighbor 16->8 resize
    + channel mean, recomputed scalar-wise."""
    t = pq.read_table(f"{corpus_dir}/documents.parquet")
    doc_ids = t["doc_id"].to_pylist()
    spans = t["spans"].to_pylist()
    d_l, s_l, r_l, m_l = [], [], [], []
    for d, doc_spans in zip(doc_ids, spans):
        for idx, sp in enumerate(doc_spans):
            if sp["kind"] != "media":
                continue
            ref = sp["media_ref"]
            payload = _fake_payload(ref)
            seed = int.from_bytes(payload[:8], "little")
            img = np.random.default_rng(seed).integers(
                0, 256, (16, 16, 3), dtype=np.uint8)
            resized = img[::2, ::2]          # nearest 16->8 (arange*16//8)
            mean_r = round(float(resized[:, :, 0].astype(np.float64).mean()), 4)
            d_l.append(d)
            s_l.append(idx)
            r_l.append(ref)
            m_l.append(mean_r)
    return pa.table({
        "doc_id": pa.array(d_l, pa.string()),
        "span_idx": pa.array(s_l, pa.int64()),
        "media_ref": pa.array(r_l, pa.string()),
        "mean_r": pa.array(m_l, pa.float64()),
    })


def _ahash_scalar(gray_flat) -> int:
    """Average-hash of 64 gray values: bit i set iff v_i·64 > Σv (the
    integer cross-multiplied mean comparison; plain Python loop)."""
    s = sum(int(v) for v in gray_flat)
    h = 0
    for i, v in enumerate(gray_flat):
        if int(v) * 64 > s:
            h |= 1 << i
    return h


def _media_ahash_rows(corpus_dir):
    """Scalar recomputation of the variant-store decode + aHash for every
    media span: family base image (blake2b family seed), 16→8 nearest
    downsample of the (r+g+b)//3 grayscale, ≤2 perturbed pixels, then
    the bit loop in _ahash_scalar."""
    t = pq.read_table(f"{corpus_dir}/documents.parquet")
    doc_ids = t["doc_id"].to_pylist()
    spans = t["spans"].to_pylist()
    n_fam = 4096  # AHASH_N_FAM (spec constant, restated independently)
    rows = []
    for d, doc_spans in zip(doc_ids, spans):
        for idx, sp in enumerate(doc_spans):
            if sp["kind"] != "media":
                continue
            ref = sp["media_ref"]
            ref_seed = _h8(ref.encode())
            fam_seed = _h8(b"fam:%d" % (ref_seed % n_fam))
            rgb = np.random.default_rng(fam_seed).integers(
                0, 256, (16, 16, 3), dtype=np.uint8)
            gray = [[(int(rgb[y][x][0]) + int(rgb[y][x][1])
                      + int(rgb[y][x][2])) // 3
                     for x in range(0, 16, 2)] for y in range(0, 16, 2)]
            flat = [v for row in gray for v in row]
            rngr = np.random.default_rng(ref_seed)
            k = int(rngr.integers(0, 3))
            if k:
                pos = rngr.integers(0, 64, size=k)
                val = rngr.integers(0, 256, size=k)
                for p, v in zip(pos, val):
                    flat[int(p)] = int(v)
            rows.append((d, idx, ref, _ahash_scalar(flat)))
    return rows


def expected_media_ahash(corpus_dir) -> pa.Table:
    rows = _media_ahash_rows(corpus_dir)
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "span_idx": pa.array([r[1] for r in rows], pa.int64()),
        "ahash": pa.array([r[3] for r in rows], pa.uint64()),
    })


def expected_media_neardup(corpus_dir, threshold: int = 3) -> pa.Table:
    """Brute-force O(n²) Hamming scan over the scalar aHash table —
    every distinct media_ref pair within `threshold` bits (the banded
    LSH query must find exactly these)."""
    rows = _media_ahash_rows(corpus_dir)
    by_ref = {}
    for _, _, ref, h in rows:
        by_ref[ref] = h
    refs = sorted(by_ref, key=lambda r: int(r[8:], 16))
    hs = np.array([by_ref[r] for r in refs], np.uint64)
    n = len(refs)
    pop = np.array([bin(i).count("1") for i in range(256)], np.uint8)
    out = []
    chunk = 1024
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        x = np.bitwise_xor(hs[s:e, None], hs[None, :])
        ham = pop[x.view(np.uint8).reshape(e - s, n, 8)] \
            .sum(axis=2).astype(np.int64)
        ii, jj = np.nonzero(ham <= threshold)
        for a, b in zip(ii, jj):
            ga = s + int(a)
            if ga < int(b):
                out.append((refs[ga], refs[int(b)],
                            int(ham[int(a)][int(b)])))
    out.sort()
    return pa.table({
        "ref_a": pa.array([o[0] for o in out], pa.string()),
        "ref_b": pa.array([o[1] for o in out], pa.string()),
        "hamming": pa.array([o[2] for o in out], pa.int64()),
    })


def expected_media_dup_clusters(corpus_dir, threshold: int = 3) -> pa.Table:
    """Union-find over the brute-force near-dup pair set; the cluster
    representative is the minimum UNSIGNED asset id reachable (the
    media_dup_clusters contract). Singletons (no pair) are absent."""
    pairs = expected_media_neardup(corpus_dir, threshold=threshold)
    parent: dict = {}

    def find(r):
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for a, b in zip(pairs["ref_a"].to_pylist(),
                    pairs["ref_b"].to_pylist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    rep: dict = {}
    for r in parent:
        root = find(r)
        cur = rep.get(root)
        if cur is None or int(r[8:], 16) < int(cur[8:], 16):
            rep[root] = r
    out = sorted((r, rep[find(r)]) for r in parent)
    return pa.table({
        "media_ref": pa.array([o[0] for o in out], pa.string()),
        "cluster_ref": pa.array([o[1] for o in out], pa.string()),
    })


_GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_scalar(lon: float, lat: float, precision: int) -> str:
    """Classic interval-halving geohash encoder (independent of the
    engine's quantize-and-interleave formulation)."""
    lo_x, hi_x, lo_y, hi_y = -180.0, 180.0, -90.0, 90.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lo_x + hi_x) / 2
            if lon >= mid:
                bits.append(1)
                lo_x = mid
            else:
                bits.append(0)
                hi_x = mid
        else:
            mid = (lo_y + hi_y) / 2
            if lat >= mid:
                bits.append(1)
                lo_y = mid
            else:
                bits.append(0)
                hi_y = mid
        even = not even
    out = []
    for c in range(precision):
        v = 0
        for b in bits[5 * c:5 * c + 5]:
            v = v * 2 + b
        out.append(_GEOHASH_B32[v])
    return "".join(out)


def expected_geohash_cells(corpus_dir) -> pa.Table:
    doc, span, gh = [], [], []
    for d, s, gt, rings in _geom_rows(corpus_dir):
        if gt != 1:
            continue
        lon, lat = rings[0][0]
        doc.append(d)
        span.append(s)
        gh.append(_geohash_scalar(lon, lat, 7))
    return pa.table({
        "doc_id": pa.array(doc, pa.string()),
        "span_idx": pa.array(span, pa.int64()),
        "geohash": pa.array(gh, pa.string()),
    })


def _word_ngrams(text: str, n: int) -> set:
    words = _WS.sub(" ", (text or "").lower()).strip().split(" ")
    if words == [""]:
        words = []
    return {tuple(words[i:i + n]) for i in range(len(words) - n + 1)}


def expected_decontaminate(docs_parquet, n=4, mod=23) -> pa.Table:
    """String-tuple-set decontamination ground truth: benchmark docs are
    doc_id % mod == 0; a training doc's n_hits is the size of the
    intersection of its DISTINCT word-n-gram set with the union of all
    benchmark docs' n-grams. Only contaminated docs appear."""
    ids, texts = _doc_texts(docs_parquet)
    bench = set()
    for i, t in zip(ids, texts):
        if i % mod == 0:
            bench |= _word_ngrams(t, n)
    d_l, h_l = [], []
    for i, t in zip(ids, texts):
        if i % mod == 0:
            continue
        hits = len(_word_ngrams(t, n) & bench)
        if hits:
            d_l.append(i)
            h_l.append(hits)
    return pa.table({
        "doc_id": pa.array(d_l, pa.int64()),
        "n_hits": pa.array(h_l, pa.int64()),
    })


def expected_pack_sequences(docs_parquet, budget=256, shard=100) -> pa.Table:
    """Pure-Python greedy first-fit-in-order packer, restarted at fixed
    shard boundaries (doc_id // shard); oversized docs get their own
    pack; pack_id = shard_index * 1e6 + local pack ordinal."""
    ids, texts = _doc_texts(docs_parquet)
    toks = {i: (len(t.split()) if t.strip() else 0)
            for i, t in zip(ids, texts)}
    rows = []
    by_shard: dict = {}
    for i in sorted(ids):
        by_shard.setdefault(i // shard, []).append(i)
    for sh, members in sorted(by_shard.items()):
        local = 0
        acc = 0
        pos = 0
        for i in members:
            t = toks[i]
            if pos > 0 and acc + t > budget:
                local += 1
                acc, pos = 0, 0
            rows.append((i, sh * 1_000_000 + local, pos, t))
            acc += t
            pos += 1
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "pack_id": pa.array([r[1] for r in rows], pa.int64()),
        "pack_pos": pa.array([r[2] for r in rows], pa.int64()),
        "n_tokens": pa.array([r[3] for r in rows], pa.int64()),
    })


def expected_gopher_quality(docs_parquet) -> pa.Table:
    """collections.Counter reimplementation of the repetition signals:
    n_words, floor(unique/total * 1e6 + 0.5), floor(top-2-gram/total
    2-grams * 1e6 + 0.5), and the keep verdict (>=15 words, unique frac
    >= 0.30, top-2-gram frac <= 0.20)."""
    from collections import Counter

    ids, texts = _doc_texts(docs_parquet)
    d_l, w_l, u_l, t_l, k_l = [], [], [], [], []
    for i, t in zip(ids, texts):
        words = _WS.sub(" ", (t or "").lower()).strip().split(" ")
        if words == [""]:
            words = []
        n = len(words)
        uniq = len(set(words))
        grams = [tuple(words[j:j + 2]) for j in range(n - 1)]
        top = max(Counter(grams).values()) if grams else 0
        um = math.floor(uniq / n * 1e6 + 0.5) if n else 0
        tm = math.floor(top / len(grams) * 1e6 + 0.5) if grams else 0
        keep = int(n >= 15 and um >= 300_000 and tm <= 200_000)
        d_l.append(i)
        w_l.append(n)
        u_l.append(um)
        t_l.append(tm)
        k_l.append(keep)
    return pa.table({
        "doc_id": pa.array(d_l, pa.int64()),
        "n_words": pa.array(w_l, pa.int64()),
        "uniq_word_micro": pa.array(u_l, pa.int64()),
        "top2gram_micro": pa.array(t_l, pa.int64()),
        "keep": pa.array(k_l, pa.int64()),
    })


def expected_corpus_build(docs_parquet, budget=256, shard=100) -> pa.Table:
    """Scalar ground truth for the full corpus-build chain: C4-style
    thresholds (>= 10 whitespace tokens, >= 50 chars), exact-dedup
    canonical keep (min doc_id per identical text among survivors),
    then the greedy per-shard packer over the kept docs."""
    ids, texts = _doc_texts(docs_parquet)
    toks, lens = {}, {}
    for i, t in zip(ids, texts):
        s = t.strip()
        toks[i] = len(_WS.split(s)) if s else 0
        lens[i] = len(t)
    surv = [i for i, t in zip(ids, texts)
            if toks[i] >= 10 and lens[i] >= 50]
    canon: dict = {}
    by_id = dict(zip(ids, texts))
    for i in sorted(surv):
        canon.setdefault(by_id[i], i)
    kept = sorted(canon.values())
    rows = []
    by_shard: dict = {}
    for i in kept:
        by_shard.setdefault(i // shard, []).append(i)
    for sh, members in sorted(by_shard.items()):
        local, acc, pos = 0, 0, 0
        for i in members:
            t = toks[i]
            if pos > 0 and acc + t > budget:
                local += 1
                acc, pos = 0, 0
            rows.append((i, sh * 1_000_000 + local, pos, t))
            acc += t
            pos += 1
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "pack_id": pa.array([r[1] for r in rows], pa.int64()),
        "pack_pos": pa.array([r[2] for r in rows], pa.int64()),
        "n_tokens": pa.array([r[3] for r in rows], pa.int64()),
    })


def expected_compression_ratio(docs_parquet) -> pa.Table:
    """zlib(level 6) compressibility per document — scalar loop over the
    stdlib compressor (the engine side must match byte counts exactly;
    ratio in integer micro units, 0 for empty docs)."""
    import zlib

    ids, texts = _doc_texts(docs_parquet)
    raw = [len(t.encode("utf-8")) for t in texts]
    comp = [len(zlib.compress(t.encode("utf-8"), 6)) for t in texts]
    ratio = [int(math.floor(c / r * 1_000_000 + 0.5)) if r else 0
             for r, c in zip(raw, comp)]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "raw_len": pa.array(raw, pa.int64()),
        "zlib_len": pa.array(comp, pa.int64()),
        "ratio_micro": pa.array(ratio, pa.int64()),
    })


def expected_pack_multimodal(corpus_dir, budget=512, shard=100) -> pa.Table:
    """Greedy packer over the INTERLEAVED corpus: per-doc cost = text
    whitespace tokens + 256 per media span + 16 per geom span; the same
    shard-restarted first-fit loop as expected_pack_sequences."""
    t = pq.read_table(f"{corpus_dir}/documents.parquet",
                      columns=["doc_id", "spans"])
    costs = {}
    for did, spans in zip(t["doc_id"].to_pylist(),
                          t["spans"].to_pylist()):
        c = 0
        for s in spans:
            if s["kind"] == "text":
                c += len(s["text"].split()) if s["text"] else 0
            elif s["kind"] == "media":
                c += 256
            elif s["kind"] == "geom":
                c += 16
        costs[int(did[4:])] = c
    rows = []
    by_shard: dict = {}
    for i in sorted(costs):
        by_shard.setdefault(i // shard, []).append(i)
    for sh, members in sorted(by_shard.items()):
        local, acc, pos = 0, 0, 0
        for i in members:
            c = costs[i]
            if pos > 0 and acc + c > budget:
                local += 1
                acc, pos = 0, 0
            rows.append((i, sh * 1_000_000 + local, pos, c))
            acc += c
            pos += 1
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "pack_id": pa.array([r[1] for r in rows], pa.int64()),
        "pack_pos": pa.array([r[2] for r in rows], pa.int64()),
        "n_cost": pa.array([r[3] for r in rows], pa.int64()),
    })


def expected_video_frames(corpus_dir, k=4) -> pa.Table:
    """Frame-sampler ground truth: scalar span walk + the deterministic
    fake store/extractor contract (payload = chained blake2b of
    \"ref:i\"; frame i = blake2b(payload + bytes([i]), 16))."""
    t = pq.read_table(f"{corpus_dir}/documents.parquet")
    d_l, s_l, r_l = [], [], []
    frames: list[list[str]] = [[] for _ in range(k)]
    for d, doc_spans in zip(t["doc_id"].to_pylist(),
                            t["spans"].to_pylist()):
        for idx, sp in enumerate(doc_spans):
            if sp["kind"] != "media":
                continue
            ref = sp["media_ref"]
            payload = _fake_payload(ref)
            d_l.append(d)
            s_l.append(idx)
            r_l.append(ref)
            for fi in range(k):
                frames[fi].append(hashlib.blake2b(
                    payload + bytes([fi]), digest_size=16).hexdigest())
    cols = {
        "doc_id": pa.array(d_l, pa.string()),
        "span_idx": pa.array(s_l, pa.int64()),
        "media_ref": pa.array(r_l, pa.string()),
    }
    for fi in range(k):
        cols[f"f{fi}"] = pa.array(frames[fi], pa.string())
    return pa.table(cols)


def expected_audio_windows(corpus_dir, window=64, hop=32) -> pa.Table:
    """Audio-chunking ground truth: scalar span walk, fake PCM = the
    256-byte deterministic payload, fixed windows with overlap, energy
    = integer byte sum per window."""
    t = pq.read_table(f"{corpus_dir}/documents.parquet")
    d_l, s_l, r_l, w_l, e_l = [], [], [], [], []
    for d, doc_spans in zip(t["doc_id"].to_pylist(),
                            t["spans"].to_pylist()):
        for idx, sp in enumerate(doc_spans):
            if sp["kind"] != "media":
                continue
            ref = sp["media_ref"]
            payload = _fake_payload(ref)
            n = (len(payload) - window) // hop + 1
            for w in range(max(n, 0)):
                seg = payload[w * hop:w * hop + window]
                d_l.append(d)
                s_l.append(idx)
                r_l.append(ref)
                w_l.append(w)
                e_l.append(sum(seg))
    return pa.table({
        "doc_id": pa.array(d_l, pa.string()),
        "span_idx": pa.array(s_l, pa.int64()),
        "media_ref": pa.array(r_l, pa.string()),
        "win_idx": pa.array(w_l, pa.int64()),
        "energy": pa.array(e_l, pa.int64()),
    })


# the lang-ID SPEC (stages/text.py LangId): stopword-profile overlap
# over \w+ words of the lowercased first 1000 chars; ties keep the
# FIRST profile in declaration order; no overlap → "unknown". The
# profile sets are spec constants, restated here independently.
_LANG_PROFILES_SPEC = [
    ("en", {"the", "and", "of", "to", "in", "is"}),
    ("de", {"der", "die", "und", "das", "ist", "nicht"}),
    ("fr", {"le", "la", "et", "les", "des", "est"}),
    ("es", {"el", "la", "de", "los", "que", "es"}),
]


def expected_lang_confusion(docs_parquet) -> pa.Table:
    t = pq.read_table(docs_parquet, columns=["lang", "text"])
    counts: dict = {}
    for lang, text in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
        words = set(_WORD.findall((text or "").lower()[:1000]))
        best, score = "unknown", 0
        for name, profile in _LANG_PROFILES_SPEC:
            s = len(words & profile)
            if s > score:
                best, score = name, s
        counts[(best, lang)] = counts.get((best, lang), 0) + 1
    keys = sorted(counts)
    return pa.table({
        "lang_pred": pa.array([k[0] for k in keys], pa.string()),
        "lang": pa.array([k[1] for k in keys], pa.string()),
        "n": pa.array([counts[k] for k in keys], pa.int64()),
    })


def _qs_weight(bucket: int) -> int:
    """Scalar mirror of stages/corpus.py quality_weights — pure integer
    arithmetic, recomputed independently here."""
    return (bucket * 2654435761 + 99991) % 2001 - 1000


def _doc_words(t: str) -> list:
    words = _WS.sub(" ", (t or "").lower()).strip().split(" ")
    return [] if words == [""] else words


def expected_quality_score(docs_parquet) -> pa.Table:
    """Scalar hashed-BoW linear scorer: per word occurrence,
    weight[_poly(word) % 4096]; keep = score > 0."""
    ids, texts = _doc_texts(docs_parquet)
    d_l, n_l, s_l, k_l = [], [], [], []
    for i, t in zip(ids, texts):
        words = _doc_words(t)
        score = sum(_qs_weight(_poly(w) % 4096) for w in words)
        d_l.append(i)
        n_l.append(len(words))
        s_l.append(score)
        k_l.append(int(score > 0))
    return pa.table({
        "doc_id": pa.array(d_l, pa.int64()),
        "n_words": pa.array(n_l, pa.int64()),
        "score": pa.array(s_l, pa.int64()),
        "keep": pa.array(k_l, pa.int64()),
    })


def expected_target_affinity(docs_parquet) -> pa.Table:
    """Scalar DSIR-flavored affinity: target = lang='en' docs; ppm[b] =
    floor(count_b/total * 1e6 + 0.5) over hashed unigram buckets;
    affinity = Σ ppm[bucket(word)] over raw word occurrences."""
    t = pq.read_table(docs_parquet, columns=["doc_id", "text", "lang"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()
    T = [0] * 4096
    for txt, lg in zip(texts, langs):
        if lg == "en":
            for w in _doc_words(txt):
                T[_poly(w) % 4096] += 1
    total = sum(T)
    ppm = [math.floor(c / total * 1e6 + 0.5) if total else 0 for c in T]
    d_l, n_l, a_l = [], [], []
    for i, txt in zip(ids, texts):
        words = _doc_words(txt)
        d_l.append(i)
        n_l.append(len(words))
        a_l.append(sum(ppm[_poly(w) % 4096] for w in words))
    return pa.table({
        "doc_id": pa.array(d_l, pa.int64()),
        "n_words": pa.array(n_l, pa.int64()),
        "affinity": pa.array(a_l, pa.int64()),
    })


def expected_type_pagerank(events_parquet) -> pa.Table:
    """Scalar PageRank over the event-type transition graph, mirroring
    the integer spec exactly: per-user events ordered by (ts, event_id),
    consecutive-pair counts, rank mass in micro-units, floor division
    per edge, damping 85/100, 20 iterations, dangling mass dropped."""
    t = pq.read_table(events_parquet,
                      columns=["event_id", "user_id", "ts", "event_type"])
    rows = sorted(zip(t["user_id"].to_pylist(),
                      t["ts"].cast(pa.int64()).to_pylist(),
                      t["event_id"].to_pylist(),
                      t["event_type"].to_pylist()))
    counts: dict = {}
    for (u1, _, _, a), (u2, _, _, b) in zip(rows, rows[1:]):
        if u1 == u2:
            counts[(a, b)] = counts.get((a, b), 0) + 1
    nodes = sorted({k[0] for k in counts} | {k[1] for k in counts})
    n = len(nodes)
    if n == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "rank_micro": pa.array([], pa.int64())})
    out_w = {a: 0 for a in nodes}
    for (a, _), c in counts.items():
        out_w[a] += c
    rank = {a: 1_000_000 // n for a in nodes}
    base = 15 * 1_000_000 // (100 * n)
    for _ in range(20):
        nxt = {a: base for a in nodes}
        for (a, b), c in counts.items():
            if out_w[a]:
                nxt[b] += 85 * rank[a] * c // (100 * out_w[a])
        rank = nxt
    return pa.table({
        "event_type": pa.array(nodes, pa.string()),
        "rank_micro": pa.array([rank[a] for a in nodes], pa.int64()),
    })


def expected_convex_hull(corpus_dir) -> pa.Table:
    """Per-layer strict convex hull (vertex count + exact |2·area| in
    micro-deg²) — scalar monotone chain over set-deduped integer tuples,
    Python ints throughout (no numpy), against the PRE-WKB coordinates.
    Shared cross-engine spec: collinear boundary points excluded;
    all-collinear layers degrade to their two lexicographic extremes."""
    t = pq.read_table(f"{corpus_dir}/geoms.parquet",
                      columns=["layer", "xs", "ys"])
    cols = t.to_pydict()
    by_layer: dict[str, set] = {}
    for lay, xs, ys in zip(cols["layer"], cols["xs"], cols["ys"]):
        s = by_layer.setdefault(lay, set())
        for x, y in zip(xs, ys):
            s.add((math.floor(x * 1e6 + 0.5), math.floor(y * 1e6 + 0.5)))
    layers, n_hull, area2 = [], [], []
    for lay in sorted(by_layer):
        pts = sorted(by_layer[lay])
        if len(pts) <= 2:
            hull = pts
        else:
            def half(seq):
                out = []
                for p in seq:
                    while len(out) >= 2 and (
                            (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                            - (out[-1][1] - out[-2][1])
                            * (p[0] - out[-2][0])) <= 0:
                        out.pop()
                    out.append(p)
                return out
            lo = half(pts)
            up = half(reversed(pts))
            hull = lo[:-1] + up[:-1]
            if len(hull) < 2:
                hull = pts[:1]
        a2 = 0
        if len(hull) >= 3:
            for i in range(len(hull)):
                x1, y1 = hull[i]
                x2, y2 = hull[(i + 1) % len(hull)]
                a2 += x1 * y2 - x2 * y1
        layers.append(lay)
        n_hull.append(len(hull))
        area2.append(abs(a2))
    return pa.table({
        "layer": pa.array(layers, pa.string()),
        "n_hull": pa.array(n_hull, pa.int64()),
        "area2": pa.array(area2, pa.int64()),
    })


def expected_k_core(corpus_dir) -> pa.Table:
    """Independent k-core ground truth: scalar mercator tile math, an
    adjacency dict, and textbook repeated-scan peeling (no numpy, no
    searchsorted — a different algorithmic route than the engine's)."""
    import math

    occ = set()
    z = 10  # SMOOTH_Z mirror
    n2 = float(2 ** z)
    for _d, _s, gt, rings in _geom_rows(corpus_dir):
        if gt != 1:
            continue
        lon, lat = rings[0][0]
        lat = min(max(lat, -85.0511287), 85.0511287)
        lr = math.radians(lat)
        x = math.floor((lon + 180.0) / 360.0 * n2)
        y = math.floor((1.0 - math.log(math.tan(lr) + 1.0 / math.cos(lr))
                        / math.pi) / 2.0 * n2)
        occ.add((int(min(max(x, 0), n2 - 1)), int(min(max(y, 0), n2 - 1))))
    nbrs = {}
    for (x, y) in occ:
        nbrs[(x, y)] = [(x + dx, y + dy) for dx in (-1, 0, 1)
                        for dy in (-1, 0, 1)
                        if (dx, dy) != (0, 0) and (x + dx, y + dy) in occ]
    deg = {v: len(ns) for v, ns in nbrs.items()}
    alive = set(occ)
    core = {}
    for k in range(1, 9):
        while True:
            rm = [v for v in alive if deg[v] < k]
            if not rm:
                break
            for v in rm:
                core[v] = k - 1
                alive.discard(v)
                for u in nbrs[v]:
                    if u in alive:
                        deg[u] -= 1
        for v in alive:
            core[v] = k
        if not alive:
            break
    hist = {}
    for v, c in core.items():
        hist[c] = hist.get(c, 0) + 1
    ks = sorted(hist)
    return pa.table({
        "core_k": pa.array(ks, pa.int64()),
        "n_tiles": pa.array([hist[k] for k in ks], pa.int64()),
    })


def expected_component_diameters(corpus_dir) -> pa.Table:
    """Independent component-shape census: scalar mercator tiles,
    python-set BFS components and textbook per-node BFS diameters."""
    import math
    from collections import deque

    occ = set()
    z = 10
    n2 = float(2 ** z)
    for _d, _s, gt, rings in _geom_rows(corpus_dir):
        if gt != 1:
            continue
        lon, lat = rings[0][0]
        lat = min(max(lat, -85.0511287), 85.0511287)
        lr = math.radians(lat)
        x = math.floor((lon + 180.0) / 360.0 * n2)
        y = math.floor((1.0 - math.log(math.tan(lr) + 1.0 / math.cos(lr))
                        / math.pi) / 2.0 * n2)
        occ.add((int(min(max(x, 0), n2 - 1)), int(min(max(y, 0), n2 - 1))))

    def nbrs(v):
        return [(v[0] + dx, v[1] + dy) for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0) and (v[0] + dx, v[1] + dy) in occ]

    def bfs(src, comp=None):
        dist = {src: 0}
        dq = deque([src])
        while dq:
            u = dq.popleft()
            for w in nbrs(u):
                if w not in dist and (comp is None or w in comp):
                    dist[w] = dist[u] + 1
                    dq.append(w)
        return dist

    seen, hist = set(), {}
    for v in occ:
        if v in seen:
            continue
        comp = set(bfs(v))
        seen |= comp
        diam = 0
        for u in comp:
            diam = max(diam, max(bfs(u, comp).values()))
        k = (len(comp), diam)
        hist[k] = hist.get(k, 0) + 1
    items = sorted(hist.items())
    return pa.table({
        "n_tiles": pa.array([s for (s, _), _ in items], pa.int64()),
        "diameter": pa.array([d for (_, d), _ in items], pa.int64()),
        "n_components": pa.array([c for _, c in items], pa.int64()),
    })


def expected_layer_diameter(corpus_dir) -> pa.Table:
    """Independent farthest-pair ground truth: chunked ALL-PAIRS max
    squared micro-degree distance per layer (no hull involved — the
    pipeline's hull-of-hulls reduction is checked against brute
    force)."""
    import math

    import numpy as np

    t = pq.read_table(f"{corpus_dir}/geoms.parquet",
                      columns=["layer", "xs", "ys"])
    pts: dict[str, list] = {}
    cols = t.to_pydict()
    for lay, xs, ys in zip(cols["layer"], cols["xs"], cols["ys"]):
        lst = pts.setdefault(lay, [])
        for x, y in zip(xs, ys):
            lst.append((math.floor(x * 1e6 + 0.5),
                        math.floor(y * 1e6 + 0.5)))
    out_l, out_d2, out_d = [], [], []
    for lay in sorted(pts):
        P = np.asarray(pts[lay], np.int64)
        best = 0
        for s in range(0, len(P), 2048):
            c = P[s:s + 2048]
            dx = c[:, 0][:, None] - P[:, 0][None, :]
            dy = c[:, 1][:, None] - P[:, 1][None, :]
            best = max(best, int((dx * dx + dy * dy).max()))
        out_l.append(lay)
        out_d2.append(best)
        out_d.append(math.isqrt(best))
    return pa.table({
        "layer": pa.array(out_l, pa.string()),
        "diam2_udeg2": pa.array(out_d2, pa.int64()),
        "diam_udeg": pa.array(out_d, pa.int64()),
    })


def expected_segment_crossings(corpus_dir) -> pa.Table:
    """Independent cross-layer segment-crossing census: chunked bbox
    overlap candidate scan over ALL unordered segment pairs, then a
    scalar exact integer predicate per candidate (sign-of-orientation
    + collinear bbox test) — no grid, no canonical-cell logic."""
    import numpy as np

    t = pq.read_table(f"{corpus_dir}/geoms.parquet",
                      columns=["geom_type", "layer", "xs", "ys"])
    cols = t.to_pydict()
    ax, ay, bx, by, lay = [], [], [], [], []
    for gt, la, xs, ys in zip(cols["geom_type"], cols["layer"],
                              cols["xs"], cols["ys"]):
        if gt != 2:
            continue
        xi = [int(np.floor(x * 1e6 + 0.5)) for x in xs]
        yi = [int(np.floor(y * 1e6 + 0.5)) for y in ys]
        for i in range(len(xi) - 1):
            ax.append(xi[i]); ay.append(yi[i])
            bx.append(xi[i + 1]); by.append(yi[i + 1])
            lay.append(la)
    ax = np.asarray(ax, np.int64); ay = np.asarray(ay, np.int64)
    bx = np.asarray(bx, np.int64); by = np.asarray(by, np.int64)
    lay = np.asarray(lay, dtype=object)
    mnx, mxx = np.minimum(ax, bx), np.maximum(ax, bx)
    mny, mxy = np.minimum(ay, by), np.maximum(ay, by)
    n = len(ax)

    def sgn(v: int) -> int:
        return (v > 0) - (v < 0)

    def hit(i: int, j: int) -> bool:
        p1 = (int(ax[i]), int(ay[i])); p2 = (int(bx[i]), int(by[i]))
        p3 = (int(ax[j]), int(ay[j])); p4 = (int(bx[j]), int(by[j]))

        def orient(p, q, r):
            return sgn((q[0] - p[0]) * (r[1] - p[1])
                       - (q[1] - p[1]) * (r[0] - p[0]))

        def on(p, q, r):
            return (min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
                    and min(p[1], q[1]) <= r[1] <= max(p[1], q[1]))

        d1, d2 = orient(p3, p4, p1), orient(p3, p4, p2)
        d3, d4 = orient(p1, p2, p3), orient(p1, p2, p4)
        if d1 * d2 < 0 and d3 * d4 < 0:
            return True
        return ((d1 == 0 and on(p3, p4, p1))
                or (d2 == 0 and on(p3, p4, p2))
                or (d3 == 0 and on(p1, p2, p3))
                or (d4 == 0 and on(p1, p2, p4)))

    counts: dict[tuple, int] = {}
    for s in range(0, n, 1024):
        e = min(s + 1024, n)
        idx = np.arange(s, e)
        ov = ((mnx[s:e, None] <= mxx[None, :])
              & (mxx[s:e, None] >= mnx[None, :])
              & (mny[s:e, None] <= mxy[None, :])
              & (mxy[s:e, None] >= mny[None, :])
              & (lay[s:e, None] != lay[None, :])
              & (idx[:, None] < np.arange(n)[None, :]))
        ii, jj = np.nonzero(ov)
        for i, j in zip((ii + s).tolist(), jj.tolist()):
            if hit(i, j):
                k = (min(lay[i], lay[j]), max(lay[i], lay[j]))
                counts[k] = counts.get(k, 0) + 1
    items = sorted(counts.items())
    return pa.table({
        "layer_a": pa.array([a for (a, _), _ in items], pa.string()),
        "layer_b": pa.array([b for (_, b), _ in items], pa.string()),
        "n_crossings": pa.array([c for _, c in items], pa.int64()),
    })


GENERATORS = {
    "media_features": ("corpus", expected_media_features),
    "media_ahash": ("corpus", expected_media_ahash),
    "media_neardup": ("corpus", expected_media_neardup),
    "media_dup_clusters": ("corpus", expected_media_dup_clusters),
    "lang_confusion": ("docs", expected_lang_confusion),
    "compression_ratio": ("docs", expected_compression_ratio),
    "pack_multimodal": ("corpus", expected_pack_multimodal),
    "video_frames": ("corpus", expected_video_frames),
    "audio_windows": ("corpus", expected_audio_windows),
    "simplify": ("corpus", expected_simplify),
    "raster_stats": ("corpus", expected_raster_stats),
    "cell_index": ("corpus", expected_cell_index),
    "simhash": ("docs", expected_simhash),
    "fingerprint": ("docs", expected_fingerprint),
    "minhash_pairs": ("docs", expected_minhash_pairs),
    "decontaminate": ("docs", expected_decontaminate),
    "pack_sequences": ("docs", expected_pack_sequences),
    "gopher_quality": ("docs", expected_gopher_quality),
    "geohash_cells": ("corpus", expected_geohash_cells),
    "corpus_build": ("docs", expected_corpus_build),
    "quality_score": ("docs", expected_quality_score),
    "target_affinity": ("docs", expected_target_affinity),
    "type_pagerank": ("events", expected_type_pagerank),
    "convex_hull": ("corpus", expected_convex_hull),
    "k_core": ("corpus", expected_k_core),
    "component_diameters": ("corpus", expected_component_diameters),
    "layer_diameter": ("corpus", expected_layer_diameter),
    "segment_crossings": ("corpus", expected_segment_crossings),
}


def ensure_expected(corpus_dir: str,
                    docs_parquet: str = "/root/testdata/sf0.01/documents.parquet",
                    names=None) -> str:
    """Materialize the expected parquets once; returns EXPECTED_DIR."""
    out = Path(EXPECTED_DIR)
    out.mkdir(parents=True, exist_ok=True)
    marker = out / f"_SUCCESS_{_VERSION}"
    if marker.exists():
        return str(out)
    for name, (kind, fn) in GENERATORS.items():
        if names is not None and name not in names:
            continue
        if kind == "corpus":
            src = corpus_dir
        elif kind == "events":
            src = docs_parquet.replace("documents.parquet",
                                       "events.parquet")
        else:
            src = docs_parquet
        pq.write_table(fn(src), out / f"{name}.parquet")
    if names is None:
        marker.touch()
    return str(out)
