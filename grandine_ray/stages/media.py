"""Multimodal (image/audio/video) span processing stages.

Media rides in the documents table as ``media`` spans whose ``media_ref``
addresses an opaque binary payload. The Ray-side plumbing here — schema,
actor signatures, batch sizing, output layout — is real and tested; the
codec work (JPEG decode, frame extraction, PCM decode) goes through a
SEAM resolved once per actor at init:

* ``deterministic_fake=None`` (stage default) auto-detects: Pillow /
  ffmpeg / soundfile when importable, else the dependency-free builtin
  PNG/WAV codecs (stages/imagecodec.py) for image/audio — a real decode
  path always exists for those two; video falls back to the
  deterministic fake derived from the payload bytes when ffmpeg is
  absent (stable across runs, so tests can assert exact values);
* ``True`` pins the fake (the registered queries do this: their payloads
  come from the fake byte store and are not decodable media);
* ``False`` pins real decode — NotImplementedError when no codec
  exists (video), loud ValueError/OSError on undecodable payloads.

Scale notes: media payloads are large, so these stages run as actor pools
with SMALL ``batch_size`` (payload × batch × concurrency must fit worker
heap) and ``batch_format="pyarrow"`` (binary columns must never pass
through pandas object dtype).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------- codec seam
#
# Real codecs are auto-detected at actor init: if the library imports
# (Pillow / soundfile) or the binary exists (ffmpeg), the stage decodes
# real media; otherwise it falls back to the deterministic fake. Passing
# deterministic_fake=True/False pins a path explicitly (False without a
# codec available raises NotImplementedError at decode time).


def available_image_codec():
    """Pillow's Image module when importable, else the dependency-free
    builtin PNG codec (stages/imagecodec.py — zlib inflate + unfilter).
    A real decode path therefore always exists; the builtin raises
    loudly on non-PNG payloads instead of guessing."""
    try:
        from PIL import Image
        return Image
    except Exception:
        from . import imagecodec
        return imagecodec


def available_audio_codec():
    """soundfile when importable, else the dependency-free builtin PCM
    WAV parser (stages/imagecodec.py)."""
    try:
        import soundfile
        return soundfile
    except Exception:
        from . import imagecodec
        return imagecodec


def available_ffmpeg():
    """Path to an ffmpeg binary, else None."""
    import shutil
    return shutil.which("ffmpeg")


def _resolve_fake(deterministic_fake, probe):
    """None → auto (fake only when no codec); bool → pinned."""
    if deterministic_fake is None:
        return probe() is None
    return bool(deterministic_fake)


def _fixed_list_u8(m: np.ndarray, width: int) -> pa.Array:
    """[n, width] uint8 matrix → fixed_size_list<uint8>[width] zero-copy."""
    return pa.FixedSizeListArray.from_arrays(
        pa.array(np.ascontiguousarray(m, dtype=np.uint8).reshape(-1),
                 pa.uint8()), width)


def _fsl_to_matrix(col, dtype=np.uint8) -> np.ndarray:
    """fixed_size_list column → [n, k] numpy, offset-aware (flatten)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    k = col.type.list_size
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(dtype).reshape(-1, k)


def _stable_bytes(ref: str, n: int = 64) -> bytes:
    """Deterministic payload for a media_ref (test stand-in for a store)."""
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.blake2b(f"{ref}:{i}".encode(), digest_size=32).digest()
        i += 1
    return out[:n]


def fetch_media(batch: pa.Table) -> pa.Table:
    """Resolve media_ref → payload bytes (fake store; deterministic)."""
    refs = batch["media_ref"].to_pylist()
    payloads = [_stable_bytes(r, 256) for r in refs]
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


class ImageDecoder:
    """Actor stage: payload → decoded image tensor + metadata.

    Codec seam: Pillow when importable (decode + resample to the stage's
    fixed h×w RGB), else the deterministic fake (None → auto-detect,
    resolved ONCE at actor init, not per batch).
    """

    def __init__(self, deterministic_fake: bool | None = None,
                 height: int = 16, width: int = 16):
        self.fake = _resolve_fake(deterministic_fake, available_image_codec)
        self.codec = None if self.fake else available_image_codec()
        self.h = height
        self.w = width

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            if self.codec is None:
                raise NotImplementedError(
                    "image decode requires Pillow/libjpeg — not in this "
                    "container")
            if hasattr(self.codec, "open"):          # Pillow
                import io
                img = self.codec.open(io.BytesIO(payload)).convert("RGB")
                img = img.resize((self.w, self.h))
                return np.asarray(img, dtype=np.uint8)
            # builtin PNG codec + nearest-neighbor resample
            rgb = self.codec.png_to_rgb(self.codec.png_decode(payload))
            yi = np.arange(self.h) * rgb.shape[0] // self.h
            xi = np.arange(self.w) * rgb.shape[1] // self.w
            return rgb[yi][:, xi]
        # deterministic fake: bytes → seeded uint8 tensor
        seed = int.from_bytes(payload[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (self.h, self.w, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        imgs = np.empty((n, self.h * self.w * 3), np.uint8)
        for i, p in enumerate(payloads):
            imgs[i] = self._decode(p).reshape(-1)
        return (
            batch.append_column(
                "image", _fixed_list_u8(imgs, self.h * self.w * 3))
            .append_column("img_h", pa.array([self.h] * n, pa.int32()))
            .append_column("img_w", pa.array([self.w] * n, pa.int32()))
        )


class ImageResizer:
    """Actor stage: nearest-neighbor resize (real numpy, no stub needed)."""

    def __init__(self, out_h: int = 8, out_w: int = 8):
        self.oh = out_h
        self.ow = out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch["img_h"][0].as_py()
        w = batch["img_w"][0].as_py()
        imgs = _fsl_to_matrix(batch["image"]).reshape(-1, h, w, 3)
        yi = (np.arange(self.oh) * h // self.oh)
        xi = (np.arange(self.ow) * w // self.ow)
        resized = imgs[:, yi][:, :, xi]
        return batch.set_column(
            batch.schema.get_field_index("image"), "image",
            _fixed_list_u8(resized.reshape(len(imgs), -1),
                           self.oh * self.ow * 3),
        ).set_column(
            batch.schema.get_field_index("img_h"), "img_h",
            pa.array([self.oh] * len(imgs), pa.int32()),
        ).set_column(
            batch.schema.get_field_index("img_w"), "img_w",
            pa.array([self.ow] * len(imgs), pa.int32()),
        )


class ImageFeatures:
    """Actor stage: image tensor → feature vector (channel-mean histogram)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch["img_h"][0].as_py()
        w = batch["img_w"][0].as_py()
        imgs = _fsl_to_matrix(batch["image"]).reshape(-1, h, w, 3) \
            .astype(np.float64)
        means = imgs.mean(axis=(1, 2))        # [n, 3]
        stds = imgs.std(axis=(1, 2))          # [n, 3]
        feats = np.concatenate([means, stds], axis=1)
        return batch.append_column(
            "img_features", pa.array([f.tolist() for f in feats],
                                     pa.list_(pa.float64(), 6))
        )


class FrameSampler:
    """Actor stage: video payload → K evenly spaced frames.

    Codec seam: ffmpeg when on PATH (decode to K thumbnail PNGs via a
    select filter), else the deterministic fake (None → auto-detect at
    actor init).
    """

    def __init__(self, k: int = 4, deterministic_fake: bool | None = None):
        self.k = k
        self.fake = _resolve_fake(deterministic_fake, available_ffmpeg)
        self.ffmpeg = None if self.fake else available_ffmpeg()

    def _frames(self, payload: bytes) -> list[bytes]:
        if not self.fake:
            if self.ffmpeg is None:
                raise NotImplementedError(
                    "video frame extraction requires ffmpeg — not in this "
                    "container")
            import os
            import subprocess
            import tempfile
            with tempfile.TemporaryDirectory() as d:
                src = os.path.join(d, "in.bin")
                with open(src, "wb") as f:
                    f.write(payload)
                subprocess.run(
                    [self.ffmpeg, "-v", "error", "-i", src,
                     "-vf", "thumbnail,select=1,scale=32:32",
                     "-frames:v", str(self.k), "-vsync", "vfr",
                     os.path.join(d, "f%03d.png")],
                    check=True)
                outs = sorted(f for f in os.listdir(d) if f.endswith(".png"))
                frames = [open(os.path.join(d, f), "rb").read()
                          for f in outs]
            # pad (short clips) to the fixed k the schema promises
            while len(frames) < self.k:
                frames.append(frames[-1] if frames else b"")
            return frames[:self.k]
        return [
            hashlib.blake2b(payload + bytes([i]), digest_size=16).digest()
            for i in range(self.k)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        frames = [self._frames(p) for p in payloads]
        return batch.append_column(
            "frames", pa.array(frames, pa.list_(pa.binary(), self.k))
        )


def media_span_rows(batch: pa.Table) -> pa.Table:
    """Interleaved docs → one row per MEDIA span (doc_id, span_idx,
    media_ref) — the shared entry stage of every media pipeline."""
    import pyarrow.compute as pc
    spans = batch["spans"].combine_chunks()
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    # span index within each doc (same derivation as extract.py)
    n = len(parent)
    if n:
        firsts = np.zeros(n, dtype=np.int64)
        new_doc = np.empty(n, dtype=bool)
        new_doc[0] = True
        new_doc[1:] = parent[1:] != parent[:-1]
        firsts[new_doc] = np.nonzero(new_doc)[0]
        np.maximum.accumulate(firsts, out=firsts)
        span_idx = np.arange(n, dtype=np.int64) - firsts
    else:
        span_idx = np.empty(0, dtype=np.int64)
    mask = pc.equal(flat.field("kind"), "media").to_numpy(zero_copy_only=False)
    sel = np.nonzero(mask)[0]
    doc_ids = batch["doc_id"].take(pa.array(parent[sel]))
    media_refs = flat.field("media_ref").take(pa.array(sel))
    return pa.table(
        {
            "doc_id": doc_ids,
            "span_idx": pa.array(span_idx[sel].astype(np.int32), pa.int32()),
            "media_ref": media_refs,
        }
    )


class AudioChunker:
    """Actor stage: audio payload → fixed-size windows with overlap.

    Real implementation point: ``_pcm`` (soundfile/ffmpeg decode to PCM);
    with the deterministic fake the payload bytes ARE the PCM. Windowing
    itself (size/hop arithmetic, per-window energy) is real and runs on
    whatever the decode yields.
    """

    def __init__(self, window: int = 64, hop: int = 32,
                 deterministic_fake: bool | None = None):
        self.window = window
        self.hop = hop
        self.fake = _resolve_fake(deterministic_fake, available_audio_codec)
        self.codec = None if self.fake else available_audio_codec()

    def _pcm(self, payload: bytes) -> bytes:
        if not self.fake:
            if self.codec is None:
                raise NotImplementedError(
                    "audio decode requires soundfile/ffmpeg — not in this "
                    "container")
            if hasattr(self.codec, "read"):          # soundfile
                import io
                data, _sr = self.codec.read(io.BytesIO(payload),
                                            dtype="int16")
                return np.asarray(data, np.int16).tobytes()
            data, _sr = self.codec.wav_decode(payload)   # builtin WAV
            return np.asarray(data, np.int16).tobytes()
        return payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        rows_of, wins, energy = [], [], []
        for r, p in enumerate(payloads):
            pcm = np.frombuffer(self._pcm(p), np.uint8)
            n = (len(pcm) - self.window) // self.hop + 1
            for w in range(max(n, 0)):
                seg = pcm[w * self.hop:w * self.hop + self.window]
                rows_of.append(r)
                wins.append(w)
                energy.append(int(seg.astype(np.int64).sum()))
        take = pa.array(np.asarray(rows_of, np.int64))
        out = {c: batch[c].take(take)
               for c in batch.column_names if c != "payload"}
        out["win_idx"] = pa.array(np.asarray(wins, np.int64), pa.int64())
        out["energy"] = pa.array(np.asarray(energy, np.int64), pa.int64())
        return pa.table(out)


# ------------------------------------------------- perceptual hashing
#
# Average-hash (aHash) near-duplicate detection over decoded media — the
# image-side analogue of simhash/minhash text dedup. The fake store here
# is VARIANT-STRUCTURED: each media_ref hashes into one of AHASH_N_FAM
# asset families and its image is that family's base image with a few
# perturbed pixels (a re-encode/crop stand-in), so near-duplicate
# structure actually exists for the pair stage to find (the flat
# `fetch_media` store yields i.i.d. images whose hashes never collide
# within Hamming 3). The fixed modulus is the synthetic store's dup-rate
# knob: family size grows linearly with corpus size, mirroring how asset
# reuse concentrates on popular assets in real crawls. With real codecs
# the payload is a PNG and the decode is real; the hash math downstream
# is identical either way.

AHASH_N_FAM = 4096  # asset families in the synthetic variant store
AHASH_HAM_T = 3     # near-dup threshold (bits of 64)


def fetch_media_variants(batch: pa.Table) -> pa.Table:
    """media_ref → 16-byte payload: first 8 bytes seed the asset-family
    base image, next 8 the per-variant perturbation (deterministic fake
    store with variant structure; a real store would return the encoded
    image bytes here instead)."""
    refs = batch["media_ref"].to_pylist()
    payloads = []
    for r in refs:
        rd8 = hashlib.blake2b(r.encode(), digest_size=8).digest()
        fam = int.from_bytes(rd8, "little") % AHASH_N_FAM
        payloads.append(
            hashlib.blake2b(b"fam:%d" % fam, digest_size=8).digest() + rd8)
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


class AverageHasher:
    """Actor stage: payload → 64-bit average-hash (8×8 integer grayscale,
    bit i set iff pixel_i·64 > Σpixels — the cross-multiplied form keeps
    the comparison exact integer, no mean division).

    Codec seam mirrors ImageDecoder: ``deterministic_fake=True`` (query
    default — the variant store's payloads are seeds, not media) expands
    the 16-byte payload into a family base image plus ≤2 perturbed
    pixels; ``False`` decodes a real PNG via the builtin/Pillow codec.
    """

    def __init__(self, deterministic_fake: bool | None = True):
        self.fake = _resolve_fake(deterministic_fake, available_image_codec)
        self.codec = None if self.fake else available_image_codec()

    def _gray8(self, payload: bytes) -> np.ndarray:
        """payload → 8×8 int64 grayscale (sum//3 of RGB, nearest resize)."""
        if not self.fake:
            if hasattr(self.codec, "open"):          # Pillow
                import io
                img = self.codec.open(io.BytesIO(payload)).convert("RGB")
                rgb = np.asarray(img, dtype=np.uint8)
            else:
                rgb = self.codec.png_to_rgb(self.codec.png_decode(payload))
            gray = rgb.astype(np.int64).sum(axis=2) // 3
            yi = np.arange(8) * gray.shape[0] // 8
            xi = np.arange(8) * gray.shape[1] // 8
            return gray[yi][:, xi]
        # fake: family base image (16×16 RGB, same shape contract as
        # ImageDecoder) + per-variant perturbation of ≤2 pixels
        fam_seed = int.from_bytes(payload[:8], "little")
        ref_seed = int.from_bytes(payload[8:16], "little")
        rgb = np.random.default_rng(fam_seed).integers(
            0, 256, (16, 16, 3), dtype=np.uint8)
        gray = rgb.astype(np.int64).sum(axis=2) // 3
        small = gray[::2, ::2].reshape(-1).copy()    # nearest 16→8
        rngr = np.random.default_rng(ref_seed)
        k = int(rngr.integers(0, 3))
        if k:
            pos = rngr.integers(0, 64, size=k)
            val = rngr.integers(0, 256, size=k)
            small[pos] = val
        return small.reshape(8, 8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        g = np.empty((n, 64), np.int64)
        for i, p in enumerate(payloads):
            g[i] = self._gray8(p).reshape(-1)
        s = g.sum(axis=1)
        bits = (g * 64 > s[:, None]).astype(np.uint64)
        h = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64)
        return batch.append_column("ahash", pa.array(h, pa.uint64()))


def media_pipeline(docs_ds, concurrency=(1, 4), batch_size: int = 256,
                   deterministic_fake: bool | None = True):
    """documents → media spans → fetch → decode → resize → features.

    Returns a Dataset with (doc_id, span_idx, media_ref, image, img_h,
    img_w, img_features). Demonstrates the full multimodal actor-pool
    plumbing over the interleaved schema. ``deterministic_fake`` defaults
    to True (NOT auto) because ``fetch_media`` is the fake byte store —
    its payloads are not decodable media; pass None with a real fetch
    stage to auto-detect codecs.
    """
    ds = docs_ds.map_batches(media_span_rows, batch_format="pyarrow")
    ds = ds.map_batches(fetch_media, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(ImageDecoder, batch_format="pyarrow",
                        batch_size=batch_size, concurrency=concurrency,
                        fn_constructor_kwargs={
                            "deterministic_fake": deterministic_fake})
    ds = ds.map_batches(ImageResizer, batch_format="pyarrow",
                        batch_size=batch_size, concurrency=concurrency)
    ds = ds.map_batches(ImageFeatures, batch_format="pyarrow",
                        batch_size=batch_size, concurrency=concurrency)
    return ds.drop_columns(["payload"])
