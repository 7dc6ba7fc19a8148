"""Dependency-free PNG and WAV codecs (stdlib zlib + numpy only).

The media seam (stages/media.py) auto-detects Pillow / soundfile and
falls back to THIS module, so the real-codec paths are exercisable in
containers that ship no media libraries. Scope is deliberately small —
the formats a test or a thumbnail pipeline actually produces:

* PNG: 8-bit, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA), non-interlaced, all five scanline filters on decode;
  encode writes color type 2 with filter 0.
* WAV: PCM (format 1), 8/16-bit, any channel count; encode writes
  16-bit mono.

Sub/Up filters unfilter vectorized per scanline; Average/Paeth fall
back to a per-pixel loop (they are sequentially dependent in x). This
is a correctness/capability seam, not a hot path — a 100-TB media run
puts Pillow on the actors and never enters this module.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + tag + data \
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)


def png_encode(arr: np.ndarray) -> bytes:
    """[h, w, 3] uint8 RGB → PNG bytes (filter 0, zlib default level)."""
    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"png_encode expects [h, w, 3], got {a.shape}")
    h, w, _ = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), a.reshape(h, w * 3)], axis=1)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw.tobytes()))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → [h, w, channels] uint8 (see module scope).

    Raises ValueError on non-PNG input or unsupported variants (palette,
    16-bit, interlaced) — the seam surfaces that loudly rather than
    guessing."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (builtin codec decodes PNG only — "
                         "install Pillow for other formats)")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={ctype} "
            f"interlace={interlace}) — install Pillow")
    ch = _CHANNELS[ctype]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int64)
        if f == 0:
            cur = line
        elif f == 1:    # Sub: cumulative per byte lane, mod 256
            cur = line.reshape(-1, ch).cumsum(axis=0).reshape(-1) & 0xFF
        elif f == 2:    # Up
            cur = (line + prev) & 0xFF
        elif f == 3:    # Average
            cur = np.zeros(stride, np.int64)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (line[x] + (left + prev[x]) // 2) & 0xFF
        elif f == 4:    # Paeth
            cur = np.zeros(stride, np.int64)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                ul = prev[x - ch] if x >= ch else 0
                cur[x] = (line[x]
                          + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def png_to_rgb(arr: np.ndarray) -> np.ndarray:
    """Decoded [h, w, ch] → [h, w, 3]: gray replicates, alpha drops."""
    ch = arr.shape[2]
    if ch == 3:
        return arr
    if ch == 4:
        return arr[:, :, :3]
    if ch == 2:
        return np.repeat(arr[:, :, :1], 3, axis=2)
    return np.repeat(arr, 3, axis=2)


# ---------------------------------------------------------------- WAV


def wav_encode(pcm: np.ndarray, rate: int) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM bytes."""
    x = np.asarray(pcm, np.int16)
    body = x.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    size = 4 + (8 + len(fmt)) + (8 + len(body))
    return (b"RIFF" + struct.pack("<I", size) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → ([n, channels] int16, sample_rate).

    8-bit samples upscale to int16 ((x−128)·256); raises ValueError on
    non-PCM or non-WAV input."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file (builtin codec decodes "
                         "PCM WAV only — install soundfile)")
    pos = 12
    fmt = None
    body = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        chunk = data[pos + 8:pos + 8 + ln]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif tag == b"data":
            body = chunk
        pos += 8 + ln + (ln & 1)      # chunks are word-aligned
    if fmt is None or body is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(
            f"unsupported WAV (fmt={audio_fmt} bits={bits}) — install "
            "soundfile")
    if bits == 16:
        x = np.frombuffer(body, "<i2").astype(np.int16)
    else:
        x = ((np.frombuffer(body, np.uint8).astype(np.int16) - 128)
             * 256).astype(np.int16)
    n = len(x) // channels
    return x[:n * channels].reshape(n, channels), rate
