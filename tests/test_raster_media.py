"""Raster↔vector kernels + multimodal stage plumbing tests."""
import numpy as np
import pytest

from grandine_ray.stages import media, raster


def test_rasterize_points():
    g = raster.rasterize_points([0.0, 10.0, 10.0, 100.0], [0.0, 10.0, 10.0, 50.0],
                                size=10, extent=100.0)
    assert g.shape == (10, 10)
    assert g[0, 0] == 1.0
    assert g[1, 1] == 2.0
    assert g[5, 9] == 1.0 or g[4, 9] == 1.0  # edge clamp
    assert g.sum() == 4.0


def test_rasterize_line_connects():
    g = raster.rasterize_line(np.array([[5.0, 5.0], [95.0, 95.0]]), 32, 100.0)
    # diagonal: every row it crosses has at least one hit
    assert (g.sum(axis=1)[2:30] >= 1).all()


def test_rasterize_polygon_fill_and_hole():
    outer = np.array([[10.0, 10.0], [90.0, 10.0], [90.0, 90.0], [10.0, 90.0]])
    hole = np.array([[40.0, 40.0], [60.0, 40.0], [60.0, 60.0], [40.0, 60.0]])
    g = raster.rasterize_polygon([outer, hole], 50, 100.0)
    assert g[25, 10] == 1.0       # inside ring, outside hole
    assert g[25, 25] == 0.0       # inside hole (even-odd)
    assert g[2, 2] == 0.0         # outside polygon
    frac = g.sum() / (50 * 50)
    assert 0.5 < frac < 0.62      # 64% minus 4% hole ≈ 0.6


def test_vectorize_roundtrip():
    # rasterize a square, vectorize it back, re-rasterize → similar mask
    sq = np.array([[20.0, 20.0], [80.0, 20.0], [80.0, 80.0], [20.0, 80.0]])
    g = raster.rasterize_polygon([sq], 40, 100.0)
    rings = raster.vectorize_grid(g, 100.0)
    assert len(rings) == 1
    r = rings[0]
    # corners near the original square (within one cell = 2.5 units)
    assert abs(r[:, 0].min() - 20.0) <= 3.0
    assert abs(r[:, 0].max() - 80.0) <= 3.0
    g2 = raster.rasterize_polygon([r], 40, 100.0)
    iou = ((g > 0) & (g2 > 0)).sum() / max(1, ((g > 0) | (g2 > 0)).sum())
    assert iou > 0.9


def test_vectorize_two_components():
    g = np.zeros((20, 20))
    g[2:6, 2:6] = 1.0
    g[12:17, 12:17] = 1.0
    rings = raster.vectorize_grid(g, 20.0)
    assert len(rings) == 2


def test_image_stage_stubs_deterministic():
    import pyarrow as pa

    batch = pa.table({"media_ref": pa.array(["media://a", "media://b"])})
    fetched = media.fetch_media(batch)
    assert fetched["payload"][0].as_py() != fetched["payload"][1].as_py()
    # deterministic across calls
    again = media.fetch_media(batch)
    assert fetched["payload"].to_pylist() == again["payload"].to_pylist()

    dec = media.ImageDecoder(deterministic_fake=True)  # fake-store bytes
    imgs = dec(fetched)
    assert imgs["image"].type == pa.list_(pa.uint8(), 16 * 16 * 3)
    res = media.ImageResizer()(imgs)
    assert res["img_h"][0].as_py() == 8
    feats = media.ImageFeatures()(res)
    assert len(feats["img_features"][0].as_py()) == 6

    # the non-fake path fails LOUDLY on junk bytes (builtin codec:
    # ValueError; Pillow: UnidentifiedImageError/OSError) — never a
    # silent fake fallback
    with pytest.raises((NotImplementedError, ValueError, OSError)):
        media.ImageDecoder(deterministic_fake=False)._decode(b"xx")
    if media.available_ffmpeg() is None:   # no builtin video codec
        with pytest.raises(NotImplementedError):
            media.FrameSampler(deterministic_fake=False)._frames(b"xx")


def test_frame_sampler():
    import pyarrow as pa

    b = media.fetch_media(pa.table({"media_ref": pa.array(["media://v1"])}))
    out = media.FrameSampler(k=3)(b)
    frames = out["frames"][0].as_py()
    assert len(frames) == 3 and len(set(frames)) == 3


@pytest.mark.usefixtures("ray_session")
def test_media_pipeline_end_to_end():
    import ray.data as rd

    from grandine_ray.sources import synth

    corpus = synth.ensure_corpus(300)
    docs = rd.read_parquet(f"{corpus}/documents.parquet")
    out = media.media_pipeline(docs, concurrency=(1, 2), batch_size=128)
    rows = out.take_all()
    assert rows
    for r in rows[:10]:
        assert r["media_ref"].startswith("media://")
        assert len(r["img_features"]) == 6
    # span_idx correctness: re-read the doc and check kinds
    import pyarrow.parquet as pq

    dt = pq.read_table(f"{corpus}/documents.parquet")
    by_doc = {d: s for d, s in zip(dt["doc_id"].to_pylist(), dt["spans"].to_pylist())}
    for r in rows[:20]:
        span = by_doc[r["doc_id"]][r["span_idx"]]
        assert span["kind"] == "media"
        assert span["media_ref"] == r["media_ref"]


def test_codec_seam_auto_detect_matches_environment():
    """None → auto: in an environment without codecs every stage resolves
    to the deterministic fake; with codecs it resolves to real decode."""
    assert media.ImageDecoder().fake == (media.available_image_codec() is None)
    assert media.FrameSampler().fake == (media.available_ffmpeg() is None)
    assert media.AudioChunker().fake == (media.available_audio_codec() is None)


def test_real_image_decode_roundtrip():
    """The real-decode path must decode an actual PNG byte string into
    the stage's fixed h×w×3 tensor. Runs unconditionally: with Pillow
    the seam uses it; without, the builtin zlib+unfilter PNG codec
    (stages/imagecodec.py) takes the path — no skips either way."""
    import numpy as np
    import pyarrow as pa

    from grandine_ray.stages import imagecodec

    src = np.zeros((4, 4, 3), np.uint8)
    src[:2, :, 0] = 255  # top half red
    payload = imagecodec.png_encode(src)
    batch = pa.table({"media_ref": pa.array(["media://real"]),
                      "payload": pa.array([payload], pa.binary())})
    out = media.ImageDecoder(deterministic_fake=False)(batch)
    img = np.asarray(out["image"][0].as_py(), np.uint8).reshape(16, 16, 3)
    assert img[0, 0, 0] == 255 and img[15, 15, 0] == 0


def test_real_audio_decode_windows():
    """Real audio decode path, unconditional like the PNG test: a PCM
    WAV built by the builtin encoder decodes through whatever codec the
    seam resolved (soundfile or the builtin WAV parser)."""
    import numpy as np
    import pyarrow as pa

    from grandine_ray.stages import imagecodec

    pcm = (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16)
    payload = imagecodec.wav_encode(pcm, 8000)
    batch = pa.table({"media_ref": pa.array(["media://wav"]),
                      "payload": pa.array([payload], pa.binary())})
    out = media.AudioChunker(deterministic_fake=False)(batch)
    assert out.num_rows > 0 and out["energy"][0].as_py() > 0


def test_builtin_png_codec_roundtrip_and_filters():
    """The builtin PNG decoder must (a) round-trip its own encoder, and
    (b) correctly unfilter a PNG hand-built with EVERY filter type
    (Sub/Up/Average/Paeth applied per spec in this test, independently
    of the encoder)."""
    import struct
    import zlib

    import numpy as np

    from grandine_ray.stages import imagecodec as ic

    rng = np.random.default_rng(11)
    src = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    assert np.array_equal(ic.png_decode(ic.png_encode(src)), src)

    # hand-filtered PNG: one scanline per filter type (w=4, RGB)
    img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8).astype(np.int64)
    ch, stride = 3, 12

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        if pa_ <= pb and pa_ <= pc_:
            return a
        return b if pb <= pc_ else c

    lines = []
    prev = np.zeros(stride, np.int64)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = img[y].reshape(-1)
        raw = np.zeros(stride, np.int64)
        for x in range(stride):
            left = cur[x - ch] if x >= ch else 0
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                raw[x] = cur[x]
            elif f == 1:
                raw[x] = cur[x] - left
            elif f == 2:
                raw[x] = cur[x] - prev[x]
            elif f == 3:
                raw[x] = cur[x] - (left + prev[x]) // 2
            else:
                raw[x] = cur[x] - paeth(int(left), int(prev[x]), int(ul))
        lines.append(bytes([f]) + (raw & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + ic._chunk(b"IHDR", ihdr)
           + ic._chunk(b"IDAT", zlib.compress(b"".join(lines)))
           + ic._chunk(b"IEND", b""))
    assert np.array_equal(ic.png_decode(png),
                          img.astype(np.uint8).reshape(5, 4, 3))
    # unsupported variants fail loudly, not wrongly
    with pytest.raises(ValueError):
        ic.png_decode(b"JFIF not a png")


def test_builtin_wav_codec_roundtrip():
    import numpy as np

    from grandine_ray.stages import imagecodec as ic

    pcm = (np.sin(np.linspace(0, 6, 100)) * 12345).astype(np.int16)
    data, rate = ic.wav_decode(ic.wav_encode(pcm, 16000))
    assert rate == 16000
    assert np.array_equal(data[:, 0], pcm)
    with pytest.raises(ValueError):
        ic.wav_decode(b"OggS not a wav")
