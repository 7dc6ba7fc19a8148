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

    dec = media.ImageDecoder()
    imgs = dec(fetched)
    assert imgs["image"].type == pa.list_(pa.uint8(), 16 * 16 * 3)
    res = media.ImageResizer()(imgs)
    assert res["img_h"][0].as_py() == 8
    feats = media.ImageFeatures()(res)
    assert len(feats["img_features"][0].as_py()) == 6

    # the non-fake path marks the real codec boundary
    with pytest.raises(NotImplementedError):
        media.ImageDecoder(deterministic_fake=False)._decode(b"xx")
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


@pytest.mark.skipif(media.available_image_codec() is None,
                    reason="Pillow not installed in this container")
def test_real_image_decode_roundtrip():
    """With Pillow present, the decoder must decode a real PNG byte string
    (built with Pillow itself) into the stage's fixed h×w×3 tensor."""
    import io

    import numpy as np
    import pyarrow as pa

    Image = media.available_image_codec()
    src = np.zeros((4, 4, 3), np.uint8)
    src[:2, :, 0] = 255  # top half red
    buf = io.BytesIO()
    Image.fromarray(src).save(buf, format="PNG")
    batch = pa.table({"media_ref": pa.array(["media://real"]),
                      "payload": pa.array([buf.getvalue()], pa.binary())})
    out = media.ImageDecoder(deterministic_fake=False)(batch)
    img = np.asarray(out["image"][0].as_py(), np.uint8).reshape(16, 16, 3)
    assert img[0, 0, 0] == 255 and img[15, 15, 0] == 0


@pytest.mark.skipif(media.available_audio_codec() is None,
                    reason="soundfile not installed in this container")
def test_real_audio_decode_windows():
    import io

    import numpy as np
    import pyarrow as pa

    sf = media.available_audio_codec()
    pcm = (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16)
    buf = io.BytesIO()
    sf.write(buf, pcm, 8000, format="WAV")
    batch = pa.table({"media_ref": pa.array(["media://wav"]),
                      "payload": pa.array([buf.getvalue()], pa.binary())})
    out = media.AudioChunker(deterministic_fake=False)(batch)
    assert out.num_rows > 0 and out["energy"][0].as_py() > 0
