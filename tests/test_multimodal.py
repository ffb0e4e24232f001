"""Multimodal plumbing tests: the decode kernels are stubbed (no codecs in
this container) but schemas, partitioning, batch shapes and determinism
are real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tidb_lightning_spark.functions import multimodal as MM


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(i, f"img_{i}".encode() * 10) for i in range(20)]
    return spark.createDataFrame(rows, "media_id long, content binary").repartition(4)


def test_image_metadata_schema_and_determinism(spark, media_df):
    out = MM.image_metadata(media_df)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "content", "width", "height", "mime",
    ]
    a = {r["media_id"]: (r["width"], r["height"]) for r in out.collect()}
    b = {r["media_id"]: (r["width"], r["height"]) for r in out.collect()}
    assert a == b  # deterministic across runs
    assert all(64 <= w < 2048 and 64 <= h < 2048 for w, h in a.values())


def test_resize_roundtrip_schema(spark, media_df):
    out = MM.resize_images(media_df, 224, 224)
    assert out.schema == media_df.schema
    payloads = [bytes(r["content"]) for r in out.collect()]
    assert all(p[-2:] == bytes([224, 224]) for p in payloads)


def test_image_embedding_feeds_knn(spark, media_df):
    emb = MM.image_embedding(media_df, dim=8)
    assert emb.schema["embedding"].dataType.simpleString() == "array<float>"
    # plumb into the LSH ANN operator (the multimodal near-dup path)
    from tidb_lightning_spark.functions.similarity import knn_lsh

    res = knn_lsh(
        emb, "media_id", "embedding", lambda c: c < 3, dim=8, k=3, n_planes=4
    )
    rows = res.collect()
    assert {r["query_id"] for r in rows} <= {0, 1, 2}
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in rows)


def test_video_frame_fanout(spark, media_df):
    out = MM.sample_video_frames(media_df, every_ms=1000)
    rows = out.collect()
    assert len(rows) > len(media_df.collect())  # fan-out happened
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in per.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense frame indexes


def test_real_decode_raises(spark, media_df):
    with pytest.raises(Exception) as ei:
        MM.image_metadata(media_df, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "decode" in str(ei.value)


# ---------------------------------------------------------------------------
# Real PNG decode path (functions/png.py: stdlib-zlib + numpy codec)
# ---------------------------------------------------------------------------


def _random_img(rng, h, w, ch):
    import numpy as np

    return np.asarray(
        rng.integers(0, 256, size=(h, w, ch)), dtype=np.uint8
    )


def test_png_roundtrip_all_color_types():
    import numpy as np

    from tidb_lightning_spark.functions import png

    rng = np.random.default_rng(42)
    for ch in (1, 2, 3, 4):
        img = _random_img(rng, 23, 17, ch)
        data = png.encode_png(img)
        assert png.is_png(data)
        w, h, depth, _ = png.png_info(data)
        assert (w, h, depth) == (17, 23, 8)
        back = png.decode_png(data)
        assert back.shape == (23, 17, ch)
        assert np.array_equal(back, img)


def test_png_decode_all_filter_types():
    """Decode must handle every PNG predictor, not just filter 0 — build a
    stream with hand-picked per-line filters and check pixel equality."""
    import struct
    import zlib

    import numpy as np

    from tidb_lightning_spark.functions import png

    rng = np.random.default_rng(7)
    img = _random_img(rng, 5, 9, 3)
    stride = 9 * 3

    def filt(y, ftype):
        cur = img[y].reshape(-1).astype(np.int32)
        prev = (
            img[y - 1].reshape(-1).astype(np.int32)
            if y > 0
            else np.zeros(stride, dtype=np.int32)
        )
        out = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                out[x] = cur[x]
            elif ftype == 1:
                out[x] = cur[x] - a
            elif ftype == 2:
                out[x] = cur[x] - b
            elif ftype == 3:
                out[x] = cur[x] - ((a + b) >> 1)
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = cur[x] - pred
        return bytes([ftype]) + bytes((out & 0xFF).astype(np.uint8))

    raw = b"".join(filt(y, y % 5) for y in range(5))

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(png.decode_png(data), img)


def test_image_kernels_real_png(spark):
    import numpy as np

    from tidb_lightning_spark.functions import png
    from tidb_lightning_spark.functions.multimodal import (
        image_embedding,
        image_metadata,
        resize_images,
    )

    rng = np.random.default_rng(3)
    imgs = {1: _random_img(rng, 40, 30, 3), 2: _random_img(rng, 10, 20, 4)}
    df = spark.createDataFrame(
        [(k, bytearray(png.encode_png(v))) for k, v in imgs.items()],
        "id int, content binary",
    )
    meta = {r["id"]: r for r in image_metadata(df, fake=False).collect()}
    assert (meta[1]["width"], meta[1]["height"]) == (30, 40)
    assert (meta[2]["width"], meta[2]["height"]) == (20, 10)
    assert meta[1]["mime"] == "image/png"

    resized = {
        r["id"]: bytes(r["content"])
        for r in resize_images(df, 8, 6, fake=False).collect()
    }
    for k in imgs:
        arr = png.decode_png(resized[k])
        assert arr.shape[:2] == (6, 8)
        # nearest-neighbor: every output pixel exists in the input
        assert np.array_equal(
            arr, png.resize_nearest(png.decode_png(png.encode_png(imgs[k])), 8, 6)
        )

    embs = {
        r["id"]: r["embedding"]
        for r in image_embedding(df, dim=16, fake=False).collect()
    }
    for k, arr in imgs.items():
        lum = arr[:, :, :3].mean(axis=2)
        hist, _ = np.histogram(lum, bins=16, range=(0.0, 256.0))
        want = (hist / lum.size).tolist()
        assert np.allclose(embs[k], want, atol=1e-6)


def test_wav_codec_roundtrip():
    """Pure-codec: encode -> info -> decode round-trips real samples."""
    import numpy as np

    from tidb_lightning_spark.functions import wav

    t = np.arange(8000) / 16000.0
    stereo = np.stack(
        [np.sin(2 * np.pi * 440 * t), 0.5 * np.sin(2 * np.pi * 880 * t)], axis=1
    )
    data = wav.encode_wav(stereo, 16000)
    assert wav.is_wav(data)
    rate, ch, bits, frames, dur = wav.wav_info(data)
    assert (rate, ch, bits, frames, dur) == (16000, 2, 16, 8000, 500)
    decoded, rate2 = wav.decode_wav(data)
    assert rate2 == 16000 and decoded.shape == (8000, 2)
    assert np.allclose(decoded, stereo, atol=2 / 32768)

    mono_8k = wav.resample_linear(decoded, 16000, 8000)
    assert mono_8k.shape == (4000, 2)


def test_audio_kernels_real_wav(spark):
    """Real WAV bytes through the Spark kernels: metadata, resample,
    RMS/ZCR embedding — values verified against the signal, not a stub."""
    import numpy as np

    from tidb_lightning_spark.functions import wav
    from tidb_lightning_spark.functions.multimodal import (
        audio_embedding,
        audio_metadata,
        resample_audio,
    )

    t = np.arange(16000) / 16000.0
    clips = {
        1: np.sin(2 * np.pi * 440 * t)[:, None],          # loud 1 s tone
        2: 0.1 * np.sin(2 * np.pi * 2000 * t)[:, None],   # quiet, high ZCR
        3: np.zeros((4000, 1), dtype=np.float32),         # 0.25 s silence
    }
    df = spark.createDataFrame(
        [(k, bytearray(wav.encode_wav(v, 16000))) for k, v in clips.items()],
        "id int, content binary",
    )

    meta = {r["id"]: r for r in audio_metadata(df, fake=False).collect()}
    assert meta[1]["sample_rate"] == 16000 and meta[1]["n_channels"] == 1
    assert meta[1]["duration_ms"] == 1000 and meta[3]["duration_ms"] == 250
    assert meta[2]["mime"] == "audio/wav"

    res = {
        r["id"]: bytes(r["content"])
        for r in resample_audio(df, 8000, fake=False).collect()
    }
    rate, _, _, frames, _ = wav.wav_info(res[1])
    assert rate == 8000 and frames == 8000  # half the samples, same second

    embs = {
        r["id"]: np.array(r["embedding"])
        for r in audio_embedding(df, dim=16, fake=False).collect()
    }
    assert all(v.shape == (16,) for v in embs.values())
    # RMS half: loud tone > quiet tone > silence
    assert embs[1][:8].mean() > embs[2][:8].mean() > embs[3][:8].mean() + 1e-9
    assert np.allclose(embs[3], 0.0)
    # ZCR half: 2 kHz tone crosses zero ~4.5x more often than 440 Hz
    assert embs[2][8:].mean() > 3 * embs[1][8:].mean()


def test_audio_stub_path_and_strict_raises(spark, media_df):
    from tidb_lightning_spark.functions.multimodal import audio_metadata

    out = audio_metadata(media_df).collect()  # fake=True on non-WAV bytes
    assert all(r["mime"] == "audio/stub" and r["sample_rate"] >= 8000 for r in out)
    with pytest.raises(Exception, match="NotImplementedError|librosa"):
        audio_metadata(media_df, fake=False).collect()


# ---------------------------------------------------------------------------
# Property-based codec round-trips (hypothesis; pure python, no Spark)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402
from hypothesis.extra import numpy as hnp  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    arr=hnp.arrays(
        dtype="uint8",
        shape=st.tuples(
            st.integers(1, 12), st.integers(1, 12), st.sampled_from([1, 2, 3, 4])
        ),
    )
)
def test_png_roundtrip_property(arr):
    from tidb_lightning_spark.functions import png

    import numpy as np

    data = png.encode_png(arr)
    assert png.is_png(data)
    w, h, depth, _color = png.png_info(data)
    assert (h, w) == arr.shape[:2] and depth == 8
    assert np.array_equal(png.decode_png(data), arr)


@settings(max_examples=40, deadline=None)
@given(
    samples=hnp.arrays(
        dtype="float32",
        shape=st.tuples(st.integers(1, 500), st.sampled_from([1, 2])),
        elements=st.floats(-1.0, 1.0, width=32),
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, rate):
    import numpy as np

    from tidb_lightning_spark.functions import wav

    data = wav.encode_wav(samples, rate)
    assert wav.is_wav(data)
    got_rate, ch, bits, frames, _ = wav.wav_info(data)
    assert (got_rate, ch, bits, frames) == (
        rate, samples.shape[1], 16, samples.shape[0],
    )
    decoded, _ = wav.decode_wav(data)
    assert decoded.shape == samples.shape
    # 16-bit quantization error bound: half a step, plus clipping at +1.0
    assert np.max(np.abs(decoded - np.clip(samples, -1, 32767 / 32768))) <= (
        0.5 / 32768 + 1e-7
    )
