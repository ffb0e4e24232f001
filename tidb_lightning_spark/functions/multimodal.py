"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

Schema convention for a 100 TB multimodal corpus:

    content   BINARY                      -- the raw encoded media bytes
    meta      STRUCT<mime STRING, width INT, height INT,
                     duration_ms BIGINT, sample_rate INT, n_frames INT>

The heavy steps (decode, resize, feature-extract, frame-sample) run as
Arrow-batched `mapInPandas` — one Python worker per partition, media bytes
never pass through the driver, output schemas are fixed up front so
Catalyst can prune/plan around them.

Decode reality, by format:
  * PNG is decoded FOR REAL — `functions/png.py` is a pure stdlib-zlib +
    numpy codec (8-bit gray/RGB/GA/RGBA), so metadata, nearest-neighbor
    resize and histogram features operate on actual pixels whenever the
    bytes are a PNG, regardless of the `fake` flag.
  * WAV (RIFF PCM/float) is decoded FOR REAL — `functions/wav.py` is a
    pure stdlib-struct + numpy codec, so audio metadata, linear-interp
    resampling and RMS/ZCR feature embeddings operate on actual samples
    whenever the bytes are a WAV, regardless of the `fake` flag.
  * Other codecs (JPEG/video/mp3: PIL/cv2/librosa) are NOT in this
    container, so those kernels are STUBBED: with `fake=True` they emit
    deterministic md5-derived pseudo-results so the distributed plumbing
    is fully testable; with `fake=False` they raise NotImplementedError.
Swapping in a real decoder changes only the inner function —
partitioning, schemas and batch shapes stay as tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def _ship(df: DataFrame) -> None:
    from tidb_lightning_spark._shipping import ensure_shipped

    ensure_shipped(df.sparkSession)


def _fake_u32(data: bytes, salt: str) -> int:
    return int.from_bytes(
        hashlib.md5(salt.encode() + data).digest()[:4], "little"
    )


def _image_dims(data: bytes, fake: bool):
    """(width, height, mime): real header parse for PNG, stub otherwise."""
    from tidb_lightning_spark.functions import png

    if png.is_png(data):
        w, h, _, _ = png.png_info(data)
        return w, h, "image/png"
    if not fake:
        raise NotImplementedError(
            "non-PNG image decode requires PIL/cv2 (not in this "
            "container); run with fake=True or install a codec"
        )
    w = 64 + _fake_u32(data, "w") % 1984
    h = 64 + _fake_u32(data, "h") % 1984
    return w, h, "image/stub"


def image_metadata(
    df: DataFrame, content_col: str = "content", fake: bool = True
) -> DataFrame:
    """content -> (*, width, height, mime) via Arrow-batched mapInPandas."""
    _ship(df)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mime", T.StringType()),
        ]
    )

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            dims = [_image_dims(bytes(b), fake) for b in pdf[content_col]]
            pdf = pdf.copy()
            pdf["width"] = [d[0] for d in dims]
            pdf["height"] = [d[1] for d in dims]
            pdf["mime"] = [d[2] for d in dims]
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    content_col: str = "content",
    fake: bool = True,
) -> DataFrame:
    """content -> resized content. PNG: real decode -> nearest-neighbor
    resample -> re-encode; other formats: stub (size-stamped digest)."""
    out_schema = df.schema
    _ship(df)

    def one(data: bytes) -> bytes:
        from tidb_lightning_spark.functions import png

        if png.is_png(data):
            return png.encode_png(
                png.resize_nearest(png.decode_png(data), target_w, target_h)
            )
        if not fake:
            raise NotImplementedError("non-PNG resize requires PIL/cv2")
        return hashlib.md5(data).digest() + bytes(
            [target_w % 256, target_h % 256]
        )

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[content_col] = [one(bytes(b)) for b in pdf[content_col]]
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def image_embedding(
    df: DataFrame,
    dim: int = 16,
    content_col: str = "content",
    id_cols: list[str] | None = None,
    fake: bool = True,
) -> DataFrame:
    """content -> float embedding.

    PNG: a REAL pixel-derived feature — the normalized `dim`-bin
    luminance histogram (a classical global descriptor; deterministic, no
    model weights needed). Other formats: md5-derived stub. Output: id
    columns + `embedding array<float>` — feeds directly into
    functions/similarity.knn_lsh for multimodal near-dup at scale.
    """
    _ship(df)
    id_cols = id_cols or [c for c in df.columns if c != content_col]
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [T.StructField("embedding", T.ArrayType(T.FloatType()))]
    )

    def one(data: bytes) -> list[float]:
        from tidb_lightning_spark.functions import png

        if png.is_png(data):
            import numpy as np

            arr = png.decode_png(data)
            # luminance = mean over color channels (alpha excluded)
            color_ch = 3 if arr.shape[2] >= 3 else 1
            lum = arr[:, :, :color_ch].mean(axis=2)
            hist, _ = np.histogram(lum, bins=dim, range=(0.0, 256.0))
            return (hist / max(1, lum.size)).astype(float).tolist()
        if not fake:
            raise NotImplementedError("non-PNG embedding requires a model")
        return [(_fake_u32(data, f"e{i}") / 2**31 - 1.0) for i in range(dim)]

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = pdf[id_cols].copy()
            out["embedding"] = [one(bytes(b)) for b in pdf[content_col]]
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


def audio_metadata(
    df: DataFrame, content_col: str = "content", fake: bool = True
) -> DataFrame:
    """content -> (*, sample_rate, n_channels, duration_ms, mime).

    WAV: real RIFF header parse (no sample materialization — the same
    header-only fast path as image_metadata/png_info). Other formats:
    md5-derived stub under fake=True."""
    _ship(df)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("mime", T.StringType()),
        ]
    )

    def one(data: bytes):
        from tidb_lightning_spark.functions import wav

        if wav.is_wav(data):
            rate, ch, _bits, _frames, dur = wav.wav_info(data)
            return rate, ch, dur, "audio/wav"
        if not fake:
            raise NotImplementedError(
                "non-WAV audio decode requires librosa/ffmpeg (not in "
                "this container); run with fake=True or install a codec"
            )
        return (
            8000 * (1 + _fake_u32(data, "sr") % 6),
            1 + _fake_u32(data, "ch") % 2,
            500 + _fake_u32(data, "dur") % 29500,
            "audio/stub",
        )

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            vals = [one(bytes(b)) for b in pdf[content_col]]
            pdf = pdf.copy()
            pdf["sample_rate"] = [v[0] for v in vals]
            pdf["n_channels"] = [v[1] for v in vals]
            pdf["duration_ms"] = [v[2] for v in vals]
            pdf["mime"] = [v[3] for v in vals]
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def resample_audio(
    df: DataFrame,
    target_rate: int,
    content_col: str = "content",
    fake: bool = True,
) -> DataFrame:
    """content -> content resampled to target_rate (the audio analog of
    resize_images). WAV: real decode -> linear-interp resample -> 16-bit
    PCM re-encode; other formats: rate-stamped digest stub."""
    out_schema = df.schema
    _ship(df)

    def one(data: bytes) -> bytes:
        from tidb_lightning_spark.functions import wav

        if wav.is_wav(data):
            samples, rate = wav.decode_wav(data)
            return wav.encode_wav(
                wav.resample_linear(samples, rate, target_rate), target_rate
            )
        if not fake:
            raise NotImplementedError("non-WAV resample requires librosa")
        return hashlib.md5(data).digest() + target_rate.to_bytes(4, "little")

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[content_col] = [one(bytes(b)) for b in pdf[content_col]]
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def audio_embedding(
    df: DataFrame,
    dim: int = 16,
    content_col: str = "content",
    id_cols: list[str] | None = None,
    fake: bool = True,
) -> DataFrame:
    """content -> float embedding (the audio analog of image_embedding).

    WAV: a REAL sample-derived descriptor — the first `dim // 2` windowed
    RMS energies and `dim - dim // 2` windowed zero-crossing rates over
    the mono mix (classical features; deterministic, no model weights).
    Other formats: md5 stub. Output: id columns + `embedding
    array<float>` — feeds functions/similarity.knn_* for audio near-dup.
    """
    _ship(df)
    id_cols = id_cols or [c for c in df.columns if c != content_col]
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [T.StructField("embedding", T.ArrayType(T.FloatType()))]
    )
    n_rms = dim // 2

    def one(data: bytes) -> list[float]:
        from tidb_lightning_spark.functions import wav

        if wav.is_wav(data):
            import numpy as np

            samples, _rate = wav.decode_wav(data)
            mono = samples.mean(axis=1)
            if mono.size == 0:
                return [0.0] * dim
            feats = []
            for n_win, kind in ((n_rms, "rms"), (dim - n_rms, "zcr")):
                edges = np.linspace(0, mono.size, n_win + 1).astype(int)
                for i in range(n_win):
                    w = mono[edges[i] : max(edges[i] + 1, edges[i + 1])]
                    if kind == "rms":
                        feats.append(float(np.sqrt(np.mean(w * w))))
                    else:
                        feats.append(float(np.mean(np.signbit(w[1:]) != np.signbit(w[:-1]))) if w.size > 1 else 0.0)
            return feats
        if not fake:
            raise NotImplementedError("non-WAV embedding requires a model")
        return [(_fake_u32(data, f"a{i}") / 2**31 - 1.0) for i in range(dim)]

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = pdf[id_cols].copy()
            out["embedding"] = [one(bytes(b)) for b in pdf[content_col]]
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    content_col: str = "content",
    fake: bool = True,
) -> DataFrame:
    """video content -> exploded (frame_idx, frame_ts_ms, frame BINARY).

    One input row fans out to N frame rows inside the same partition —
    no shuffle; downstream ops see an ordinary binary column.
    """
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ts_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    other = [f.name for f in df.schema.fields if f.name != content_col]
    _ship(df)

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r[content_col])
                if not fake:
                    raise NotImplementedError("real frame sampling requires cv2")
                duration_ms = 1000 + _fake_u32(data, "dur") % 9000
                n = max(1, duration_ms // every_ms)
                for i in range(n):
                    rows.append(
                        {
                            **{c: r[c] for c in other},
                            "frame_idx": i,
                            "frame_ts_ms": i * every_ms,
                            "frame": hashlib.md5(
                                data + i.to_bytes(4, "little")
                            ).digest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=other + ["frame_idx", "frame_ts_ms", "frame"])

    return df.mapInPandas(kernel, schema=out_schema)
