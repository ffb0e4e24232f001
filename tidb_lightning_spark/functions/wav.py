"""Minimal pure-stdlib WAV (RIFF PCM) codec for the multimodal kernels.

No audio library ships in this environment, but WAV's container is a
plain RIFF chunk list and integer PCM needs no decompression at all, so
— like `functions/png.py` for images — the audio kernels can operate on
REAL samples with only `struct` + numpy. Supported: PCM (format tag 1)
and IEEE float (tag 3), 8/16/24/32-bit, any channel count / rate; a
clear error beyond that (ADPCM, mp3-in-wav, ...).

Used executor-side inside Arrow-batched kernels
(functions/multimodal.py). Reference analog: tidb-lightning has no media
path — this extends the engine for training-data corpora where audio
rides in BINARY columns.
"""

from __future__ import annotations

import struct


class WAVError(ValueError):
    pass


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def _chunks(data: bytes):
    """Yield (chunk_id, start_offset, size) for each top-level RIFF chunk."""
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        cid, size = data[pos : pos + 4], struct.unpack(
            "<I", data[pos + 4 : pos + 8]
        )[0]
        yield cid, pos + 8, min(size, n - pos - 8)
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def wav_info(data: bytes) -> tuple[int, int, int, int, int]:
    """(sample_rate, n_channels, bits_per_sample, n_frames, duration_ms)
    from the fmt/data headers — no sample materialization (metadata fast
    path, mirrors png_info)."""
    if not is_wav(data):
        raise WAVError("not a WAV (bad RIFF/WAVE signature)")
    fmt = None
    data_size = None
    for cid, off, size in _chunks(data):
        if cid == b"fmt " and size >= 16:
            fmt = struct.unpack("<HHIIHH", data[off : off + 16])
        elif cid == b"data":
            data_size = size
    if fmt is None or data_size is None:
        raise WAVError("missing fmt/data chunk")
    tag, channels, rate, _byte_rate, block_align, bits = fmt
    if tag not in (1, 3):  # PCM / IEEE float
        raise WAVError(f"unsupported WAV format tag {tag} (PCM/float only)")
    if channels < 1 or bits not in (8, 16, 24, 32):
        raise WAVError(f"unsupported layout: {channels}ch {bits}-bit")
    frame_size = block_align or channels * (bits // 8)
    n_frames = data_size // frame_size
    duration_ms = n_frames * 1000 // rate if rate else 0
    return rate, channels, bits, n_frames, duration_ms


def decode_wav(data: bytes):
    """WAV bytes -> (numpy float32 array of shape (n_frames, channels)
    scaled to [-1, 1], sample_rate)."""
    import numpy as np

    rate, channels, bits, n_frames, _ = wav_info(data)
    tag = 1
    raw = None
    for cid, off, size in _chunks(data):
        if cid == b"fmt ":
            tag = struct.unpack("<H", data[off : off + 2])[0]
        elif cid == b"data":
            raw = data[off : off + size]
    if tag == 3:  # IEEE float
        if bits != 32:
            raise WAVError(f"float WAV must be 32-bit, got {bits}")
        arr = np.frombuffer(raw, dtype="<f4").astype(np.float32)
    elif bits == 8:  # unsigned
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif bits == 16:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8)
        b = b[: (len(b) // 3) * 3].reshape(-1, 3).astype(np.uint32)
        v = (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)).astype(np.int32)
        v = (v << 8) >> 8  # sign-extend 24 -> 32
        arr = v.astype(np.float32) / 8388608.0
    else:  # 32-bit int
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    arr = arr[: n_frames * channels].reshape(-1, channels)
    return arr, rate


def encode_wav(samples, rate: int) -> bytes:
    """numpy (n_frames, channels) float in [-1, 1] -> 16-bit PCM WAV."""
    import numpy as np

    samples = np.asarray(samples, dtype=np.float32)
    if samples.ndim == 1:
        samples = samples[:, None]
    # round (not truncate) and use the same 1/32768 step the decoder
    # divides by, so a decode->encode->decode cycle is lossless and the
    # quantization error is bounded by half a step
    pcm = (
        np.clip(np.rint(samples * 32768.0), -32768, 32767)
        .astype("<i2")
        .tobytes()
    )
    channels = samples.shape[1]
    block_align = channels * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, channels, rate, rate * block_align, block_align, 16
        )
        + b"data"
        + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


def resample_linear(samples, src_rate: int, dst_rate: int):
    """Linear-interpolation resample along axis 0 (per channel)."""
    import numpy as np

    if src_rate == dst_rate:
        return samples
    n_src = samples.shape[0]
    n_dst = max(1, int(round(n_src * dst_rate / src_rate)))
    x_dst = np.arange(n_dst, dtype=np.float64) * (src_rate / dst_rate)
    x_src = np.arange(n_src, dtype=np.float64)
    out = np.stack(
        [
            np.interp(x_dst, x_src, samples[:, c])
            for c in range(samples.shape[1])
        ],
        axis=1,
    )
    return out.astype(np.float32)
