"""Minimal pure-Python/numpy PNG codec for the multimodal kernels.

No imaging library ships in this environment, but PNG's container is
stdlib-friendly: chunked layout + zlib-compressed scanlines with five
per-line predictors (RFC 2083). This implements the subset a training-data
pipeline actually meets from screenshot/diagram corpora — 8-bit depth,
grayscale / RGB / gray+alpha / RGBA, non-interlaced — and raises a clear
error beyond it. Encoding writes filter-0 scanlines (valid, if not
maximally compressed).

Used executor-side inside Arrow-batched kernels (functions/multimodal.py);
numpy vectorizes everything except the inherently sequential Paeth/Sub
filters, which run per scanline.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PNGError(ValueError):
    pass


def is_png(data: bytes) -> bool:
    return data[:8] == _SIGNATURE


def png_info(data: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from IHDR — header-only,
    no decompression (the metadata fast path)."""
    if not is_png(data):
        raise PNGError("not a PNG (bad signature)")
    if data[12:16] != b"IHDR":
        raise PNGError("missing IHDR")
    w, h, depth, color = struct.unpack(">IIBB", data[16:26])
    return w, h, depth, color


def decode_png(data: bytes):
    """PNG bytes -> numpy uint8 array of shape (h, w, channels)."""
    import numpy as np

    w, h, depth, color = png_info(data)
    interlace = data[28]
    if depth != 8:
        raise PNGError(f"unsupported bit depth {depth} (only 8)")
    if color not in _CHANNELS:
        raise PNGError(f"unsupported color type {color} (no palette support)")
    if interlace:
        raise PNGError("interlaced PNG not supported")
    ch = _CHANNELS[color]

    # walk chunks, concatenate IDAT
    idat = bytearray()
    pos = 8
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += data[pos + 8 : pos + 8 + length]
        elif ctype == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise PNGError("scanline size mismatch")

    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = lines[:, 0]
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = filters[y]
        cur = lines[y, 1:].astype(np.int32)
        if f == 0:
            out = cur
        elif f == 1:  # Sub: left-sequential within the line
            out = cur.copy()
            for x in range(ch, stride):
                out[x] = (out[x] + out[x - ch]) & 0xFF
        elif f == 2:  # Up
            out = (cur + prev) & 0xFF
        elif f == 3:  # Average
            out = cur.copy()
            p = prev.astype(np.int32)
            for x in range(stride):
                left = out[x - ch] if x >= ch else 0
                out[x] = (out[x] + ((left + p[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            out = cur.copy()
            p = prev.astype(np.int32)
            for x in range(stride):
                a = out[x - ch] if x >= ch else 0
                b = p[x]
                c = p[x - ch] if x >= ch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = (out[x] + pred) & 0xFF
        else:
            raise PNGError(f"bad filter type {f}")
        img[y] = out.astype(np.uint8)
        prev = img[y]
    return img.reshape(h, w, ch)


def encode_png(arr) -> bytes:
    """numpy uint8 (h, w[, channels]) -> PNG bytes (filter 0, zlib 6)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise PNGError(f"unsupported channel count {ch}")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(arr, target_w: int, target_h: int):
    """Nearest-neighbor resize via numpy index sampling (deterministic,
    no interpolation ties)."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return arr[ys][:, xs]
