"""Dependency-free PNG codec (stdlib ``zlib`` + ``struct``): the REAL
decode path behind the multimodal image pipeline.

Scope: 8-bit depth, color types 0 (grayscale), 2 (RGB), 4 (gray+alpha),
6 (RGBA), no interlace -- the output space of every mainstream encoder's
default settings.  All five scanline filters (None/Sub/Up/Average/
Paeth) are reconstructed per the PNG spec (RFC 2083 §6).  Other formats
(JPEG, WebP, ...) stay behind the optional-PIL gate in
``functions/multimodal.py``.

The encoder exists for tests and fixture generation (it can emit any
filter type per scanline, so the decoder's reconstruction paths are all
exercised); production writes would use a real imaging library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array (H, W) or (H, W, C in {1,2,3,4}) -> PNG bytes.

    ``filter_type`` applies to every scanline (0..4); non-zero types
    exist so tests can exercise each decoder reconstruction path.
    """
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8:
        raise ValueError("encode_png: uint8 arrays only")
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c  # bytes per pixel at bit depth 8
    raw = arr.reshape(h, w * c).astype(np.int64)
    lines = []
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - (left + prev) // 2
        elif filter_type == 4:
            pred = np.fromiter(
                (
                    _paeth(int(left[i]), int(prev[i]), int(upleft[i]))
                    for i in range(w * c)
                ),
                dtype=np.int64,
                count=w * c,
            )
            filt = cur - pred
        else:
            raise ValueError(f"unknown filter type {filter_type}")
        lines.append(bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H, W, C).  Raises ValueError on
    non-PNG input or unsupported variants (16-bit, palette,
    interlaced)."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG (bad magic)")
    pos = len(PNG_MAGIC)
    width = height = color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + tag + payload + crc
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    c = _CHANNELS[color_type]
    stride = width * c
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:
            cur = line
        elif ftype == 2:
            cur = (line + prev) % 256
        elif ftype in (1, 3, 4):
            # Left-referencing filters are sequential per pixel.
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - c] if i >= c else 0
                b = prev[i]
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    cc = prev[i - c] if i >= c else 0
                    pred = _paeth(int(a), int(b), int(cc))
                cur[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"unknown scanline filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, c)
