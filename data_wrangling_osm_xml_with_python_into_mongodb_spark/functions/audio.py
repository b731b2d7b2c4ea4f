"""Dependency-free WAV (RIFF PCM) codec via the stdlib ``wave``
module: the REAL audio decode path, completing the native multimodal
set (PNG: functions/png.py, baseline JPEG: functions/jpeg.py).

Scope: PCM mono/stereo, 8-bit unsigned or 16-bit signed -- the
uncompressed layouts a training-data audio pipeline normalizes to
before feature extraction.  Compressed containers (MP3/FLAC/OGG) stay
behind the optional-dependency gate in functions/multimodal.py
alongside color JPEG.
"""

from __future__ import annotations

import io
import wave

import numpy as np

WAV_MAGIC = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """(n,) or (n, channels) uint8 (unsigned PCM) or int16 (signed
    PCM) -> WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype == np.uint8:
        width = 1
    elif samples.dtype == np.int16:
        width = 2
    else:
        raise ValueError("encode_wav: uint8 or int16 samples only")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(width)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, channels) array, sample_rate).  dtype is
    uint8 for 8-bit PCM, int16 for 16-bit."""
    if data[:4] != WAV_MAGIC:
        raise ValueError("not a WAV (missing RIFF magic)")
    with wave.open(io.BytesIO(data), "rb") as w:
        width = w.getsampwidth()
        if width not in (1, 2):
            raise ValueError(f"unsupported PCM width {width} (8/16-bit only)")
        raw = w.readframes(w.getnframes())
        dtype = np.uint8 if width == 1 else np.dtype("<i2")
        arr = np.frombuffer(raw, dtype=dtype).reshape(-1, w.getnchannels())
        return arr, w.getframerate()
