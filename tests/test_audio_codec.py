"""Stdlib WAV codec (functions/audio.py): PCM round trips, layout
variants, and error paths -- the audio leg of the native multimodal
set (mm5_wav_decode_stats is the oracle-gated query)."""

from __future__ import annotations

import numpy as np
import pytest

from data_wrangling_osm_xml_with_python_into_mongodb_spark.functions.audio import (
    decode_wav,
    encode_wav,
)


def test_uint8_mono_roundtrip():
    samples = np.arange(256, dtype=np.uint8)
    arr, rate = decode_wav(encode_wav(samples, sample_rate=8000))
    assert rate == 8000
    assert arr.shape == (256, 1)
    assert (arr[:, 0] == samples).all()


def test_int16_stereo_roundtrip():
    rng = np.random.default_rng(3)
    samples = rng.integers(-(2**15), 2**15, (100, 2)).astype(np.int16)
    arr, rate = decode_wav(encode_wav(samples, sample_rate=44100))
    assert rate == 44100
    assert arr.shape == (100, 2)
    assert (arr == samples).all()
    assert arr.dtype == np.int16


def test_error_paths():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNG not audio")
    with pytest.raises(ValueError, match="uint8 or int16"):
        encode_wav(np.zeros(4, dtype=np.float32))
