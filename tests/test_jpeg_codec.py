"""Stdlib baseline JPEG codec (functions/jpeg.py) -- the second
native decode format (VERDICT r7 #5).

Pins: quantization-exact constant-block round trips (the property
mm4's oracle builds on), bounded loss on arbitrary images, near-
lossless q=1 behavior, edge padding for non-multiple-of-8 sizes,
marker/error paths, and decode_media's magic-byte dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from data_wrangling_osm_xml_with_python_into_mongodb_spark.functions.jpeg import (
    DEFAULT_QUANT,
    decode_jpeg,
    encode_jpeg,
)
from data_wrangling_osm_xml_with_python_into_mongodb_spark.functions.multimodal import (
    decode_media,
)


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def _blocks(vals, by, bx):
    return np.repeat(
        np.repeat(np.asarray(vals, dtype=np.uint8).reshape(by, bx), 8, 0), 8, 1
    )


def test_constant_blocks_roundtrip_exactly():
    """Every possible byte value survives bit-exact when blocks are
    constant: DC = 8*(v-128) is divisible by the uniform-8 quant step
    and all ACs vanish -- the lossy pipeline's exact subspace."""
    vals = np.arange(256, dtype=np.uint8)
    img = _blocks(vals, 16, 16)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (128, 128, 1)
    assert (out[:, :, 0] == img).all()


def test_general_image_bounded_loss():
    img = _rand((24, 40), seed=7)
    out = decode_jpeg(encode_jpeg(img))[:, :, 0]
    err = np.abs(out.astype(int) - img.astype(int))
    # uniform-8 quantization bounds per-coefficient error by 4; the
    # worst pixel error stays far below visible-banding territory.
    assert err.max() <= 16
    assert err.mean() < 4


def test_quant_1_near_lossless():
    img = _rand((16, 16), seed=11)
    out = decode_jpeg(encode_jpeg(img, quant=np.ones(64, dtype=int)))[:, :, 0]
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_odd_sizes_edge_padding_cropped():
    for h, w in [(1, 1), (7, 9), (10, 13), (8, 17)]:
        img = np.full((h, w), 77, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == (h, w, 1)
        assert (out[:, :, 0] == img).all()


def test_smooth_gradient_low_error():
    g = np.clip(
        np.round(np.add.outer(np.linspace(0, 50, 24), np.linspace(0, 255, 40))),
        0,
        255,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g))[:, :, 0]
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 6


def test_error_paths():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG")
    with pytest.raises(ValueError, match="grayscale"):
        # encoder is grayscale-only
        encode_jpeg(_rand((8, 8, 3), seed=1))
    data = bytearray(encode_jpeg(_rand((8, 8), seed=2)))
    sof = bytes(data).find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(_rand((8, 8), seed=3))[:-40])  # truncated scan


def test_decode_media_dispatches_jpeg():
    img = _blocks([10, 200], 1, 2)
    out = decode_media(encode_jpeg(img))
    assert out.shape == (8, 16, 1)
    assert (out[:, :, 0] == img).all()


def test_stats_weighting_matches_mm4_oracle_model():
    """The oracle models per-pixel stats as uniform over block values
    (64 px per block) -- verify on the synth shape (2x4 blocks)."""
    vals = [3, 250, 100, 0, 255, 17, 99, 181]
    img = _blocks(vals, 2, 4)
    out = decode_jpeg(encode_jpeg(img))[:, :, 0]
    assert round(float(out.mean()), 4) == round(sum(vals) / 8.0, 4)
    assert int(out.min()) == min(vals) and int(out.max()) == max(vals)
    assert (DEFAULT_QUANT == 8).all()
