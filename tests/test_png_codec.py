"""Stdlib PNG codec (functions/png.py) + real-decode multimodal path.

Round-trips every scanline filter type and color layout, checks
unsupported-variant errors, and pins decode_media's dispatch: PNG is
always real; non-PNG needs PIL (skip-gated) or raises the documented
codec gate."""

from __future__ import annotations

import numpy as np
import pytest

from data_wrangling_osm_xml_with_python_into_mongodb_spark.functions.png import (
    decode_png,
    encode_png,
)
from data_wrangling_osm_xml_with_python_into_mongodb_spark.functions.multimodal import (
    decode_media,
)

try:
    import PIL  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_every_filter_and_layout(filter_type, channels):
    arr = _rand((11, 7, channels), seed=filter_type * 10 + channels)
    out = decode_png(encode_png(arr, filter_type=filter_type))
    assert out.shape == arr.shape
    assert (out == arr).all()


def test_roundtrip_grayscale_2d_and_gradient():
    # Gradients stress Sub/Average/Paeth predictors with correlated data.
    g = np.add.outer(np.arange(32), np.arange(64)).astype(np.uint8)
    for ft in range(5):
        assert (decode_png(encode_png(g, filter_type=ft))[:, :, 0] == g).all()


def test_decode_rejects_non_png_and_bad_variants():
    with pytest.raises(ValueError, match="magic"):
        decode_png(b"JFIF not a png")
    arr = _rand((4, 4, 1), seed=1)
    data = bytearray(encode_png(arr))
    # Corrupt IHDR bit depth (offset: 8 magic + 8 len/tag + 8 w/h)
    data[24] = 16
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(data))


def test_decode_media_dispatch():
    arr = _rand((5, 9, 3), seed=7)
    assert (decode_media(encode_png(arr)) == arr).all()
    if not HAVE_PIL:
        with pytest.raises(NotImplementedError, match="decode natively"):
            decode_media(b"\xff\xd8\xff\xe0 fake jpeg bytes")


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed in this environment")
def test_decode_media_pil_path():
    import io

    from PIL import Image

    arr = _rand((6, 6, 3), seed=3)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="BMP")  # non-PNG -> PIL branch
    assert (decode_media(buf.getvalue()) == arr).all()


def test_png_media_spark_roundtrip(spark):
    """The registered mm3 path end-to-end on a tiny frame: encode in
    one Arrow stage, decode in another, exact digest-derived stats."""
    import hashlib

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.functions.multimodal import (
        png_decode_stats,
        synth_png_media,
    )

    docs = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(10)], "doc_id long, text string"
    )
    rows = {
        r["media_id"]: r
        for r in png_decode_stats(synth_png_media(docs)).collect()
    }
    for i in range(10):
        dig = hashlib.md5(f"text number {i}".encode()).digest()
        assert rows[i]["width"] == 16 and rows[i]["height"] == 8
        assert rows[i]["min_byte"] == min(dig)
        assert rows[i]["max_byte"] == max(dig)
        assert rows[i]["mean_byte"] == pytest.approx(
            round(sum(dig) / 16.0, 4)
        )
