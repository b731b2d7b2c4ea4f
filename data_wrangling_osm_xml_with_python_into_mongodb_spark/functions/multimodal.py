"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas
iterators (``mapInPandas``).

Decode is REAL for PNG: ``decode_media`` dispatches PNG payloads to
the dependency-free stdlib codec in ``functions/png.py`` (all filter
types, gray/RGB/RGBA), and other formats to PIL when installed.  Only
the no-PNG-no-PIL case keeps the documented ``NotImplementedError``
gate.  ``_decode_stub`` remains for the synthetic fake-payload tables
(mm1/mm2), whose oracles recompute its arithmetic independently.

Scale notes: media rows are large; the operators below are narrow
(no shuffle), so throughput scales with input splits.  Keep
``spark.sql.files.maxPartitionBytes`` sized so one Arrow batch of
decoded frames fits executor memory; binary columns should live in
their own parquet files (or a media lakehouse table) referenced by id
to keep analytic scans of the text columns cheap.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("data", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_feature", T.ArrayType(T.FloatType())),
    ]
)

_FEATURE_DIM = 8


def synth_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table derived from the documents table:
    payload bytes = repeated md5 of the text, metadata from doc stats.
    Stands in for a real binary-column ingest (parquet/lakehouse) so
    the downstream plumbing is exercised end to end."""
    payload = F.repeat(F.unhex(F.md5(F.col("text"))), 8)  # 128 bytes
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.cast("binary").alias("data"),
        F.struct(
            F.lit("fake").alias("format"),
            F.lit(16).cast("int").alias("width"),
            F.lit(8).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.col("doc_id") % 10 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _decode_stub(data: bytes, require_codec: bool = False) -> np.ndarray:
    """STUB decoder.  Real deployments replace this with PIL / libvips /
    torchaudio; here: deterministic float array from the payload bytes."""
    if require_codec:
        raise NotImplementedError(
            "no image/audio codec in this environment; plug a real decoder here"
        )
    digest = hashlib.md5(data or b"").digest()
    arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def decode_media(data: bytes) -> np.ndarray:
    """REAL image decode: (H, W, C) uint8 pixels.

    PNG and baseline grayscale JPEG decode natively via the stdlib
    codecs (functions/png.py, functions/jpeg.py) -- no external
    dependency.  Other formats (color/progressive JPEG, WebP, ...)
    go through PIL when installed; without it they hit the documented
    codec gate."""
    from .jpeg import JPEG_MAGIC, decode_jpeg
    from .png import PNG_MAGIC, decode_png

    if data[: len(PNG_MAGIC)] == PNG_MAGIC:
        return decode_png(data)
    if data[: len(JPEG_MAGIC)] == JPEG_MAGIC:
        try:
            return decode_jpeg(data)
        except ValueError:
            # Color/progressive JPEG: fall through to the PIL gate.
            pass
    try:
        import io

        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "payload needs a codec this environment lacks; PNG and "
            "baseline grayscale JPEG decode natively (functions/png.py, "
            "functions/jpeg.py), other formats need PIL"
        ) from e
    arr = np.asarray(Image.open(io.BytesIO(data)))
    return arr[:, :, None] if arr.ndim == 2 else arr


def synth_png_media(docs: DataFrame, width: int = 16, height: int = 8) -> DataFrame:
    """REAL encoded media derived deterministically from documents:
    each doc becomes a grayscale PNG whose pixel bytes are the md5
    digest of its text repeated to fill width*height.  Payloads are
    genuine PNGs (scanline-filtered, zlib-compressed), so downstream
    decode exercises the full codec -- while an oracle can still
    predict every pixel statistic straight from ``md5(text)``."""
    from .png import encode_png

    n = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                digest = hashlib.md5((text or "").encode("utf-8")).digest()
                px = (digest * ((n // len(digest)) + 1))[:n]
                arr = np.frombuffer(px, dtype=np.uint8).reshape(height, width)
                # Filter type keyed off the digest so the corpus covers
                # every decoder reconstruction path (None/Sub/Up/Avg/
                # Paeth), not just the trivial one.
                payloads.append(encode_png(arr, filter_type=digest[0] % 5))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "data": payloads}
            )

    return docs.select("doc_id", "text").mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("data", T.BinaryType()),
            ]
        ),
    )


def synth_jpeg_media(docs: DataFrame, blocks_x: int = 4, blocks_y: int = 2) -> DataFrame:
    """REAL encoded JPEGs derived deterministically from documents:
    each doc becomes a (8*blocks_y, 8*blocks_x) grayscale baseline
    JPEG of CONSTANT 8x8 blocks, block b's value = byte b of
    md5(text).  Constant blocks survive the lossy pipeline exactly
    under the default quant table (functions/jpeg.py module
    docstring), so the full entropy-coding + DCT machinery runs while
    a DuckDB oracle still predicts every decoded pixel statistic from
    the md5 hex digits -- the mm3 technique extended to the second
    format."""
    from .jpeg import encode_jpeg

    nblocks = blocks_x * blocks_y

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                digest = hashlib.md5((text or "").encode("utf-8")).digest()
                vals = np.frombuffer(digest[:nblocks], dtype=np.uint8)
                arr = np.repeat(
                    np.repeat(vals.reshape(blocks_y, blocks_x), 8, axis=0),
                    8,
                    axis=1,
                )
                payloads.append(encode_jpeg(arr))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "data": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("data", T.BinaryType()),
            ]
        ),
    )


def synth_wav_media(docs: DataFrame, tile: int = 64, rate: int = 8000) -> DataFrame:
    """REAL encoded audio derived deterministically from documents:
    each doc becomes an 8-bit mono PCM WAV whose samples are the md5
    digest tiled ``tile`` times (16*tile samples).  Genuine RIFF
    containers through the stdlib codec (functions/audio.py); the
    oracle predicts every amplitude statistic from the digest hex."""
    from .audio import encode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                digest = hashlib.md5((text or "").encode("utf-8")).digest()
                samples = np.frombuffer(digest * tile, dtype=np.uint8)
                payloads.append(encode_wav(samples, sample_rate=rate))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "data": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("data", T.BinaryType()),
            ]
        ),
    )


WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_amp", T.DoubleType()),
        T.StructField("min_amp", T.IntegerType()),
        T.StructField("max_amp", T.IntegerType()),
    ]
)


def wav_decode_stats(media: DataFrame) -> DataFrame:
    """Decode every WAV payload with the REAL codec and report
    amplitude statistics -- the audio twin of png_decode_stats.
    Narrow (no shuffle); Arrow-batched."""
    from .audio import decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                arr, rate = decode_wav(bytes(data))
                rows.append(
                    (
                        mid,
                        arr.shape[0],
                        rate,
                        arr.shape[1],
                        round(float(arr.mean()), 4),
                        int(arr.min()),
                        int(arr.max()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAV_STATS_SCHEMA.fields]
            )

    return media.mapInPandas(run, WAV_STATS_SCHEMA)


PNG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("min_byte", T.IntegerType()),
        T.StructField("max_byte", T.IntegerType()),
    ]
)


def png_decode_stats(media: DataFrame) -> DataFrame:
    """Decode every payload with the REAL codec and report pixel
    statistics -- the verifiable core of an image-quality/filtering
    stage.  Narrow (no shuffle); Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                arr = decode_media(bytes(data))
                rows.append(
                    (
                        mid,
                        arr.shape[1],
                        arr.shape[0],
                        arr.shape[2],
                        round(float(arr.mean()), 4),
                        int(arr.min()),
                        int(arr.max()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PNG_STATS_SCHEMA.fields]
            )

    return media.mapInPandas(run, PNG_STATS_SCHEMA)


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Per-media fixed-dim feature vector via Arrow-batched mapInPandas.

    The UDF sees an iterator of pandas batches (constant memory per
    task); each batch is processed vectorized."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(d)[: _FEATURE_DIM].tolist() for d in pdf["data"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(d or b"") for d in pdf["data"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_meta(media: DataFrame, width: int, height: int) -> DataFrame:
    """'Resize': rewrite the typed metadata (the pixel transform itself
    lives behind the decode stub).  Pure column expression -- no UDF."""
    return media.withColumn(
        "meta",
        F.col("meta")
        .withField("width", F.lit(width).cast("int"))
        .withField("height", F.lit(height).cast("int")),
    )


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling for video rows: one output row per kept frame,
    frame feature = decoded payload salted by frame index.  Explodes
    ONLY the sampled indices (narrow; no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_feat = [], [], []
            for mid, data, meta in zip(pdf["media_id"], pdf["data"], pdf["meta"]):
                n = int(meta["n_frames"] or 0)
                for i in range(0, n, every_k):
                    out_ids.append(mid)
                    out_idx.append(i)
                    salted = (data or b"") + i.to_bytes(4, "little")
                    out_feat.append(
                        _decode_stub(salted)[: _FEATURE_DIM].tolist()
                    )
            yield pd.DataFrame(
                {
                    "media_id": out_ids,
                    "frame_idx": out_idx,
                    "frame_feature": out_feat,
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


BYTE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("last_byte", T.IntegerType()),
    ]
)


def media_byte_stats(media: DataFrame) -> DataFrame:
    """Payload integrity audit over binary media columns: byte length,
    byte sum, first/last byte per payload -- the smallest real
    exercise of binary columns crossing the Arrow boundary into a
    pandas iterator (same batch shape as the decode path), with
    results an independent engine can recompute."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            datas = [bytes(d) if d is not None else b"" for d in pdf["data"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(d) for d in datas],
                    "byte_sum": [int(sum(d)) for d in datas],
                    "first_byte": [d[0] if d else None for d in datas],
                    "last_byte": [d[-1] if d else None for d in datas],
                }
            )

    return media.mapInPandas(run, BYTE_STATS_SCHEMA)
