"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas
iterators (``mapInPandas``).

The decode step itself is STUBBED: this container has no image/audio
codecs, so ``_decode_stub`` produces a deterministic fake derived from
the payload bytes (and raises ``NotImplementedError`` when a real
codec is demanded via ``require_codec=True``).  Everything around the
stub -- the media schema, the binary payloads, the mapInPandas batch
shape, partition-parallel execution, and the feature/resize/frame
arithmetic -- is real and tested, so swapping in PIL/torchaudio/ffmpeg
is a one-function change.

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
