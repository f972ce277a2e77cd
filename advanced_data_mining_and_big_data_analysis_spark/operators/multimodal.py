"""Multimodal column conventions + processing plumbing.

Convention: media travels as an opaque ``binary`` column plus typed
metadata columns (mime, width/height/duration, source uri). All Spark-side
plumbing — schema, partitioning, Arrow batch shape — is real; the actual
codec work is stubbed behind ``DECODERS`` because image/audio libraries are
not available in this container (clearly marked below).

The processing shape is ``mapInPandas`` (Arrow-batched iterator of
pandas.DataFrame), which is the right boundary for byte-blob work at scale:
batches stream through Python without materializing a partition, and
column pruning still applies upstream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("uri", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def _decode_image(content: bytes) -> list[float]:
    """STUB — real implementation needs an image codec (PIL/opencv), not
    present in this container. Deterministic fake: 4 moments of the raw
    bytes, so the pipeline shape is testable end-to-end."""
    if not content:
        return [0.0, 0.0, 0.0, 0.0]
    n = float(len(content))
    s = float(sum(content))
    mx = float(max(content))
    mn = float(min(content))
    return [n, s / n, mx, mn]


def _decode_audio(content: bytes) -> list[float]:
    """STUB — real implementation needs an audio codec. See _decode_image."""
    raise NotImplementedError("audio decode requires an audio codec library")


DECODERS: dict[str, Callable[[bytes], list[float]]] = {
    "image/png": _decode_image,
    "image/jpeg": _decode_image,
    "audio/wav": _decode_audio,
}


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over a media table.

    Unknown mimes produce a null feature (kept, so downstream can audit
    coverage); decode errors are not swallowed — a poisoned blob should
    fail the task, not silently skew the corpus.
    """

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for mime, content in zip(pdf["mime"], pdf["content"]):
                fn = DECODERS.get(mime)
                feats.append(fn(bytes(content)) if fn and content is not None else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.repartition("mime").mapInPandas(per_batch, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """STUB-backed image resize over mapInPandas.

    Real implementation needs an image codec (not in this container); the
    deterministic fake truncates/tiles the byte payload to width*height
    bytes so batch shapes, schema, and byte-handling are exercised
    end-to-end. The Spark-side plumbing (Arrow batches of binary columns,
    explicit output schema) is exactly what the real decoder drops into.
    """
    target = width * height

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes = []
            for content in pdf["content"]:
                b = bytes(content) if content is not None else b""
                tiled = (b * (target // max(len(b), 1) + 1))[:target] if b else bytes(target)
                out_bytes.append(tiled)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "content": out_bytes,
                }
            )

    return media.mapInPandas(per_batch, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 16, max_frames: int = 4) -> DataFrame:
    """STUB-backed video frame sampling: 1→N rows per media item via
    mapInPandas (a flat-map over Arrow batches). The fake treats each
    ``every_n_bytes`` slice as a 'frame'; a real decoder would demux the
    container and decode key frames — same plumbing, same schema."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                for i in range(min(max_frames, max(len(b) // every_n_bytes, 0))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(per_batch, schema=FRAME_SCHEMA)


def synthetic_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic in-memory media fixture (no external files needed)."""
    rows = [
        (
            i,
            f"mem://media/{i}",
            "image/png" if i % 3 else "application/octet-stream",
            bytes([(i * 7 + j) % 256 for j in range(32 + i % 16)]),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
