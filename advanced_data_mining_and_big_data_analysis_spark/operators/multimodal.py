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
