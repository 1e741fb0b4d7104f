"""Multimodal columns: image/audio/video as opaque binary + metadata.

The Spark-side plumbing is real and tested — schema, Arrow batch
shape, partitioning — while the actual media decode is stubbed
(image/audio libraries are not in this container): ``decode_image``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake "decode" derived from the bytes stands in so the
pipeline shape can be exercised end-to-end.

Pattern: ``mapInPandas`` over batches of (id, media binary, mime) —
the decode/resize/feature step is embarrassingly parallel, so the
operator inherits whatever partitioning the source has; no shuffle.
Feature vectors come back as ``array<float>`` ready for
operators/similarity.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Test shim: treat document text bytes as opaque media payloads.

    Gives the binary-column plumbing something deterministic to chew
    on until a real media source is wired in.
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.create_map(F.lit("origin"), F.lit("documents.text")).alias("meta"),
    )


def _decode_real(content: bytes, mime: str):
    raise NotImplementedError(
        "media decode needs an image/audio library not present in this "
        "environment; pass fake=True for the deterministic stand-in"
    )


def _decode_fake(content: bytes, dim: int) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: pseudo width/height + a feature
    vector from byte statistics. Stable across runs and machines.

    Each feature slot accumulates an INTEGER byte sum (exact in any
    order) and divides once at the end — a single IEEE op per slot, so
    the values are bit-reproducible by any engine that can sum bytes
    (the DuckDB oracle mirrors this from hex(blob)).
    """
    n = len(content)
    width = (n % 640) + 1
    height = (n % 480) + 1
    sums = [0] * dim
    for i, byte in enumerate(content):
        sums[i % dim] += byte
    return width, height, [s / 255.0 for s in sums]


def extract_features(
    media: DataFrame, *, dim: int = 16, batch_hint: int | None = None,
    fake: bool = False
) -> DataFrame:
    """Decode + featurize each media blob via mapInPandas.

    Arrow streams batches of the binary column into Python; each
    batch yields one output frame — constant memory per task
    regardless of table size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "byte_len": [], "width": [], "height": [],
                   "features": []}
            for mid, content, mime in zip(pdf["media_id"], pdf["content"], pdf["mime"]):
                if content is None:
                    out["media_id"].append(mid)
                    out["byte_len"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["features"].append(None)
                    continue
                blob = bytes(content)
                if fake:
                    w, h, feats = _decode_fake(blob, dim)
                else:
                    w, h, feats = _decode_real(blob, mime)  # pragma: no cover
                out["media_id"].append(mid)
                out["byte_len"].append(len(blob))
                out["width"].append(w)
                out["height"].append(h)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("frame_features", T.ArrayType(T.FloatType()), True),
    ]
)


def sample_frames(
    media: DataFrame, *, frame_bytes: int = 64, stride: int = 2, dim: int = 8,
    fake: bool = False
) -> DataFrame:
    """Frame-sample each media blob: every ``stride``-th chunk of
    ``frame_bytes`` becomes one output row with its own feature vector.

    The 1:N (video → frames) operator shape: mapInPandas yields more
    rows than it consumes, still shuffle-free and constant-memory per
    Arrow batch. A real decoder would seek keyframes; the fake path
    slices the byte stream deterministically so the plumbing (schema,
    fan-out ratio, per-frame features) is fully testable here.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame": [],
                   "frame_features": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                if not fake:  # pragma: no cover
                    _decode_real(bytes(content), "video/*")
                blob = bytes(content)
                n_frames = max(1, len(blob) // frame_bytes)
                for idx in range(0, n_frames, stride):
                    frame = blob[idx * frame_bytes:(idx + 1) * frame_bytes]
                    _, _, feats = _decode_fake(frame, dim)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame"].append(frame)
                    out["frame_features"].append(feats)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FRAME_SCHEMA)
