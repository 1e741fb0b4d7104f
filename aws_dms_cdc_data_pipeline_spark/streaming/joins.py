"""Streaming joins: stream-stream (watermarked) and stream-static.

The two join shapes Structured Streaming supports beyond foreachBatch:

- **stream-static**: every micro-batch hash-joins against a batch
  DataFrame (dimension enrichment). No state, no watermark; the
  static side is re-resolved per batch, so slowly-changing dims pick
  up updates on the next trigger.
- **stream-stream**: both sides buffer in the state store until the
  watermark + time-range condition proves no more matches can arrive.
  The event-time constraint is mandatory for state cleanup — an
  unconstrained stream-stream join grows state forever.

Both reuse the CDC envelope stream; semantics mirror the same joins
run in batch over the same data (the oracle the tests assert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_static(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static enrichment join (broadcast-sized dim in practice)."""
    return stream.join(dim, on, "left")


def correlate_ops_within(
    envelopes: DataFrame,
    *,
    left_op: str = "insert",
    right_op: str = "update",
    key: str = "data.trans_id",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Pair each ``left_op`` record with ``right_op`` records for the
    same key arriving within ``within`` AFTER it (stream-stream inner
    join with the event-time constraint that bounds join state).

    Works identically on batch envelope frames (no watermark applied)
    — that run is the oracle for the streaming one.
    """
    left = envelopes.filter(F.col("metadata.operation") == left_op).select(
        F.col(key).alias("k"),
        F.col("metadata.timestamp").alias("l_ts"),
        F.col("doc_id").alias("l_doc"),
    )
    right = envelopes.filter(F.col("metadata.operation") == right_op).select(
        F.col(key).alias("r_k"),
        F.col("metadata.timestamp").alias("r_ts"),
        F.col("doc_id").alias("r_doc"),
    )
    if left.isStreaming:
        left = left.withWatermark("l_ts", watermark)
        right = right.withWatermark("r_ts", watermark)
    cond = (
        (left.k == right.r_k)
        & (right.r_ts >= left.l_ts)
        & (right.r_ts <= left.l_ts + F.expr(f"INTERVAL {within}"))
    )
    return left.join(right, cond).select(
        "k", "l_ts", "l_doc", "r_ts", "r_doc"
    )
