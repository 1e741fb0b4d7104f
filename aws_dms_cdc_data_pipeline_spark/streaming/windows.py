"""Event-time windowed streaming aggregation with watermarking (T3).

The reference buffers on processing time only (Firehose 60 s/1 MB —
firehose.py:139-142) and re-sorts on event time at query; a
Spark-native engine can do better: tumbling event-time windows over
``metadata.timestamp`` with a watermark bounding how long state waits
for stragglers (we default to 24 h, mirroring the stream's replay
retention — reference kds.py:24).

Late data inside the watermark lands in its correct window; beyond
it, state is finalized and the record dropped from the aggregation
(it still reaches the archive/state sinks, which are append/upsert
and need no watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "24 hours"  # = Kinesis retention, reference kds.py:24


def windowed_operation_counts(
    envelopes: DataFrame,
    *,
    window_duration: str = "1 minute",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per-window, per-operation event counts over the envelope stream.

    Works identically on a streaming or batch envelope frame — the
    batch run is the oracle for the streaming one (watermarking only
    changes what a stream may still revise, not finalized values).
    """
    src = envelopes.select(
        F.col("metadata.timestamp").alias("event_ts"),
        F.col("metadata.`operation`").alias("operation"),
    )
    if src.isStreaming:
        src = src.withWatermark("event_ts", watermark)
    return (
        src.groupBy(F.window("event_ts", window_duration), "operation")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "operation",
            "n",
        )
    )


def session_activity(
    envelopes: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per-key SESSION windows over the envelope stream (E26's
    streaming leg): events for one primary key group into sessions
    that close after ``gap`` of event-time silence.

    Built on the native ``session_window`` aggregation, so streaming
    state is bounded by the watermark and merged incrementally by the
    engine (dynamic-gap merge, map-side partials) — no custom state
    handler. Works identically on a batch frame, which is the oracle
    in tests (same function, same answer).
    """
    src = envelopes.select(
        F.col("metadata.timestamp").alias("event_ts"),
        F.col("data.trans_id").alias("trans_id"),
    )
    if src.isStreaming:
        src = src.withWatermark("event_ts", watermark)
    return (
        src.groupBy(F.session_window("event_ts", gap), "trans_id")
        .agg(F.count("*").alias("n_changes"))
        .select(
            "trans_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_changes",
        )
    )
