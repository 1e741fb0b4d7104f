"""Streaming distinct-count sketches — the streaming leg of
operators/sketches.py's HLL rollup.

"Distinct users per hour, live" cannot be an exact streaming
COUNT(DISTINCT): exact distinct state grows with key cardinality and
Spark (correctly) refuses unbounded distinct state. The lakehouse
answer is the same one the batch side materializes: an HLL sketch per
event-time window, held as STREAMING AGGREGATION STATE. Spark's
native ``hll_sketch_agg`` is a typed imperative aggregate, so the
per-window state is the sketch itself — KB-bounded regardless of how
many users the window sees — and the watermark closes windows and
evicts their state.

Because HLL registers are max-merged, the sketch (and its estimate)
is insensitive to both arrival order and partitioning: the streamed
per-window estimate equals the batch estimate over the same rows
bit-for-bit, which is exactly what the parity test asserts.

The emitted rows carry the BINARY sketch alongside the estimate, so
downstream batch rollups (``operators/sketches.rollup_sketches``)
can union streamed hours into days/weeks without touching the fact
stream again — one pre-agg feeds both the live and the historical
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_distinct_sketches(
    stream_df: DataFrame,
    *,
    ts_col: str = "ts",
    distinct_expr: str = "user_id",
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
    lg_config_k: int = 12,
) -> DataFrame:
    """Windowed HLL sketches over an event-time stream.

    Append-mode compatible: the watermark finalizes each window once
    late data can no longer arrive, emitting ``(bucket, sketch,
    approx_distinct, n_rows)`` — the same shape as the batch
    ``bucket_sketches`` so the two legs are interchangeable inputs to
    ``rollup_sketches``.
    """
    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration).alias("w"))
        .agg(
            F.hll_sketch_agg(F.expr(distinct_expr), F.lit(lg_config_k)).alias(
                "sketch"
            ),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            "sketch",
            F.hll_sketch_estimate("sketch").cast("long").alias("approx_distinct"),
            "n_rows",
        )
    )


__all__ = ["streaming_distinct_sketches"]
