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




def streaming_bottomk_sketches(
    stream_df,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    id_expr: str = "event_id",
    window_duration: str = "1 day",
    k: int = 512,
):
    """Streaming leg of the bottom-k quantile sketch
    (operators/sketches.py:bottomk_value_sketches).

    Per event-time window, state is the k smallest (xxhash64(id),
    value) entries — bounded at k structs per window no matter how
    many rows arrive, maintained in ``applyInPandasWithState``.
    Because bottom-k is exactly closed under union, the streamed
    sketch equals the batch sketch over the same rows BIT-FOR-BIT
    (asserted in tests), and the emitted rows feed
    ``rollup_quantiles`` interchangeably with batch-built sketches.

    Update mode: each trigger re-emits the window's current sketch
    (monotone refinement — downstream keeps the latest row per
    bucket, the same convention as the streaming heavy-hitters leg).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    import pandas as pd

    def update(key, pdfs, state: GroupState):
        if state.exists:
            hs, vs, n = state.get
            entries = list(zip(hs, vs))
        else:
            entries, n = [], 0
        for pdf in pdfs:
            n += len(pdf)
            entries.extend(zip(pdf["h"], pdf["v"]))
            entries = sorted(entries)[:k]
        state.update((
            [int(h) for h, _ in entries],
            [float(v) for _, v in entries],
            int(n),
        ))
        yield pd.DataFrame(
            {
                "bucket": [key[0]],
                "entries": [[(int(h), float(v)) for h, v in entries]],
                "n_rows": [int(n)],
            }
        )

    keyed = stream_df.select(
        F.window(ts_col, window_duration)["start"].alias("bucket"),
        F.xxhash64(F.expr(id_expr)).alias("h"),
        F.col(value_col).cast("double").alias("v"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=(
            "bucket timestamp, "
            "entries array<struct<h: bigint, v: double>>, n_rows bigint"
        ),
        stateStructType="hs array<bigint>, vs array<double>, n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )




def streaming_cms_sketches(
    stream_df,
    *,
    ts_col: str = "ts",
    key_expr: str = "event_type",
    window_duration: str = "1 day",
    width: int = 256,
    depth: int = 4,
):
    """Streaming leg of the count-min frequency sketch
    (operators/sketches.py:cms_bucket_sketches).

    Per event-time window, state is the dense depth·width counter
    grid — a fixed ≤ depth·width·8-byte array no matter how many rows
    or distinct keys arrive (the CMS point). Cell positions hash
    JVM-side (xxhash64, identical to the batch builder) BEFORE the
    stateful apply, so the Python worker only bincounts integer
    cells. Because the grid is LINEAR (element-wise sums), the
    streamed grid equals the batch grid over the same rows
    BIT-FOR-BIT regardless of arrival order or partitioning (asserted
    in tests), and emitted rows feed :func:`...sketches.cms_rollup` /
    ``cms_estimate`` interchangeably with batch-built sketches.

    Update mode: each trigger re-emits the window's current grid
    (monotone refinement — downstream keeps the latest row per
    bucket, the streaming bottom-k convention).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    import numpy as np
    import pandas as pd

    size = depth * width

    def update(key, pdfs, state: GroupState):
        if state.exists:
            cms_list, n = state.get
            grid = np.array(cms_list, dtype=np.int64)
        else:
            grid, n = np.zeros(size, dtype=np.int64), 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            cells = np.concatenate(pdf["cells"].to_numpy())
            grid += np.bincount(cells, minlength=size).astype(np.int64)
            n += len(pdf)
        state.update(([int(x) for x in grid], int(n)))
        yield pd.DataFrame(
            {
                "bucket": [key[0]],
                "cms": [[int(x) for x in grid]],
                "n_rows": [int(n)],
            }
        )

    k = F.expr(key_expr).cast("string")
    keyed = stream_df.select(
        F.window(ts_col, window_duration)["start"].alias("bucket"),
        F.array(
            *[
                (
                    F.lit(d * width)
                    + F.pmod(F.xxhash64(k, F.lit(d)), F.lit(width))
                ).cast("int")
                for d in range(depth)
            ]
        ).alias("cells"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType="bucket timestamp, cms array<bigint>, n_rows bigint",
        stateStructType="cms array<bigint>, n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


__all__ = [
    "streaming_bottomk_sketches",
    "streaming_cms_sketches",
    "streaming_distinct_sketches",
]
