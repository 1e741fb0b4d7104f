"""Streaming change-point monitor — the live leg of the E195
``change_point`` aggregation (operators/retrieval.py).

The Discover alerting question "did this metric just shift?" cannot
wait for a batch sweep: the monitor maintains the DAILY bucket series
incrementally (per micro-batch work is one map-side-combined partial
aggregation over the batch — never a rescan of history) and re-runs
only the bounded argmax pass (≤ days rows) per trigger, appending an
alert row whenever the split statistic clears the caller's threshold
on enough buckets.

Idempotence — the archive-partition contract (streaming/pipeline.py
precedent): per-batch partials land under
``state_path/batch_id=N/`` and alert rows under
``alerts_path/batch_id=N/``, each written with ``mode("overwrite")``
on that batch's OWN directory, so a replayed epoch rewrites
byte-identical content instead of duplicating. The bucket read side
re-aggregates partials by day, which makes the maintained series
EXACTLY equal to the batch aggregation over all rows seen — the
parity the test asserts.

Scale shape: state is one partial row per (batch, active day) —
bounded by days, not rows; the per-trigger detection pass is the
same bounded bucket-series scan the batch agg runs. The raw stream
never accumulates anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ChangePointConfig:
    state_path: str
    alerts_path: str
    checkpoint_path: str
    ts_col: str = "ts"
    value_col: str = "value"
    min_buckets: int = 6
    min_stat: float = 0.0
    trigger_seconds: int | None = None  # None → availableNow


def _partial(batch_df: DataFrame, cfg: ChangePointConfig) -> DataFrame:
    """Micro-batch → (day, _m, _n) quantized partials (the same
    6-dp quantization + missing-value contract as the batch agg)."""
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import _ES_FP

    v = F.col(cfg.value_col).cast("double")
    ok = v.isNotNull() & ~F.isnan(v) & (F.abs(v) != F.lit(float("inf")))
    return (
        batch_df.filter(ok & F.col(cfg.ts_col).isNotNull())
        .select(
            F.date_format(F.col(cfg.ts_col).cast("date"), "yyyy-MM-dd")
            .alias("day"),
            F.round(v * _ES_FP, 0).cast("long").alias("_vq"),
        )
        .groupBy("day")
        .agg(
            F.sum("_vq").cast("long").alias("_m"),
            F.count(F.lit(1)).cast("long").alias("_n"),
        )
    )


def current_buckets(spark, cfg: ChangePointConfig) -> DataFrame:
    """The maintained (day, _m) series: partials re-aggregated by day
    — exact long sums, so the series equals the batch aggregation
    over every row the monitor has seen."""
    return (
        spark.read.option("basePath", cfg.state_path)
        .parquet(f"{cfg.state_path}/batch_id=*")
        .groupBy("day")
        .agg(F.sum("_m").cast("long").alias("_m"))
    )


def detect(spark, cfg: ChangePointConfig) -> DataFrame:
    """Run the bounded argmax pass over the maintained series (the
    exact batch semantics via change_point_over_buckets)."""
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        change_point_over_buckets,
    )

    return change_point_over_buckets(current_buckets(spark, cfg))


def start_change_point_monitor(spark, stream_df: DataFrame,
                               cfg: ChangePointConfig):
    """Attach the monitor to an event stream. Each trigger: write the
    batch's partials (idempotent per-batch dir), re-detect over the
    maintained series, and append an alert row when the statistic
    clears ``min_stat`` on ≥ ``min_buckets`` buckets."""
    import os

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        _partial(batch_df, cfg).write.mode("overwrite").parquet(
            os.path.join(cfg.state_path, f"batch_id={batch_id}")
        )
        best = detect(batch_df.sparkSession, cfg).collect()
        if not best:
            return
        r = best[0]
        if (int(r["n_buckets"]) >= cfg.min_buckets
                and float(r["stat"]) >= cfg.min_stat):
            alert = batch_df.sparkSession.createDataFrame(
                [(
                    r["change_day"], int(r["split_index"]),
                    int(r["n_buckets"]), float(r["stat"]),
                    float(r["left_mean"]), float(r["right_mean"]),
                    r["direction"],
                )],
                "change_day string, split_index long, n_buckets long, "
                "stat double, left_mean double, right_mean double, "
                "direction string",
            )
            alert.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(cfg.alerts_path, f"batch_id={batch_id}")
            )

    writer = (
        stream_df.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", cfg.checkpoint_path)
    )
    if cfg.trigger_seconds is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{cfg.trigger_seconds} seconds")
    return writer.start()


__all__ = [
    "ChangePointConfig",
    "start_change_point_monitor",
    "current_buckets",
    "detect",
]
