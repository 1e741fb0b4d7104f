"""Streaming change-point monitor (streaming/changepoint.py): alert
on a planted step, stream≡batch bucket parity, replay idempotence."""

import glob
import os

from pyspark.sql import functions as F


def _events(spark, n_days, step_at, lo=2.0, hi=9.0, month=3):
    rows = []
    for d in range(n_days):
        base = lo if d < step_at else hi
        for j in range(3):
            rows.append((f"2024-{month:02d}-{1 + d:02d} 0{j}:00:00",
                         base + (j - 1) * 0.25))
    return spark.createDataFrame(rows, "ts_s string, value double").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )


def test_change_point_monitor_alerts_and_matches_batch(spark, tmp_path):
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import (
        change_point_agg,
    )
    from aws_dms_cdc_data_pipeline_spark.streaming.changepoint import (
        ChangePointConfig,
        current_buckets,
        start_change_point_monitor,
    )

    events = _events(spark, n_days=14, step_at=8)
    src = str(tmp_path / "src")
    # several files so availableNow processes real micro-batches
    events.repartition(4).write.json(src)
    cfg = ChangePointConfig(
        state_path=str(tmp_path / "state"),
        alerts_path=str(tmp_path / "alerts"),
        checkpoint_path=str(tmp_path / "ckpt"),
        min_buckets=5,
        min_stat=1.0,
    )
    stream = (
        spark.readStream.schema("ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    start_change_point_monitor(spark, stream, cfg).awaitTermination()

    # stream-maintained buckets == batch daily aggregation, exactly
    got = {r["day"]: r["_m"] for r in current_buckets(spark, cfg).collect()}
    from aws_dms_cdc_data_pipeline_spark.operators.retrieval import _ES_FP
    ref = {
        r["day"]: r["_m"]
        for r in events.select(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd")
            .alias("day"),
            F.round(F.col("value") * _ES_FP, 0).cast("long").alias("_vq"),
        ).groupBy("day").agg(F.sum("_vq").cast("long").alias("_m")).collect()
    }
    assert got == ref

    # the last alert matches the batch agg on the full data
    alert_dirs = sorted(glob.glob(os.path.join(cfg.alerts_path, "batch_id=*")))
    assert alert_dirs, "no alert emitted for a planted step"
    last = spark.read.parquet(alert_dirs[-1]).collect()[0]
    batch = change_point_agg(events).collect()[0]
    assert last["change_day"] == batch["change_day"] == "2024-03-08"
    assert last["stat"] == batch["stat"]
    assert last["direction"] == "up"

    # replay on the same checkpoint: a no-op (no new state dirs, no
    # new alerts, bucket series unchanged)
    n_state = len(glob.glob(os.path.join(cfg.state_path, "batch_id=*")))
    start_change_point_monitor(
        spark,
        spark.readStream.schema("ts timestamp, value double").json(src),
        cfg,
    ).awaitTermination()
    assert len(glob.glob(os.path.join(cfg.state_path, "batch_id=*"))) == n_state
    assert len(glob.glob(os.path.join(cfg.alerts_path, "batch_id=*"))) == len(
        alert_dirs
    )
    assert {r["day"]: r["_m"]
            for r in current_buckets(spark, cfg).collect()} == ref


def test_change_point_monitor_threshold_gates_alerts(spark, tmp_path):
    from aws_dms_cdc_data_pipeline_spark.streaming.changepoint import (
        ChangePointConfig,
        start_change_point_monitor,
    )

    flat = _events(spark, n_days=8, step_at=8, month=4)  # no step
    src = str(tmp_path / "src2")
    flat.write.json(src)
    cfg = ChangePointConfig(
        state_path=str(tmp_path / "state2"),
        alerts_path=str(tmp_path / "alerts2"),
        checkpoint_path=str(tmp_path / "ckpt2"),
        min_buckets=5,
        min_stat=1.0,
    )
    stream = spark.readStream.schema("ts timestamp, value double").json(src)
    start_change_point_monitor(spark, stream, cfg).awaitTermination()
    assert not glob.glob(os.path.join(cfg.alerts_path, "batch_id=*"))
