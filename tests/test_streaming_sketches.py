"""Streaming HLL windows: stream ≡ batch estimates, bounded state,
and streamed sketches feed the batch rollup."""

import os

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.sketches import (
    bucket_sketches,
    rollup_sketches,
)
from aws_dms_cdc_data_pipeline_spark.session import load_table
from aws_dms_cdc_data_pipeline_spark.streaming.sketches import (
    streaming_distinct_sketches,
)
from tests.conftest import SF_DIR_ORACLE


def _stream_events(spark, tmp_path, events, n_files=3):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    # split into files on a deterministic hash so triggers interleave
    # event-time (out-of-order arrival across micro-batches)
    events.withColumn(
        "_s", F.pmod(F.xxhash64("event_id"), F.lit(n_files))
    ).write.partitionBy("_s").mode("overwrite").parquet(src)
    return (
        spark.readStream.schema(
            spark.read.parquet(src).drop("_s").schema
        )
        .option("maxFilesPerTrigger", "4")
        .parquet(os.path.join(src, "_s=*"))
    )


def test_stream_matches_batch_estimates(spark, tmp_path):
    ev = load_table(spark, SF_DIR_ORACLE, "events").select(
        "event_id", "ts", "user_id"
    )
    stream = _stream_events(spark, tmp_path, ev)
    out = streaming_distinct_sketches(
        stream, window_duration="1 day", watermark_delay="0 seconds"
    )
    sink = str(tmp_path / "sink")

    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.read.parquet(sink)

    batch = bucket_sketches(ev, "date_trunc('day', ts)", "user_id").select(
        F.col("bucket"),
        F.hll_sketch_estimate("sketch").cast("long").alias("approx_distinct"),
        "n_rows",
    )
    got = {
        r["bucket"]: (r["approx_distinct"], r["n_rows"])
        for r in streamed.collect()
    }
    want = {
        r["bucket"]: (r["approx_distinct"], r["n_rows"])
        for r in batch.collect()
    }
    # append mode + availableNow: the final (unclosed) window may be
    # withheld by the watermark; every EMITTED window must match batch
    assert len(got) >= len(want) - 1 and got
    for b, v in got.items():
        assert v == want[b], f"window {b}: stream {v} != batch {want[b]}"


def test_streamed_sketches_roll_up_with_batch_operator(spark, tmp_path):
    ev = load_table(spark, SF_DIR_ORACLE, "events").select(
        "event_id", "ts", "user_id"
    )
    stream = _stream_events(spark, tmp_path, ev)
    out = streaming_distinct_sketches(
        stream, window_duration="1 day", watermark_delay="0 seconds"
    )
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.read.parquet(sink).withColumnRenamed("bucket", "day")

    weekly = rollup_sketches(
        streamed, "date_trunc('week', day)", rollup_alias="week"
    )
    emitted_days = [r["day"] for r in streamed.select("day").collect()]
    exact = (
        ev.filter(F.expr("date_trunc('day', ts)").isin(emitted_days))
        .groupBy(F.expr("date_trunc('week', date_trunc('day', ts))").alias("week"))
        .agg(F.countDistinct("user_id").alias("exact"))
    )
    ex = {r["week"]: r["exact"] for r in exact.collect()}
    for r in weekly.collect():
        rel = abs(r["approx_distinct"] - ex[r["week"]]) / ex[r["week"]]
        assert rel <= 0.05


def test_streaming_bottomk_equals_batch_bit_for_bit(spark, tmp_path):
    from aws_dms_cdc_data_pipeline_spark.operators.sketches import (
        bottomk_value_sketches,
    )
    from aws_dms_cdc_data_pipeline_spark.streaming.sketches import (
        streaming_bottomk_sketches,
    )

    ev = load_table(spark, SF_DIR_ORACLE, "events").select(
        "event_id", "ts", "value"
    )
    stream = _stream_events(spark, tmp_path, ev)
    out = streaming_bottomk_sketches(stream, k=128)
    sink = str(tmp_path / "sink")

    def deliver(batch, epoch_id):
        if batch.count():
            batch.write.mode("append").parquet(sink)

    q = (
        out.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # latest emission per window = the final sketch
    streamed_df = spark.read.parquet(sink)
    streamed_df.createOrReplaceTempView("_bk_sink")
    latest = spark.sql(
        """SELECT bucket, entries, n_rows FROM (
               SELECT *, max(n_rows) OVER (PARTITION BY bucket) AS mx
               FROM _bk_sink) WHERE n_rows = mx"""
    )
    streamed = {
        r["bucket"]: (tuple(map(tuple, r["entries"])), r["n_rows"])
        for r in latest.collect()
    }
    batch = {
        r["bucket"]: (tuple(map(tuple, r["entries"])), r["n_rows"])
        for r in bottomk_value_sketches(
            ev, "date_trunc('day', ts)", "value", "event_id", k=128
        ).collect()
    }
    assert streamed == batch  # bottom-k closure ⇒ bit-for-bit equality


def test_streaming_cms_equals_batch_bit_for_bit(spark, tmp_path):
    from aws_dms_cdc_data_pipeline_spark.operators.sketches import (
        cms_bucket_sketches,
        cms_estimate,
    )
    from aws_dms_cdc_data_pipeline_spark.streaming.sketches import (
        streaming_cms_sketches,
    )

    ev = load_table(spark, SF_DIR_ORACLE, "events").select(
        "event_id", "ts", "event_type"
    )
    stream = _stream_events(spark, tmp_path, ev)
    out = streaming_cms_sketches(stream, width=64, depth=3)
    sink = str(tmp_path / "sink")

    def deliver(batch, epoch_id):
        if batch.count():
            batch.write.mode("append").parquet(sink)

    q = (
        out.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed_df = spark.read.parquet(sink)
    streamed_df.createOrReplaceTempView("_cms_sink")
    latest = spark.sql(
        """SELECT bucket, cms, n_rows FROM (
               SELECT *, max(n_rows) OVER (PARTITION BY bucket) AS mx
               FROM _cms_sink) WHERE n_rows = mx"""
    )
    streamed = {
        r["bucket"]: (tuple(r["cms"]), r["n_rows"])
        for r in latest.collect()
    }
    batch_sk = cms_bucket_sketches(
        ev, "event_type", "date_trunc('day', ts)", width=64, depth=3
    )
    batch = {
        r["bucket"]: (tuple(r["cms"]), r["n_rows"])
        for r in batch_sk.collect()
    }
    assert streamed == batch  # CMS linearity ⇒ bit-for-bit equality

    # streamed grids feed the batch estimator interchangeably
    est = cms_estimate(
        spark.createDataFrame(
            [(b, list(g), n) for b, (g, n) in streamed.items()],
            "bucket timestamp, cms array<bigint>, n_rows bigint",
        ),
        ["click", "error"],
        width=64,
        depth=3,
    )
    exact = {
        (r["d"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.expr("date_trunc('day', ts)").alias("d"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in est.collect():
        assert r["est"] >= exact.get((r["bucket"], r["key"]), 0)
