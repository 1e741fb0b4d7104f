"""Streaming MG sketch: containment + deficit bounds, checkpoint resume."""

import os

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.streaming.heavyhitters import (
    streaming_heavy_hitter_candidates,
)

K = 8
SHARDS = 2


def _write_items(path, name, items):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for it in items:
            f.write(it + "\n")


def _run(spark, src, ckpt, sink_dir):
    # memory sink cannot recover from a checkpoint; foreachBatch +
    # append parquet supports exactly the restart we want to test
    stream = spark.readStream.format("text").load(src)
    out = streaming_heavy_hitter_candidates(stream, "value", k=K, num_shards=SHARDS)

    def deliver(batch, epoch_id):
        if batch.count():
            batch.write.mode("append").parquet(sink_dir)

    q = (
        out.writeStream.foreachBatch(deliver)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _latest_summaries(spark, sink_dir):
    df = spark.read.parquet(sink_dir)
    df.createOrReplaceTempView("_hh_sink")
    return spark.sql(
        """SELECT shard, item, est, shard_rows FROM (
              SELECT *, max(shard_rows) OVER (PARTITION BY shard) AS mx
              FROM _hh_sink) WHERE shard_rows = mx"""
    ).collect()


def test_containment_and_deficit_bound(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    hot = ["hot"] * 300
    warm = ["warm"] * 80
    noise = [f"n{i:04d}" for i in range(200)]
    # interleave across two files so state spans triggers
    stream1 = hot[:150] + noise[:100] + warm[:40]
    stream2 = hot[150:] + noise[100:] + warm[40:]
    sink = str(tmp_path / "sink")
    _write_items(src, "a.txt", stream1)
    _run(spark, src, ckpt, sink)
    _write_items(src, "b.txt", stream2)
    _run(spark, src, ckpt, sink)

    rows = _latest_summaries(spark, sink)
    items = {r["item"] for r in rows if r["item"] is not None}
    assert "hot" in items and "warm" in items  # containment

    # deficit bound: per shard, true_shard_count - est <= shard_rows / K
    true_counts = {"hot": 300, "warm": 80}
    per_shard_rows = {r["shard"]: r["shard_rows"] for r in rows}
    total_seen = sum(per_shard_rows.values())
    assert total_seen == len(stream1) + len(stream2)  # state resumed, not reset
    for r in rows:
        if r["item"] in true_counts:
            # est never exceeds truth, undercounts by <= shard budget
            assert r["est"] <= true_counts[r["item"]]
            assert true_counts[r["item"]] - r["est"] <= r["shard_rows"] / K

    # bounded state actually evicted: a shard never reports > K items
    from collections import Counter

    per_shard_items = Counter(
        r["shard"] for r in rows if r["item"] is not None
    )
    assert all(v <= K for v in per_shard_items.values())


def test_same_item_always_same_shard(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    _write_items(src, "a.txt", ["x", "y", "z"] * 30)
    _run(spark, src, ckpt, sink)
    rows = (
        spark.read.parquet(sink)
        .filter("item IS NOT NULL")
        .select("shard", "item")
        .distinct()
        .collect()
    )
    per_item = {}
    for r in rows:
        per_item.setdefault(r["item"], set()).add(r["shard"])
    assert all(len(s) == 1 for s in per_item.values())
