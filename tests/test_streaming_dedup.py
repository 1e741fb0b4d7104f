"""Streaming exact dedup: stream ≡ batch, duplicates collapse (E39,
streaming/dedup.py — watermark-bounded dropDuplicatesWithinWatermark)."""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.generator import (
    GeneratorConfig,
    envelopes_df,
    write_envelope_jsonl,
)
from aws_dms_cdc_data_pipeline_spark.sources.envelope_stream import (
    read_envelope_stream,
)
from aws_dms_cdc_data_pipeline_spark.streaming.dedup import dedup_stream

# duplicate_fraction plants genuine wire re-deliveries (same doc_id)
CFG = GeneratorConfig(n_rows=100, update_fraction=0.3, delete_fraction=0.1,
                      duplicate_fraction=0.3, shuffle_fraction=0.3)


def _prep(env):
    if "_corrupt" in env.columns:  # wire parse; batch frames are clean
        env = env.filter(~F.col("_corrupt"))
    return env.select("doc_id", F.col("metadata.timestamp").alias("event_ts"))


def test_stream_dedup_matches_batch_and_collapses_replays(spark, tmp_path):
    src = str(tmp_path / "wire")
    write_envelope_jsonl(CFG, src, files=4)

    stream = dedup_stream(_prep(read_envelope_stream(spark, src)))
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT doc_id FROM dedup_out")

    batch_env = _prep(envelopes_df(spark, CFG))
    want = dedup_stream(batch_env)

    # every id exactly once, and the stream saw real duplicates to drop
    assert got.count() == got.select("doc_id").distinct().count()
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in want.collect()
    )
    assert batch_env.count() > want.count(), "fixture planted no duplicates"
