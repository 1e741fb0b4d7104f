"""Stream-stream and stream-static joins ≡ the same joins in batch."""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.generator import (
    GeneratorConfig,
    envelopes_df,
    write_envelope_jsonl,
)
from aws_dms_cdc_data_pipeline_spark.sources.envelope_stream import (
    read_envelope_stream,
)
from aws_dms_cdc_data_pipeline_spark.streaming.joins import (
    correlate_ops_within,
    enrich_with_static,
)

CFG = GeneratorConfig(n_rows=80, update_fraction=0.5, delete_fraction=0.0,
                      shuffle_fraction=0.2)


def _rows(df):
    return sorted(map(str, df.collect()))


def test_stream_stream_join_matches_batch(spark, tmp_path):
    src = str(tmp_path / "wire")
    write_envelope_jsonl(CFG, src, files=3)
    stream = read_envelope_stream(spark, src, max_files_per_trigger=1).filter(
        ~F.col("_corrupt")
    )
    q = (
        correlate_ops_within(stream, within="1 hour")
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _rows(spark.sql("SELECT * FROM ss_join"))
    want = _rows(correlate_ops_within(envelopes_df(spark, CFG), within="1 hour"))
    assert got == want
    assert len(got) > 0  # updates within an hour of their insert exist


def test_stream_static_enrichment(spark, tmp_path):
    src = str(tmp_path / "wire")
    write_envelope_jsonl(GeneratorConfig(n_rows=30, update_fraction=0.0,
                                         delete_fraction=0.0), src, files=1)
    dim = spark.createDataFrame(
        [("pc", "desktop"), ("mobile", "handheld"), ("tablet", "handheld")],
        ["device", "form_factor"],
    )
    stream = (
        read_envelope_stream(spark, src)
        .filter(~F.col("_corrupt"))
        .select(F.col("data.trans_id").alias("trans_id"),
                F.col("data.device").alias("device"))
    )
    q = (
        enrich_with_static(stream, dim, "device")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM enriched")
    assert out.count() == 30
    assert out.filter(F.col("form_factor").isNull()).count() == 0
