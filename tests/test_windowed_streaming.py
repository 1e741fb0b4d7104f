"""Event-time windowed aggregation: streaming ≡ batch, watermark wired."""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.generator import (
    GeneratorConfig,
    envelopes_df,
    write_envelope_jsonl,
)
from aws_dms_cdc_data_pipeline_spark.sources.envelope_stream import (
    read_envelope_stream,
)
from aws_dms_cdc_data_pipeline_spark.streaming.windows import (
    windowed_operation_counts,
)

CFG = GeneratorConfig(n_rows=120, update_fraction=0.3, delete_fraction=0.1,
                      shuffle_fraction=0.3)


def test_streaming_windows_match_batch(spark, tmp_path):
    src = str(tmp_path / "wire")
    write_envelope_jsonl(CFG, src, files=3)

    stream = read_envelope_stream(spark, src, max_files_per_trigger=1)
    counts = windowed_operation_counts(
        stream.filter(~F.col("_corrupt")), window_duration="5 minutes"
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        map(str, spark.sql("SELECT * FROM win_counts").collect())
    )
    want = sorted(
        map(str, windowed_operation_counts(
            envelopes_df(spark, CFG), window_duration="5 minutes"
        ).collect())
    )
    assert got == want and len(got) > 0


def test_streaming_session_windows_match_batch(spark, tmp_path):
    from aws_dms_cdc_data_pipeline_spark.streaming.windows import (
        session_activity,
    )

    src = str(tmp_path / "wire_sess")
    write_envelope_jsonl(CFG, src, files=3)

    stream = read_envelope_stream(spark, src, max_files_per_trigger=1)
    sessions = session_activity(
        stream.filter(~F.col("_corrupt")), gap="10 minutes"
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(str, spark.sql("SELECT * FROM sess_counts").collect()))

    batch = envelopes_df(spark, CFG)
    want = sorted(map(str, session_activity(batch, gap="10 minutes").collect()))
    assert got == want
    assert len(got) > 0
