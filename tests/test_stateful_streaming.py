"""applyInPandasWithState: running totals ≡ batch aggregate, and state
survives across micro-batches.
"""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.generator import (
    GeneratorConfig,
    envelopes_df,
    write_envelope_jsonl,
)
from aws_dms_cdc_data_pipeline_spark.sources.envelope_stream import (
    read_envelope_stream,
)
from aws_dms_cdc_data_pipeline_spark.streaming.stateful import running_totals

CFG = GeneratorConfig(n_rows=60, update_fraction=0.3, delete_fraction=0.1,
                      duplicate_fraction=0.1)


def _run(spark, src, checkpoint, sink_name, max_files=None):
    stream = read_envelope_stream(spark, src, max_files_per_trigger=max_files)
    good = stream.filter(~F.col("_corrupt"))
    totals = running_totals(good, key_col="data.customer_id",
                            value_col="data.amount")
    q = (
        totals.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_running_totals_match_batch(spark, tmp_path):
    src = str(tmp_path / "wire")
    write_envelope_jsonl(CFG, src, files=4)
    _run(spark, src, str(tmp_path / "ckpt"), "totals_once")

    # last emitted row per key == final running state
    got = {
        r.key: (r.n_events, r.total)
        for r in spark.sql(
            """SELECT key, n_events, total FROM (
                 SELECT *, row_number() OVER (PARTITION BY key
                                              ORDER BY n_events DESC) rn
                 FROM totals_once) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.key: (r.n, r.total)
        for r in envelopes_df(spark, CFG)
        .groupBy(F.col("data.customer_id").cast("string").alias("key"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce(F.col("data.amount"), F.lit(0)).cast("double")).alias(
                "total"
            ),
        )
        .collect()
    }
    assert got == want


def test_state_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "wire")
    write_envelope_jsonl(CFG, src, files=4)
    # one file per trigger → 4 micro-batches against one state store
    _run(spark, src, str(tmp_path / "ckpt2"), "totals_multi", max_files=1)
    emitted = spark.sql("SELECT * FROM totals_multi")
    # keys seen in several batches emit strictly increasing n_events
    multi = (
        emitted.groupBy("key")
        .agg(F.count("*").alias("emissions"), F.max("n_events").alias("final_n"))
        .filter(F.col("emissions") > 1)
    )
    assert multi.count() > 0
    row = multi.orderBy(F.col("final_n").desc()).first()
    seq = [
        r.n_events
        for r in emitted.filter(F.col("key") == row.key)
        .orderBy("n_events")
        .collect()
    ]
    assert seq == sorted(set(seq)) and seq[-1] == row.final_n
