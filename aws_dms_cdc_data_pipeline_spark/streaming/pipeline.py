"""Phase-2 streaming pipeline: readStream → foreachBatch triple sink.

Mirrors the reference's delivery stage (SURVEY.md §3.1 steps 5-7):

- 60 s processing-time micro-batches (Firehose buffering hints,
  firehose.py:139-142; tests use ``availableNow`` for determinism),
- per batch: (a) idempotent MERGE into the current-state store
  (S5/T1), (b) raw append partitioned ``year/month/day/hour``
  (S6 — firehose.py:132-135's `{index}/YYYY/MM/dd/HH/` layout),
  (c) dead-letter failed/malformed records under ``error/``
  (S7 — firehose.py:134,150-152),
- checkpoint directory = the replication task's resume state
  (§3.3): stop + restart continues from the last committed batch.

Watermarking note (T3): the batch-merge semantics make late data a
non-issue for correctness — the per-key ranking window re-evaluates
with whatever has arrived, exactly like the reference's OpenSearch
re-sorting on event time at query. ``withWatermark`` only enters if
a user adds streaming event-time aggregations on top.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from aws_dms_cdc_data_pipeline_spark import schema as S
from aws_dms_cdc_data_pipeline_spark.operators.selection import select_table
from aws_dms_cdc_data_pipeline_spark.sinks.state_store import StateStore
from aws_dms_cdc_data_pipeline_spark.sources.envelope_stream import read_envelope_stream


@dataclass
class CdcStreamConfig:
    source_path: str          # JSONL wire files (Kinesis stand-in)
    sink_root: str            # root dir for state/ archive/ error/ checkpoint/
    schema_name: str = S.DEFAULT_SCHEMA_NAME
    table_name: str = S.DEFAULT_TABLE_NAME
    trigger_seconds: int | None = 60   # None → availableNow (tests/backfill)
    max_files_per_trigger: int | None = None

    @property
    def state_path(self) -> str:
        return os.path.join(self.sink_root, "state")

    @property
    def archive_path(self) -> str:
        return os.path.join(self.sink_root, "archive")

    @property
    def error_path(self) -> str:
        return os.path.join(self.sink_root, "error")

    @property
    def checkpoint_path(self) -> str:
        return os.path.join(self.sink_root, "checkpoint")


def _deliver(cfg: CdcStreamConfig, store: StateStore):
    """Build the foreachBatch delivery function."""

    def deliver(batch: DataFrame, epoch_id: int) -> None:
        batch = batch.persist()
        try:
            # S7: dead-letter malformed lines with failure metadata,
            # keyed by batch so a replayed epoch overwrites its own
            # previous (possibly partial) attempt instead of doubling.
            corrupt = batch.filter(F.col("_corrupt"))
            corrupt.select(
                F.col("_raw").alias("raw"),
                F.lit("parse-error").alias("error"),
                F.current_timestamp().alias("dead_lettered_at"),
            ).write.mode("overwrite").json(
                os.path.join(cfg.error_path, f"batch_id={epoch_id}")
            )

            good = batch.filter(~F.col("_corrupt")).drop("_raw", "_corrupt")
            selected = select_table(good, cfg.schema_name, cfg.table_name)

            # S6: raw hourly-partitioned archive of EVERY delivered
            # record (AllDocuments backup — selection happens after
            # backup in our layout too, matching firehose.py:153).
            # Partition axis = capture time (deterministic; the
            # reference uses Firehose arrival time, which is the same
            # axis one buffer later). Epoch subdir → idempotent replay.
            (
                good.withColumn("year", F.date_format("metadata.timestamp", "yyyy"))
                .withColumn("month", F.date_format("metadata.timestamp", "MM"))
                .withColumn("day", F.date_format("metadata.timestamp", "dd"))
                .withColumn("hour", F.date_format("metadata.timestamp", "HH"))
                .withColumn("value", F.to_json(F.struct("data", "metadata")))
                .select("year", "month", "day", "hour", "doc_id", "value")
                .repartition("year", "month", "day", "hour")
                .write.mode("overwrite")
                .partitionBy("year", "month", "day", "hour")
                .json(os.path.join(cfg.archive_path, f"batch_id={epoch_id}"))
            )

            # S5: idempotent upsert into the current-state store.
            store.merge(selected)
        finally:
            batch.unpersist()

    return deliver


def start_cdc_stream(spark: SparkSession, cfg: CdcStreamConfig) -> StreamingQuery:
    """Wire and start the CDC delivery stream."""
    stream = read_envelope_stream(
        spark, cfg.source_path, max_files_per_trigger=cfg.max_files_per_trigger
    )
    store = StateStore(spark, cfg.state_path)
    writer = (
        stream.writeStream.foreachBatch(_deliver(cfg, store))
        .option("checkpointLocation", cfg.checkpoint_path)
        .outputMode("update")
    )
    if cfg.trigger_seconds is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{cfg.trigger_seconds} seconds")
    return writer.start()


def run_cdc_backfill(spark: SparkSession, cfg: CdcStreamConfig) -> None:
    """T5 — process everything currently in the source, then stop
    (full-load-and-cdc's snapshot+tail collapses to availableNow).

    The caller's config is not mutated — reusing it afterwards to
    start a live stream keeps its original trigger cadence.
    """
    q = start_cdc_stream(spark, dataclasses.replace(cfg, trigger_seconds=None))
    q.awaitTermination()
