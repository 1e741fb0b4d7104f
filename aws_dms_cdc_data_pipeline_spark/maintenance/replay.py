"""DLQ replay — the operational loop that closes S7.

The stream dead-letters two kinds of records
(streaming/pipeline.py): malformed wire lines under
``error/batch_id=N/parse/`` and envelopes whose delivery exhausted
the bounded retry budget under ``error/batch_id=N/delivery/``. Both
carry the ORIGINAL wire payload in a ``raw`` column precisely so an
operator can replay them after fixing the cause (parser bug,
downstream outage) — this job is that replay:

- ``delivery`` records are known-good keyed envelopes: re-parse the
  stored JSON and MERGE them into the state store (idempotent — the
  per-key ranking makes a double replay a no-op, T1).
- ``parse`` records re-run the SAME permissive parser the stream
  uses; lines that now parse merge like any envelope, lines that are
  still malformed are re-dead-lettered in place (atomic rewrite), so
  nothing is ever dropped silently.

Consumed batch directories are cleared on success; the job is safe
to run repeatedly and concurrently with the stream (the store merge
is the same idempotent path the stream uses).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark import schema as S
from aws_dms_cdc_data_pipeline_spark.sinks.state_store import StateStore


def replay_dlq(spark: SparkSession, error_path: str, store: StateStore) -> dict:
    """Replay every dead-lettered record under ``error_path`` into
    ``store``. Returns counts: ``delivery_replayed``,
    ``parse_replayed``, ``still_corrupt``.
    """
    out = {"delivery_replayed": 0, "parse_replayed": 0, "still_corrupt": 0}

    delivery_dirs = sorted(glob.glob(os.path.join(error_path, "batch_id=*", "delivery")))
    parse_dirs = sorted(glob.glob(os.path.join(error_path, "batch_id=*", "parse")))

    raw_schema = "raw string"
    if delivery_dirs:
        raw = spark.read.schema(raw_schema).json(delivery_dirs)
        env = raw.select(
            F.from_json(F.col("raw"), S.KEYED_ENVELOPE_SCHEMA).alias("_e")
        ).select("_e.data", "_e.metadata", "_e.doc_id")
        n = env.count()
        if n:
            store.merge(env)
        out["delivery_replayed"] = n
        for d in delivery_dirs:
            shutil.rmtree(d, ignore_errors=True)

    if parse_dirs:
        raw = spark.read.schema(raw_schema).json(parse_dirs)
        parsed = raw.select(
            "raw",
            F.from_json(F.col("raw"), S.KEYED_ENVELOPE_SCHEMA).alias("_e"),
        ).withColumn(
            "_ok",
            F.col("_e.metadata").isNotNull() & F.col("_e.doc_id").isNotNull(),
        )
        parsed = parsed.persist()
        try:
            good = parsed.filter(F.col("_ok")).select(
                "_e.data", "_e.metadata", "_e.doc_id"
            )
            bad = parsed.filter(~F.col("_ok")).select(
                "raw",
                F.lit("parse-error").alias("error"),
                F.current_timestamp().alias("dead_lettered_at"),
            )
            n_good = good.count()
            n_bad = bad.count()
            if n_good:
                store.merge(good)
            # atomic-enough rewrite: stage the survivors, then swap the
            # per-batch parse dirs for a single consolidated one
            retry_dir = os.path.join(error_path, "batch_id=replay", "parse")
            if n_bad:
                staging = retry_dir + ".tmp"
                shutil.rmtree(staging, ignore_errors=True)
                bad.write.mode("overwrite").json(staging)
                shutil.rmtree(retry_dir, ignore_errors=True)
                os.replace(staging, retry_dir)
            for d in parse_dirs:
                if os.path.abspath(d) != os.path.abspath(retry_dir):
                    shutil.rmtree(d, ignore_errors=True)
            if not n_bad:
                shutil.rmtree(retry_dir, ignore_errors=True)
            out["parse_replayed"] = n_good
            out["still_corrupt"] = n_bad
        finally:
            parsed.unpersist()

    return out


__all__ = ["replay_dlq"]
