"""S5 — the upsert-style "index" store (OpenSearch analog).

The reference bulk-indexes every envelope into a fixed OpenSearch
index with doc-id = shard sequence number (firehose.py:114-155,
README.md:457); the queryable "table" is the latest version per
primary key. Our store keeps that semantic with plain Parquet +
an atomically-swapped version pointer — a compacted changelog:

  state/v=N/   latest *envelope* per key (incl. delete tombstones)
  state/_VERSION  text file naming the live version

Merge of a new micro-batch = current_state(old ∪ batch) keyed by PK —
pure window dedup, one shuffle on the key, size bounded by #live keys
(not log length), so each merge is O(state + batch) and embarrassingly
parallel. Replayed batches are idempotent because re-delivered
records carry the same doc_id and per-key ranking is deterministic
(T1). On a real deployment this class is replaced 1:1 by a Delta/
Iceberg ``MERGE INTO`` (same logical plan, transactional commit);
the pointer-swap is the minimal standalone equivalent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark import schema as S
from aws_dms_cdc_data_pipeline_spark.operators.upsert import current_state


class StateStore:
    def __init__(self, spark: SparkSession, path: str, key: str = "data.trans_id"):
        self.spark = spark
        self.path = path
        self.key = key
        os.makedirs(path, exist_ok=True)

    # -- version pointer ---------------------------------------------------
    @property
    def _version_file(self) -> str:
        return os.path.join(self.path, "_VERSION")

    def version(self) -> int:
        try:
            with open(self._version_file) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def _vdir(self, v: int) -> str:
        return os.path.join(self.path, f"v={v}")

    # -- read --------------------------------------------------------------
    def envelopes(self) -> DataFrame | None:
        """Latest envelope per key, including delete tombstones."""
        v = self.version()
        if v < 0:
            return None
        return self.spark.read.parquet(self._vdir(v))

    def table(self) -> DataFrame:
        """The analyst-facing current-state table (live rows only)."""
        env = self.envelopes()
        if env is None:
            return self.spark.createDataFrame([], S.DATA_SCHEMA)
        return env.filter(F.col("metadata.operation") != F.lit(S.OP_DELETE)).select(
            "data.*"
        )

    # -- write -------------------------------------------------------------
    def merge(self, batch_envelopes: DataFrame) -> int:
        """Upsert one micro-batch of keyed envelopes; returns new version."""
        old = self.envelopes()
        cols = ["data", "metadata", "doc_id"]
        merged_src = batch_envelopes.select(*cols)
        if old is not None:
            merged_src = old.select(*cols).unionByName(merged_src)
        # keep tombstones so a late pre-delete change can't resurrect the row
        latest = _latest_envelope(merged_src, self.key)
        new_v = self.version() + 1
        latest.write.mode("overwrite").parquet(self._vdir(new_v))
        tmp = self._version_file + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(new_v))
        os.replace(tmp, self._version_file)  # atomic pointer swap
        return new_v


def _latest_envelope(envelopes: DataFrame, key: str) -> DataFrame:
    """current_state minus the delete-filter/projection: full envelopes."""
    from pyspark.sql import Window

    order = [
        F.col("metadata.timestamp").desc(),
        F.col(S.meta("transaction-id")).desc(),
        F.col("doc_id").desc(),
    ]
    w = Window.partitionBy(F.col(key)).orderBy(*order)
    return (
        envelopes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


__all__ = ["StateStore", "current_state"]
