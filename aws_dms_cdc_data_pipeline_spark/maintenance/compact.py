"""Archive compaction — the small-files answer for a 60 s trigger.

The S6 raw archive accretes one directory per micro-batch
(``archive/batch_id=N/year=.../hour=.../part-*.json``): ~1,440
batch dirs/day, each with up to shuffle-partitions tiny files. At
100 TB that layout destroys scan performance (file-listing dominates)
and NameNode/S3-LIST budgets. This job periodically rewrites a time
range into the canonical columnar archive:

  archive_compacted/year=Y/month=M/day=D/hour=H/part-*.parquet

- per-hour partitions are preserved (partition pruning intact),
- records dedup by doc_id (at-least-once delivery may leave a record
  in two batch dirs; doc_id is the idempotency key — T1 at rest),
- files are right-sized via ``maxRecordsPerFile`` instead of manual
  repartition math,
- parquet + column pruning replaces raw JSON for the analytical
  read path; the JSON batch dirs can be dropped after the compacted
  write commits (left to the caller's retention policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ARCHIVE_SCHEMA = "doc_id string, value string"


def read_archive(spark: SparkSession, archive_path: str) -> DataFrame:
    """Read the raw per-batch archive with its partition columns."""
    return (
        spark.read.schema(ARCHIVE_SCHEMA)
        .option("basePath", archive_path)
        .json(f"{archive_path}/batch_id=*/year=*/month=*/day=*/hour=*")
    )


def compact_archive(
    spark: SparkSession,
    archive_path: str,
    out_path: str,
    *,
    max_records_per_file: int = 1_000_000,
) -> int:
    """Rewrite the batch-dir archive as hour-partitioned parquet.

    Returns the number of distinct records written. One shuffle
    (partition-aligned repartition) so each hour partition is written
    by few tasks → few, large files.
    """
    raw = read_archive(spark, archive_path)
    deduped = raw.dropDuplicates(["doc_id"]).select(
        "year", "month", "day", "hour", "doc_id", "value"
    )
    (
        deduped.repartition("year", "month", "day", "hour")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("year", "month", "day", "hour")
        .parquet(out_path)
    )
    return spark.read.parquet(out_path).count()


def archive_file_count(spark: SparkSession, path: str, suffix: str) -> int:
    """Count data files under a path (test/ops helper)."""
    import glob
    import os

    return len(
        [p for p in glob.glob(os.path.join(path, "**", f"*{suffix}"), recursive=True)]
    )
