"""Bucketed table layout — co-located joins with zero shuffle.

At 100 TB the dominant cost of fact⋈fact joins is the shuffle. Spark's
answer is bucketing: both tables hash-clustered into the same number
of buckets on the join key at WRITE time, so at read time the join is
bucket-to-bucket with no Exchange (and with ``sortBy``, no Sort
either — a straight merge). This module wraps the saveAsTable plumbing
and is exercised by tests that assert the Exchange disappears from
the physical plan.

The CDC state store (sinks/state_store.py) applies the same idea on
its own files: pmod(hash(key), B) directories so merges touch only
affected buckets. This module is the catalog-table variant for the
analytics side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    Joins/aggregations on ``bucket_col`` between tables written with
    the same ``num_buckets`` run shuffle-free. Choose ``num_buckets``
    ≈ cluster cores × small factor at deployment scale.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
