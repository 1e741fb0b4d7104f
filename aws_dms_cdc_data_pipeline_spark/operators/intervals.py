"""Interval union / coverage per key (merge overlapping intervals).

The measure-of-union problem behind "how much wall-clock was this
user actually active", ad-break coverage, and SLA uptime math:
each row contributes a half-open interval ``[start, start + dur)``;
overlapping or touching intervals within a key merge into islands,
and the key's coverage is the summed length of its islands.

Spark-first shape (one shuffle, windows only):

- Everything runs in epoch-microsecond longs — interval arithmetic
  is integer-exact and cross-engine portable (no timestamp
  intervals, no doubles).
- One window pass ordered by (start, end) computes the running max
  of *previous* ends per key; a row opens a new island iff its
  start exceeds that max (strictly — touching intervals merge).
  A running sum of the open-flags numbers the islands. This is the
  classic sweep-line, expressed as two stacked window functions
  over the SAME (key, order) partitioning, so Catalyst plans a
  single Exchange + Sort and both windows (plus the final groupBys)
  reuse it.
- Within an island the union is contiguous by construction, so
  island coverage = max(end) - min(start): no per-pair overlap
  arithmetic, no self-join, nothing quadratic. 100 TB shape: cost
  is one hash exchange of the fact rows on the key plus a per-key
  sort — the same bill sessionization pays, and AQE handles skewed
  keys.
- Tie-robustness: rows with equal (start, end) order arbitrarily,
  but the open-flag compares only against the running max of ends,
  which is identical under any permutation of ties — island ids and
  coverage are deterministic.

Reference parity note: the reference pipeline has no interval
algebra (it is CDK wiring — see SURVEY.md §2.4/A6 [absent]); this
is part of the engine's §2.7 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_us_col: str,
    end_us_col: str,
) -> DataFrame:
    """Per-key merged-interval stats over ``[start_us, end_us)`` longs.

    Returns one row per key: ``n_intervals`` (input rows),
    ``n_islands`` (merged runs), ``covered_us`` (measure of the
    union). Rows with NULL or empty/negative intervals
    (``end <= start``) are ignored — a zero-length interval covers
    nothing and must not glue two neighbours together.
    """
    base = df.filter(
        F.col(start_us_col).isNotNull()
        & F.col(end_us_col).isNotNull()
        & (F.col(end_us_col) > F.col(start_us_col))
    ).select(
        F.col(key_col).alias("_k"),
        F.col(start_us_col).alias("_s"),
        F.col(end_us_col).alias("_e"),
    )
    order = Window.partitionBy("_k").orderBy("_s", "_e")
    prev_max_end = F.max("_e").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max_end.isNull() | (F.col("_s") > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    flagged = base.withColumn("_open", opens)
    island = flagged.withColumn(
        "_island",
        F.sum("_open").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = island.groupBy("_k", "_island").agg(
        F.count(F.lit(1)).alias("_rows"),
        F.min("_s").alias("_lo"),
        F.max("_e").alias("_hi"),
    )
    return per_island.groupBy("_k").agg(
        F.sum("_rows").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("_hi") - F.col("_lo")).cast("long").alias("covered_us"),
    ).withColumnRenamed("_k", key_col)
