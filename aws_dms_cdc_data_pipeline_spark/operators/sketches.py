"""Re-aggregatable distinct-count sketches (HLL rollup).

The 100 TB problem this solves: "daily/weekly/monthly distinct
users" computed exactly forces a full rescan of the fact table per
granularity — COUNT(DISTINCT) does not re-aggregate (Σ daily
distincts ≠ weekly distinct). Datasketches HLL DOES: materialize one
tiny sketch per fine-grained bucket ONCE, then any coarser rollup is
a sketch-union over the pre-aggregated relation — bytes per bucket,
no second look at the fact table. This is the standard lakehouse
pre-agg pattern, built on Spark's native `hll_sketch_agg` /
`hll_union_agg` / `hll_sketch_estimate` (Apache DataSketches under
the hood, JVM-side, mergeable across partitions — map-side partials
work exactly like SUM).

Estimates carry ~1.6% relative standard error at lgConfigK=12
(default); tests pin tolerance accordingly. No SQL oracle — DuckdB's
approx_count_distinct uses a different sketch — so registry exposure
is rows-only; the pytest asserts the estimate against the exact
distinct within tolerance AND that rollup-of-sketches equals
sketching the coarser grain directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_sketches(
    df: DataFrame,
    bucket_expr: str,
    distinct_expr: str,
    *,
    bucket_alias: str = "bucket",
    lg_config_k: int = 12,
) -> DataFrame:
    """One HLL sketch (binary) + exact row count per bucket.

    The materialization pass: run once over the fact table at the
    finest grain you'll ever query; every coarser rollup then reads
    only this (tiny) relation.
    """
    return (
        df.groupBy(F.expr(bucket_expr).alias(bucket_alias))
        .agg(
            F.hll_sketch_agg(F.expr(distinct_expr), F.lit(lg_config_k)).alias(
                "sketch"
            ),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


def rollup_sketches(
    sketches: DataFrame,
    rollup_expr: str,
    *,
    rollup_alias: str = "rollup_bucket",
    bucket_alias: str = "bucket",
) -> DataFrame:
    """Coarser-grain distinct estimates from pre-aggregated sketches.

    ``rollup_expr`` maps the fine bucket column to the coarser key
    (e.g. day → week). Sketch union is associative + commutative, so
    this aggregates map-side like a SUM; the fact table is never
    touched.
    """
    return (
        sketches.groupBy(F.expr(rollup_expr).alias(rollup_alias))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch")))
            .cast("long")
            .alias("approx_distinct"),
            F.sum("n_rows").cast("long").alias("n_rows"),
        )
    )


__all__ = ["bucket_sketches", "rollup_sketches"]
