"""Per-group statistical outlier flagging with exact integer arithmetic.

Data-quality surface: flag rows whose value deviates from their
group's mean by more than ``k`` sample standard deviations. The naive
formulation (mean/stddev as doubles, sqrt from libm) is not
reproducible across engines or partition orders; this operator
restates the test as a pure-integer inequality so the flag set is
bit-deterministic everywhere:

    |x - mean| > k * stddev
    <=>  (n-1) * (n*x - S)^2  >  k^2 * n * (n*Q - S^2)

with S = sum(x), Q = sum(x^2) over the group, all on fixed-point
quantized values ``x_q = floor(x * 1e6)`` (floor is
rounding-mode-portable; the flag is defined on the quantized values).
No square roots, no division — every quantity is an exact integer in
decimal(38,0) arithmetic.

Execution shape (scale notes):

- One groupBy computes (n, S, Q) per group — map-side partial sums;
  the stats relation has one row per group and broadcasts back onto
  the fact rows, so the fact table is scanned twice but never
  shuffled.
- Exactness bound (documented, not silently truncated): with
  per-group row count n and quantized magnitude M = max|x_q|, the
  largest intermediate is max((n-1)*(2nM)^2, k^2*n^2*M^2*n) — with
  k=3 it fits decimal(38,0) whenever n^3 * M^2 < ~1e37, e.g. groups
  of a million rows with values up to ~3e9 micro-units. Beyond that,
  pre-aggregate or raise the quantization unit.
- Groups of size 1 have zero variance on both sides and are never
  flagged (0 > 0 is false). NULL values are excluded up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_FP = 1_000_000


def flag_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    k: int = 3,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Rows of ``df`` whose ``value_col`` is a >k-sigma outlier in its group.

    Returns ``keep_cols`` (default: group + value column) for each
    flagged row. ``k`` must be a positive integer (the inequality
    uses k^2 exactly).
    """
    if k <= 0 or int(k) != k:
        raise ValueError("flag_outliers: k must be a positive integer")
    keep = keep_cols or [group_col, value_col]
    base = df.filter(F.col(value_col).isNotNull()).withColumn(
        "_xq", F.floor(F.col(value_col).cast("double") * F.lit(float(_FP))).cast("long")
    )
    stats = base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_xq").cast("decimal(38,0)")).alias("_s"),
        F.sum(
            F.col("_xq").cast("decimal(19,0)")
            * F.col("_xq").cast("decimal(19,0)")
        ).alias("_q"),
    )
    j = base.join(F.broadcast(stats), group_col)
    dd = (
        F.col("_n").cast("decimal(19,0)") * F.col("_xq").cast("decimal(19,0)")
        - F.col("_s")
    ).cast("decimal(19,0)")
    lhs = (F.col("_n") - F.lit(1)).cast("decimal(10,0)") * (dd * dd)
    rhs = (
        F.lit(k * k).cast("decimal(10,0)")
        * F.col("_n").cast("decimal(10,0)")
        * (
            F.col("_n").cast("decimal(10,0)") * F.col("_q")
            - F.col("_s").cast("decimal(19,0)") * F.col("_s").cast("decimal(19,0)")
        )
    )
    return j.filter(lhs > rhs).select(*keep)


def flag_outliers_robust(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    k_scaled: int = 35,  # modified z threshold × 10 (3.5 is the textbook value)
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Rows whose value deviates from their group's MEDIAN by more
    than ``k_scaled/10`` times the MAD — the robust companion of
    :func:`flag_outliers`.

    Mean/stddev flagging breaks down exactly when it matters: heavy
    outliers inflate the stddev and mask themselves (up to ~n/k of a
    group can hide). Median and MAD have a 50% breakdown point. Both
    statistics here are NEAREST-RANK order statistics over
    floor(x·1e6)-quantized values — actual data elements, no
    interpolation, no libm — and the flag test

        |x_q − med_q| · 10 > k_scaled · mad_q

    is pure integer arithmetic: bit-deterministic across engines and
    partition layouts, like everything in this module. Zero-MAD
    groups (>50% identical values): every row NOT equal to the
    median flags (ad·10 > 0), median-valued rows never do (0 > 0
    false) — any deviation from a majority-constant group is
    anomalous by definition; the textbook modified z-score is simply
    undefined there, so the convention is documented, not hidden.

    Scale shape (r14): median and MAD come from the per-group
    DISTINCT-value distribution — map-side-combined (group, x_q)
    counts, cumulative windows over DISTINCT values only, and a
    ≤|groups|-row stats relation joined back (AQE broadcasts it when
    groups are few). The DATA-sized relation is never per-group
    row-sorted — the old two-rank-window shape funneled every group's
    rows through one task, a wall when one group carries the corpus.
    """
    keep = keep_cols or [group_col, value_col]
    base = df.filter(F.col(value_col).isNotNull()).withColumn(
        "_xq", F.floor(F.col(value_col).cast("double") * F.lit(float(_FP))).cast("long")
    )
    dist = base.groupBy(group_col, "_xq").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt")
    )
    w_grp = Window.partitionBy(group_col)
    w_cum = w_grp.orderBy("_xq").rowsBetween(Window.unboundedPreceding, 0)
    cum = dist.select(
        group_col,
        "_xq",
        F.sum("_cnt").over(w_cum).alias("_cum"),
        F.sum("_cnt").over(w_grp).alias("_n"),
    )
    med_rank = F.expr("(_n + 1) div 2")  # lower median: a data element
    med = cum.groupBy(group_col).agg(
        F.min(F.when(F.col("_cum") >= med_rank, F.col("_xq"))).alias("_med"),
    )
    dev = (
        dist.join(med, group_col)
        .select(
            group_col,
            F.abs(F.col("_xq") - F.col("_med")).alias("_ad"),
            "_cnt",
        )
        .groupBy(group_col, "_ad")
        .agg(F.sum("_cnt").cast("long").alias("_cnt"))
    )
    w_cum2 = w_grp.orderBy("_ad").rowsBetween(Window.unboundedPreceding, 0)
    cum2 = dev.select(
        group_col,
        "_ad",
        F.sum("_cnt").over(w_cum2).alias("_cum"),
        F.sum("_cnt").over(w_grp).alias("_n"),
    )
    mad = cum2.groupBy(group_col).agg(
        F.min(F.when(F.col("_cum") >= med_rank, F.col("_ad"))).alias("_mad"),
    )
    stats = med.join(mad, group_col)
    return (
        base.join(stats, group_col)
        .filter(
            F.abs(F.col("_xq") - F.col("_med")) * F.lit(10)
            > F.lit(k_scaled) * F.col("_mad")
        )
        .select(*keep)
    )
