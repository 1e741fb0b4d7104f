"""Sequential per-key feature engineering: time-decayed EWMA.

The exponentially-weighted moving average over an *irregular* event
series (y_t = Σ_j 0.5^((t_t − t_j)/halflife) · x_j / Σ_j w_j, summed
over the key's events up to and including t) is the standard
recency-weighted feature for training-data pipelines (user activity
level, rolling quality, decayed engagement). It has no stable
closed form in relational algebra: the naive rewrite
0.5^(t/h) · cumsum(0.5^(−t_j/h) x_j) overflows double range after a
few hundred halflives, so a per-partition streaming evaluation is
genuinely required — this is the documented Pandas-UDF slow path,
not a missed built-in.

Shape: ONE hash shuffle on the key (`groupBy().applyInPandas`),
Arrow-batched columnar transfer, pandas' Cython `ewm(times=...)`
kernel per group — no row-at-a-time Python. Memory is O(largest
single key's rows); at 100 TB that bounds per-executor memory by the
heaviest entity, the same bill every sessionization pays, and a key
whose history genuinely doesn't fit is pre-aggregated upstream
(e.g. hourly rollup first). Determinism: rows are sorted
(ts, order_col) inside each group before the scan, so equal-ts ties
evaluate in a fixed order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def ewma_by_key(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    halflife_us: int,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key irregular-time EWMA of ``value_col``, halflife in µs.

    Appends ``out_col`` (double): the weighted mean of the key's
    values at-or-before each row, weights halving every
    ``halflife_us`` of event time. ``order_col`` fixes equal-ts
    evaluation order. NULL values propagate pandas semantics: the
    row's output is the decayed mean of the non-NULL values seen so
    far (NaN until the first non-NULL).
    """
    if halflife_us <= 0:
        raise ValueError(f"halflife_us must be positive, got {halflife_us}")
    ts_type = df.schema[ts_col].dataType
    if not isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        raise TypeError(
            f"ewma_by_key ts_col={ts_col!r} must be a timestamp, "
            f"got {ts_type.simpleString()}"
        )
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    import pandas as pd

    halflife = pd.Timedelta(microseconds=halflife_us)

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([ts_col, order_col], kind="mergesort")
        # pandas ewm(times=) requires monotonic times and handles the
        # irregular-decay arithmetic in a numerically stable scan
        pdf[out_col] = (
            pdf[value_col].astype("float64").ewm(halflife=halflife, times=pdf[ts_col]).mean()
        )
        return pdf

    return df.groupBy(key_col).applyInPandas(kernel, schema=out_schema)


__all__ = ["ewma_by_key"]


def winsorize(
    df,
    group_col: str,
    value_col: str,
    *,
    lo_num: int = 5,
    hi_num: int = 95,
    den: int = 100,
    keep_cols: list[str] | None = None,
):
    """Per-group winsorization (outlier clipping) at nearest-rank
    quantiles: values below the group's p_lo clamp up to it, values
    above p_hi clamp down. The robust-statistics companion of
    operators/outliers.flag_outliers — flagging finds anomalies,
    winsorizing neutralizes them for downstream aggregates.

    Nearest-rank (ceil(p·n)-th order statistic, an actual data
    element — no interpolation) keeps the result bit-identical across
    engines and partition layouts.

    Scale shape (r14): the bounds come from the per-group
    DISTINCT-value distribution — groupBy(group, value) with map-side
    combine, a cumulative window over the distinct values only, and a
    ≤|groups|-row bounds relation joined back (AQE broadcasts it when
    groups are few). The DATA-sized relation is never sorted and,
    with the broadcast, never exchanged — the old shape per-group
    row-sorted the whole input, a one-task-per-group wall at corpus
    scale. ``cum·den ≥ n·p`` is the cross-multiplied integer form of
    ``cum ≥ ceil(n·p/den)`` — no division, no floats.

    Returns keep_cols + (value_col, winsorized, clipped ∈ {-1,0,1}).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not (0 < lo_num <= hi_num <= den):
        raise ValueError("need 0 < lo_num <= hi_num <= den")
    keep = keep_cols or [group_col]
    base = df.filter(F.col(value_col).isNotNull())
    dist = base.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).cast("long").alias("_cnt")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_grp = Window.partitionBy(group_col)
    cum = dist.select(
        group_col,
        value_col,
        F.sum("_cnt").over(w).alias("_cum"),
        F.sum("_cnt").over(w_grp).alias("_n"),
    )
    v = F.col(value_col)
    bounds = cum.groupBy(group_col).agg(
        F.min(
            F.when(F.col("_cum") * den >= F.col("_n") * lo_num, v)
        ).alias("_lo"),
        F.min(
            F.when(F.col("_cum") * den >= F.col("_n") * hi_num, v)
        ).alias("_hi"),
    )
    return base.join(bounds, group_col).select(
        *keep,
        value_col,
        F.least(F.greatest(v, F.col("_lo")), F.col("_hi")).alias("winsorized"),
        F.when(v < F.col("_lo"), F.lit(-1))
        .when(v > F.col("_hi"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("clipped"),
    )
