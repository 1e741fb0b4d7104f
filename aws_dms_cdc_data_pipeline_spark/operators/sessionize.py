"""Gap-based sessionization over an event stream.

Training-data and analytics staple: events of one user separated by
more than ``gap`` belong to different sessions. Expressed with two
cumulative windows (lag to flag session starts, running sum to number
them) — one shuffle on the user key, single-pass frames, and the
whole computation is SQL-portable so a DuckDB oracle can mirror it
exactly (microsecond integer arithmetic, no float time math).

Streaming variant: the same semantics fall out of
``groupBy(session_window(ts, gap), user)`` in Structured Streaming;
this batch form is the oracle-able ground truth for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Attach ``session_idx`` (1-based per user) and ``session_id``.

    A session starts where the microsecond gap to the previous event
    of the same user exceeds ``gap_minutes`` (or at the user's first
    event). ``order_col`` breaks equal-timestamp ordering ties.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w_seq = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    w_cum = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(us).over(w_seq)
    starts = F.when(
        prev_us.isNull() | ((us - prev_us) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.withColumn("_start", starts)
        .withColumn("session_idx", F.sum("_start").over(w_cum).cast("long"))
        .withColumn(
            "session_id",
            F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_idx")),
        )
        .drop("_start")
    )


def daily_streaks(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user consecutive-active-day streak stats (gaps-and-islands).

    Calendar cousin of :func:`sessionize`: collapse events to distinct
    active days, then group consecutive days with the classic
    ``day_number - row_number`` island key (constant within a run of
    consecutive days, different across gaps — pure integer
    arithmetic, no date intervals). Returns one row per user:
    ``n_active_days``, ``n_streaks``, ``longest_streak`` (days).

    Scale shape: the distinct-day aggregation does the data
    reduction FIRST (map-side combine; output is |users|×|days|,
    tiny next to the event count), and the island window + both
    follow-up groupBys all share the user-key partitioning — one
    exchange of the already-reduced rows. Deterministic everywhere:
    row_number runs over unique (user, day) pairs, so no tie
    ambiguity exists.
    """
    days = df.select(
        F.col(user_col).alias("_u"),
        F.datediff(F.to_date(ts_col), F.lit("1970-01-01")).alias("_day"),
    ).distinct()
    w = Window.partitionBy("_u").orderBy("_day")
    islands = days.withColumn(
        "_grp", F.col("_day") - F.row_number().over(w)
    )
    streaks = islands.groupBy("_u", "_grp").agg(
        F.count(F.lit(1)).alias("_len")
    )
    return (
        streaks.groupBy("_u")
        .agg(
            F.sum("_len").cast("long").alias("n_active_days"),
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.max("_len").cast("long").alias("longest_streak"),
        )
        .withColumnRenamed("_u", user_col)
    )
