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
