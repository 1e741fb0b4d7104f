"""interval_coverage (measure-of-union) + daily_streaks (gaps-and-islands).

Hand-computable fixtures covering the merge edge cases: overlap,
touching endpoints, nesting, zero/negative-length rows, NULLs, and
ties. Streaks: consecutive-day runs with gaps.
"""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.intervals import interval_coverage
from aws_dms_cdc_data_pipeline_spark.operators.sessionize import daily_streaks


def test_interval_coverage_merges_overlaps(spark):
    rows = [
        # key "a": [0,10) + [5,20) overlap -> [0,20); [20,30) touches -> merge
        ("a", 0, 10),
        ("a", 5, 20),
        ("a", 20, 30),
        # second island after a gap: [100,110)
        ("a", 100, 110),
        # key "b": nested interval contributes nothing extra
        ("b", 0, 100),
        ("b", 10, 20),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = {
        r["k"]: r for r in interval_coverage(df, "k", "s", "e").collect()
    }
    assert out["a"]["n_intervals"] == 4
    assert out["a"]["n_islands"] == 2
    assert out["a"]["covered_us"] == 30 + 10
    assert out["b"]["n_islands"] == 1
    assert out["b"]["covered_us"] == 100


def test_interval_coverage_ignores_degenerate_rows(spark):
    rows = [
        ("a", 0, 10),
        ("a", 5, 5),      # zero-length: ignored, must not glue
        ("a", 12, 11),    # negative: ignored
        ("a", 11, 15),    # gap of 1 after [0,10): separate island
        ("a", None, 99),  # NULL start: ignored
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    (r,) = interval_coverage(df, "k", "s", "e").collect()
    assert r["n_intervals"] == 2
    assert r["n_islands"] == 2
    assert r["covered_us"] == 10 + 4


def test_interval_coverage_tie_order_deterministic(spark):
    # duplicate (s, e) rows and equal starts: coverage must not depend
    # on their arbitrary window order
    rows = [("a", 0, 10), ("a", 0, 10), ("a", 0, 3), ("a", 2, 8)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    (r,) = interval_coverage(df, "k", "s", "e").collect()
    assert r["n_intervals"] == 4
    assert r["n_islands"] == 1
    assert r["covered_us"] == 10


def test_daily_streaks(spark):
    def d(day):
        return f"2024-01-{day:02d} 12:00:00"

    rows = [
        # u1: days 1,2,3 (streak 3), day 6 (streak 1); repeat events
        # on day 2 must not inflate counts
        (1, d(1)), (1, d(2)), (1, d(2)), (1, d(3)), (1, d(6)),
        # u2: single day
        (2, d(10)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {r["user_id"]: r for r in daily_streaks(df).collect()}
    assert out[1]["n_active_days"] == 4
    assert out[1]["n_streaks"] == 2
    assert out[1]["longest_streak"] == 3
    assert out[2]["n_active_days"] == 1
    assert out[2]["n_streaks"] == 1
    assert out[2]["longest_streak"] == 1


def test_daily_streaks_crosses_month_boundary(spark):
    rows = [(1, "2024-01-31 23:59:59"), (1, "2024-02-01 00:00:01")]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    (r,) = daily_streaks(df).collect()
    assert r["longest_streak"] == 2
