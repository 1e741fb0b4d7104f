"""Range join ≡ naive inequality join; rollup grains are consistent."""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.rangejoin import (
    range_join,
    time_rollup,
)
from aws_dms_cdc_data_pipeline_spark.session import load_table


def test_range_join_matches_naive(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    intervals = spark.createDataFrame(
        [
            ("a", "2024-01-02 06:00:00", "2024-01-05 18:00:00"),
            ("b", "2024-01-04 00:00:00", "2024-01-04 12:00:00"),  # nested in a
            ("c", "2024-01-20 00:00:00", "2024-01-20 00:00:01"),  # 1s sliver
        ],
        "name string, s string, e string",
    ).select(
        "name",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    got = range_join(
        ev, intervals, ts_col="ts", start_col="s", end_col="e", granule="6 hours"
    ).select("event_id", "name")
    naive = ev.join(
        intervals, (ev.ts >= intervals.s) & (ev.ts < intervals.e)
    ).select("event_id", "name")
    assert sorted(map(str, got.collect())) == sorted(map(str, naive.collect()))
    # nested interval means some events match twice
    dup = got.groupBy("event_id").count().filter(F.col("count") > 1)
    assert dup.count() > 0


def test_range_join_granule_only_affects_cost(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    iv = spark.createDataFrame(
        [("w", "2024-01-03 00:00:00", "2024-01-12 00:00:00")],
        "name string, s string, e string",
    ).select(
        "name",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    fine = range_join(ev, iv, ts_col="ts", start_col="s", end_col="e",
                      granule="1 hour").count()
    coarse = range_join(ev, iv, ts_col="ts", start_col="s", end_col="e",
                        granule="7 days").count()
    assert fine == coarse


def test_time_rollup_grains_consistent(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rolled = time_rollup(ev, ts_col="ts", grains=("hour", "day", "month"))
    totals = {
        r.grain: r.total
        for r in rolled.groupBy("grain").agg(F.sum("n").alias("total")).collect()
    }
    n = ev.count()
    assert totals == {"hour": n, "day": n, "month": n}
    # day buckets really are day-truncated hour buckets
    days = rolled.filter(F.col("grain") == "day")
    assert days.filter(F.date_trunc("day", "bucket") != F.col("bucket")).count() == 0
