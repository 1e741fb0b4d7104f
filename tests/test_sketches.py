"""HLL bucket sketches: rollup-of-sketches == direct sketch, and
estimates track exact distincts within the sketch's error bound."""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.sketches import (
    bucket_sketches,
    rollup_sketches,
)
from aws_dms_cdc_data_pipeline_spark.session import load_table
from tests.conftest import SF_DIR_ORACLE


def test_rollup_matches_direct_sketch_and_exact(spark):
    ev = load_table(spark, SF_DIR_ORACLE, "events")
    daily = bucket_sketches(
        ev, "to_date(ts)", "user_id", bucket_alias="day"
    )
    weekly = rollup_sketches(
        daily, "date_trunc('week', day)", rollup_alias="week",
        bucket_alias="day",
    )
    got = {r["week"]: r for r in weekly.collect()}

    # 1) rollup-of-daily-sketches == sketching weeks directly
    direct = {
        r["week"]: r["approx_distinct"]
        for r in rollup_sketches(
            bucket_sketches(
                ev, "date_trunc('week', to_date(ts))", "user_id",
                bucket_alias="week",
            ),
            "week", rollup_alias="week",
        ).collect()
    }
    assert {w: r["approx_distinct"] for w, r in got.items()} == direct

    # 2) estimates within 5% of exact (lgK=12 RSE ~1.6%; 3 sigma)
    exact = {
        r["week"]: r["exact"]
        for r in ev.groupBy(
            F.expr("date_trunc('week', to_date(ts))").alias("week")
        ).agg(F.countDistinct("user_id").alias("exact")).collect()
    }
    assert set(got) == set(exact)
    for w, r in got.items():
        rel = abs(r["approx_distinct"] - exact[w]) / exact[w]
        assert rel <= 0.05, f"week {w}: {r['approx_distinct']} vs {exact[w]}"

    # 3) row counts are exact (plain SUM re-aggregation)
    n_total = sum(r["n_rows"] for r in got.values())
    assert n_total == ev.count()
