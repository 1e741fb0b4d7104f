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


def test_bottomk_quantile_rollup_exact_mergeability_and_accuracy(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.sketches import (
        bottomk_value_sketches,
        rollup_quantiles,
    )

    ev = load_table(spark, SF_DIR_ORACLE, "events")
    daily = bottomk_value_sketches(
        ev, "to_date(ts)", "value", "event_id", bucket_alias="day", k=512
    )
    weekly = rollup_quantiles(
        daily, "date_trunc('week', day)", [0.5, 0.95],
        rollup_alias="week", k=512,
    )
    got = {r["week"]: r for r in weekly.collect()}

    # 1) EXACT mergeability: rollup of daily sketches == sketching
    #    weeks directly (bottom-k closure under union)
    direct = {
        r["week"]: r
        for r in rollup_quantiles(
            bottomk_value_sketches(
                ev, "date_trunc('week', to_date(ts))", "value", "event_id",
                bucket_alias="week", k=512,
            ),
            "week", [0.5, 0.95], rollup_alias="week", k=512,
        ).collect()
    }
    assert set(got) == set(direct)
    for w in got:
        assert got[w]["q50"] == direct[w]["q50"]
        assert got[w]["q95"] == direct[w]["q95"]
        assert got[w]["n_rows"] == direct[w]["n_rows"]

    # 2) estimates track exact quantiles (k=512 → rank error ~4-5%;
    #    assert via rank position, not value distance)
    from pyspark.sql import functions as F

    for w, r in got.items():
        wk = ev.filter(
            F.expr("date_trunc('week', to_date(ts))") == w
        ).select("value")
        n = wk.count()
        for q, p in ((r["q50"], 0.5), (r["q95"], 0.95)):
            rank = wk.filter(F.col("value") <= q).count() / n
            assert abs(rank - p) < 0.12, f"week {w} p={p}: rank {rank}"

    # 3) layout invariance: repartitioned input → identical sketches
    daily2 = bottomk_value_sketches(
        ev.repartition(7), "to_date(ts)", "value", "event_id",
        bucket_alias="day", k=512,
    )
    a = {r["day"]: r["entries"] for r in daily.collect()}
    b = {r["day"]: r["entries"] for r in daily2.collect()}
    assert a == b


def test_bottomk_prefilter_is_bit_identical_and_fallback_exact(spark, sf_dir):
    """The threshold-prefiltered build (bounded shuffle) must equal the
    naive unbounded build bit-for-bit; margin=0 starves the filter so
    EVERY bucket takes the in-plan exact-rebuild branch, proving the
    guard restores exactness rather than papering over a shortfall."""
    from aws_dms_cdc_data_pipeline_spark.operators.sketches import (
        bottomk_value_sketches,
    )

    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # a NULL-bucket group: groupBy keeps NULL as a group, so the
    # prefilter's bucket joins must be null-safe or the whole group
    # silently vanishes (the r6 ADVICE hazard).
    ev = ev.withColumn(
        "ts", F.when(F.col("event_id") % 97 == 0, F.lit(None)).otherwise(F.col("ts"))
    )

    def canon(df):
        return sorted(
            (
                (r["bucket"] is None, r["bucket"]),
                tuple(map(tuple, r["entries"])),
                r["n_rows"],
            )
            for r in df.collect()
        )

    args = (ev, "date_trunc('day', ts)", "value", "event_id")
    naive = canon(bottomk_value_sketches(*args, k=64, prefilter=False))
    fast = canon(bottomk_value_sketches(*args, k=64))
    starved = canon(bottomk_value_sketches(*args, k=64, margin=0))
    assert any(b[0] for b, _, _ in naive), "fixture must include a NULL bucket"
    assert fast == naive
    assert starved == naive
