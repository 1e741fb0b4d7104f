"""flag_outliers: planted-outlier recall, integer-exactness edge cases."""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.outliers import flag_outliers

import pytest


def test_flags_planted_outliers_only(spark):
    # tight cluster around 10.0 plus two planted extremes per group
    rows = []
    for g in ("a", "b"):
        rows += [(g, i, 10.0 + (i % 7) * 0.01) for i in range(100)]
        rows += [(g, 1000, 500.0), (g, 1001, -480.0)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {
        (r["g"], r["id"])
        for r in flag_outliers(df, "g", "v", k=3, keep_cols=["g", "id"]).collect()
    }
    assert got == {("a", 1000), ("a", 1001), ("b", 1000), ("b", 1001)}


def test_no_outliers_in_uniform_group(spark):
    # uniform[0,1): max deviation ~1.73 sigma, so k=2 flags nothing
    df = spark.createDataFrame(
        [("g", i, (i % 100) / 100.0) for i in range(1000)],
        "g string, id long, v double",
    )
    assert flag_outliers(df, "g", "v", k=2).count() == 0


def test_singleton_group_and_nulls_never_flagged(spark):
    df = spark.createDataFrame(
        [("solo", 1, 99.0), ("g", 2, None), ("g", 3, 1.0), ("g", 4, 1.0)],
        "g string, id long, v double",
    )
    assert flag_outliers(df, "g", "v", k=3).count() == 0


def test_k_validation(spark):
    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    for bad in (0, -1, 2.5):
        with pytest.raises(ValueError):
            flag_outliers(df, "g", "v", k=bad)


def test_flag_set_is_partition_order_invariant(spark):
    rows = [("g", i, float(i % 13) + (100.0 if i % 97 == 0 else 0.0))
            for i in range(500)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    a = {r["id"] for r in flag_outliers(df, "g", "v", keep_cols=["id"]).collect()}
    b = {
        r["id"]
        for r in flag_outliers(
            df.repartition(17, "v"), "g", "v", keep_cols=["id"]
        ).collect()
    }
    assert a == b and a  # invariant AND non-empty


def test_registry_query_matches_duckdb_oracle(spark):
    """The events_value_outliers registry entry: Spark == DuckDB."""
    import duckdb

    from aws_dms_cdc_data_pipeline_spark.plans.queries import REGISTRY
    from tests.conftest import SF_DIR

    qd = REGISTRY["events_value_outliers"]
    got = sorted(tuple(r) for r in qd.fn(spark, SF_DIR).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(qd.oracle).fetchall())
    assert got == want and got


def test_robust_flags_where_classic_masks(spark):
    """The masking case: a few huge outliers inflate the stddev enough
    that 3-sigma misses some — median/MAD still flags them all."""
    from aws_dms_cdc_data_pipeline_spark.operators.outliers import (
        flag_outliers_robust,
    )

    rows = [("g", i, 10.0 + (i % 5) * 0.1) for i in range(50)]
    rows += [("g", 900 + j, 1e6) for j in range(6)]  # gross outliers
    df = spark.createDataFrame(rows, "g string, id long, v double")
    robust = {r["id"] for r in flag_outliers_robust(
        df, "g", "v", keep_cols=["id"]).collect()}
    assert {900 + j for j in range(6)} <= robust
    classic = {r["id"] for r in flag_outliers(
        df, "g", "v", k=3, keep_cols=["id"]).collect()}
    # the documented masking: classic sigma misses them (6/56 gross
    # outliers hold ~10% mass and drag sigma to their own scale)
    assert not classic


def test_robust_zero_mad_group_flags_deviants_only(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.outliers import (
        flag_outliers_robust,
    )

    # >50% identical values -> MAD = 0: any row differing from the
    # median flags; median-valued rows never do
    rows = [("g", i, 5.0) for i in range(10)] + [("g", 99, 500.0)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {r["id"] for r in flag_outliers_robust(
        df, "g", "v", keep_cols=["id"]).collect()}
    assert got == {99}


def test_robust_partition_invariance(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.outliers import (
        flag_outliers_robust,
    )

    rows = [("g", i, float(i % 13) + (80.0 if i % 41 == 0 else 0.0))
            for i in range(400)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    a = {r["id"] for r in flag_outliers_robust(df, "g", "v", keep_cols=["id"]).collect()}
    b = {r["id"] for r in flag_outliers_robust(
        df.repartition(19), "g", "v", keep_cols=["id"]).collect()}
    assert a == b and a
