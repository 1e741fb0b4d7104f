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
