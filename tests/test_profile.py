"""Table profiler: exact stats, approx path, and input validation."""

import pytest
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def sample(spark):
    rows = [
        (1, 10.5, "a", None),
        (2, None, "b", None),
        (2, 3.25, None, None),
        (4, -1.75, "a", None),
        (None, 10.5, "c", None),
    ]
    return spark.createDataFrame(
        rows, "id bigint, val double, tag string, always_null string"
    )


def _by_col(df):
    return {r["column_name"]: r.asDict() for r in df.collect()}


def test_exact_profile(sample):
    prof = _by_col(profile_table(sample))
    assert set(prof) == {"id", "val", "tag", "always_null"}

    assert prof["id"]["n_null"] == 1
    assert prof["id"]["n_non_null"] == 4
    assert prof["id"]["n_distinct"] == 3  # 1, 2, 4
    assert prof["id"]["min_value"] == "1"
    assert prof["id"]["max_value"] == "4"

    # doubles are fixed-point micro-unit strings: floor(x * 1e6)
    assert prof["val"]["n_distinct"] == 3  # 10.5 appears twice
    assert prof["val"]["min_value"] == str(int(-1.75 * 1_000_000))
    assert prof["val"]["max_value"] == str(int(10.5 * 1_000_000))

    assert prof["tag"]["n_null"] == 1
    assert prof["tag"]["min_value"] == "a"
    assert prof["tag"]["max_value"] == "c"

    # an all-null column profiles without error
    assert prof["always_null"]["n_non_null"] == 0
    assert prof["always_null"]["n_distinct"] == 0
    assert prof["always_null"]["min_value"] is None


def test_column_subset_and_order(sample):
    prof = profile_table(sample, columns=["tag", "id"])
    assert [r["column_name"] for r in prof.collect()] == ["tag", "id"]


def test_approx_path_close_to_exact(spark):
    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 37).alias("mod37")
    )
    prof = _by_col(profile_table(df, approx=True, rsd=0.02))
    # HLL at rsd=0.02 on small cardinalities is near-exact
    assert abs(prof["id"]["n_distinct"] - 2000) <= 80
    assert prof["mod37"]["n_distinct"] == 37
    assert prof["id"]["min_value"] == "0"
    assert prof["id"]["max_value"] == "1999"


def test_rejects_bad_input(spark, sample):
    with pytest.raises(ValueError, match="not in DataFrame"):
        profile_table(sample, columns=["nope"])
    arr = spark.range(3).select(F.array("id").alias("a"))
    with pytest.raises(ValueError, match="unorderable"):
        profile_table(arr)
    with pytest.raises(ValueError, match="no columns"):
        profile_table(sample, columns=[])


def test_timestamp_normalization(spark):
    df = spark.sql(
        "SELECT timestamp'2024-03-01 12:34:56' AS ts "
        "UNION ALL SELECT timestamp'2023-01-15 00:00:00'"
    )
    prof = _by_col(profile_table(df))
    assert prof["ts"]["min_value"] == "2023-01-15 00:00:00"
    assert prof["ts"]["max_value"] == "2024-03-01 12:34:56"


def test_correlation_matrix_semantics(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.profile import (
        correlation_matrix,
    )

    # y = 2x exactly; z independent-ish; w constant
    rows = [(float(i), 2.0 * i, float((i * 7) % 5), 3.0) for i in range(50)]
    df = spark.createDataFrame(rows, "x double, y double, z double, w double")
    out = {(r["col_a"], r["col_b"]): r["corr"]
           for r in correlation_matrix(df, ["x", "y", "z", "w"]).collect()}
    assert out[("x", "x")] == 1.0 and out[("y", "y")] == 1.0
    assert out[("x", "y")] == 1.0            # perfectly linear
    assert abs(out[("x", "z")]) < 0.3        # near-independent
    assert out[("x", "w")] is None           # zero variance -> NULL
    assert out[("w", "w")] is None
    assert len(out) == 10                    # upper triangle incl diag


def test_correlation_matrix_partition_invariant(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.profile import (
        correlation_matrix,
    )

    rows = [(float(i % 17), float((i * 13) % 23)) for i in range(500)]
    df = spark.createDataFrame(rows, "a double, b double")
    one = sorted(map(tuple, correlation_matrix(df, ["a", "b"]).collect()))
    many = sorted(map(tuple,
        correlation_matrix(df.repartition(37), ["a", "b"]).collect()))
    assert one == many  # exact moments -> bit-identical across layouts
