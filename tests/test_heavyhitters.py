"""heavy_hitters: exactness proof obligations on adversarial layouts."""

import pytest
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.heavyhitters import heavy_hitters


def _exact(df, col, num, den):
    base = df.select(col).filter(F.col(col).isNotNull())
    total = base.count()
    rows = base.groupBy(col).count().collect()
    return {r[col]: r["count"] for r in rows if r["count"] * den >= total * num}


def test_matches_exact_groupby_on_skewed_data(spark):
    # one dominant key, a mid key, a long uniform tail
    rows = (
        [("hot",)] * 5000 + [("warm",)] * 800 + [(f"t{i}",) for i in range(4200)]
    )
    df = spark.createDataFrame(rows, "k string").repartition(16)
    got = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", phi_num=5, phi_den=100).collect()}
    assert got == _exact(df, "k", 5, 100) == {"hot": 5000, "warm": 800}
    (t,) = {r["total"] for r in heavy_hitters(df, "k", phi_num=5, phi_den=100).collect()}
    assert t == 10000


def test_evenly_spread_heavy_key_still_found(spark):
    """The adversarial case for per-partition sketches: the heavy key
    is spread perfectly evenly so it is never LOCALLY dominant. The
    MG containment bound must still surface it."""
    # 64 partitions x 50 copies of "spread" interleaved with unique noise
    rows = []
    for i in range(3200):
        rows.append(("spread",))
        rows.append((f"noise-{i}",))
    df = spark.createDataFrame(rows, "k string").repartition(64)
    got = {r["k"] for r in heavy_hitters(df, "k", phi_num=40, phi_den=100).collect()}
    assert got == {"spread"}


def test_null_keys_excluded_and_empty_input(spark):
    df = spark.createDataFrame([(None,), ("a",), ("a",), ("b",)], "k string")
    got = {r["k"]: (r["cnt"], r["total"])
           for r in heavy_hitters(df, "k", phi_num=50, phi_den=100).collect()}
    assert got == {"a": (2, 3)}  # total excludes NULL
    empty = df.filter(F.col("k") == "zzz")
    assert heavy_hitters(empty, "k").count() == 0


def test_k_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="k="):
        heavy_hitters(df, "k", phi_num=1, phi_den=100, k=10)
    with pytest.raises(ValueError, match="positive"):
        heavy_hitters(df, "k", phi_num=0)


def test_long_key_type(spark):
    df = spark.createDataFrame(
        [(7,)] * 60 + [(i,) for i in range(100, 140)], "k long"
    ).repartition(8)
    got = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", phi_num=10, phi_den=100).collect()}
    assert got == {7: 60}
