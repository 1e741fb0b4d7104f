"""Count-min sketch properties: never-under estimates, exactness
without collisions, rollup linearity, and determinism."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 (fixture)


@pytest.fixture(scope="module")
def facts(spark):
    rows = []
    for day, mult in (("2024-01-01", 1), ("2024-01-02", 3),
                      ("2024-01-08", 2)):
        for key, n in (("alpha", 5), ("beta", 2), ("gamma", 7)):
            rows += [(day, key)] * (n * mult)
    return spark.createDataFrame(rows, "day string, key string")


def test_cms_estimates_never_under_and_exact_when_sparse(facts):
    from aws_dms_cdc_data_pipeline_spark.operators.sketches import (
        cms_bucket_sketches, cms_estimate,
    )

    sk = cms_bucket_sketches(facts, "key", "day", width=64, depth=3)
    est = {
        (r.bucket, r.key): r.est
        for r in cms_estimate(
            sk, ["alpha", "beta", "gamma"], width=64, depth=3
        ).collect()
    }
    true = {
        (r.day, r.key): r.n
        for r in facts.groupBy("day", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for k, t in true.items():
        assert est[k] >= t
    # 3 keys in a 64-wide grid: collision-free -> exact
    assert est == true


def test_cms_rollup_linearity(facts):
    from aws_dms_cdc_data_pipeline_spark.operators.sketches import (
        cms_bucket_sketches, cms_estimate, cms_rollup,
    )

    daily = cms_bucket_sketches(facts, "key", "day", width=64, depth=3)
    weekly = cms_rollup(
        daily,
        "CASE WHEN bucket < '2024-01-07' THEN 'w1' ELSE 'w2' END",
    )
    # rolled-up grid == grid built directly at the coarse grain
    direct = cms_bucket_sketches(
        facts.withColumn(
            "week",
            F.when(F.col("day") < "2024-01-07", "w1").otherwise("w2"),
        ),
        "key", "week", width=64, depth=3,
    )
    a = {r.bucket: (list(r.cms), r.n_rows) for r in weekly.collect()}
    b = {r.bucket: (list(r.cms), r.n_rows) for r in direct.collect()}
    assert a == b
    est = {
        (r.bucket, r.key): r.est
        for r in cms_estimate(weekly, ["alpha"], width=64, depth=3).collect()
    }
    assert est[("w1", "alpha")] == 5 * (1 + 3)
    assert est[("w2", "alpha")] == 5 * 2


def test_cms_deterministic_across_partitionings(facts):
    from aws_dms_cdc_data_pipeline_spark.operators.sketches import (
        cms_bucket_sketches,
    )

    a = {
        r.bucket: list(r.cms)
        for r in cms_bucket_sketches(
            facts.repartition(1), "key", "day", width=32, depth=2
        ).collect()
    }
    b = {
        r.bucket: list(r.cms)
        for r in cms_bucket_sketches(
            facts.repartition(16), "key", "day", width=32, depth=2
        ).collect()
    }
    assert a == b


def test_cms_validation(facts):
    from aws_dms_cdc_data_pipeline_spark.operators.sketches import (
        cms_bucket_sketches, cms_estimate,
    )

    with pytest.raises(ValueError, match="width"):
        cms_bucket_sketches(facts, "key", "day", width=4)
    sk = cms_bucket_sketches(facts, "key", "day")
    with pytest.raises(ValueError, match="at least one key"):
        cms_estimate(sk, [])
