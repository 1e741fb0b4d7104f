"""Bucketed tables make the key join shuffle-free (scale strategy)."""

import pytest
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.session import load_table
from aws_dms_cdc_data_pipeline_spark.sinks.bucketed import (
    co_located_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{wh}'")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "okey"
    )
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "okey"
    )
    write_bucketed(li, "bucketdb.li_b", bucket_col="okey", num_buckets=8)
    write_bucketed(orders, "bucketdb.orders_b", bucket_col="okey", num_buckets=8)
    yield "bucketdb.li_b", "bucketdb.orders_b"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    li_t, orders_t = bucketed_tables
    # at fixture scale the planner would just broadcast the small side
    # (also shuffle-free, but not the mechanism under test) — force the
    # sort-merge path a fact⋈fact join takes at 100 TB
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, li_t, orders_t, "okey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # un-bucketed baseline DOES shuffle — the assertion has teeth
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        base = li.join(orders, li.l_orderkey == orders.o_orderkey)
        base_plan = base._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in base_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    li_t, orders_t = bucketed_tables
    got = (
        co_located_join(spark, li_t, orders_t, "okey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    want = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(str, got.collect())) == sorted(map(str, want.collect()))


def test_bucketed_aggregation_avoids_shuffle(spark, bucketed_tables):
    li_t, _ = bucketed_tables
    agg = spark.table(li_t).groupBy("okey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# --- E244: bucketed-fact serving for the star queries ----------------


@pytest.fixture(scope="module")
def fact_buckets(spark, sf_dir):
    from aws_dms_cdc_data_pipeline_spark.sinks.bucketed import (
        ensure_fact_buckets,
    )

    li_t, ord_t = ensure_fact_buckets(spark, sf_dir, num_buckets=8)
    yield li_t, ord_t
    spark.sql(f"DROP TABLE IF EXISTS {li_t}")
    spark.sql(f"DROP TABLE IF EXISTS {ord_t}")


def test_fact_bucket_join_no_exchange_no_sort(spark, fact_buckets):
    """The star fact join over the serving tables is bucket-to-bucket:
    no Exchange AND no Sort (one file per bucket -> sortedness
    trusted). Force the non-broadcast path a 100 TB join takes."""
    li_t, ord_t = fact_buckets
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, orders = spark.table(li_t), spark.table(ord_t)
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        import re

        assert re.search(r"[+:]- Sort \[", plan) is None, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_star_variants_match_adhoc(spark, sf_dir, fact_buckets):
    """The three *_bucketed registry variants are bit-identical to
    their ad-hoc rows and provably serve from the catalog."""
    from aws_dms_cdc_data_pipeline_spark.plans.queries import REGISTRY

    for name in (
        "regional_revenue",
        "topk_customers_by_revenue",
        "q3_shipping_priority",
    ):
        adhoc = REGISTRY[name].fn(spark, sf_dir)
        served = REGISTRY[f"{name}_bucketed"].fn(spark, sf_dir)
        assert any("factbkt_" in f for f in served.inputFiles())
        assert sorted(map(str, adhoc.collect())) == sorted(
            map(str, served.collect())
        ), name


def test_ensure_fact_buckets_idempotent(spark, sf_dir, fact_buckets):
    from aws_dms_cdc_data_pipeline_spark.sinks.bucketed import (
        ensure_fact_buckets,
    )

    again = ensure_fact_buckets(spark, sf_dir, num_buckets=8)
    assert again == fact_buckets
