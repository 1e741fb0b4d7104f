"""Bucketed table layout — co-located joins with zero shuffle.

At 100 TB the dominant cost of fact⋈fact joins is the shuffle. Spark's
answer is bucketing: both tables hash-clustered into the same number
of buckets on the join key at WRITE time, so at read time the join is
bucket-to-bucket with no Exchange (and with ``sortBy``, no Sort
either — a straight merge). This module wraps the saveAsTable plumbing
and is exercised by tests that assert the Exchange disappears from
the physical plan.

The CDC state store (sinks/state_store.py) applies the same idea on
its own files: pmod(hash(key), B) directories so merges touch only
affected buckets. This module is the catalog-table variant for the
analytics side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    Joins/aggregations on ``bucket_col`` between tables written with
    the same ``num_buckets`` run shuffle-free. Choose ``num_buckets``
    ≈ cluster cores × small factor at deployment scale.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def ensure_fact_buckets(
    spark: SparkSession,
    sf_dir: str,
    *,
    num_buckets: int = 32,
) -> tuple[str, str]:
    """Materialize the star-serving FACT tables ONCE as co-bucketed
    catalog tables — the production shape for the fact⋈fact star
    joins, wired exactly the way ``ensure_token_index`` serves the
    text family (build once, every query reads the catalog).

    Two tables (idempotent per session; the name encodes ``sf_dir``
    so fixture tiers never collide):

    - ``factbkt_<name>_lineitem``: (l_orderkey, l_extendedprice,
      l_discount, l_shipdate) — the star queries' serving projection,
      bucketed + sorted on ``l_orderkey``;
    - ``factbkt_<name>_orders``: (o_orderkey, o_custkey, o_orderdate,
      o_orderpriority), bucketed + sorted on ``o_orderkey``.

    Both sides repartition to one file per bucket before the write so
    Spark trusts the sortedness metadata: the lineitem⋈orders join
    then plans as a bucket-to-bucket sort-merge with NO Exchange and
    NO Sort on either side — at 100 TB the two fact-width shuffles
    are the dominant star-query term (PERF.md: the r16 decomposition
    attributed the star residue to exactly this UnsafeRow+lz4
    exchange; the A/B with both fact shuffles gone measured −37%).
    """
    import re

    from aws_dms_cdc_data_pipeline_spark.operators.search import (
        _cache_db,
        _drop_stale_location,
    )
    from aws_dms_cdc_data_pipeline_spark.session import load_table

    name = re.sub(r"[^a-zA-Z0-9]+", "_", sf_dir.strip("/")).lower()
    db = _cache_db(spark)
    li_table = f"{db}.factbkt_{name}_lineitem"
    ord_table = f"{db}.factbkt_{name}_orders"
    if not spark.catalog.tableExists(li_table):
        _drop_stale_location(spark, li_table)
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"
        )
        write_bucketed(
            li.repartition(num_buckets, "l_orderkey"),
            li_table, bucket_col="l_orderkey", num_buckets=num_buckets,
        )
    if not spark.catalog.tableExists(ord_table):
        _drop_stale_location(spark, ord_table)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
        )
        write_bucketed(
            orders.repartition(num_buckets, "o_orderkey"),
            ord_table, bucket_col="o_orderkey", num_buckets=num_buckets,
        )
    return li_table, ord_table
