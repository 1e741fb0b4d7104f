"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``aws_dms_cdc_data_pipeline_spark.plans.queries``
(the REGISTRY); this module is a thin adapter onto that registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_dms_cdc_data_pipeline_spark.plans.queries import REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    regional_revenue exercises the engine's relational core: 5-table
    star join (broadcast dims), grouped decimal-exact revenue rollup.
    """
    return REGISTRY["regional_revenue"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for every oracle-expressible
    query; rows-only entries (oracle=None) are omitted so the driver
    records the weaker rows-only check for them.
    """
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
