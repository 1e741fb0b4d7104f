"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we would set on a real cluster:
AQE on (runtime re-planning, skew-join handling, partition
coalescing), UTC session timezone (the reference pipeline is UTC
end-to-end — reference README.md:349-350), Arrow for the Pandas-UDF
slow path, and shuffle partitions sized to the machine rather than
the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "aws_dms_cdc_data_pipeline_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` (driver convention) controls local
    parallelism; on a real cluster ``master`` comes from
    spark-submit and these settings transfer unchanged.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Prefer shuffled-hash over sort-merge when the planner's stats
        # say a build side fits per-partition (the preference is
        # conditional, not forced — SMJ remains the fallback). Skips
        # both sort passes; measured 20-40% on the fact-join bench.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str, *, raw_events: bool = False):
    """Read one fixture table (schemas in FIXTURES.md §B).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    rejects by default — read it as long (runtime-settable legacy
    conf) and truncate to microseconds, exactly matching DuckDB's
    ns→µs handling of the same file.

    The µs conversion is a derived expression, so time-range
    predicates on the converted column CANNOT push to the parquet
    scan. Callers with selective event-time ranges should pass
    ``raw_events=True``, filter the int64 nanos directly (pushdown-
    and row-group-stats-eligible), then convert — see
    ``event_time_bounds_nanos``.
    """
    # The driver may hand us a session built with defaults; every
    # timestamp comparison against the (naive-UTC) DuckDB oracle
    # assumes UTC session time, and both confs are runtime-settable —
    # so the loader defends itself instead of trusting the builder.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        if raw_events:
            return df
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def event_time_bounds_nanos(ts_utc: str) -> int:
    """UTC wall-clock string → int64 epoch nanos (raw events.ts units)."""
    import datetime as _dt

    d = _dt.datetime.fromisoformat(ts_utc).replace(tzinfo=_dt.timezone.utc)
    return int(d.timestamp()) * 1_000_000_000


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
