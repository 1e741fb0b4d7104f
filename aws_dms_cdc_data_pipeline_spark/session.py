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
        # Trust the per-bucket sort order of bucketed+sorted catalog
        # tables (token index, factbkt star serving): Spark 3+ gates
        # this behind the legacy flag because multi-file buckets
        # can't claim ordering — the claim stays guarded by the
        # one-file-per-bucket check, and ensure_fact_buckets /
        # ensure_token_index repartition to exactly that layout, so
        # the bucket-to-bucket merge join drops BOTH sorts.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Spark's legacy default writes timestamps as parquet INT96,
        # which has NO min/max statistics — every time-range scan
        # over engine-written data would read every row group. µs
        # int64 restores stats-based pruning (and is what every
        # modern reader, including DuckDB and the fixtures, uses).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # Split-size tuning for THIS harness, not a universal default:
        # the fixtures are single 10–115 MB parquet files, which under
        # the stock 128 MB split become ONE scan task — a 32-core
        # local session then runs its biggest table scans single-
        # threaded (measured: q1 at sf1 1.19 s → 0.77 s with 8 MB
        # splits; r17 re-measured 8 MB → 4 MB at sf0.1, where the
        # 10.8 MB lineitem still scanned as 2 tasks: q1 0.96 → 0.68 s,
        # q3 0.56 → 0.43 s across an 11-query A/B, 2 MB within noise
        # of 4 MB). On a real cluster with 128–256 MB files keep the
        # default — override via extra_conf / runtime conf; parquet
        # stays byte-range splittable either way.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"),
        )
        # AQE post-shuffle target size, harness-scale default (the
        # maxPartitionBytes precedent): at fixture scale the stock
        # 64 MB advisory coalesces every vocabulary-grain aggregate
        # (bigram/trigram counts, NB model legs, BM25 stats) to ONE
        # post-shuffle partition, so each model build runs a 0.3-0.5 s
        # single-task HashAggregate before its broadcast; 16 MB keeps
        # those stages parallel (measured −6% across a 15-query A/B,
        # 64m 14.4 s → 16m 13.5 s; 8m measured identical to 16m). On
        # a real cluster raise toward 64-256 MB with the data — the
        # env override is the knob (guide §2.2 sizing).
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "16m"),
        )
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


# Parquet schemas by (path, mtime): spark.read.parquet() re-infers the
# schema on EVERY call — a ~90 ms driver stall plus a 1-task footer-read
# job per table reference (profiled r17: ~150 load_table calls per bench
# sweep ≈ 10 s of pure schema re-inference). The engine's catalog role:
# remember the schema once per file version and hand it to the reader
# (`.schema(...)` skips inference; execution still reads the parquet
# data itself). Keyed on mtime so a regenerated fixture re-infers.
# This memoizes METADATA, never query results.
_SCHEMA_MEMO: dict = {}


def _read_parquet(spark: SparkSession, path: str):
    try:
        key = (path, os.path.getmtime(path))
    except OSError:
        return spark.read.parquet(path)
    schema = _SCHEMA_MEMO.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str, *, raw_events: bool = False):
    """Read one fixture table (schemas in FIXTURES.md §B).

    ``events.ts`` exists in two fixture generations: older testdata
    wrote parquet TIMESTAMP(NANOS) — Spark reads it as int64 under the
    legacy conf and we truncate to microseconds (DuckDB's ns→µs
    handling of the same file) — while current testdata writes
    TIMESTAMP(MICROS), which Spark reads as a native timestamp
    directly. The loader detects the generation from the scanned
    schema and returns ``ts`` as a session-UTC TimestampType either
    way.

    ``raw_events=True`` returns ``ts`` in STORAGE units (int64 nanos
    or native timestamp) so selective time ranges can be pushed to
    the parquet scan (row-group pruning). Build the bound literal
    with ``event_ts_bound`` — it emits the matching type — and
    normalize afterwards with ``event_ts_to_micros``. On native-
    timestamp fixtures both helpers are identity-shaped: timestamp
    predicates push down as-is.
    """
    # The driver may hand us a session built with defaults; every
    # timestamp comparison against the (naive-UTC) DuckDB oracle
    # assumes UTC session time, and all three confs are runtime-
    # settable — so the loader defends itself instead of trusting the
    # builder.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # read µs-no-tz as TimestampType (not NTZ): values are UTC
        # micros verbatim and every comparison/window downstream stays
        # on the one timestamp type the engine uses everywhere
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = _read_parquet(spark, path)
        if raw_events or not _event_ts_is_long(df):
            return df
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _read_parquet(spark, path)


def _event_ts_is_long(df) -> bool:
    from pyspark.sql.types import LongType

    return isinstance(df.schema["ts"].dataType, LongType)


def event_time_bounds_nanos(ts_utc: str) -> int:
    """UTC wall-clock string → int64 epoch nanos (raw events.ts units)."""
    import datetime as _dt

    d = _dt.datetime.fromisoformat(ts_utc).replace(tzinfo=_dt.timezone.utc)
    return int(d.timestamp()) * 1_000_000_000


def event_ts_bound(df, ts_utc: str, *, slack_us: int = 0):
    """Literal for comparing a RAW events ``ts`` column to a UTC instant.

    Emits whatever type the storage column has: epoch-nanos long for
    legacy nanos fixtures, a timestamp literal for native-µs fixtures
    — so the predicate is pushdown-eligible in both generations.
    ``slack_us`` widens the bound (±1 µs covers truncation onto an
    instant when a loose pushed bound is re-checked exactly
    downstream); both forms constant-fold to a scan-pushable literal.
    """
    from pyspark.sql import functions as F

    if _event_ts_is_long(df):
        return F.lit(event_time_bounds_nanos(ts_utc) + slack_us * 1000)
    ts = F.lit(ts_utc).cast("timestamp")
    if slack_us:
        return ts + F.expr(f"INTERVAL '{slack_us}' MICROSECOND")
    return ts


def event_ts_to_micros(df):
    """Normalize a RAW events frame's ``ts`` to TimestampType (µs, UTC)."""
    from pyspark.sql import functions as F

    if _event_ts_is_long(df):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
