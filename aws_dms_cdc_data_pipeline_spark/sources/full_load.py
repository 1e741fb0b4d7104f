"""S1 — the parallel full-load table scan (snapshot path).

The reference configures up to 8 parallel full-load sub-tasks
(``MaxFullLoadSubTasks: 8``, reference
dms_aurora_mysql_to_kinesis.py:126-128), enabled under the
``full-load*`` migration types (:145). In Spark that is a partitioned
JDBC scan: ``numPartitions`` concurrent range queries over the
primary key, each executor pulling its own slice — same shape, no
coordinator bottleneck.

Two entry points:

- :func:`full_load_jdbc` — production: partitioned ``spark.read.jdbc``
  against the source database (host:3306 endpoint analog,
  dms_aurora_mysql_to_kinesis.py:50-59).
- :func:`full_load_snapshot` — sandbox/tests: a parquet/file snapshot
  mapped to ``load``-operation envelopes, so backfill and live tail
  flow through one pipeline (T5: ``full-load-and-cdc``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_dms_cdc_data_pipeline_spark import schema as S
from aws_dms_cdc_data_pipeline_spark.operators.envelope import to_envelope

MAX_FULL_LOAD_SUBTASKS = 8  # dms_aurora_mysql_to_kinesis.py:127


def full_load_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    pk_column: str = S.PRIMARY_KEY,
    num_subtasks: int = MAX_FULL_LOAD_SUBTASKS,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned snapshot read of the source table over JDBC.

    Each of ``num_subtasks`` partitions issues its own PK-range query —
    Spark's native equivalent of DMS's parallel full-load sub-tasks.
    Bounds default to a one-row min/max probe (one extra round-trip);
    pass them explicitly to skip it.
    """
    props = dict(properties or {})
    if lower_bound is None or upper_bound is None:
        bounds = (
            spark.read.jdbc(
                url,
                f"(SELECT MIN({pk_column}) AS lo, MAX({pk_column}) AS hi "
                f"FROM {table}) AS _bounds",
                properties=props,
            )
            .collect()[0]
        )
        lower_bound = bounds["lo"] if lower_bound is None else lower_bound
        upper_bound = bounds["hi"] if upper_bound is None else upper_bound
    return spark.read.jdbc(
        url,
        table,
        column=pk_column,
        lowerBound=int(lower_bound),
        upperBound=int(upper_bound),
        numPartitions=num_subtasks,
        properties=props,
    )


def full_load_snapshot(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    schema_name: str = S.DEFAULT_SCHEMA_NAME,
    table_name: str = S.DEFAULT_TABLE_NAME,
    timestamp=None,
) -> DataFrame:
    """Snapshot files → ``load``-operation envelopes (T5 seed leg).

    The parallelism analog of the 8 sub-tasks is the file-split scan;
    the result feeds StateStore.merge (or the archive sink) through
    the same envelope contract the CDC tail uses, so a
    ``full-load-and-cdc`` run is merge(snapshot) → start stream.

    ``timestamp`` defaults to the snapshot read time (correct when the
    CDC tail follows in real time). Pass an explicit Column when
    replaying historical change data whose event times predate "now" —
    the load records must sort BEFORE the tail's changes per key, or
    the snapshot would shadow later updates/deletes.
    """
    rows = spark.read.format(fmt).load(path)
    return to_envelope(
        rows,
        operation=S.OP_LOAD,
        schema_name=schema_name,
        table_name=table_name,
        timestamp=timestamp,
    ).withColumn("doc_id", _load_doc_id())


def _load_doc_id():
    """Deterministic doc id for snapshot records: 'load-<pk>'.

    CDC records carry the shard sequence number (README.md:457); the
    snapshot has no stream position, so the PK (unique within a
    full load) keys idempotent re-merges of a retried load.
    """
    from pyspark.sql import functions as F

    return F.concat(F.lit("load-"), F.col("data.trans_id").cast("string"))
