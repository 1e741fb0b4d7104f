"""table_checksum: order/partitioning invariance + change detection.

The validation contract: identical row multisets → identical
checksum, regardless of row order or partition layout; any
insert/update/delete/duplicate → different checksum.
"""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.checksum import table_checksum


def _rows(n=50):
    return [
        (i, f"name-{i}", float(i) * 1.5 if i % 7 else None,
         None if i % 11 == 0 else f"2024-01-{(i % 28) + 1:02d} 10:00:00")
        for i in range(n)
    ]


def _df(spark, rows, parts=4):
    df = spark.createDataFrame(
        rows, "id long, name string, score double, ts string"
    ).select(
        "id", "name", "score", F.col("ts").cast("timestamp").alias("ts")
    )
    return df.repartition(parts)


def _sum(df):
    (r,) = table_checksum(df, "t").collect()
    return r["n_rows"], r["checksum"]


def test_checksum_invariant_to_order_and_partitioning(spark):
    rows = _rows()
    a = _sum(_df(spark, rows, parts=1))
    b = _sum(_df(spark, list(reversed(rows)), parts=13))
    assert a == b


def test_checksum_detects_any_change(spark):
    rows = _rows()
    base = _sum(_df(spark, rows))
    # update one value
    changed = list(rows)
    changed[5] = (5, "name-5", 999.0, changed[5][3])
    assert _sum(_df(spark, changed)) != base
    # delete one row
    assert _sum(_df(spark, rows[:-1])) != base
    # duplicate one row (XOR would miss this; SUM must not)
    assert _sum(_df(spark, rows + [rows[0]])) != base
    # null vs non-null in the same column
    nulled = list(rows)
    nulled[3] = (3, "name-3", None, nulled[3][3])
    assert _sum(_df(spark, nulled)) != base


def test_checksum_empty_table(spark):
    (r,) = table_checksum(_df(spark, _rows(0)), "t").collect()
    assert r["n_rows"] == 0
    assert r["checksum"] == "0"


def test_checksum_no_shuffle_plan(spark):
    """The aggregation must be a two-stage partial/final with a
    SinglePartition exchange of one scalar row — never a hash
    exchange of data rows."""
    df = _df(spark, _rows())
    plan = table_checksum(df, "t")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_checksum_validates_cdc_replication(spark):
    """End-to-end validation use: batch-pipeline state vs an
    independently-computed copy digest-match; a tampered copy fails."""
    from aws_dms_cdc_data_pipeline_spark.generator import (
        GeneratorConfig, envelopes_df,
    )
    from aws_dms_cdc_data_pipeline_spark.plans import cdc_batch_pipeline

    env = envelopes_df(spark, GeneratorConfig(n_rows=80, seed=5))
    state = cdc_batch_pipeline(env)
    cols = ["trans_id", "customer_id", "sku", "amount"]
    a = table_checksum(state.select(*cols), "state").collect()
    b = table_checksum(
        state.select(*cols).orderBy(F.rand(seed=1)), "state"
    ).collect()
    assert a == b
    tampered = state.select(
        "trans_id", "customer_id", "sku",
        (F.col("amount") + F.lit(1)).alias("amount"),
    )
    c = table_checksum(tampered.select(*cols), "state").collect()
    assert c != a


def test_checksum_wide_double_range_matches_duckdb(spark):
    """|x| >= 1e12 doubles must digest as their value, not as NULL —
    and identically in DuckDB (ADVICE-r4: DECIMAL(18,6) silently
    NULL'd them under Spark's non-ANSI cast while DuckDB's CAST
    errored; DECIMAL(38,6) restores the cross-engine contract)."""
    import duckdb
    from aws_dms_cdc_data_pipeline_spark.operators.checksum import (
        checksum_oracle_sql,
    )

    rows = [(1, 5.0e12), (2, -3.25e15), (3, None), (4, 0.5)]
    df = spark.createDataFrame(rows, "id long, v double")
    (got,) = table_checksum(df, "t", ["id", "v"]).collect()

    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        checksum_oracle_sql("t", {"id": "int", "v": "double"})
    ).fetchone()
    assert (got["n_rows"], got["checksum"]) == (want[1], want[2])

    # and the overflow row is NOT digesting as NULL: nulling it out
    # changes the checksum
    df_nulled = spark.createDataFrame(
        [(1, None), (2, -3.25e15), (3, None), (4, 0.5)], "id long, v double"
    )
    (other,) = table_checksum(df_nulled, "t", ["id", "v"]).collect()
    assert other["checksum"] != got["checksum"]
