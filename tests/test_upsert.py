"""A1 current-state semantics: update/delete/out-of-order/duplicates (T1-T3)."""

import datetime as dt

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark import schema as S
from aws_dms_cdc_data_pipeline_spark.generator import GeneratorConfig, envelopes_df
from aws_dms_cdc_data_pipeline_spark.operators.upsert import current_state
from aws_dms_cdc_data_pipeline_spark.plans.pipeline import cdc_batch_pipeline


def _env(spark, rows):
    """rows: (trans_id, amount, op, ts, txn, doc_id)"""
    data = [
        (
            (tid, "c", "cart", "SKU", amount, "pc", dt.datetime(2022, 3, 14)),
            (ts, "data", op, "primary-key", "testdb", "retail_trans", txn),
            doc,
        )
        for (tid, amount, op, ts, txn, doc) in rows
    ]
    return spark.createDataFrame(data, S.KEYED_ENVELOPE_SCHEMA)


T0 = dt.datetime(2022, 3, 14, 14, 0, 0)


def test_update_wins_by_timestamp(spark):
    env = _env(
        spark,
        [
            (1, 10, "insert", T0, 100, "a"),
            (1, 20, "update", T0 + dt.timedelta(seconds=5), 101, "b"),
        ],
    )
    got = current_state(env).collect()
    assert len(got) == 1 and got[0].amount == 20


def test_out_of_order_delivery_is_reordered_by_event_time(spark):
    # update delivered BEFORE its insert (arrival order irrelevant)
    env = _env(
        spark,
        [
            (1, 20, "update", T0 + dt.timedelta(seconds=5), 101, "b"),
            (1, 10, "insert", T0, 100, "a"),
        ],
    )
    got = current_state(env).collect()
    assert len(got) == 1 and got[0].amount == 20


def test_delete_removes_row(spark):
    env = _env(
        spark,
        [
            (1, 10, "insert", T0, 100, "a"),
            (1, 10, "delete", T0 + dt.timedelta(seconds=9), 102, "c"),
            (2, 30, "insert", T0, 103, "d"),
        ],
    )
    got = current_state(env).collect()
    assert [r.trans_id for r in got] == [2]


def test_timestamp_tie_breaks_by_transaction_id(spark):
    env = _env(
        spark,
        [
            (1, 10, "update", T0, 200, "a"),
            (1, 99, "update", T0, 201, "b"),  # same ts, later txn wins
        ],
    )
    got = current_state(env).collect()
    assert got[0].amount == 99


def test_duplicate_delivery_is_idempotent(spark):
    rows = [
        (1, 10, "insert", T0, 100, "a"),
        (1, 10, "insert", T0, 100, "a"),  # re-delivered (same doc_id)
        (1, 25, "update", T0 + dt.timedelta(seconds=1), 101, "b"),
        (1, 25, "update", T0 + dt.timedelta(seconds=1), 101, "b"),
    ]
    got = current_state(_env(spark, rows)).collect()
    assert len(got) == 1 and got[0].amount == 25


def test_pipeline_counts_match_generator_bookkeeping(spark):
    cfg = GeneratorConfig(
        n_rows=120,
        update_fraction=0.4,
        delete_fraction=0.15,
        duplicate_fraction=0.2,
        shuffle_fraction=0.3,
        foreign_fraction=0.1,
    )
    env = envelopes_df(spark, cfg)
    state = cdc_batch_pipeline(env)
    n_deleted = int(120 * 0.15)
    assert state.count() == 120 - n_deleted
    # PK is unique in the derived table
    assert state.select("trans_id").distinct().count() == state.count()


def test_scd2_history_interval_chain(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.upsert import scd2_history

    df = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 00:00:00", "a"),
            (1, 11, "2024-01-02 00:00:00", "b"),
            (1, 12, "2024-01-03 00:00:00", "c"),
            (2, 20, "2024-01-05 00:00:00", "x"),
        ],
        "key long, seq long, ts string, payload string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    hist = scd2_history(df, key_col="key", ts_col="ts", order_col="seq")
    rows = {r.seq: r for r in hist.collect()}
    # chain: each version closes at the next one's valid_from
    assert rows[10].valid_to == rows[11].valid_from
    assert rows[11].valid_to == rows[12].valid_from
    # exactly one open version per key
    assert rows[12].valid_to is None and rows[12].is_current == 1
    assert rows[20].valid_to is None and rows[20].is_current == 1
    assert sum(r.is_current for r in rows.values()) == 2


def test_state_as_of_matches_filtered_current_state(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.upsert import state_as_of

    df = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 00:00:00", "old"),
            (1, 11, "2024-01-09 00:00:00", "mid"),
            (1, 12, "2024-02-01 00:00:00", "new"),
            (2, 20, "2024-03-01 00:00:00", "future-only"),
        ],
        "key long, seq long, ts string, payload string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    snap = state_as_of(
        df,
        F.lit("2024-01-15 00:00:00").cast("timestamp"),
        key_col="key", ts_col="ts", order_col="seq",
    )
    got = {r.key: r.payload for r in snap.collect()}
    assert got == {1: "mid"}  # key 2 didn't exist yet; 'new' not yet visible
