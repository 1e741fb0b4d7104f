"""A1 current-state semantics: update/delete/out-of-order/duplicates (T1-T3)."""

import datetime as dt

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
