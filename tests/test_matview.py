"""IncrementalAggView: exact incremental maintenance vs full recompute.

The invariant under test everywhere: after any sequence of merges,
``view.table()`` equals the from-scratch GROUP BY over the store's
live current state — through inserts, updates that MOVE a row across
groups, deletes, replayed batches, and crash-gap recovery.
"""

import os

import pytest
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.generator import GeneratorConfig, envelopes_df
from aws_dms_cdc_data_pipeline_spark.sinks.state_store import StateStore
from aws_dms_cdc_data_pipeline_spark.streaming.matview import IncrementalAggView


def _recompute(store):
    """Oracle: full GROUP BY over live current state."""
    return (
        store.table()
        .groupBy(F.coalesce(F.col("device"), F.lit("<null>")).alias("group_key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.coalesce(F.sum(F.col("amount").cast("long")), F.lit(0))
            .cast("long")
            .alias("amount_sum"),
        )
    )


def _rows(df):
    return sorted(map(tuple, df.select("group_key", "n_rows", "amount_sum").collect()))


def _assert_matches(view, store):
    assert _rows(view.table()) == _rows(_recompute(store))


@pytest.fixture()
def store_and_view(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "state"), num_buckets=8)
    view = IncrementalAggView(
        store,
        str(tmp_path / "view"),
        group_expr="data.device",
        group_alias="group_key",
        sums={"amount_sum": "data.amount"},
    )
    return store, view


def _batches(spark, n=3):
    # distinct seeds but overlapping trans_id key ranges: later batches
    # update and delete rows created by earlier ones
    return [
        envelopes_df(
            spark,
            GeneratorConfig(
                n_rows=60,
                seed=100 + i,
                update_fraction=0.4,
                delete_fraction=0.15,
                duplicate_fraction=0.1,
            ),
        )
        for i in range(n)
    ]


def test_view_tracks_store_across_batches(spark, store_and_view):
    store, view = store_and_view
    for batch in _batches(spark):
        view.update(lambda: store.merge(batch))
        _assert_matches(view, store)


def test_replayed_batch_is_noop(spark, store_and_view):
    store, view = store_and_view
    b1, b2, _ = _batches(spark)
    view.update(lambda: store.merge(b1))
    before = _rows(view.table())
    # replay: content-identical merge bumps the store generation but
    # must diff to zero — and the view must not double-count
    view.update(lambda: store.merge(b1))
    assert _rows(view.table()) == before
    view.update(lambda: store.merge(b2))
    _assert_matches(view, store)


def test_missed_merge_triggers_rebuild_and_recovers(spark, store_and_view):
    store, view = store_and_view
    b1, b2, b3 = _batches(spark)
    view.update(lambda: store.merge(b1))
    store.merge(b2)  # crash window: merge landed, view never advanced
    view.update(lambda: store.merge(b3))  # gap detected -> rebuild
    _assert_matches(view, store)


def test_group_vanishes_when_last_row_deleted(spark, store_and_view):
    store, view = store_and_view
    ins = envelopes_df(
        spark,
        GeneratorConfig(
            n_rows=4, seed=7, update_fraction=0.0,
            delete_fraction=0.0, duplicate_fraction=0.0,
        ),
    )
    view.update(lambda: store.merge(ins))
    target = store.table().select("trans_id", "device").first()
    dele = (
        ins.filter(F.col("data.trans_id") == target["trans_id"])
        .withColumn(
            "metadata",
            F.col("metadata").withField("operation", F.lit("delete")).withField(
                "timestamp", F.col("metadata.timestamp") + F.expr("INTERVAL 1 HOUR")
            ),
        )
        .withColumn("doc_id", F.concat(F.col("doc_id"), F.lit("-del")))
    )
    view.update(lambda: store.merge(dele))
    _assert_matches(view, store)
    remaining = {r["group_key"] for r in view.table().collect()}
    still_live = {
        r["d"]
        for r in store.table()
        .select(F.coalesce(F.col("device"), F.lit("<null>")).alias("d"))
        .distinct()
        .collect()
    }
    assert remaining == still_live


def test_streaming_integration(spark, tmp_path):
    from aws_dms_cdc_data_pipeline_spark.generator import write_envelope_jsonl
    from aws_dms_cdc_data_pipeline_spark.streaming import (
        CdcStreamConfig, start_cdc_stream,
    )

    wire = str(tmp_path / "wire")
    write_envelope_jsonl(
        GeneratorConfig(n_rows=120, seed=3, update_fraction=0.3,
                        delete_fraction=0.1, duplicate_fraction=0.2),
        wire,
        files=4,
    )
    cfg = CdcStreamConfig(
        source_path=wire, sink_root=str(tmp_path / "sink"),
        trigger_seconds=None, max_files_per_trigger=1,
    )
    store = StateStore(spark, cfg.state_path)
    view = IncrementalAggView(store, os.path.join(cfg.sink_root, "matview"))
    start_cdc_stream(spark, cfg, matview=view).awaitTermination()
    assert view.table().count() > 0
    # default group/sum spec: device / amount_sum
    got = sorted(map(tuple, view.table().collect()))
    want = sorted(
        map(
            tuple,
            store.table()
            .groupBy(
                F.coalesce(F.col("device"), F.lit("<null>")).alias("group_key")
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.coalesce(F.sum(F.col("amount").cast("long")), F.lit(0))
                .cast("long")
                .alias("amount_sum"),
            )
            .collect(),
        )
    )
    assert got == want


def test_streaming_crash_recovery_mid_trigger(spark, tmp_path):
    """Crash between a batch's store merge and the view advance, with
    the checkpoint intact: on restart the batch replays (idempotent
    merge), the view detects the generation gap and rebuilds — the
    final view still equals the full recompute.
    """
    import shutil

    from aws_dms_cdc_data_pipeline_spark.generator import write_envelope_jsonl
    from aws_dms_cdc_data_pipeline_spark.operators.selection import select_table
    from aws_dms_cdc_data_pipeline_spark.sources.envelope_stream import (
        read_envelope_batch,
    )
    from aws_dms_cdc_data_pipeline_spark.streaming import (
        CdcStreamConfig, start_cdc_stream,
    )

    wire = str(tmp_path / "wire")
    write_envelope_jsonl(
        GeneratorConfig(n_rows=80, seed=11, update_fraction=0.3,
                        delete_fraction=0.1, duplicate_fraction=0.2),
        wire, files=2,
    )
    cfg = CdcStreamConfig(
        source_path=wire, sink_root=str(tmp_path / "sink"),
        trigger_seconds=None, max_files_per_trigger=1,
    )
    store = StateStore(spark, cfg.state_path)
    view = IncrementalAggView(store, os.path.join(cfg.sink_root, "matview"))

    # generation 1: clean run
    start_cdc_stream(spark, cfg, matview=view).awaitTermination()
    _assert_device_view_matches(view, store)
    gen_clean = store.version()

    # new wire files land (fresh names so the file source sees them)
    staging = str(tmp_path / "staging")
    write_envelope_jsonl(
        GeneratorConfig(n_rows=60, seed=12, update_fraction=0.4,
                        delete_fraction=0.2, duplicate_fraction=0.1),
        staging, files=2,
    )
    new_files = []
    for i, name in enumerate(sorted(os.listdir(staging))):
        dst = os.path.join(wire, f"late-{i:05d}.jsonl")
        shutil.move(os.path.join(staging, name), dst)
        new_files.append(dst)

    # CRASH SIMULATION: the stream merged the first new file into the
    # store, then died before view.advance ran and before the epoch
    # committed to the checkpoint. Store generation moves; view's
    # recorded store_gen does not; checkpoint still points before the
    # batch.
    env = read_envelope_batch(spark, new_files[0])
    good = env.filter(~F.col("_corrupt")).drop("_raw", "_corrupt")
    store.merge(select_table(good, cfg.schema_name, cfg.table_name))
    assert store.version() > gen_clean
    stale = _rows(view.table())

    # RESTART on the same checkpoint: both new files (re)process — the
    # crashed file's merge replays idempotently, the view sees the
    # missed generation and falls back to rebuild.
    start_cdc_stream(spark, cfg, matview=view).awaitTermination()
    _assert_device_view_matches(view, store)
    assert _rows(view.table()) != stale  # it actually advanced

    # and a THIRD run with nothing new is a no-op for both
    gen_final, v_final = store.version(), view._manifest()["v"]
    start_cdc_stream(spark, cfg, matview=view).awaitTermination()
    assert store.version() == gen_final
    assert _rows(view.table()) == _rows(_recompute(store))


def _assert_device_view_matches(view, store):
    got = sorted(map(tuple, view.table().collect()))
    want = _rows(_recompute(store))
    assert got == want and got
