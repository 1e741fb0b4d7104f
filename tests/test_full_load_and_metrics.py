"""S1 full-load snapshot seed + T5 backfill-then-tail + S8 ops log."""

import datetime as dt
import json
import os
import time

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark import schema as S
from aws_dms_cdc_data_pipeline_spark.generator import (
    GeneratorConfig,
    write_envelope_jsonl,
)
from aws_dms_cdc_data_pipeline_spark.sinks.state_store import StateStore
from aws_dms_cdc_data_pipeline_spark.sources.full_load import full_load_snapshot
from aws_dms_cdc_data_pipeline_spark.streaming.metrics import attach_metrics_listener
from aws_dms_cdc_data_pipeline_spark.streaming.pipeline import (
    CdcStreamConfig,
    run_cdc_backfill,
)


def _snapshot_rows(spark, n):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, f"C-{i:06d}", "visit", f"SKU-{i:05d}", 10 + i, "pc",
         base + dt.timedelta(minutes=i))
        for i in range(1, n + 1)
    ]
    return spark.createDataFrame(rows, S.DATA_SCHEMA)


def test_full_load_snapshot_envelopes(spark, tmp_path):
    snap = str(tmp_path / "snap")
    _snapshot_rows(spark, 12).write.parquet(snap)

    env = full_load_snapshot(spark, snap)
    rows = env.collect()
    assert len(rows) == 12
    ops = {r["metadata"]["operation"] for r in rows}
    assert ops == {S.OP_LOAD}
    assert {r["doc_id"] for r in rows} == {f"load-{i}" for i in range(1, 13)}
    # re-merging the same snapshot is idempotent (deterministic doc ids)
    store = StateStore(spark, str(tmp_path / "state"), num_buckets=4)
    store.merge(env)
    store.merge(env)
    assert store.table().count() == 12


def test_full_load_seed_then_cdc_tail(spark, tmp_path):
    # T5: merge(snapshot) then tail the change stream over the SAME store.
    # The generator's change events carry historical (2024) event times,
    # so the seed gets an explicit earlier timestamp — load records must
    # sort before the tail's changes per key.
    snap = str(tmp_path / "snap")
    _snapshot_rows(spark, 20).write.parquet(snap)
    src = str(tmp_path / "wire")
    write_envelope_jsonl(
        GeneratorConfig(n_rows=10, update_fraction=0.2, delete_fraction=0.2),
        src,
        files=1,
    )

    cfg = CdcStreamConfig(source_path=src, sink_root=str(tmp_path / "sink"),
                          trigger_seconds=None)
    seed = full_load_snapshot(
        spark, snap, timestamp=F.lit("2020-01-01 00:00:00").cast("timestamp")
    )
    StateStore(spark, cfg.state_path).merge(seed)
    run_cdc_backfill(spark, cfg)

    table = StateStore(spark, cfg.state_path).table()
    # keys 1..10 come from CDC (2 of them deleted → tombstoned over the
    # load rows too), keys 11..20 only from the snapshot
    assert table.count() == 18
    assert table.filter(F.col("trans_id") > 10).count() == 10


def test_metrics_listener_logs_batches(spark, tmp_path):
    ops_log = str(tmp_path / "ops" / "stream_metrics.jsonl")
    listener = attach_metrics_listener(spark, ops_log)
    try:
        src = str(tmp_path / "wire")
        write_envelope_jsonl(GeneratorConfig(n_rows=15), src, files=1)
        cfg = CdcStreamConfig(source_path=src, sink_root=str(tmp_path / "sink"),
                              trigger_seconds=None)
        run_cdc_backfill(spark, cfg)
        # listener bus is async — poll briefly
        deadline = time.time() + 20
        events = []
        while time.time() < deadline:
            if os.path.exists(ops_log):
                events = [json.loads(line) for line in open(ops_log)]
                if any(e["event"] == "progress" and e["num_input_rows"] > 0
                       for e in events):
                    break
            time.sleep(0.5)
        progress = [e for e in events if e["event"] == "progress"]
        assert progress, f"no progress events in {events}"
        assert sum(e["num_input_rows"] for e in progress) >= 15
        assert all("duration_ms" in e for e in progress)
    finally:
        spark.streams.removeListener(listener)
