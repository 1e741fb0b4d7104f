"""transformWithState ordering monitor: violations, TTL state, clean keys."""

import json
import os

from aws_dms_cdc_data_pipeline_spark.sources.envelope_stream import (
    read_envelope_stream,
)
from aws_dms_cdc_data_pipeline_spark.streaming.monitor import (
    monitor_arrival_order,
)


def _env(trans_id, ts, seq, op="insert"):
    return {
        "data": {
            "trans_id": trans_id,
            "customer_id": "c-1",
            "event": "visit",
            "sku": "S1",
            "amount": 1,
            "device": "pc",
            "trans_datetime": ts,
        },
        "metadata": {
            "timestamp": ts,
            "record-type": "data",
            "operation": op,
            "partition-key-type": "primary-key",
            "schema-name": "testdb",
            "table-name": "retail_trans",
            "transaction-id": seq,
        },
        "doc_id": f"{trans_id}-{seq}",
    }


def _write_wire(path, name, envs):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for e in envs:
            f.write(json.dumps(e) + "\n")


def _run(spark, src, tmp_path):
    stream = read_envelope_stream(
        spark, src, max_files_per_trigger=1
    ).filter("NOT _corrupt")
    out = monitor_arrival_order(stream)
    sink = str(tmp_path / "sink")

    def deliver(batch, epoch_id):
        if batch.count():
            batch.write.mode("append").parquet(sink)

    q = (
        out.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        return spark.read.parquet(sink).collect()
    except Exception:
        return []


def test_out_of_order_flagged_in_order_silent(spark, tmp_path):
    src = str(tmp_path / "wire")
    # file a (batch 1): key 1 advances to (t3, 30); key 2 in order
    _write_wire(src, "a.json", [
        _env(1, "2024-01-01T00:00:01", 10),
        _env(1, "2024-01-01T00:00:03", 30),
        _env(2, "2024-01-01T00:00:05", 50),
    ])
    # file b (batch 2): key 1 regresses BEHIND (t3, 30) → violation;
    # key 2 advances cleanly
    _write_wire(src, "b.json", [
        _env(1, "2024-01-01T00:00:02", 20),
        _env(2, "2024-01-01T00:00:06", 60),
    ])
    rows = _run(spark, src, tmp_path)
    assert len(rows) == 1
    v = rows[0]
    assert v["trans_id"] == 1
    assert v["seq"] == 20
    assert v["last_seq"] == 30  # the watermark it ran behind


def test_same_timestamp_tie_breaks_on_seq(spark, tmp_path):
    src = str(tmp_path / "wire")
    ts = "2024-01-01T00:00:01"
    _write_wire(src, "a.json", [_env(5, ts, 100)])
    _write_wire(src, "b.json", [_env(5, ts, 90)])  # same ts, older txid
    rows = _run(spark, src, tmp_path)
    assert len(rows) == 1
    assert rows[0]["seq"] == 90 and rows[0]["last_seq"] == 100


def test_all_in_order_emits_nothing(spark, tmp_path):
    src = str(tmp_path / "wire")
    _write_wire(src, "a.json", [
        _env(k, f"2024-01-01T00:00:0{k}", k * 10) for k in (1, 2, 3)
    ])
    _write_wire(src, "b.json", [
        _env(k, f"2024-01-01T00:00:0{k+4}", k * 10 + 5) for k in (1, 2, 3)
    ])
    assert _run(spark, src, tmp_path) == []


def test_null_transaction_id_handled(spark, tmp_path):
    src = str(tmp_path / "wire")
    e1 = _env(9, "2024-01-01T00:00:01", 10)
    e2 = _env(9, "2024-01-01T00:00:02", 20)
    e2["metadata"]["transaction-id"] = None  # NULL txid, newer ts → in order
    e3 = _env(9, "2024-01-01T00:00:01", 5)  # regresses behind (t2, NULL)
    _write_wire(src, "a.json", [e1])
    _write_wire(src, "b.json", [e2])
    _write_wire(src, "c.json", [e3])
    rows = _run(spark, src, tmp_path)
    assert len(rows) == 1
    assert rows[0]["seq"] == 5 and rows[0]["last_seq"] == -1
