"""replay_dlq: dead-lettered records re-enter the state store."""

import glob
import json
import os

from aws_dms_cdc_data_pipeline_spark.generator import GeneratorConfig, envelopes_df
from aws_dms_cdc_data_pipeline_spark.maintenance.replay import replay_dlq
from aws_dms_cdc_data_pipeline_spark.sinks.state_store import StateStore
from pyspark.sql import functions as F


def _write_dlq(path, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_replay_delivery_and_parse(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "state"), num_buckets=8)
    err = str(tmp_path / "error")

    # delivery DLQ: two valid keyed envelopes (as the pipeline writes them)
    env = envelopes_df(
        spark, GeneratorConfig(n_rows=4, seed=21, update_fraction=0.0,
                               delete_fraction=0.0, duplicate_fraction=0.0)
    )
    wire = [
        r["raw"]
        for r in env.select(
            F.to_json(F.struct("data", "metadata", "doc_id")).alias("raw")
        ).collect()
    ]
    _write_dlq(
        os.path.join(err, "batch_id=3", "delivery"),
        [{"raw": w, "error": "delivery-error"} for w in wire[:2]],
    )
    # parse DLQ: one line that now parses + one permanently malformed
    _write_dlq(
        os.path.join(err, "batch_id=5", "parse"),
        [{"raw": wire[2], "error": "parse-error"},
         {"raw": "{not json at all", "error": "parse-error"}],
    )

    out = replay_dlq(spark, err, store)
    assert out == {
        "delivery_replayed": 2, "parse_replayed": 1, "still_corrupt": 1,
    }
    # replayed rows are live in the store
    ids = {r["trans_id"] for r in store.table().collect()}
    want = {r["data"]["trans_id"] for r in env.collect()}
    assert len(ids) == 3 and ids <= want
    # consumed dirs cleared; still-bad line re-dead-lettered
    assert not glob.glob(os.path.join(err, "batch_id=3", "delivery", "*"))
    retry = glob.glob(os.path.join(err, "batch_id=replay", "parse", "*.json"))
    assert retry

    # second replay: idempotent for the store, still-bad stays parked
    out2 = replay_dlq(spark, err, store)
    assert out2["parse_replayed"] == 0 and out2["still_corrupt"] == 1
    assert {r["trans_id"] for r in store.table().collect()} == ids


def test_replay_empty_dlq_is_noop(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "state"), num_buckets=4)
    out = replay_dlq(spark, str(tmp_path / "error"), store)
    assert out == {
        "delivery_replayed": 0, "parse_replayed": 0, "still_corrupt": 0,
    }


def test_replay_trans_id_null_stays_dead(spark, tmp_path):
    """A line with metadata + doc_id present but data.trans_id NULL must
    NOT be replayed (the store keys on trans_id; hash(NULL) bucketing
    would silently collapse all such records into one winner). The
    replay must judge lines with the production parser's full _corrupt
    predicate — this is the ADVICE-r4 regression."""
    store = StateStore(spark, str(tmp_path / "state"), num_buckets=4)
    err = str(tmp_path / "error")

    null_key_line = json.dumps({
        "data": {"trans_id": None, "customer_id": "C-1", "event": "visit",
                 "sku": "S-1", "amount": 5, "device": "pc",
                 "trans_datetime": "2022-03-14T14:17:40Z"},
        "metadata": {"timestamp": "2022-03-14T14:18:11.104009Z",
                     "record-type": "data", "operation": "insert",
                     "partition-key-type": "primary-key",
                     "schema-name": "testdb", "table-name": "retail_trans",
                     "transaction-id": 1},
        "doc_id": "d-1",
    })
    no_data_line = json.dumps({
        "metadata": {"timestamp": "2022-03-14T14:18:11.104009Z",
                     "record-type": "data", "operation": "insert",
                     "partition-key-type": "primary-key",
                     "schema-name": "testdb", "table-name": "retail_trans",
                     "transaction-id": 2},
        "doc_id": "d-2",
    })
    # one in each branch: the delivery branch must apply the same gate
    _write_dlq(os.path.join(err, "batch_id=1", "delivery"),
               [{"raw": null_key_line, "error": "delivery-error"}])
    _write_dlq(os.path.join(err, "batch_id=2", "parse"),
               [{"raw": no_data_line, "error": "parse-error"},
                {"raw": null_key_line, "error": "parse-error"}])

    out = replay_dlq(spark, err, store)
    assert out == {
        "delivery_replayed": 0, "parse_replayed": 0, "still_corrupt": 3,
    }
    assert store.table().count() == 0
    # all three re-parked, none dropped
    parked = spark.read.json(os.path.join(err, "batch_id=replay", "parse"))
    assert parked.count() == 3
