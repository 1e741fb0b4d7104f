"""Kafka/Kinesis envelope-source wiring: format + option plumbing.

No broker exists in this sandbox, so the connectors can't be
integration-tested — but a typo in a format name or option key would
still ship silently. These tests stub the session's readStream with a
recording reader whose ``load()`` returns a real (batch) DataFrame
shaped like the connector's output, so the full downstream plan
(binary→string cast → production parse) executes for real.
"""

import json

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.sources.envelope_stream import (
    read_envelope_kafka,
    read_envelope_kinesis,
)

_WIRE = json.dumps({
    "data": {"trans_id": 7, "customer_id": "C-7", "event": "cart",
             "sku": "S-7", "amount": 42, "device": "mobile",
             "trans_datetime": "2022-03-14T14:17:40Z"},
    "metadata": {"timestamp": "2022-03-14T14:18:11.104009Z",
                 "record-type": "data", "operation": "insert",
                 "partition-key-type": "primary-key",
                 "schema-name": "testdb", "table-name": "retail_trans",
                 "transaction-id": 99},
    "doc_id": "shard-1:42",
})


class _RecordingReader:
    def __init__(self, load_df):
        self._load_df = load_df
        self.fmt = None
        self.opts = {}

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self, *a, **kw):
        return self._load_df


class _FakeSession:
    def __init__(self, reader):
        self._reader = reader

    @property
    def readStream(self):
        return self._reader


def _binary_df(spark, col_name):
    # connector output shape: payload arrives as a binary column
    return spark.createDataFrame([(bytearray(_WIRE, "utf-8"),)]).toDF(col_name)


def test_kafka_reader_options_and_parse(spark):
    reader = _RecordingReader(_binary_df(spark, "value"))
    out = read_envelope_kafka(
        _FakeSession(reader), "broker-a:9092,broker-b:9092", "cdc.retail_trans",
        starting_offsets="latest", max_offsets_per_trigger=5000,
    )
    assert reader.fmt == "kafka"
    assert reader.opts == {
        "kafka.bootstrap.servers": "broker-a:9092,broker-b:9092",
        "subscribe": "cdc.retail_trans",
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": 5000,
    }
    (row,) = out.collect()
    assert not row["_corrupt"]
    assert row["data"]["trans_id"] == 7 and row["doc_id"] == "shard-1:42"


def test_kafka_reader_default_options(spark):
    reader = _RecordingReader(_binary_df(spark, "value"))
    read_envelope_kafka(_FakeSession(reader), "b:9092", "t")
    assert reader.opts["startingOffsets"] == "earliest"
    assert "maxOffsetsPerTrigger" not in reader.opts


def test_kinesis_reader_options_and_parse(spark):
    reader = _RecordingReader(_binary_df(spark, "data"))
    out = read_envelope_kinesis(
        _FakeSession(reader), "cdc-stream", "us-east-1",
        starting_position="LATEST", endpoint_url="https://localhost:4566",
        consumer_type="EFO",
    )
    assert reader.fmt == "aws-kinesis"
    assert reader.opts == {
        "kinesis.streamName": "cdc-stream",
        "kinesis.region": "us-east-1",
        "kinesis.consumerType": "EFO",
        "kinesis.startingPosition": "LATEST",
        "kinesis.endpointUrl": "https://localhost:4566",
    }
    (row,) = out.collect()
    assert not row["_corrupt"] and row["data"]["trans_id"] == 7


def test_kinesis_reader_defaults(spark):
    reader = _RecordingReader(_binary_df(spark, "data"))
    read_envelope_kinesis(_FakeSession(reader), "s", "eu-west-1")
    assert reader.opts["kinesis.startingPosition"] == "TRIM_HORIZON"
    assert reader.opts["kinesis.consumerType"] == "GetRecords"
    assert "kinesis.endpointUrl" not in reader.opts


def test_corrupt_line_flows_to_dlq_flag_on_transport_path(spark):
    # the downstream _corrupt contract holds regardless of transport
    bad = spark.createDataFrame(
        [(bytearray(b"{not json"),), (bytearray(_WIRE, "utf-8"),)]
    ).toDF("value")
    out = read_envelope_kafka(_FakeSession(_RecordingReader(bad)), "b", "t")
    flags = sorted(r["_corrupt"] for r in out.collect())
    assert flags == [False, True]
