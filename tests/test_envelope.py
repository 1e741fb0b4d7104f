"""Envelope operators: P1 selection, P2 mapping, P3 serde, P4 metadata.

Golden contract: the literal document at reference README.md:454-492.
"""

import datetime as dt
import json

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark import schema as S
from aws_dms_cdc_data_pipeline_spark.generator import GeneratorConfig, envelopes_df
from aws_dms_cdc_data_pipeline_spark.operators.envelope import (
    parse_envelopes,
    serialize_envelopes,
    to_envelope,
)
from aws_dms_cdc_data_pipeline_spark.operators.selection import select_table

# the README.md:454-492 example, minus the OpenSearch wrapper
GOLDEN_LINE = json.dumps(
    {
        "data": {
            "trans_id": 6,
            "customer_id": "387378799012",
            "event": "list",
            "sku": "AI6161BEFX",
            "amount": 1,
            "device": "pc",
            "trans_datetime": "2022-03-14T14:17:40Z",
        },
        "metadata": {
            "timestamp": "2022-03-14T14:18:11.104009Z",
            "record-type": "data",
            "operation": "insert",
            "partition-key-type": "primary-key",
            "schema-name": "testdb",
            "table-name": "retail_trans",
            "transaction-id": 8590392498,
        },
    }
)


def test_parse_golden_envelope(spark):
    raw = spark.createDataFrame([(GOLDEN_LINE,)], "value string")
    env = parse_envelopes(raw)
    row = env.collect()[0]
    assert row.data.trans_id == 6
    assert row.data.customer_id == "387378799012"
    assert row.data.amount == 1
    assert row.data.trans_datetime == dt.datetime(2022, 3, 14, 14, 17, 40)
    assert row.metadata["operation"] == "insert"
    assert row.metadata["transaction-id"] == 8590392498
    # µs precision on the event-time axis (README.md:471)
    assert row.metadata["timestamp"] == dt.datetime(2022, 3, 14, 14, 18, 11, 104009)


def test_serde_roundtrip(spark):
    cfg = GeneratorConfig(n_rows=25, update_fraction=0.2, delete_fraction=0.1)
    env = envelopes_df(spark, cfg).drop("doc_id")
    back = parse_envelopes(serialize_envelopes(env))
    a = sorted(map(str, env.collect()))
    b = sorted(map(str, back.collect()))
    assert a == b


def test_selection_filter_drops_foreign_tables(spark):
    cfg = GeneratorConfig(
        n_rows=40, update_fraction=0.0, delete_fraction=0.0, foreign_fraction=0.25
    )
    env = envelopes_df(spark, cfg)
    total = env.count()
    kept = select_table(env).count()
    assert kept == 40  # only the retail_trans inserts survive
    assert total > kept
    assert (
        select_table(env)
        .filter(F.col(S.meta("table-name")) != S.DEFAULT_TABLE_NAME)
        .count()
        == 0
    )


def test_to_envelope_wraps_bare_rows(spark):
    rows = spark.createDataFrame(
        [(1, "c1", "visit", "SKU1", 1, "pc", dt.datetime(2022, 3, 14, 12, 0, 0))],
        S.DATA_SCHEMA,
    )
    env = to_envelope(rows, operation=S.OP_LOAD)
    r = env.collect()[0]
    assert r.data.trans_id == 1
    assert r.metadata["operation"] == "load"
    assert r.metadata["record-type"] == "data"
    assert r.metadata["partition-key-type"] == "primary-key"
    assert r.metadata["schema-name"] == "testdb"
    assert r.metadata["table-name"] == "retail_trans"


def test_schema_drift_report_flags_added_and_dropped_keys(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.envelope import (
        schema_drift_report,
    )

    wire = spark.createDataFrame(
        [
            ('{"a": 1, "b": 2}',),
            ('{"a": 1, "b": 2}',),
            ('{"a": 1, "b": 2, "rogue": 9}',),  # added column
            ('{"a": 1}',),                      # dropped column b
        ],
        "value string",
    )
    rep = {r.key: r for r in schema_drift_report(wire, ["a", "b"]).collect()}
    assert rep["a"].n_present == 4 and rep["a"].n_missing == 0
    assert rep["a"].in_schema == 1
    assert rep["b"].n_present == 3 and rep["b"].n_missing == 1
    assert rep["rogue"].n_present == 1 and rep["rogue"].in_schema == 0
    # an expected key never observed still gets a row
    rep2 = {r.key: r for r in schema_drift_report(wire, ["a", "gone"]).collect()}
    assert rep2["gone"].n_present == 0 and rep2["gone"].n_missing == 4


def test_parse_tolerates_unknown_fields_and_missing_optionals(spark):
    """Schema-evolution tolerance on the wire: a producer adding new
    envelope/data fields must not break ingestion (from_json drops
    unknowns), and absent optional columns parse as NULL without
    tripping the corrupt gate."""
    import json

    from aws_dms_cdc_data_pipeline_spark.sources.envelope_stream import (
        parse_envelope_lines,
    )

    evolved = json.dumps({
        "data": {"trans_id": 5, "customer_id": "C-5", "sku": "S-5",
                 "amount": 1, "trans_datetime": "2022-03-14T14:17:40Z",
                 "NEW_COLUMN": "surprise"},          # added by producer
        "metadata": {"timestamp": "2022-03-14T14:18:11.104009Z",
                     "record-type": "data", "operation": "insert",
                     "partition-key-type": "primary-key",
                     "schema-name": "testdb", "table-name": "retail_trans",
                     "transaction-id": 1,
                     "new-meta": {"nested": True}},  # added by producer
        "doc_id": "d-5",
        "top_level_extra": 42,                        # added by producer
    })
    df = spark.createDataFrame([(evolved,)], "value string")
    (row,) = parse_envelope_lines(df).collect()
    assert not row["_corrupt"]
    assert row["data"]["trans_id"] == 5
    assert row["data"]["event"] is None      # optional absent -> NULL
    assert row["data"]["device"] is None
    assert "NEW_COLUMN" not in row["data"].asDict()
