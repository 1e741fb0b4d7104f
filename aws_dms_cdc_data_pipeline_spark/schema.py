"""Data contracts: the replicated table row and the DMS change envelope.

Source-table DDL: reference README.md:198-208 and
utils/gen_fake_mysql_data.py:20-31 (table ``testdb.retail_trans``).
Envelope wire contract: reference README.md:454-492 and
dms_aurora_mysql_to_kinesis.py:84-117 (one-line JSON,
``{"data": {...after-image...}, "metadata": {...}}``).

Metadata field names are hyphenated on the wire (``record-type``,
``schema-name``, ``table-name``, ``transaction-id``,
``partition-key-type``) — SQL over these columns needs backtick
quoting; helpers below centralize that.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# §1.1 — the replicated row (after-image carried in envelope.data)
# ---------------------------------------------------------------------------

DATA_SCHEMA = T.StructType(
    [
        T.StructField("trans_id", T.LongType(), nullable=False),
        T.StructField("customer_id", T.StringType(), nullable=False),
        T.StructField("event", T.StringType(), nullable=True),
        T.StructField("sku", T.StringType(), nullable=False),
        T.StructField("amount", T.IntegerType(), nullable=True),
        T.StructField("device", T.StringType(), nullable=True),
        T.StructField("trans_datetime", T.TimestampType(), nullable=True),
    ]
)

# ---------------------------------------------------------------------------
# §1.2 — DMS change-record metadata (reference README.md:470-478)
# ---------------------------------------------------------------------------

METADATA_SCHEMA = T.StructType(
    [
        # capture/commit time, microsecond precision, UTC — the
        # event-time axis of the stream.
        T.StructField("timestamp", T.TimestampType(), nullable=False),
        T.StructField("record-type", T.StringType(), nullable=False),
        T.StructField("operation", T.StringType(), nullable=False),
        T.StructField("partition-key-type", T.StringType(), nullable=False),
        T.StructField("schema-name", T.StringType(), nullable=False),
        T.StructField("table-name", T.StringType(), nullable=False),
        T.StructField("transaction-id", T.LongType(), nullable=True),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("data", DATA_SCHEMA, nullable=True),
        T.StructField("metadata", METADATA_SCHEMA, nullable=False),
    ]
)

# Envelope plus the sink document key (the Kinesis shard sequence
# number analog — reference README.md:457 shows _id =
# "49627593537354623426044597072248245532118434881168474130.0").
KEYED_ENVELOPE_SCHEMA = T.StructType(
    list(ENVELOPE_SCHEMA.fields) + [T.StructField("doc_id", T.StringType(), False)]
)

# CDC verbs (reference README.md:473; migration types at
# dms_aurora_mysql_to_kinesis.py:145: cdc → insert/update/delete,
# full-load adds snapshot 'load' records).
OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"
OP_LOAD = "load"
OPERATIONS = (OP_INSERT, OP_UPDATE, OP_DELETE, OP_LOAD)

RECORD_TYPE_DATA = "data"
PARTITION_KEY_TYPE = "primary-key"  # dms_aurora_mysql_to_kinesis.py:121-123

DEFAULT_SCHEMA_NAME = "testdb"  # cdk.context.json:3-6
DEFAULT_TABLE_NAME = "retail_trans"

PRIMARY_KEY = "trans_id"
EVENT_VALUES = ("visit", "view", "cart", "list", "like", "purchase")
DEVICE_VALUES = ("pc", "mobile", "tablet")


def meta(field: str) -> str:
    """SQL-safe reference to a (possibly hyphenated) metadata field."""
    return f"metadata.`{field}`"
