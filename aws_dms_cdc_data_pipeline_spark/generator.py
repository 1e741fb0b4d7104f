"""Seeded CDC workload generator — envelopes, not SQL.

Port of the value distributions in the reference's only producer,
utils/gen_fake_mysql_data.py:78-104 (random categorical event/device,
conditional amount, pattern-formatted sku/customer_id, bounded random
timestamps), lifted from emitting INSERT statements to emitting the
DMS change envelope directly (reference README.md:454-492), with
knobs the manual probe in the reference exercises implicitly:
insert/update/delete mix, out-of-order delivery within a key,
duplicated records (at-least-once), and records for foreign tables
(dropped by the selection filter).

This is a test fixture / demo source: it materializes rows on the
driver (fine at test scale) and hands them to Spark. At production
scale the stream comes from a real connector (Kinesis/Kafka); the
generator's job is determinism, not throughput.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random
import string
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from aws_dms_cdc_data_pipeline_spark import schema as S

_EPOCH = dt.datetime(2022, 3, 14, 0, 0, 0)  # fixed base → deterministic output


@dataclass
class GeneratorConfig:
    n_rows: int = 100
    seed: int = 42
    # fraction of *change events beyond the initial insert* per verb
    update_fraction: float = 0.3
    delete_fraction: float = 0.1
    # at-least-once: fraction of records emitted twice
    duplicate_fraction: float = 0.0
    # fraction of adjacent records swapped after ordering (out-of-order
    # delivery across keys; per-key order can also be violated when a
    # key's update lands before its insert in wall order)
    shuffle_fraction: float = 0.0
    # records for other tables, to exercise the selection filter (P1)
    foreign_fraction: float = 0.0
    schema_name: str = S.DEFAULT_SCHEMA_NAME
    table_name: str = S.DEFAULT_TABLE_NAME
    operations: tuple[str, ...] = field(default=(S.OP_INSERT,))


def _random_row(rng: random.Random, trans_id: int) -> dict:
    """One retail_trans row, distributions per gen_fake_mysql_data.py:81-90."""
    event = rng.choice(S.EVENT_VALUES)
    return {
        "trans_id": trans_id,
        "customer_id": "".join(rng.choice(string.digits) for _ in range(12)),
        "event": event,
        "sku": (
            "".join(rng.choice(string.ascii_uppercase) for _ in range(2))
            + "".join(rng.choice(string.digits) for _ in range(3))
            + "".join(rng.choice(string.ascii_uppercase) for _ in range(4))
        ),
        "amount": rng.randint(1, 100) if event in ("cart", "purchase") else 1,
        "device": rng.choice(S.DEVICE_VALUES),
        "trans_datetime": _EPOCH + dt.timedelta(seconds=rng.randint(0, 3600)),
    }


def _envelope(
    row: dict,
    op: str,
    capture_ts: dt.datetime,
    txn_id: int,
    seq: int,
    schema_name: str,
    table_name: str,
) -> dict:
    return {
        "data": row,
        "metadata": {
            "timestamp": capture_ts,
            "record-type": S.RECORD_TYPE_DATA,
            "operation": op,
            "partition-key-type": S.PARTITION_KEY_TYPE,
            "schema-name": schema_name,
            "table-name": table_name,
            "transaction-id": txn_id,
        },
        # sink document key: shard-sequence-number analog (README.md:457)
        "doc_id": f"{seq:040d}.0",
    }


def generate_envelopes(cfg: GeneratorConfig) -> list[dict]:
    """Deterministic list of keyed envelopes in delivery order."""
    rng = random.Random(cfg.seed)
    events: list[tuple[int, str, dict]] = []  # (txn, op, row)
    txn = 8590000000  # transaction-id magnitude per README.md:477

    rows: dict[int, dict] = {}
    for i in range(1, cfg.n_rows + 1):
        row = _random_row(rng, i)
        rows[i] = row
        txn += rng.randint(1, 5000)
        events.append((txn, S.OP_INSERT, row))

    n_updates = int(cfg.n_rows * cfg.update_fraction)
    for _ in range(n_updates):
        pk = rng.randint(1, cfg.n_rows)
        row = dict(rows[pk])
        row["event"] = rng.choice(S.EVENT_VALUES)
        row["amount"] = rng.randint(1, 100) if row["event"] in ("cart", "purchase") else 1
        rows[pk] = row
        txn += rng.randint(1, 5000)
        events.append((txn, S.OP_UPDATE, row))

    n_deletes = int(cfg.n_rows * cfg.delete_fraction)
    deleted: set[int] = set()
    while len(deleted) < n_deletes:
        pk = rng.randint(1, cfg.n_rows)
        if pk in deleted:
            continue
        deleted.add(pk)
        txn += rng.randint(1, 5000)
        events.append((txn, S.OP_DELETE, dict(rows[pk])))

    # capture timestamps strictly increasing with transaction order
    out: list[dict] = []
    base = _EPOCH + dt.timedelta(hours=14)
    for seq, (txn_id, op, row) in enumerate(events):
        ts = base + dt.timedelta(milliseconds=137 * seq, microseconds=rng.randint(0, 999))
        out.append(
            _envelope(row, op, ts, txn_id, seq, cfg.schema_name, cfg.table_name)
        )

    # foreign-table noise (exercises selection filter P1)
    n_foreign = int(len(out) * cfg.foreign_fraction)
    for j in range(n_foreign):
        donor = out[rng.randrange(len(out))]
        noise = json.loads(json.dumps(donor, default=str))
        noise["data"]["trans_datetime"] = donor["data"]["trans_datetime"]
        noise["metadata"]["timestamp"] = donor["metadata"]["timestamp"]
        noise["metadata"]["table-name"] = "other_table"
        noise["doc_id"] = f"F{j:039d}.0"
        out.insert(rng.randrange(len(out) + 1), noise)

    # at-least-once duplicates (same doc_id re-delivered)
    n_dup = int(len(out) * cfg.duplicate_fraction)
    for _ in range(n_dup):
        out.insert(rng.randrange(len(out) + 1), out[rng.randrange(len(out))])

    # out-of-order delivery: swap adjacent records
    n_swap = int(len(out) * cfg.shuffle_fraction)
    for _ in range(n_swap):
        k = rng.randrange(len(out) - 1)
        out[k], out[k + 1] = out[k + 1], out[k]

    return out


def envelopes_df(spark: SparkSession, cfg: GeneratorConfig) -> DataFrame:
    """Keyed-envelope DataFrame (schema.KEYED_ENVELOPE_SCHEMA)."""
    rows = [
        (
            tuple(e["data"][f.name] for f in S.DATA_SCHEMA.fields),
            tuple(e["metadata"][f.name] for f in S.METADATA_SCHEMA.fields),
            e["doc_id"],
        )
        for e in generate_envelopes(cfg)
    ]
    return spark.createDataFrame(rows, S.KEYED_ENVELOPE_SCHEMA)


def write_envelope_jsonl(cfg: GeneratorConfig, out_dir: str, files: int = 4) -> list[str]:
    """Write envelopes as one-line JSON files (the DMS wire format,
    dms_aurora_mysql_to_kinesis.py:89) — input for the streaming file
    source in tests."""
    os.makedirs(out_dir, exist_ok=True)

    def default(o):
        if isinstance(o, dt.datetime):
            return o.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
        raise TypeError(type(o))

    envs = generate_envelopes(cfg)
    paths = []
    per = max(1, (len(envs) + files - 1) // files)
    for i in range(0, len(envs), per):
        path = os.path.join(out_dir, f"part-{i // per:05d}.jsonl")
        with open(path, "w") as f:
            for e in envs[i : i + per]:
                f.write(json.dumps(e, default=default) + "\n")
        paths.append(path)
    return paths
