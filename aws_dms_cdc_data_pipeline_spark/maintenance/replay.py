"""DLQ replay — the operational loop that closes S7.

The stream dead-letters two kinds of records
(streaming/pipeline.py): malformed wire lines under
``error/batch_id=N/parse/`` and envelopes whose delivery exhausted
the bounded retry budget under ``error/batch_id=N/delivery/``. Both
carry the ORIGINAL wire payload in a ``raw`` column precisely so an
operator can replay them after fixing the cause (parser bug,
downstream outage) — this job is that replay:

- ``delivery`` records are known-good keyed envelopes: re-parse the
  stored JSON and MERGE them into the state store (idempotent — the
  per-key ranking makes a double replay a no-op, T1).
- ``parse`` records re-run the SAME permissive parser the stream
  uses; lines that now parse merge like any envelope, lines that are
  still malformed are re-dead-lettered in place (atomic rewrite), so
  nothing is ever dropped silently.

Consumed batch directories are cleared on success; the job is safe
to run repeatedly and concurrently with the stream (the store merge
is the same idempotent path the stream uses).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.sinks.state_store import StateStore
from aws_dms_cdc_data_pipeline_spark.sources.envelope_stream import (
    parse_envelope_lines,
)


def replay_dlq(
    spark: SparkSession,
    error_path: str,
    store: StateStore,
    *,
    include_contract: bool = False,
) -> dict:
    """Replay every dead-lettered record under ``error_path`` into
    ``store``. Returns counts: ``delivery_replayed``,
    ``parse_replayed``, ``still_corrupt`` (plus
    ``contract_replayed`` when ``include_contract``).

    ``include_contract=True`` additionally replays the CONTRACT
    quarantine (streaming/pipeline.py's third DLQ class). It is
    opt-in because those rows were parked deliberately: re-merging
    them is only correct after the operator has fixed the upstream
    producer or consciously waived the contract — an automatic
    replay would just re-admit the violation.

    Both branches re-run :func:`parse_envelope_lines` — the EXACT
    production parser with its full ``_corrupt`` predicate (missing
    envelope, metadata, data, doc_id, OR the ``data.trans_id`` store
    key). A hand-rolled weaker predicate here once admitted
    trans_id-NULL lines into the store's hash(NULL) bucket, silently
    collapsing distinct malformed records into one winner; reusing the
    parser makes that divergence structurally impossible. Lines still
    corrupt (from either branch) are re-parked, never dropped.
    """
    out = {"delivery_replayed": 0, "parse_replayed": 0, "still_corrupt": 0}
    if include_contract:
        out["contract_replayed"] = 0

    delivery_dirs = sorted(glob.glob(os.path.join(error_path, "batch_id=*", "delivery")))
    parse_dirs = sorted(glob.glob(os.path.join(error_path, "batch_id=*", "parse")))
    contract_dirs = (
        sorted(glob.glob(os.path.join(error_path, "batch_id=*", "contract")))
        if include_contract
        else []
    )
    if not delivery_dirs and not parse_dirs and not contract_dirs:
        return out

    raw_schema = "raw string"
    still_bad = []  # DataFrames of re-parked lines, merged below

    def _split(dirs):
        """(good envelopes, still-corrupt raw lines) via the production parser."""
        raw = spark.read.schema(raw_schema).json(dirs)
        parsed = parse_envelope_lines(raw, line_col="raw").persist()
        good = parsed.filter(~F.col("_corrupt")).select("data", "metadata", "doc_id")
        bad = parsed.filter(F.col("_corrupt")).select(
            F.col("_raw").alias("raw"),
            F.lit("parse-error").alias("error"),
            F.current_timestamp().alias("dead_lettered_at"),
        )
        return parsed, good, bad

    retry_dir = os.path.join(error_path, "batch_id=replay", "parse")
    cached = []
    try:
        if delivery_dirs:
            parsed, good, bad = _split(delivery_dirs)
            cached.append(parsed)
            n_good, n_bad = good.count(), bad.count()
            if n_good:
                store.merge(good)
            out["delivery_replayed"] = n_good
            out["still_corrupt"] += n_bad
            if n_bad:
                still_bad.append(bad)

        if parse_dirs:
            parsed, good, bad = _split(parse_dirs)
            cached.append(parsed)
            n_good, n_bad = good.count(), bad.count()
            if n_good:
                store.merge(good)
            out["parse_replayed"] = n_good
            out["still_corrupt"] += n_bad
            if n_bad:
                still_bad.append(bad)

        if contract_dirs:
            parsed, good, bad = _split(contract_dirs)
            cached.append(parsed)
            n_good, n_bad = good.count(), bad.count()
            if n_good:
                store.merge(good)
            out["contract_replayed"] = n_good
            out["still_corrupt"] += n_bad
            if n_bad:
                still_bad.append(bad)

        # atomic-enough rewrite: stage the survivors, then swap the
        # per-batch error dirs for a single consolidated retry dir
        if still_bad:
            bad_all = still_bad[0]
            for b in still_bad[1:]:
                bad_all = bad_all.unionByName(b)
            staging = retry_dir + ".tmp"
            shutil.rmtree(staging, ignore_errors=True)
            bad_all.write.mode("overwrite").json(staging)
            shutil.rmtree(retry_dir, ignore_errors=True)
            os.replace(staging, retry_dir)
        for d in delivery_dirs + parse_dirs + contract_dirs:
            if os.path.abspath(d) != os.path.abspath(retry_dir):
                shutil.rmtree(d, ignore_errors=True)
        if not still_bad:
            shutil.rmtree(retry_dir, ignore_errors=True)
    finally:
        for p in cached:
            p.unpersist()

    return out


__all__ = ["replay_dlq"]
