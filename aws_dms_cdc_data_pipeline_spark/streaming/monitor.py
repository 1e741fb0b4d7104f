"""Per-key CDC arrival-order monitor (bounded stateful streaming).

T2 (per-PK ordering) is ENFORCED by the deterministic version ranking
in operators/upsert.py — a late or re-delivered envelope can never
win over a newer one. What the pipeline lacked was OBSERVABILITY of
how disordered the wire actually is: DMS guarantees commit order per
key only within a task, and a regression there (re-shard, failover,
misconfigured parallel apply) silently raises end-to-end latency even
though state stays correct. This operator watches the envelope stream
and emits one row per ARRIVAL VIOLATION: an envelope whose
(timestamp, transaction-id) is older than the newest already seen for
its key. In-order keys emit nothing.

State is ONE (ts, seq) watermark per key — bytes per key, not
history — held in ``applyInPandasWithState`` with a processing-time
timeout: keys idle longer than ``ttl_ms`` evict themselves, so state
stays bounded over an unbounded key universe (an evicted key that
reappears restarts its watermark — a violation older than the TTL is
below the monitor's resolution by design). Spark 4's
``transformWithStateInPandas`` is the designated successor (native
ValueState TTL and timers); its Python leg needs the protobuf
runtime, which this container doesn't ship — the API contract here
is identical, so the swap is mechanical when it's available.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "trans_id long, ts timestamp, seq long, last_ts timestamp, last_seq long"
)
STATE_SCHEMA = "ts timestamp, seq long"


def _make_monitor(ttl_ms: int | None):
    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_ts, last_seq = state.get if state.exists else (None, None)
        for pdf in pdfs:
            out = []
            # arrival order within the batch IS the wire order the
            # source delivered; iterate it, never re-sort by time
            for ts, seq in zip(pdf["ts"], pdf["seq"]):
                ts = ts.to_pydatetime()
                # nullable transaction-id arrives as NaN in the Arrow
                # batch, not None; NULL ranks below any real txid
                seq = -1 if pd.isna(seq) else int(seq)
                if last_ts is not None and (ts, seq) < (last_ts, last_seq):
                    out.append((int(key[0]), ts, seq, last_ts, last_seq))
                else:
                    last_ts, last_seq = ts, seq
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["trans_id", "ts", "seq", "last_ts", "last_seq"],
                )
        if last_ts is not None:
            state.update((last_ts, last_seq))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)

    return update


def monitor_arrival_order(
    envelopes: DataFrame,
    *,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Attach the ordering monitor to a streaming envelope DataFrame
    (the parsed wire stream: ``data``/``metadata``/``doc_id``).

    Keys by ``data.trans_id``; per-key state is one (ts, seq) pair
    evicted after ``ttl_ms`` of inactivity (None = keep forever).
    Output mode "append": violations are facts, never retracted.

    TTL caveat (measured, not theoretical): pass ``ttl_ms`` only on a
    CONTINUOUS trigger (the production shape, where eviction is what
    bounds state). Under ``Trigger.AvailableNow`` the processing-time
    timeout keeps the microbatch loop alive waiting on timers and the
    query never terminates — for bounded replays leave the default
    ``None`` (state dies with the run anyway).
    """
    keyed = envelopes.select(
        F.col("data.trans_id").alias("trans_id"),
        F.col("metadata.timestamp").alias("ts"),
        F.col("metadata.`transaction-id`").cast("long").alias("seq"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("trans_id").applyInPandasWithState(
        _make_monitor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


__all__ = ["monitor_arrival_order", "OUTPUT_SCHEMA"]
