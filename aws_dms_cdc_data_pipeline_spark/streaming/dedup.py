"""Streaming exact dedup — at-least-once wire → exactly-once rows.

The CDC transport is at-least-once (DMS re-sends on failover; the
reference leans on per-PK idempotent indexing to absorb replays —
SURVEY.md §2.5 T1). The state-store path already dedups per key at
merge time; this operator is the STREAM-side equivalent for flows
that bypass the store (archive feeds, training-data taps): drop
re-deliveries of the same record id while it can still plausibly
recur, with watermark-bounded state.

``dropDuplicatesWithinWatermark`` keeps one row per key and expires
a key's state once the watermark passes its event time + delay — so
state is O(keys inside the watermark horizon), not O(stream
history). That bound is what makes this viable on an unbounded
100 TB/day stream; plain ``dropDuplicates`` on a stream would grow
state forever.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

DEFAULT_DEDUP_WATERMARK = "24 hours"  # = replay horizon (kds.py:24)


def dedup_stream(
    events: DataFrame,
    *,
    key_cols: Sequence[str] = ("doc_id",),
    event_time_col: str = "event_ts",
    watermark: str = DEFAULT_DEDUP_WATERMARK,
) -> DataFrame:
    """Keep the first-seen row per ``key_cols`` within the watermark.

    Streaming: watermark on ``event_time_col`` + state-expiring
    dedup — re-deliveries inside the horizon are dropped, state for
    older keys is reclaimed. Batch: plain ``dropDuplicates`` on the
    same keys (the parity oracle; a batch frame has no state to
    bound). A duplicate arriving AFTER the horizon re-emits — the
    contract is the transport's replay window, not forever; size
    ``watermark`` to it.
    """
    keys = list(key_cols)
    if events.isStreaming:
        return events.withWatermark(
            event_time_col, watermark
        ).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
