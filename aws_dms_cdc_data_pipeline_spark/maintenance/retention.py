"""Archive retention — the S3 lifecycle-expiration analog.

The reference keeps every raw document in the Firehose backup bucket
indefinitely (an operator attaches S3 lifecycle rules out-of-band);
the engine-native equivalent expires hourly archive partitions past a
retention horizon. Partition VALUES (year/month/day/hour in the
directory names written by streaming/pipeline.py) decide expiry — no
data file is ever opened, so expiring a year of 100 TB archive is a
directory listing plus renames, not a scan.

``now`` is an explicit argument (no wall-clock read inside): retention
is a policy decision, and determinism makes the job replayable and
testable. Deletion is two-phase per partition — rename to a
``.expired-<ts>`` sibling, then remove — so a reader holding the old
directory listing never sees a half-deleted partition.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import re
import shutil

_PART_RE = re.compile(
    r"year=(\d{4})/month=(\d{2})/day=(\d{2})/hour=(\d{2})$"
)


def list_archive_partitions(archive_path: str) -> list[tuple[dt.datetime, str]]:
    """(partition-hour UTC, absolute path) for every hour partition."""
    out = []
    pattern = os.path.join(
        archive_path, "batch_id=*", "year=*", "month=*", "day=*", "hour=*"
    )
    for p in glob.glob(pattern):
        m = _PART_RE.search(p.replace(os.sep, "/"))
        if not m:
            continue
        y, mo, d, h = map(int, m.groups())
        try:
            ts = dt.datetime(y, mo, d, h, tzinfo=dt.timezone.utc)
        except ValueError:
            continue  # malformed partition values never match a policy
        out.append((ts, p))
    return sorted(out)


def expire_archive(
    archive_path: str,
    *,
    keep_hours: int,
    now: dt.datetime,
) -> dict:
    """Delete archive partitions strictly older than ``now - keep_hours``.

    Returns {"expired": n, "kept": n, "cutoff": iso}. Idempotent —
    a rerun with the same ``now`` is a no-op; a crashed run leaves
    either the partition or a ``.expired-*`` tombstone sibling, both
    cleaned by the next run.
    """
    if now.tzinfo is None:
        raise ValueError("expire_archive: pass an explicit UTC-aware now")
    cutoff = now - dt.timedelta(hours=keep_hours)
    expired = kept = 0
    for ts, path in list_archive_partitions(archive_path):
        if ts < cutoff:
            tomb = f"{path}.expired-{int(now.timestamp())}"
            try:
                os.rename(path, tomb)
            except FileNotFoundError:
                pass  # concurrent/crashed expiry already moved it
            shutil.rmtree(tomb, ignore_errors=True)
            expired += 1
        else:
            kept += 1
    # sweep tombstones from crashed earlier runs
    for tomb in glob.glob(
        os.path.join(archive_path, "batch_id=*", "year=*", "month=*",
                     "day=*", "hour=*.expired-*")
    ):
        shutil.rmtree(tomb, ignore_errors=True)
    return {"expired": expired, "kept": kept, "cutoff": cutoff.isoformat()}


__all__ = ["expire_archive", "list_archive_partitions"]
