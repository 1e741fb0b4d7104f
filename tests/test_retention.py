"""expire_archive: partition-value-driven expiry, idempotent, no scans."""

import datetime as dt
import os

from aws_dms_cdc_data_pipeline_spark.maintenance.retention import (
    expire_archive,
    list_archive_partitions,
)

UTC = dt.timezone.utc


def _mk(root, batch, y, mo, d, h, files=1):
    p = os.path.join(
        root, f"batch_id={batch}", f"year={y:04d}", f"month={mo:02d}",
        f"day={d:02d}", f"hour={h:02d}",
    )
    os.makedirs(p, exist_ok=True)
    for i in range(files):
        with open(os.path.join(p, f"part-{i}.json"), "w") as f:
            f.write("{}\n")
    return p


def test_expires_strictly_older_partitions(tmp_path):
    root = str(tmp_path / "archive")
    old = _mk(root, 1, 2024, 1, 1, 5)
    edge = _mk(root, 1, 2024, 1, 2, 5)   # exactly at cutoff → kept
    new = _mk(root, 2, 2024, 1, 3, 5)
    now = dt.datetime(2024, 1, 3, 5, tzinfo=UTC)

    out = expire_archive(root, keep_hours=24, now=now)
    assert out["expired"] == 1 and out["kept"] == 2
    assert not os.path.exists(old)
    assert os.path.exists(edge) and os.path.exists(new)

    # idempotent rerun
    out2 = expire_archive(root, keep_hours=24, now=now)
    assert out2["expired"] == 0 and out2["kept"] == 2


def test_streamed_archive_layout_is_parsed(spark, tmp_path):
    """The real layout written by the CDC stream parses and expires."""
    from aws_dms_cdc_data_pipeline_spark.generator import (
        GeneratorConfig, write_envelope_jsonl,
    )
    from aws_dms_cdc_data_pipeline_spark.streaming import (
        CdcStreamConfig, start_cdc_stream,
    )

    wire = str(tmp_path / "wire")
    write_envelope_jsonl(GeneratorConfig(n_rows=40, seed=4), wire, files=2)
    cfg = CdcStreamConfig(source_path=wire, sink_root=str(tmp_path / "sink"),
                          trigger_seconds=None)
    start_cdc_stream(spark, cfg).awaitTermination()

    parts = list_archive_partitions(cfg.archive_path)
    assert parts  # the stream wrote hour partitions the parser reads
    newest = max(ts for ts, _ in parts)
    out = expire_archive(
        cfg.archive_path, keep_hours=1,
        now=newest + dt.timedelta(hours=30),
    )
    assert out["expired"] == len(parts) and out["kept"] == 0
    assert not list_archive_partitions(cfg.archive_path)


def test_crashed_tombstone_is_swept(tmp_path):
    root = str(tmp_path / "archive")
    p = _mk(root, 1, 2024, 6, 1, 0)
    os.rename(p, p + ".expired-123")  # crashed mid-expiry
    fresh = _mk(root, 1, 2024, 6, 2, 0)
    out = expire_archive(
        root, keep_hours=240,
        now=dt.datetime(2024, 6, 2, 0, tzinfo=UTC),
    )
    assert out["kept"] == 1 and os.path.exists(fresh)
    assert not os.path.exists(p + ".expired-123")


def test_naive_now_rejected(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="UTC-aware"):
        expire_archive(str(tmp_path), keep_hours=1, now=dt.datetime(2024, 1, 1))
