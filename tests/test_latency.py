"""T4: a change written to the wire is visible in the current-state
table within ~2 trigger intervals (reference baseline: 5-10 MINUTES;
engine budget: seconds).
"""

import os
import time

from aws_dms_cdc_data_pipeline_spark.generator import (
    GeneratorConfig,
    write_envelope_jsonl,
)
from aws_dms_cdc_data_pipeline_spark.sinks.state_store import StateStore
from aws_dms_cdc_data_pipeline_spark.streaming.pipeline import (
    CdcStreamConfig,
    start_cdc_stream,
)

TRIGGER_S = 2


def test_visibility_within_two_triggers(spark, tmp_path):
    src = str(tmp_path / "wire")
    os.makedirs(src)
    cfg = CdcStreamConfig(source_path=src, sink_root=str(tmp_path / "sink"),
                          trigger_seconds=TRIGGER_S)
    q = start_cdc_stream(spark, cfg)
    store = StateStore(spark, cfg.state_path)
    try:
        # let the stream settle into its cadence, then deliver a change
        time.sleep(TRIGGER_S + 1)
        write_envelope_jsonl(
            GeneratorConfig(n_rows=5, update_fraction=0.0, delete_fraction=0.0),
            str(tmp_path / "stage"),
            files=1,
        )
        import glob
        import shutil

        t0 = time.time()
        shutil.move(
            glob.glob(str(tmp_path / "stage" / "*.jsonl"))[0],
            os.path.join(src, "change-1.jsonl"),
        )
        deadline = t0 + 60
        visible_at = None
        while time.time() < deadline:
            try:
                if store.table().count() == 5:
                    visible_at = time.time() - t0
                    break
            except Exception:  # noqa: BLE001  (store not initialized yet)
                pass
            time.sleep(0.5)
        assert visible_at is not None, "change never became visible"
        # generous scheduling slack on a busy CI box; the reference
        # baseline this replaces is 300-600 s
        assert visible_at <= 6 * TRIGGER_S, f"visible after {visible_at:.1f}s"
    finally:
        q.stop()
