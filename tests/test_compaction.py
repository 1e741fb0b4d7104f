"""Archive compaction: lossless, deduped, fewer files, pruning intact."""

from aws_dms_cdc_data_pipeline_spark.generator import (
    GeneratorConfig,
    write_envelope_jsonl,
)
from aws_dms_cdc_data_pipeline_spark.maintenance.compact import (
    archive_file_count,
    compact_archive,
    read_archive,
)
from aws_dms_cdc_data_pipeline_spark.streaming.pipeline import (
    CdcStreamConfig,
    run_cdc_backfill,
)


def test_compaction_lossless_and_fewer_files(spark, tmp_path):
    src = str(tmp_path / "wire")
    write_envelope_jsonl(
        GeneratorConfig(n_rows=120, update_fraction=0.3, delete_fraction=0.1),
        src,
        files=6,
    )
    cfg = CdcStreamConfig(source_path=src, sink_root=str(tmp_path / "sink"),
                          trigger_seconds=None, max_files_per_trigger=1)
    run_cdc_backfill(spark, cfg)  # 6 micro-batches → 6 batch_id dirs

    raw = read_archive(spark, cfg.archive_path)
    raw_ids = {r.doc_id for r in raw.select("doc_id").collect()}
    raw_files = archive_file_count(spark, cfg.archive_path, ".json")

    out = str(tmp_path / "compacted")
    n = compact_archive(spark, cfg.archive_path, out)
    assert n == len(raw_ids)  # lossless modulo doc_id dedup

    compacted = spark.read.parquet(out)
    assert {r.doc_id for r in compacted.select("doc_id").collect()} == raw_ids
    parquet_files = archive_file_count(spark, out, ".parquet")
    assert parquet_files < raw_files
    # hour-partition layout preserved → partition pruning still applies
    one_hour = compacted.select("year", "month", "day", "hour").first()
    pruned = compacted.filter(
        (compacted.year == one_hour.year) & (compacted.hour == one_hour.hour)
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
