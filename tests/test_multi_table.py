"""P1 at fleet scale: one wire stream carrying several tables routes
each table to its own pipeline/state store (selection filter does the
fan-out; checkpoints are independent).
"""

import os

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark import schema as S
from aws_dms_cdc_data_pipeline_spark.generator import GeneratorConfig, envelopes_df
from aws_dms_cdc_data_pipeline_spark.operators.envelope import serialize_envelopes
from aws_dms_cdc_data_pipeline_spark.sinks.state_store import StateStore
from aws_dms_cdc_data_pipeline_spark.streaming.pipeline import (
    CdcStreamConfig,
    run_cdc_backfill,
)


def _retag(env, table_name, id_shift):
    """Clone an envelope frame onto another table name + key range."""
    data = F.col("data").withField(
        "trans_id", F.col("data.trans_id") + F.lit(id_shift)
    )
    meta = F.col("metadata").withField("`table-name`", F.lit(table_name))
    return env.select(
        data.alias("data"), meta.alias("metadata"),
        F.concat(F.lit(f"{table_name}-"), F.col("doc_id")).alias("doc_id"),
    )


def test_two_tables_one_wire_route_independently(spark, tmp_path):
    env_a = envelopes_df(spark, GeneratorConfig(n_rows=30, delete_fraction=0.0,
                                                update_fraction=0.0))
    env_b = _retag(
        envelopes_df(spark, GeneratorConfig(n_rows=20, seed=9,
                                            delete_fraction=0.0,
                                            update_fraction=0.0)),
        "orders_log", 100000,
    )
    wire = str(tmp_path / "wire")
    os.makedirs(wire)
    mixed = serialize_envelopes(
        env_a.select("data", "metadata").unionByName(env_b.select("data", "metadata"))
    )
    # re-attach doc ids on the wire line level: write both with doc_id json
    lines_a = env_a.select(F.to_json(F.struct("data", "metadata", "doc_id")).alias("v"))
    lines_b = env_b.select(F.to_json(F.struct("data", "metadata", "doc_id")).alias("v"))
    lines_a.unionByName(lines_b).coalesce(1).write.mode("overwrite").text(wire)
    assert mixed.count() == 50

    cfg_a = CdcStreamConfig(source_path=wire, sink_root=str(tmp_path / "sink_a"),
                            table_name=S.DEFAULT_TABLE_NAME, trigger_seconds=None)
    cfg_b = CdcStreamConfig(source_path=wire, sink_root=str(tmp_path / "sink_b"),
                            table_name="orders_log", trigger_seconds=None)
    run_cdc_backfill(spark, cfg_a)
    run_cdc_backfill(spark, cfg_b)

    table_a = StateStore(spark, cfg_a.state_path).table()
    table_b = StateStore(spark, cfg_b.state_path).table()
    assert table_a.count() == 30
    assert table_b.count() == 20
    assert table_a.filter(F.col("trans_id") > 100000).count() == 0
    assert table_b.filter(F.col("trans_id") <= 100000).count() == 0
    # both archives hold ALL 50 records (backup precedes selection, S6)
    for cfg in (cfg_a, cfg_b):
        import glob

        archived = sum(
            1
            for p in glob.glob(
                os.path.join(cfg.archive_path, "**", "*.json"), recursive=True
            )
            for _ in open(p)
        )
        assert archived == 50
