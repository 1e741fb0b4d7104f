"""The relational core of the CDC pipeline, batch form.

Composition mirrors the reference's data-plane path (SURVEY.md §3.1):
parse (P3) → select table (P1) → [envelopes already mapped, P2] →
PK partitioning (X1) → current-state view (A1). One declarative plan;
Catalyst collapses the filter into the scan and the repartition into
the window's required exchange (no double shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from aws_dms_cdc_data_pipeline_spark import schema as S
from aws_dms_cdc_data_pipeline_spark.operators.selection import select_table
from aws_dms_cdc_data_pipeline_spark.operators.upsert import current_state


def cdc_batch_pipeline(
    envelopes: DataFrame,
    *,
    schema_name: str = S.DEFAULT_SCHEMA_NAME,
    table_name: str = S.DEFAULT_TABLE_NAME,
) -> DataFrame:
    """Typed envelopes → current-state table (bare rows, live keys).

    The explicit repartition of X1 is intentionally *omitted* here:
    current_state's window already requires HashPartitioning on the
    key, so Catalyst plans exactly one exchange — adding repartition()
    first would shuffle twice for the same layout.
    """
    selected = select_table(envelopes, schema_name, table_name)
    return current_state(selected)
