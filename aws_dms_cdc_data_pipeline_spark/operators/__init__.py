"""Operator library — each module maps to SURVEY.md §2 inventory rows."""

from aws_dms_cdc_data_pipeline_spark.operators.selection import select_table  # noqa: F401
from aws_dms_cdc_data_pipeline_spark.operators.envelope import (  # noqa: F401
    parse_envelopes,
    serialize_envelopes,
    to_envelope,
    wrap_rows,
)
from aws_dms_cdc_data_pipeline_spark.operators.partitioning import partition_by_key  # noqa: F401
from aws_dms_cdc_data_pipeline_spark.operators.upsert import current_state  # noqa: F401
