"""Sources: batch fixture readers and the CDC envelope stream."""

from aws_dms_cdc_data_pipeline_spark.sources.envelope_stream import (  # noqa: F401
    read_envelope_stream,
    read_envelope_batch,
)
