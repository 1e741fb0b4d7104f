"""Logical plans: the batch CDC pipeline and the analytics queries."""

from aws_dms_cdc_data_pipeline_spark.plans.pipeline import cdc_batch_pipeline  # noqa: F401
