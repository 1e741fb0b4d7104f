"""Physical-plan scale guards over the whole query registry.

Two operators kill 100 TB runs no matter how correct the results are:
an unconstrained cartesian product (O(N·M) row explosion) and a
row-at-a-time Python UDF (BatchEvalPython — every row crosses the
JVM/Python boundary unvectorized). Neither belongs in ANY registered
query plan: cross joins must ride a broadcast (BroadcastNestedLoopJoin
over a tiny literal/aggregate side is fine and is asserted allowed),
and Python paths must be Arrow-vectorized (ArrowEvalPython /
mapInPandas / FlatMapGroupsInPandas).

This is the regression net for the plan audits in PLANS.md — an
operator change that silently degrades to a cartesian or a per-row
UDF fails here at sf0.001 before it ships.
"""

from __future__ import annotations

import pytest

from aws_dms_cdc_data_pipeline_spark.plans.queries import REGISTRY

# training-loop queries build eagerly (k-means collect per iteration);
# their plan is audited via their operator tests instead
_SKIP = {"kmeans_cluster_sizes", "ann_ivf_topk"}

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", [n for n in REGISTRY if n not in _SKIP])
def test_no_cartesian_or_rowwise_python(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for op in FORBIDDEN:
        assert op not in plan, f"{name}: {op} in physical plan"
