"""check_constraints: violation counting, NULL strictness, one-scan plan."""

import pytest

from aws_dms_cdc_data_pipeline_spark.operators.expectations import (
    check_constraints,
)


def _df(spark):
    rows = [
        (1, 10, "A"),
        (2, -5, "B"),      # violates amount_non_negative
        (3, None, "A"),    # NULL amount -> violates (unknown != pass)
        (4, 7, None),      # NULL status -> violates enum check
    ]
    return spark.createDataFrame(rows, "id long, amount int, status string")


def test_check_constraints_counts(spark):
    out = {
        r["check_name"]: (r["n_rows"], r["n_violations"], r["pass_flag"])
        for r in check_constraints(
            _df(spark),
            {
                "amount_non_negative": "amount >= 0",
                "status_enum": "status IN ('A', 'B')",
                "id_present": "id IS NOT NULL",
            },
        ).collect()
    }
    assert out["amount_non_negative"] == (4, 2, 0)  # -5 and NULL
    assert out["status_enum"] == (4, 1, 0)          # NULL status
    assert out["id_present"] == (4, 0, 1)


def test_check_constraints_one_scan_no_shuffle(spark):
    df = _df(spark)
    plan = (
        check_constraints(df, {"a": "amount >= 0", "b": "id > 0"})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan
    # a single aggregation: scan appears once
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") <= 1


def test_check_constraints_rejects_empty(spark):
    with pytest.raises(ValueError, match="at least one"):
        check_constraints(_df(spark), {})
