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


def test_quarantine_partitions_rows_with_reasons(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.expectations import (
        quarantine_violations,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -1.0, "A"), (3, 5.0, "X"), (4, -2.0, "X"),
         (5, None, "A")],
        "id long, amount double, flag string",
    )
    checks = {
        "amount_non_negative": "amount >= 0",
        "flag_enum": "flag IN ('A', 'B')",
    }
    good, bad = quarantine_violations(df, checks)
    assert {r["id"] for r in good.collect()} == {1}
    got = {r["id"]: r["violations"] for r in bad.collect()}
    assert got == {
        2: ["amount_non_negative"],
        3: ["flag_enum"],
        4: ["amount_non_negative", "flag_enum"],
        5: ["amount_non_negative"],  # NULL predicate = violation
    }
    # good keeps the original schema exactly
    assert good.columns == df.columns


def test_quarantine_good_plus_bad_is_total(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.expectations import (
        quarantine_violations,
    )
    from aws_dms_cdc_data_pipeline_spark.session import load_table
    from tests.conftest import SF_DIR_ORACLE

    li = load_table(spark, SF_DIR_ORACLE, "lineitem")
    good, bad = quarantine_violations(
        li, {"qty_below_max": "l_quantity < 50"}
    )
    assert good.count() + bad.count() == li.count()
    assert bad.filter("l_quantity < 50").count() == 0
