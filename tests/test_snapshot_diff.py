"""snapshot_diff: change classification, null-safety, validation."""

import pytest

from aws_dms_cdc_data_pipeline_spark.operators.diff import snapshot_diff


@pytest.fixture(scope="module")
def snaps(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),    # unchanged
            (2, "b", 20.0),    # value changes
            (3, None, 30.0),   # null -> value (update)
            (4, "d", 40.0),    # deleted
            (6, None, None),   # stays all-null (unchanged)
        ],
        "id bigint, tag string, val double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 25.0),
            (3, "c", 30.0),
            (5, "e", 50.0),    # inserted
            (6, None, None),
        ],
        "id bigint, tag string, val double",
    )
    return old, new


def test_classification(snaps):
    old, new = snaps
    out = {
        r["id"]: (r["change_type"], r["changed_cols"])
        for r in snapshot_diff(old, new, keys="id").collect()
    }
    assert out == {
        2: ("update", "val"),
        3: ("update", "tag"),
        4: ("delete", ""),
        5: ("insert", ""),
    }  # 1 and 6 (incl. null==null) are unchanged and dropped


def test_multi_column_change_order(spark, snaps):
    old, _ = snaps
    new = spark.createDataFrame(
        [(2, "x", 99.0)], "id bigint, tag string, val double"
    )
    row = (
        snapshot_diff(
            old.filter("id = 2"), new, keys="id", compare_cols=["tag", "val"]
        )
        .collect()[0]
    )
    # changed_cols follows compare_cols order
    assert row["changed_cols"] == "tag,val"


def test_validation(snaps):
    old, new = snaps
    with pytest.raises(ValueError, match="missing columns"):
        snapshot_diff(old, new, keys="id", compare_cols=["nope"])
    with pytest.raises(ValueError, match="no columns to compare"):
        snapshot_diff(
            old.select("id"), new.select("id"), keys="id"
        )
