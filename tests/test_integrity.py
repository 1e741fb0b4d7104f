"""fk_orphan_audit: orphan/null counting and plan shape."""

import pytest

from aws_dms_cdc_data_pipeline_spark.operators.integrity import fk_orphan_audit


@pytest.fixture(scope="module")
def rel(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, None)],
        "id bigint, fk bigint",
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk bigint")
    return child, parent


def test_counts(rel):
    child, parent = rel
    row = fk_orphan_audit([("c->p", child, "fk", parent, "pk")]).collect()[0]
    assert row["relation"] == "c->p"
    assert row["n_child"] == 5
    assert row["n_null_fk"] == 1   # id=5
    assert row["n_orphans"] == 1   # id=4 -> 99


def test_duplicate_parent_keys_do_not_inflate(rel, spark):
    child, _ = rel
    dup_parent = spark.createDataFrame(
        [(10,), (10,), (20,)], "pk bigint"
    )
    row = fk_orphan_audit([("c->p", child, "fk", dup_parent, "pk")]).collect()[0]
    assert row["n_child"] == 5  # distinct() guards the join fan-out


def test_multiple_relations_union(rel):
    child, parent = rel
    out = fk_orphan_audit(
        [
            ("a", child, "fk", parent, "pk"),
            ("b", parent, "pk", child, "fk"),
        ]
    ).collect()
    assert {r["relation"] for r in out} == {"a", "b"}
    b = next(r for r in out if r["relation"] == "b")
    assert b["n_orphans"] == 1  # pk=30 has no child fk=30


def test_validation(rel):
    child, parent = rel
    with pytest.raises(ValueError, match="no relations"):
        fk_orphan_audit([])
    with pytest.raises(ValueError, match="child column"):
        fk_orphan_audit([("x", child, "nope", parent, "pk")])
    with pytest.raises(ValueError, match="parent column"):
        fk_orphan_audit([("x", child, "fk", parent, "nope")])


def test_reserved_working_names_rejected(spark):
    child = spark.createDataFrame([(1, 1)], "_pk_0 long, other long")
    parent = spark.createDataFrame([(1,)], "pk long")
    with pytest.raises(ValueError, match="reserved"):
        fk_orphan_audit([("c->p", child, "_pk_0", parent, "pk")])
    parent2 = spark.createDataFrame([(1,)], "_n_child long")
    child2 = spark.createDataFrame([(1,)], "fk long")
    with pytest.raises(ValueError, match="reserved"):
        fk_orphan_audit([("c->p", child2, "fk", parent2, "_n_child")])
