"""remove_boilerplate_lines: planted-boilerplate semantics + plumbing."""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.text import remove_boilerplate_lines


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_strips_planted_boilerplate_preserving_order(spark):
    footer = "subscribe to our newsletter"
    header = "ACME corp all rights reserved"
    rows = [
        ("d1", f"{header}\nunique alpha\nmiddle one\n{footer}"),
        ("d2", f"{header}\nunique beta\n{footer}"),
        ("d3", f"{header}\nunique gamma\nunique delta\n{footer}"),
        ("d4", "entirely unique document\nwith two lines"),
    ]
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(_docs(spark, rows), min_df=3).collect()
    }
    assert out["d1"]["clean_text"] == "unique alpha\nmiddle one"
    assert out["d2"]["clean_text"] == "unique beta"
    assert out["d3"]["clean_text"] == "unique gamma\nunique delta"
    assert out["d4"]["clean_text"] == "entirely unique document\nwith two lines"
    assert out["d1"]["n_lines_removed"] == 2
    assert out["d4"]["n_lines_removed"] == 0


def test_all_boilerplate_doc_survives_as_empty(spark):
    rows = [
        ("d1", "spam line"),
        ("d2", "spam line"),
        ("d3", "spam line\nreal content"),
    ]
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(_docs(spark, rows), min_df=2).collect()
    }
    assert out["d1"]["clean_text"] == "" and out["d1"]["n_lines_kept"] == 0
    assert out["d1"]["n_lines_removed"] == 1
    assert out["d3"]["clean_text"] == "real content"
    assert len(out) == 3  # nobody disappears


def test_trim_and_blank_line_handling(spark):
    rows = [("d1", "  padded  \n\n\n  padded  \nunique")]
    (r,) = remove_boilerplate_lines(_docs(spark, rows), min_df=10).collect()
    # duplicate WITHIN one doc is not boilerplate (df counts documents)
    assert r["clean_text"] == "padded\npadded\nunique"
    assert r["n_lines_removed"] == 0


def test_within_doc_repeats_dont_count_toward_df(spark):
    rows = [
        ("d1", "chorus\nchorus\nchorus\nverse"),
        ("d2", "something else"),
    ]
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(_docs(spark, rows), min_df=2).collect()
    }
    assert out["d1"]["clean_text"] == "chorus\nchorus\nchorus\nverse"


def test_registry_query_matches_duckdb_oracle(spark):
    import duckdb

    from aws_dms_cdc_data_pipeline_spark.plans.queries import REGISTRY
    from tests.conftest import SF_DIR

    qd = REGISTRY["boilerplate_line_removal"]
    got = sorted(tuple(r) for r in qd.fn(spark, SF_DIR).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(qd.oracle).fetchall())
    assert got == want and got
