"""Benchmark decontamination (operators/contamination.py, E43)."""

from aws_dms_cdc_data_pipeline_spark.operators.contamination import (
    flag_contaminated,
)


def _dfs(spark, docs, probes):
    return (
        spark.createDataFrame(docs, "doc_id long, text string"),
        spark.createDataFrame(probes, "probe_id long, probe_text string"),
    )


def test_flags_doc_sharing_probe_ngram(spark):
    span = "alpha beta gamma delta"
    docs, probes = _dfs(
        spark,
        [
            (1, f"intro words {span} trailing text here"),
            (2, "completely unrelated content with other words entirely"),
        ],
        [(10, f"benchmark question: {span}")],
    )
    got = flag_contaminated(docs, probes, n=4).collect()
    assert [(r.doc_id, r.probe_id) for r in got] == [(1, 10)]
    assert got[0].n_shared_grams == 1


def test_repeated_phrase_counts_once_per_distinct_gram(spark):
    span = "one two three four"
    docs, probes = _dfs(
        spark,
        [(1, f"{span} and again {span}")],  # same gram twice in the doc
        [(10, f"{span} {span}")],           # and twice in the probe
    )
    (row,) = flag_contaminated(docs, probes, n=4).collect()
    # dedup per side: shared DISTINCT grams, not the 2x2 cross product
    assert row.n_shared_grams < 4


def test_short_docs_and_case_whitespace_normalization(spark):
    docs, probes = _dfs(
        spark,
        [(1, "too short"), (2, "Alpha   BETA gamma\tdelta tail")],
        [(10, "alpha beta gamma delta")],
    )
    got = flag_contaminated(docs, probes, n=4).collect()
    # doc 1 has <4 words -> no grams, no reversed-sequence garbage;
    # doc 2 matches despite case/whitespace differences
    assert [(r.doc_id, r.probe_id) for r in got] == [(2, 10)]
