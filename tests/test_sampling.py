"""Hash sampling: growth-invariant splits, partitioning-independent."""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.sampling import (
    hash_sample,
    with_split,
)
from aws_dms_cdc_data_pipeline_spark.session import load_table


def test_split_assignment_survives_corpus_growth(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    half = docs.filter(F.col("doc_id") < 250)
    full_split = {r.doc_id: r.split for r in with_split(docs).collect()}
    half_split = {r.doc_id: r.split for r in with_split(half).collect()}
    # the eval membership of existing docs never changes as data grows
    assert all(full_split[d] == s for d, s in half_split.items())
    # all three splits are populated roughly per fractions
    counts = {s: 0 for s in ("train", "val", "test")}
    for s in full_split.values():
        counts[s] += 1
    assert counts["train"] > counts["val"] > 0 and counts["test"] > 0


def test_hash_sample_partitioning_independent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = {r.doc_id for r in hash_sample(docs, 0.25).collect()}
    b = {r.doc_id for r in hash_sample(docs.repartition(13), 0.25).collect()}
    assert a == b
    n = docs.count()
    assert 0.15 * n < len(a) < 0.35 * n  # ~25% with hash variance
