"""Connected components / near-dup cluster collapse (operators/components.py)."""

import pytest
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.components import (
    connected_components,
    keep_canonical,
    near_dup_clusters,
)


def test_connected_components_transitive_chain(spark):
    # a-b, b-c, c-d chain plus an isolated pair: closure must merge
    # the whole chain even though a-d never pair directly
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r.id: r.comp for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_is_deterministic_and_symmetric(spark):
    # direction of the input pairs must not matter
    fwd = spark.createDataFrame([(5, 9), (9, 7)], "id_a long, id_b long")
    rev = spark.createDataFrame([(9, 5), (7, 9)], "id_a long, id_b long")
    as_dict = lambda df: {r.id: r.comp for r in df.collect()}  # noqa: E731
    assert as_dict(connected_components(fwd)) == as_dict(connected_components(rev))
    assert as_dict(connected_components(fwd)) == {5: 5, 9: 5, 7: 5}


def test_connected_components_raises_when_not_converged(spark, monkeypatch):
    # a 6-hop chain cannot converge in 1 round — force the iterative
    # path (the single-task union-find would absorb a graph this small)
    from aws_dms_cdc_data_pipeline_spark.operators import components as C

    monkeypatch.setattr(C, "_SINGLE_TASK_EDGE_LIMIT", 0)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=1)


def test_single_task_and_iterative_paths_agree(spark, monkeypatch):
    """Both implementations produce identical components on a mixed
    graph (chain + clique + singleton-ish pair), long AND string ids."""
    from aws_dms_cdc_data_pipeline_spark.operators import components as C

    long_edges = [(i, i + 1) for i in range(8)] + [(20, 21), (21, 22), (20, 22), (30, 31)]
    str_edges = [(f"d{a:03d}", f"d{b:03d}") for a, b in long_edges]
    for rows, ddl in [
        (long_edges, "id_a long, id_b long"),
        (str_edges, "id_a string, id_b string"),
    ]:
        edges = spark.createDataFrame(rows, ddl)
        fast = {(r["id"], r["comp"]) for r in connected_components(edges).collect()}
        monkeypatch.setattr(C, "_SINGLE_TASK_EDGE_LIMIT", 0)
        slow = {(r["id"], r["comp"]) for r in connected_components(edges).collect()}
        monkeypatch.undo()
        assert fast == slow and fast


def test_near_dup_clusters_keeps_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id for r in near_dup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 3: 0, 5: 0, 1: 1, 2: 2, 4: 4}


def test_keep_canonical_min_id_and_quality(spark):
    docs = spark.createDataFrame(
        [(1, 0.9), (2, 0.1), (3, 0.99), (4, 0.5)], "doc_id long, quality double"
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "doc_id long, cluster_id long"
    )
    kept_min = sorted(r.doc_id for r in keep_canonical(docs, clusters).collect())
    assert kept_min == [1, 4]  # min-id member per cluster
    kept_q = sorted(
        r.doc_id
        for r in keep_canonical(docs, clusters, quality_col="quality").collect()
    )
    assert kept_q == [3, 4]  # highest-quality member per cluster


def test_cluster_sizes_match_pair_closure_on_fixture(spark, sf_dir):
    # every pair's endpoints share a cluster; cluster count + sizes
    # reconcile with the number of documents
    from aws_dms_cdc_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(docs)
    clusters = near_dup_clusters(docs, pairs)
    n_docs = docs.count()
    assert clusters.count() == n_docs
    lab = clusters.withColumnRenamed("doc_id", "id")
    joined = (
        pairs.join(lab.withColumnRenamed("cluster_id", "ca"), pairs.id_a == lab.id)
        .drop("id")
        .join(
            lab.withColumnRenamed("cluster_id", "cb").withColumnRenamed("id", "id2"),
            pairs.id_b == F.col("id2"),
        )
    )
    assert joined.filter(F.col("ca") != F.col("cb")).count() == 0
    kept = keep_canonical(docs, clusters)
    n_clusters = clusters.select("cluster_id").distinct().count()
    assert kept.count() == n_clusters <= n_docs
