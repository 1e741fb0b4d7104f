"""IVF quantizer training + probe search: recall and determinism."""

import numpy as np
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators import similarity as V
from aws_dms_cdc_data_pipeline_spark.operators.ivf import ivf_topk, train_quantizer
from aws_dms_cdc_data_pipeline_spark.session import load_table


def test_quantizer_trains_normalized_centroids(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    c1 = train_quantizer(emb, n_lists=8, iterations=2)
    c2 = train_quantizer(emb, n_lists=8, iterations=2)
    assert c1.shape == (8, 64)
    assert np.allclose(c1, c2)  # hash-sample init → deterministic
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)


def test_ivf_recall_and_shape(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.vec_id)
             for r in V.brute_force_topk(emb, queries, k=5).collect()}
    centroids = train_quantizer(emb, n_lists=16, iterations=3)
    approx_rows = ivf_topk(emb, queries, centroids, k=5, n_probe=4).collect()
    approx = {(r.query_id, r.vec_id) for r in approx_rows}
    # every query returns a full k (probed cells hold enough candidates)
    assert len(approx_rows) == len(exact)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3  # random vectors are the ANN worst case
    # each query's own vector is its nearest neighbor — IVF must find it
    self_hits = {(r.query_id, r.vec_id) for r in approx_rows
                 if r.rank == 1}
    assert self_hits == {(q, q) for q in range(8)}


def test_kmeans_cluster_sizes_partition_corpus(spark, sf_dir):
    from aws_dms_cdc_data_pipeline_spark.plans.queries import REGISTRY

    out = REGISTRY["kmeans_cluster_sizes"].fn(spark, sf_dir).collect()
    emb_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_vectors for r in out) == emb_n  # exactly one cell each
    assert 1 < len(out) <= 8
    assert all(0 <= r.cluster < 8 for r in out)
