"""Text-encoder plumbing: determinism, normalization, similarity
signal, and composition with the ANN operators."""

import numpy as np
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.embed import embed_documents
from aws_dms_cdc_data_pipeline_spark.operators.similarity import brute_force_topk
from aws_dms_cdc_data_pipeline_spark.session import load_table
from tests.conftest import SF_DIR_ORACLE


def _vecs(df):
    return {r[0]: np.array(r[1], dtype=np.float32) for r in df.collect()}


def test_deterministic_across_partitionings(spark):
    docs = load_table(spark, SF_DIR_ORACLE, "documents").limit(50)
    a = _vecs(embed_documents(docs.repartition(1)))
    b = _vecs(embed_documents(docs.repartition(13)))
    assert set(a) == set(b)
    for k in a:
        assert np.array_equal(a[k], b[k])


def test_unit_norm_and_schema(spark):
    docs = load_table(spark, SF_DIR_ORACLE, "documents").limit(30)
    out = embed_documents(docs, dim=32)
    assert dict(out.dtypes)["embedding"] == "array<float>"
    for v in _vecs(out).values():
        assert len(v) == 32
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_empty_text_is_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, None)], "doc_id long, text string"
    )
    vs = _vecs(embed_documents(df, dim=16))
    assert np.linalg.norm(vs[2]) == 0.0
    assert np.linalg.norm(vs[3]) == 0.0
    assert abs(float(np.linalg.norm(vs[1])) - 1.0) < 1e-5


def test_similarity_signal(spark):
    df = spark.createDataFrame(
        [
            (1, "spark shuffle join aggregate window partition"),
            (2, "spark shuffle join aggregate window broadcast"),  # near-dup of 1
            (3, "entirely different words about cooking pasta dinner"),
        ],
        "doc_id long, text string",
    )
    vs = _vecs(embed_documents(df, dim=64))
    near = float(vs[1] @ vs[2])
    far = float(vs[1] @ vs[3])
    assert near > 0.7 > far


def test_composes_with_brute_force_topk(spark):
    docs = load_table(spark, SF_DIR_ORACLE, "documents").limit(200)
    emb = embed_documents(docs, id_col="doc_id")
    corpus = emb.withColumnRenamed("doc_id", "vec_id")
    queries = (
        emb.filter(F.col("doc_id") < 3)
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    top = brute_force_topk(corpus, queries, k=3).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == 3
        best = max(rows, key=lambda r: r["cosine"])
        assert best["vec_id"] == qid  # self is its own nearest neighbor
        assert abs(best["cosine"] - 1.0) < 1e-4
