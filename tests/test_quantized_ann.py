"""quantized_topk: int8 screen + exact re-rank — recall and edge cases."""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators import similarity as V
from aws_dms_cdc_data_pipeline_spark.session import load_table


def test_quantized_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.vec_id)
             for r in V.brute_force_topk(emb, queries, k=10).collect()}
    quant = {(r.query_id, r.vec_id)
             for r in V.quantized_topk(emb, queries, k=10, rerank_factor=4).collect()}
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, f"recall collapsed: {recall}"
    # re-ranked scores are EXACT cosines: for every overlapping pair
    # the quantized path reports the same score as brute force
    es = {(r.query_id, r.vec_id): r.cosine
          for r in V.brute_force_topk(emb, queries, k=10).collect()}
    qs = {(r.query_id, r.vec_id): r.cosine
          for r in V.quantized_topk(emb, queries, k=10).collect()}
    for key in es.keys() & qs.keys():
        assert es[key] == qs[key]


def test_quantized_handles_zero_vector(spark):
    rows = [(0, [0.0] * 4), (1, [1.0, 0.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = V.quantized_topk(emb, queries, k=2, rerank_factor=1).collect()
    # the zero vector neither crashes the screen nor outranks real hits
    top = [r.vec_id for r in sorted(out, key=lambda r: r.rank)]
    assert top[0] == 1 and len(top) == 2


def test_quantization_is_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    q = emb.select(V._quantize_int8(F.col("embedding")).alias("q"))
    a = [tuple(r.q) for r in q.collect()]
    b = [tuple(r.q) for r in q.repartition(7).collect()]
    assert sorted(a) == sorted(b)
    flat = [v for t in a for v in t]
    assert all(-127 <= v <= 127 for v in flat)
