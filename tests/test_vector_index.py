"""Persistent vector index: ensure/serve/append lifecycle parity —
indexed serving is bit-identical to the session-memoized paths on
the same trained artifacts (E25/E209 made durable, the token-index
precedent)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from tests.conftest import spark  # noqa: F401 (fixture)


def _mk_vectors(spark, n=240, dim=16, start=0):
    rows = []
    for i in range(start, start + n):
        # deterministic, well-spread: a few crude clusters + noise
        base = [(i % 5) * 1.0] * dim
        vec = [
            base[j] + ((i * 31 + j * 7) % 13) / 13.0
            for j in range(dim)
        ]
        vec[0] += (i % 97) / 97.0  # break period-65 duplicates
        rows.append((i, vec))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _queries(spark, vecs, n=4):
    return vecs.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_indexed_parity_and_idempotence(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.ivf import (
        ivf_topk,
        train_quantizer,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.vector_index import (
        ensure_vector_index,
        ivf_topk_indexed,
        load_centroids,
    )

    vecs = _mk_vectors(spark)
    q = _queries(spark, vecs)
    tables = ensure_vector_index(
        spark, vecs, "t_vecidx_ivf", n_lists=8, iterations=3
    )
    cents = train_quantizer(vecs, n_lists=8, iterations=3)
    import numpy as np

    # stored centroids round-trip parquet doubles exactly
    assert np.array_equal(load_centroids(spark, tables), cents)
    want = ivf_topk(vecs, q, cents, k=5, n_probe=3)
    got = ivf_topk_indexed(spark, tables, q, k=5, n_probe=3)
    assert _rows(got) == _rows(want)
    # idempotent: a second ensure reuses the tables
    again = ensure_vector_index(
        spark, vecs, "t_vecidx_ivf", n_lists=8, iterations=3
    )
    assert again == tables


def test_pq_indexed_parity(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.pq import (
        encode_pq,
        pq_topk,
        train_pq,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.vector_index import (
        ensure_vector_index,
        load_codebooks,
        pq_topk_indexed,
    )

    vecs = _mk_vectors(spark)
    q = _queries(spark, vecs)
    tables = ensure_vector_index(
        spark, vecs, "t_vecidx_pq", n_lists=8, iterations=2,
        pq_m=4, pq_k=8, pq_sample=240, pq_iterations=4,
    )
    books = train_pq(vecs, m=4, k=8, sample=240, iterations=4)
    import numpy as np

    assert np.array_equal(load_codebooks(spark, tables), books)
    want = pq_topk(encode_pq(vecs, books), books, q, k=5)
    got = pq_topk_indexed(spark, tables, q, k=5)
    assert _rows(got) == _rows(want)


def test_append_matches_rebuild_with_same_artifacts(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.ivf import ivf_topk
    from aws_dms_cdc_data_pipeline_spark.operators.pq import (
        encode_pq,
        pq_topk,
    )
    from aws_dms_cdc_data_pipeline_spark.operators.vector_index import (
        append_to_vector_index,
        ensure_vector_index,
        ivf_topk_indexed,
        load_centroids,
        load_codebooks,
        pq_topk_indexed,
    )

    base = _mk_vectors(spark, n=200)
    batch = _mk_vectors(spark, n=40, start=200)
    full = base.unionByName(batch)
    q = _queries(spark, base)
    tables = ensure_vector_index(
        spark, base, "t_vecidx_app", n_lists=8, iterations=2,
        pq_m=4, pq_k=8, pq_sample=200, pq_iterations=3,
    )
    append_to_vector_index(spark, batch, tables)
    cents = load_centroids(spark, tables)
    books = load_codebooks(spark, tables)
    # union corpus served exactly as a rebuild with the SAME
    # (pre-append) artifacts would serve it
    assert _rows(ivf_topk_indexed(spark, tables, q, k=5, n_probe=3)) \
        == _rows(ivf_topk(full, q, cents, k=5, n_probe=3))
    assert _rows(pq_topk_indexed(spark, tables, q, k=5)) == _rows(
        pq_topk(encode_pq(full, books), books, q, k=5)
    )
    # appended ids are findable
    got_ids = {
        r.vec_id
        for r in ivf_topk_indexed(
            spark, tables,
            batch.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            ).limit(2),
            k=1, n_probe=2,
        ).collect()
    }
    assert got_ids & set(range(200, 240))


def test_compact_vector_index_preserves_results(spark):
    from aws_dms_cdc_data_pipeline_spark.operators.vector_index import (
        append_to_vector_index,
        compact_vector_index,
        ensure_vector_index,
        ivf_topk_indexed,
        pq_topk_indexed,
    )

    base = _mk_vectors(spark, n=160)
    tables = ensure_vector_index(
        spark, base, "t_vecidx_cmp", n_lists=4, iterations=2,
        pq_m=4, pq_k=8, pq_sample=160, pq_iterations=3,
    )
    for start in (160, 200, 240):
        append_to_vector_index(
            spark, _mk_vectors(spark, n=40, start=start), tables
        )
    q = _queries(spark, base)
    before_ivf = _rows(ivf_topk_indexed(spark, tables, q, k=5,
                                        n_probe=2))
    before_pq = _rows(pq_topk_indexed(spark, tables, q, k=5))
    stats = compact_vector_index(spark, tables)
    assert stats["cells"]["files_after"] < stats["cells"]["files_before"]
    assert stats["codes"]["files_after"] <= stats["codes"]["files_before"]
    assert _rows(
        ivf_topk_indexed(spark, tables, q, k=5, n_probe=2)
    ) == before_ivf
    assert _rows(pq_topk_indexed(spark, tables, q, k=5)) == before_pq
