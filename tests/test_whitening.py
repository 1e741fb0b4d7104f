"""PCA whitening: decorrelation, unit variance, layout stability."""

import numpy as np
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.whitening import (
    apply_whitening,
    fit_whitening,
)
from aws_dms_cdc_data_pipeline_spark.session import load_table
from tests.conftest import SF_DIR_ORACLE


def test_whitened_embeddings_are_decorrelated_unit_variance(spark):
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    model = fit_whitening(emb, k=8)
    out = apply_whitening(emb, model)
    x = np.stack([r["whitened"] for r in out.select("whitened").collect()])
    cov = np.cov(x, rowvar=False, bias=True)
    # diagonal ~1, off-diagonal ~0
    assert np.allclose(np.diag(cov), 1.0, atol=1e-2)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-2
    # mean removed
    assert np.abs(x.mean(axis=0)).max() < 1e-6
    # schema: original columns preserved + whitened appended
    assert out.columns == emb.columns + ["whitened"]
    assert out.count() == emb.count()


def test_components_orthonormal_and_variance_ordered(spark):
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    model = fit_whitening(emb, k=6)
    c = model.components
    assert np.allclose(c @ c.T, np.eye(6), atol=1e-8)
    # scales ascend (eigenvalues descend)
    assert all(model.scales[i] <= model.scales[i + 1] + 1e-12
               for i in range(5))


def test_fit_is_layout_stable_within_tolerance(spark):
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    m1 = fit_whitening(emb, k=4)
    m2 = fit_whitening(emb.repartition(13), k=4)
    assert np.allclose(m1.mean, m2.mean, atol=1e-9)
    # eigenvectors are sign-ambiguous: compare spans via projectors
    p1 = m1.components.T @ m1.components
    p2 = m2.components.T @ m2.components
    assert np.allclose(p1, p2, atol=1e-6)


def test_empty_input_raises(spark):
    import pytest

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings").filter(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        fit_whitening(emb)
