"""Embedding PCA / whitening — the standard preprocessing for
similarity search and clustering over learned embeddings.

Why it belongs in a 100 TB pipeline: raw embedding dimensions are
correlated and unequally scaled, which distorts cosine/L2 geometry;
PCA-whitening (project onto principal axes, scale to unit variance)
measurably improves retrieval quality and is the usual precursor to
quantization (operators/similarity.quantized_topk) and IVF training.

Scale shape — the classic two-phase moment computation:

1. One ``mapInPandas`` pass accumulates per-partition moments with
   numpy: row count, Σx (dim), and the Gram matrix Σxxᵀ (dim²
   doubles). Each partition emits ONE row regardless of its row
   count; the reduce combines ≤ P such rows. Nothing data-sized
   crosses the wire — for dim=64 a partial is ~33 KB.
2. The covariance eigendecomposition runs driver-side on the dim×dim
   matrix — bounded by the embedding dimension exactly like IVF's
   k×dim centroids, never by the corpus.

Float caveat (honest): partial sums reduce in partition order, so
trained axes can differ across layouts in the last ulp — acceptable
for a TRAINED transform (like IVF), covered by property tests rather
than a cross-engine oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class WhiteningModel:
    mean: np.ndarray        # (dim,)
    components: np.ndarray  # (k, dim) rows = principal axes
    scales: np.ndarray      # (k,) 1/sqrt(eigenvalue + eps)


def fit_whitening(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    k: int | None = None,
    eps: float = 1e-9,
) -> WhiteningModel:
    """Train mean + top-k whitened principal axes in one data pass."""

    def partials(batches):
        import pandas as pd

        n, s, g = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy())
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gi = x.T @ x
            g = gi if g is None else g + gi
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    rows = df.select(vec_col).mapInPandas(
        partials, schema="n long, s array<double>, g array<double>"
    ).collect()  # ≤ one small row per partition — bounded by P, not data
    if not rows:
        raise ValueError("fit_whitening: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]) for r in rows], axis=0)
    dim = s.shape[0]
    mean = s / n
    cov = g.reshape(dim, dim) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    k = k or dim
    evals, evecs = evals[order[:k]], evecs[:, order[:k]]
    return WhiteningModel(
        mean=mean,
        components=evecs.T.copy(),
        scales=1.0 / np.sqrt(np.maximum(evals, 0.0) + eps),
    )


def apply_whitening(
    df: DataFrame,
    model: WhiteningModel,
    *,
    vec_col: str = "embedding",
    out_col: str = "whitened",
) -> DataFrame:
    """Project embeddings onto the whitened axes (Arrow-vectorized).

    The (k×dim) transform broadcasts inside the UDF closure — tiny,
    like IVF centroids; per batch the projection is one numpy matmul.
    """
    w = (model.components * model.scales[:, None])  # (k, dim)
    mean = model.mean

    def project(batches):
        for pdf in batches:
            if len(pdf):
                x = np.stack(pdf[vec_col].to_numpy())
                pdf = pdf.assign(**{out_col: ((x - mean) @ w.T).tolist()})
            else:
                pdf = pdf.assign(**{out_col: []})
            yield pdf

    in_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(
        project, schema=f"{in_schema}, {out_col} array<double>"
    )


__all__ = ["WhiteningModel", "fit_whitening", "apply_whitening"]
