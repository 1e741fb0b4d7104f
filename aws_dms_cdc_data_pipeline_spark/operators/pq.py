"""Product-quantization ANN — the PQ/ADC tier of the vector-search
family (Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011; the FAISS ``PQx`` index).

Completes the engine's ANN ladder: brute-force BLAS (E5/E113) →
hyperplane LSH (E6) → IVF (E25) → int8 scalar quantization (E90) →
PQ (this module). PQ splits each (normalized) vector into ``m``
subvectors, k-means-codes each subspace against a tiny codebook, and
scores queries with an asymmetric distance computation (ADC): a
per-query (m × k) dot-product table computed once driver-side, then
one table-gather + row-sum per corpus code — no float vector math
per candidate at query time, and the stored corpus shrinks from
dim × float32 to m × uint8-scale codes (16× at the registry shape).

Spark shape: codebooks train driver-side on a DETERMINISTIC hash
sample (the xxhash64-smallest rows — FAISS trains PQ codebooks on a
sample too; the codebook is m·k·dsub ≈ KBs). Encoding and ADC
scoring are Arrow-batched mapInPandas passes over the scan-partitioned
corpus — zero shuffles; only (query, id, score) triples and the
batch-local top-k survivors move. Verification is rows-only by design
(k-means is iterative — the E25/E51 precedent); recall and
ADC-exactness property tests pin the semantics
(tests/test_pq.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def train_pq(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    sample: int = 2048,
    iterations: int = 8,
) -> np.ndarray:
    """Train PQ codebooks: returns (m, k, dim/m) float64.

    Deterministic end to end: the training sample is the ``sample``
    corpus rows with smallest xxhash64(id) (order-free, stable across
    partitionings — the train_quantizer precedent); per-subspace
    Lloyd's runs in numpy float64 with init = the first ``k`` sample
    subvectors in hash order; empty cells keep their previous
    centroid. Vectors are L2-normalized first so ADC inner products
    rank like cosine.
    """
    if m < 1 or k < 2:
        raise ValueError("need m >= 1 subspaces and k >= 2 centroids")
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("_v"))
        .withColumn("_h", F.xxhash64(F.col(id_col)))
        .orderBy("_h")
        .limit(sample)
        .collect()
    )
    X = np.array([list(r["_v"]) for r in rows], dtype=np.float64)
    if X.shape[0] < k:
        raise ValueError(
            f"sample ({X.shape[0]}) smaller than k ({k}) — shrink k"
        )
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.where(norms == 0, 1.0, norms)
    dsub = dim // m
    books = np.empty((m, k, dsub))
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        C = Xs[:k].copy()
        for _ in range(iterations):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # first-min: deterministic ties
            for c in range(k):
                members = Xs[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[s] = C
    return books


def encode_pq(
    corpus: DataFrame,
    codebooks: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes): per-subspace nearest-centroid codes — one
    Arrow-batched argmin pass against the broadcast codebooks, zero
    shuffles. Ties go to the lowest code (numpy first-min), a total
    order. Vectors are normalized with the same zero-guard as
    training."""
    import pandas as pd

    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, k, dsub = B.shape
    bc = corpus.sparkSession.sparkContext.broadcast(B)
    id_type = corpus.schema[id_col].dataType.simpleString()

    def enc(batches):
        Bv = bc.value
        cn2 = (Bv**2).sum(axis=2)  # (m, k) centroid norms
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            mn = np.linalg.norm(M, axis=1, keepdims=True)
            M = M / np.where(mn == 0, 1.0, mn)
            codes = np.empty((M.shape[0], m), dtype=np.int32)
            for s in range(m):
                Ms = M[:, s * dsub : (s + 1) * dsub]
                # argmin ||x - c||² = argmin (||c||² - 2 x·c)
                d = cn2[s][None, :] - 2.0 * (Ms @ Bv[s].T)
                codes[:, s] = d.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        enc, schema=f"{id_col} {id_type}, codes array<int>"
    )


def pq_topk(
    codes: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k per query over PQ codes via ADC.

    Per query the (m × k) inner-product table ``T[s][c] = q_s ·
    codebook[s][c]`` is computed once driver-side; each corpus code
    then scores as ``Σ_s T[s][codes[s]]`` — a table gather + row sum
    per Arrow batch, batch-local top-k with the (score desc, id asc)
    tie-break before anything leaves the task (the brute_force_topk
    shape, with the matmul replaced by a gather).

    Returns (query_id, id, approx_score, rank) — approx_score is the
    quantized inner product against the normalized query (rounded
    1e-6), an estimate of cosine.
    """
    import pandas as pd

    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, kc, dsub = B.shape
    qrows = queries.select(query_id_col, query_vec_col).collect()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    id_type = codes.schema[id_col].dataType.simpleString()
    if not qrows:
        empty = codes.sparkSession.createDataFrame(
            [],
            f"{query_id_col} {qid_type}, {id_col} {id_type}, "
            "approx_score double, rank int",
        )
        return empty
    qids = [r[0] for r in qrows]
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    Q = Q / np.where(qn == 0, 1.0, qn)
    # tables: (n_queries, m, kc)
    T = np.stack(
        [Q[:, s * dsub : (s + 1) * dsub] @ B[s].T for s in range(m)],
        axis=1,
    )
    bc = codes.sparkSession.sparkContext.broadcast((qids, T))

    def score(batches):
        bqids, bT = bc.value
        nq = len(bqids)
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
            ids = pdf[id_col].to_numpy()
            n = C.shape[0]
            take = min(k, n)
            frames = []
            for j in range(nq):
                # gather: T[j][s][C[:, s]] summed over s
                s_idx = np.arange(m)[None, :]
                vals = bT[j][s_idx, C].sum(axis=1)
                vals = np.round(vals, 6)
                idx = np.lexsort((ids, -vals))[:take]
                frames.append(
                    pd.DataFrame(
                        {
                            query_id_col: [bqids[j]] * len(idx),
                            id_col: ids[idx],
                            "approx_score": vals[idx],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = codes.select(id_col, "codes").mapInPandas(
        score,
        schema=(
            f"{query_id_col} {qid_type}, {id_col} {id_type}, "
            "approx_score double"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "approx_score", "rank")
    )


__all__ = ["encode_pq", "pq_topk", "train_pq"]
