"""IVF (inverted-file) approximate nearest neighbor — the trained
counterpart to the hyperplane LSH in operators/similarity.py.

Structure: a k-means coarse quantizer partitions the corpus into
``n_lists`` cells; a query probes only its ``n_probe`` nearest cells
and exact-re-ranks the candidates. Cost drops from O(N) to
~O(N × n_probe / n_lists) per query while recall stays high when
neighbors cluster.

Spark-first shape:
- cell assignment is a broadcast join against the (tiny) centroid
  relation + ``max_by`` partial aggregation — NOT a generated
  argmin expression chain, which at n_lists×dim literals overflows
  whole-stage codegen and the plan cache.
- training (Lloyd iterations) keeps the corpus distributed — each
  iteration is one job (assign → posexplode → per-dimension mean);
  only the k×dim centroid matrix ever reaches the driver.
- search broadcasts the (query, probed-cell) pairs against the
  cell-assigned corpus, then reuses the two-stage top-k — no corpus
  shuffle beyond the N-row assignment combine.

Vectors are L2-normalized once up front so max-dot ≡ max-cosine.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.similarity import (
    _dot,
    _topk_per_query,
)


def _normalize(vec_col):
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, b: a + b,
        )
    )
    return F.transform(vec_col, lambda x: x.cast("double") / norm)


def _centroid_df(spark, centroids: np.ndarray) -> DataFrame:
    rows = [(i, [float(v) for v in c]) for i, c in enumerate(centroids)]
    return spark.createDataFrame(rows, "_cell int, _centroid array<double>")


def _assign_cells(
    normed: DataFrame, centroids: np.ndarray, *, id_col: str
) -> DataFrame:
    """(id, _v, _cell): nearest centroid per vector via broadcast join
    + max_by — map-side combine keeps the shuffle at one row per id."""
    cdf = _centroid_df(normed.sparkSession, centroids)
    scored = normed.crossJoin(F.broadcast(cdf)).withColumn(
        "_d", _dot(F.col("_v"), F.col("_centroid"))
    )
    best = scored.groupBy(id_col).agg(F.max_by("_cell", "_d").alias("_cell"))
    return normed.join(best, id_col)


def train_quantizer(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 16,
    iterations: int = 4,
) -> np.ndarray:
    """Lloyd's k-means over normalized vectors; returns (n_lists, dim).

    Deterministic init: the ``n_lists`` corpus vectors with smallest
    xxhash64(id) — an order-free hash sample, stable across runs and
    partitionings.
    """
    normed = corpus.select(
        F.col(id_col), _normalize(F.col(vec_col)).alias("_v")
    ).persist()
    seeds = (
        normed.withColumn("_h", F.xxhash64(F.col(id_col)))
        .orderBy("_h")
        .limit(n_lists)
        .collect()
    )
    centroids = np.array([r["_v"] for r in seeds])
    for _ in range(iterations):
        assigned = _assign_cells(normed, centroids, id_col=id_col)
        sums = (
            assigned.select("_cell", F.posexplode("_v").alias("_p", "_x"))
            .groupBy("_cell", "_p")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        new = centroids.copy()
        for r in sums:
            new[r["_cell"], r["_p"]] = r["_m"]
        # re-normalize so dot stays cosine-equivalent next round
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        centroids = new / np.where(norms == 0, 1.0, norms)
    normed.unpersist()
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    *,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Probe the ``n_probe`` nearest cells per query, exact re-rank.

    The (query, cell) probe list is computed driver-side (|queries| ×
    n_probe rows — queries are small by contract) and broadcast; the
    corpus is filtered by cell membership, scored, and reduced by the
    shared two-stage top-k.
    """
    normed = corpus.select(F.col(id_col), _normalize(F.col(vec_col)).alias("_v"))
    cells = _assign_cells(normed, centroids, id_col=id_col)
    probe_rows = []
    for r in queries.collect():
        qv = np.asarray(r[query_vec_col], dtype=np.float64)
        qv = qv / (np.linalg.norm(qv) or 1.0)
        order = np.argsort(-(centroids @ qv))[:n_probe]
        probe_rows.extend(
            (r[query_id_col], int(c), [float(v) for v in qv]) for c in order
        )
    probes = corpus.sparkSession.createDataFrame(
        probe_rows, f"{query_id_col} long, _cell int, _qv array<double>"
    )
    joined = cells.join(F.broadcast(probes), "_cell").withColumn(
        "cosine", F.round(_dot(F.col("_v"), F.col("_qv")), 6)
    )
    return _topk_per_query(joined, k=k, query_id_col=query_id_col, id_col=id_col)
