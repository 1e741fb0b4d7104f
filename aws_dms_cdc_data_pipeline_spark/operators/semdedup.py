"""SemDeDup — semantic deduplication over an embedding corpus.

The training-data curation operator from Abbas et al., "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication"
(arXiv:2303.09540): k-means-cluster the embedding space, compare
pairs ONLY within a cluster, connect pairs above a cosine threshold,
and keep one representative per duplicate group. Catches paraphrases
and re-encodings that exact/MinHash dedup (operators/dedup.py) cannot
see, at Σ cluster² cost instead of O(N²).

Spark-first composition — every stage is an existing engine
primitive:

1. :func:`...ivf.train_quantizer` — distributed Lloyd's k-means
   (deterministic hash-sample init, partial-sum updates).
2. :func:`...ivf._assign_cells` — zero-shuffle Arrow-batch argmax
   against the broadcast centroid matrix.
3. Within-cell pair scoring — self-join keyed on the cell id, so the
   exchange partitions by cluster and each task scores one cluster's
   pairs; exact float64 cosine, rounded to 1e-6.
4. :func:`...components.connected_components` — min-label duplicate
   groups (a pair graph, NOT "keep first seen": A~B, B~C must
   collapse to one survivor even when cos(A,C) < τ).
5. Keep = min id per group (the deterministic canonical choice;
   :func:`...components.keep_canonical` offers quality-based choice).

Scale: the cluster count is the knob — E[cluster size] = N/k, pair
work Σ|cell|² ≈ N²/k for balanced cells; the paper runs k ≈ √N. The
corpus embedding vectors are shuffled ONCE (the cell-keyed pair
exchange); centroids/labels move as broadcasts and id-pair edges.

Verification: k-means is iterative (no SQL oracle — rows-only by
design, the E25/E51 precedent); planted-duplicate and transitivity
property tests pin the semantics (tests/test_semdedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.ivf import (
    _assign_cells,
    _normalize,
    train_quantizer,
)
from aws_dms_cdc_data_pipeline_spark.operators.components import (
    connected_components,
)
from aws_dms_cdc_data_pipeline_spark.operators.similarity import (
    cosine_similarity,
)


def semdedup_pairs(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    iterations: int = 4,
    threshold: float = 0.95,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: (id_a, id_b, cosine) with
    id_a < id_b and cosine ≥ threshold, both ids in the same k-means
    cell. The SemDeDup candidate relation (stage 1–3 of the module
    docstring)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    centroids = train_quantizer(
        corpus,
        vec_col=vec_col,
        id_col=id_col,
        n_lists=n_clusters,
        iterations=iterations,
    )
    normed = corpus.select(
        F.col(id_col), _normalize(F.col(vec_col)).alias("_v")
    )
    assigned = _assign_cells(normed, centroids, id_col=id_col).persist()
    a = assigned.alias("a")
    b = assigned.alias("b")
    return (
        a.join(
            b,
            (F.col("a._cell") == F.col("b._cell"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn(
            "cosine",
            F.round(
                cosine_similarity(F.col("a._v"), F.col("b._v")), 6
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cosine",
        )
    )


def semdedup(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    iterations: int = 4,
    threshold: float = 0.95,
) -> DataFrame:
    """Full SemDeDup assignment: one row per corpus vector,
    (id, group, is_kept) — ``group`` is the min-id of the vector's
    duplicate group (its own id when it has no near-duplicate),
    ``is_kept`` marks the one survivor per group. Downstream keeps
    ``is_kept`` rows; the dropped fraction is the paper's dedup rate.
    """
    pairs = semdedup_pairs(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_clusters=n_clusters,
        iterations=iterations,
        threshold=threshold,
    )
    comps = connected_components(pairs, "id_a", "id_b")  # (id, comp)
    ids = corpus.select(F.col(id_col))
    labeled = ids.join(
        comps.withColumnRenamed("id", id_col), id_col, "left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("comp"), F.col(id_col)).alias("group"),
    )
    return labeled.select(
        id_col,
        "group",
        (F.col(id_col) == F.col("group")).alias("is_kept"),
    )


def semdedup_incremental(
    corpus: DataFrame,
    batch: DataFrame,
    centroids,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Incremental SemDeDup ingestion — the E100 contract for the
    semantic tier: an arriving batch is deduplicated against the
    EXISTING corpus (and itself) without ever re-pairing the corpus.
    Centroids come from the original :func:`...ivf.train_quantizer`
    run (memoized — the codebook is the index; retraining per batch
    would move every cell boundary and invalidate prior decisions).

    Pair work is |batch| × (cell sizes touched by the batch): the
    batch assigns to cells in one zero-shuffle Arrow pass, then joins
    corpus vectors AND earlier batch members in the SAME cell only.
    A batch row's duplicate target is the MINIMUM id among its
    matches (corpus ids and smaller batch ids — deterministic, and
    consistent with the full rebuild's min-id survivor rule for the
    pairs this path examines).

    Returns one row per batch vector: (id, dup_of, cosine) — dup_of
    NULL when the vector is novel; cosine is the similarity to the
    kept duplicate target.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    c_norm = corpus.select(
        F.col(id_col), _normalize(F.col(vec_col)).alias("_v")
    )
    b_norm = batch.select(
        F.col(id_col), _normalize(F.col(vec_col)).alias("_v")
    )
    c_asg = _assign_cells(c_norm, centroids, id_col=id_col)
    b_asg = _assign_cells(b_norm, centroids, id_col=id_col).persist()
    # candidate targets: corpus members of the cell, plus batch
    # members with a smaller id (earlier-wins, like the batch rule)
    cand = c_asg.select(
        F.col(id_col).alias("_tid"), F.col("_v").alias("_tv"),
        "_cell", F.lit(False).alias("_from_batch"),
    ).unionByName(
        b_asg.select(
            F.col(id_col).alias("_tid"), F.col("_v").alias("_tv"),
            "_cell", F.lit(True).alias("_from_batch"),
        )
    )
    j = (
        b_asg.alias("n")
        .join(cand.alias("c"), ["_cell"])
        .filter(
            (~F.col("_from_batch"))
            | (F.col("_tid") < F.col(f"n.{id_col}"))
        )
        .withColumn(
            "cosine",
            F.round(cosine_similarity(F.col("n._v"), F.col("_tv")), 6),
        )
        .filter(F.col("cosine") >= threshold)
    )
    # cosine reported for the MIN-id duplicate target (min_by keeps
    # the report aligned with the chosen dup_of)
    best = j.groupBy(F.col(f"n.{id_col}").alias(id_col)).agg(
        F.min("_tid").alias("dup_of"),
        F.min_by("cosine", "_tid").alias("cosine"),
    )
    return (
        b_asg.select(F.col(id_col))
        .join(best, id_col, "left")
        .select(id_col, "dup_of", "cosine")
    )


__all__ = ["semdedup", "semdedup_incremental", "semdedup_pairs"]
