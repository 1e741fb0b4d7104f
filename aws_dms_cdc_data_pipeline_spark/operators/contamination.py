"""Benchmark decontamination — flag docs sharing n-grams with probes.

The published decontamination recipe: a training document is
contaminated if it shares any length-``n`` word n-gram with a
benchmark ("probe") document. Extension beyond the reference's
surface (SURVEY.md §2.7) for the training-data pipeline.

Scale shape: probe suites are benchmark-sized (thousands of docs) —
their gram set broadcasts; the corpus-side grams stream through a
broadcast-hash join, so the 100 TB side is never shuffled and the
only exchange is the final per-(doc, probe) count aggregation over
matches (rare by construction). Grams are deduplicated per side so a
repeated phrase can't inflate the match count quadratically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _word_ngrams(text: Column, n: int) -> Column:
    """Array of word n-grams over normalized text; [] when < n words."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    ws = F.split(norm, " ")
    count = F.size(ws) - F.lit(n - 1)
    # guard: F.sequence(1, stop) runs DESCENDING when stop < 1 — short
    # docs must yield no grams, not reversed garbage
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(ws, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def flag_contaminated(
    docs: DataFrame,
    probes: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "probe_id",
    probe_text_col: str = "probe_text",
) -> DataFrame:
    """(id_col, probe_id, n_shared_grams) for every contaminated
    (document, probe) pair — docs sharing ≥1 word-``n``-gram with a
    probe. Clean documents don't appear; semi-join the output against
    the corpus to drop flagged docs.
    """
    from aws_dms_cdc_data_pipeline_spark.operators.partitioning import (
        fan_out_scan,
    )

    # building n word-grams per position costs ~n string copies per
    # token — an order heavier per source byte than tokenization, so
    # the fan-out guard runs with a proportionally lower bytes bar
    # (the default 2 MB bar left the whole gram build on ONE task for
    # a single-row-group 0.6 MB corpus: measured 3.4 s of this
    # query's 4.0 s).
    d_grams = fan_out_scan(
        docs.select(id_col, text_col),
        min_bytes_per_partition=128 * 1024,
    ).select(
        id_col, F.explode(_word_ngrams(F.col(text_col), n)).alias("_g")
    ).distinct()
    p_grams = probes.select(
        F.col(probe_id_col).alias("probe_id"),
        F.explode(_word_ngrams(F.col(probe_text_col), n)).alias("_g"),
    ).distinct()
    return (
        d_grams.join(F.broadcast(p_grams), "_g")
        .groupBy(id_col, "probe_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
