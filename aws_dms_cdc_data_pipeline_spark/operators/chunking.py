"""Document chunking — fixed-size token windows with overlap.

The step between a cleaned corpus and a tokenizer: split every
document into ``chunk_tokens``-sized windows advancing by
``chunk_tokens - overlap_tokens``, so consecutive chunks share
``overlap_tokens`` tokens of context. Extension beyond the
reference's surface (SURVEY.md §2.7) sized for the 100 TB case:
pure JVM projection + one generator explode — no shuffle, no UDF,
no state; output partitioning follows the input scan, so a
downstream repartition/bucketing decides layout exactly once.

Window rule (portable to the SQL oracle): start positions are
``1, 1+stride, …`` up to ``max(n_tokens - overlap_tokens, 1)`` —
every token lands in ≥1 chunk, the final chunk may be short, and a
document shorter than one chunk yields exactly one chunk. Documents
with no tokens yield no rows (nothing to train on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap_tokens: int = 8,
) -> DataFrame:
    """(id_col, chunk_id, chunk_text, n_tokens) — whitespace-token
    windows of ``chunk_tokens`` with ``overlap_tokens`` overlap.

    chunk_id is the 0-based window index ((start-1)/stride), so a
    chunk's provenance (doc, offset) is reconstructible — the lineage
    a training pipeline needs for dedup-at-chunk-level or contamination
    tracebacks.
    """
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap_tokens < chunk_tokens, got "
            f"overlap={overlap_tokens}, chunk={chunk_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    c = F.col(text_col)
    toks = df.filter(F.length(F.trim(c)) > 0).select(
        id_col, F.split(F.trim(c), r"\s+").alias("_ws")
    )
    n = F.size(F.col("_ws"))
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(overlap_tokens), F.lit(1)), F.lit(stride)
    )
    exploded = toks.select(
        id_col, "_ws", F.explode(starts).alias("_start")
    )
    return exploded.select(
        id_col,
        ((F.col("_start") - 1) / stride).cast("long").alias("chunk_id"),
        F.array_join(
            F.slice(F.col("_ws"), F.col("_start"), chunk_tokens), " "
        ).alias("chunk_text"),
        F.least(
            F.lit(chunk_tokens), F.size(F.col("_ws")) - F.col("_start") + 1
        ).cast("long").alias("n_tokens"),
    )
