"""Percolator — standing queries matched against incoming documents.

OpenSearch's percolator inverts search: queries are REGISTERED and
every arriving document is matched against them (the alerting /
saved-search-notification feature of the reference's terminal store).
This is that capability Spark-first:

- the standing query set is SMALL (it is human-authored alert
  definitions) and rides into every task as plan literals;
- each micro-batch prunes its positional token relation to the union
  of all standing terms BEFORE the per-doc window pass — one
  exchange per batch carrying only fixed-width token rows;
- per-query semantics reuse the exact batch operators
  (operators/search.py:_phrase_match), so a percolator hit is
  bit-identical to running the same phrase query ad hoc over the
  batch (asserted in tests — stream ≡ batch).

Standing queries are (query_id, phrase) pairs; a document matches a
query when it contains the full token sequence (match_phrase
semantics, alnum tokenization). Single-term phrases degrade to plain
term alerts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.operators.search import (
    _phrase_match,
    _split_phrase,
    tokenize_positions,
)


def percolate(
    docs: DataFrame,
    standing: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Match every document against every standing phrase query.

    Returns (query_id, id, n_matches), n_matches > 0. One positional
    tokenization of the batch, pruned once to the UNION of all
    standing terms; each query then filters its own terms from the
    shared pruned relation — the batch text is read exactly once no
    matter how many queries stand.
    """
    if not standing:
        raise ValueError("percolate needs at least one standing query")
    parsed = []
    for qid, phrase in standing:
        terms = _split_phrase(phrase)
        if not terms:
            raise ValueError(f"standing query {qid!r} has no tokens")
        parsed.append((qid, terms))
    all_terms = sorted({t for _, terms in parsed for t in terms})
    toks = tokenize_positions(docs, text_col, id_col).filter(
        F.col("term").isin(all_terms)
    )
    outs = []
    for qid, terms in parsed:
        m = _phrase_match(
            toks.filter(F.col("term").isin(sorted(set(terms)))), terms, id_col
        )
        outs.append(m.select(F.lit(qid).alias("query_id"), id_col, "n_matches"))
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def start_percolator(
    docs_stream: DataFrame,
    standing: list[tuple[str, str]],
    alerts_path: str,
    checkpoint_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
    trigger_seconds: int | None = None,
):
    """Run the percolator over a streaming document source; matches
    append to ``alerts_path`` as parquet (query_id, id, n_matches,
    batch_id). Each epoch writes under ``batch_id=N`` so a replayed
    epoch overwrites its own previous attempt — the same idempotent
    layout as the CDC DLQ/archive sinks (streaming/pipeline.py).
    """

    def deliver(batch: DataFrame, epoch_id: int) -> None:
        matches = percolate(
            batch, standing, text_col=text_col, id_col=id_col
        )
        matches.withColumn("batch_id", F.lit(epoch_id)).write.mode(
            "overwrite"
        ).parquet(os.path.join(alerts_path, f"batch_id={epoch_id}"))

    writer = (
        docs_stream.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now or trigger_seconds is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def start_index_maintainer(
    docs_stream: DataFrame,
    idx_table: str,
    dl_table: str,
    checkpoint_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 16,
    available_now: bool = True,
    trigger_seconds: int | None = None,
):
    """Keep the corpus token index current from a document STREAM:
    each micro-batch appends its postings + lengths via
    ``append_to_token_index`` — O(batch) per trigger, the index is
    never rebuilt, and every indexed query (bm25/tfidf, single or
    batch) immediately sees the union corpus (stream ≡ full-rebuild
    parity asserted in tests).

    The checkpoint gives exactly-once batch tracking on the SOURCE
    side; the append itself is at-least-once on replay after a crash
    INSIDE a batch (same caveat as any non-transactional foreachBatch
    sink — a Delta/Iceberg swap makes the append idempotent via
    txn ids; documented, not hidden). New-ids-only contract matches
    ``append_to_token_index``: route documents through the CDC
    dedup/current-state path first if the stream can re-deliver.
    """
    from aws_dms_cdc_data_pipeline_spark.operators.search import (
        append_to_token_index,
    )

    def deliver(batch: DataFrame, epoch_id: int) -> None:
        append_to_token_index(
            batch.sparkSession,
            batch,
            idx_table,
            dl_table,
            text_col=text_col,
            id_col=id_col,
            num_buckets=num_buckets,
        )

    writer = (
        docs_stream.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now or trigger_seconds is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


__all__ = ["percolate", "start_percolator", "start_index_maintainer"]
