"""Distributed BPE merge learning over a document corpus.

Byte-pair encoding's classic scalability trick is that merges are a
function of the WORD-FREQUENCY table, not the corpus: a 100 TB corpus
collapses to a ≤ tens-of-millions-row ``(word, weight)`` table after
one map-side-combined groupBy, and every subsequent iteration touches
only that table. This module implements exactly that formulation:

- :func:`word_symbol_table` — one full-corpus pass: split → explode →
  groupBy(word).count(). The only scan of the big data.
- :func:`pair_counts` — weighted adjacent-symbol-pair counts over the
  vocabulary, entirely in JVM array expressions (``transform`` over an
  index ``sequence`` → explode → sum). No Python in the loop.
- :func:`learn_bpe_merges` — iterative greedy merge learning: each
  iteration finds the max-weight pair (ONE row collected to the
  driver — bounded by construction) and rewrites the symbol arrays
  with a left-to-right ``aggregate`` fold (also pure JVM). Lineage is
  truncated with ``localCheckpoint`` every few iterations so the plan
  does not grow with the merge count (same pattern as
  operators/components.py's label propagation).

Determinism: ties on pair weight break on (left, right) lexicographic
order, so the learned merge sequence is a pure function of the corpus.

Reference parity: the reference pipeline has no tokenizer-training
stage (it ships data to OpenSearch — README.md:454-492); this is part
of the LLM-training-data extension surface, modeled on the published
BPE algorithm (Sennrich et al. 2016) re-expressed as DataFrame ops.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BpeMerge:
    rank: int
    left: str
    right: str
    merged: str
    weight: int


def word_symbol_table(
    df: DataFrame, text_col: str = "text", min_word_len: int = 2
) -> DataFrame:
    """One corpus pass → ``(word, weight, symbols)`` vocabulary table.

    ``symbols`` starts as the word's character array; merge learning
    rewrites it in place. Words shorter than ``min_word_len`` carry no
    pairs and are dropped up front.
    """
    words = df.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    ).filter(F.length("word") >= min_word_len)
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("weight"))
        .select("word", "weight", F.split("word", "").alias("symbols"))
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts: ``(left, right, pair_weight)``.

    transform over a 0-based index sequence builds the pair structs
    JVM-side; the groupBy gets map-side partial aggregation. Output
    cardinality is bounded by the (current) symbol alphabet squared,
    not by vocabulary size.
    """
    # size >= 2 BEFORE the index sequence: sequence(0, -1) would count
    # DOWN in Spark, not produce an empty array
    pairs = vocab.filter(F.size("symbols") >= 2).select(
        "weight",
        F.explode(
            F.expr(
                "transform(sequence(0, size(symbols) - 2), "
                "i -> struct(symbols[i] AS left, symbols[i + 1] AS right))"
            )
        ).alias("p"),
    )
    return (
        pairs.select("weight", "p.left", "p.right")
        .groupBy("left", "right")
        .agg(F.sum("weight").cast("long").alias("pair_weight"))
    )


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every symbol array replacing adjacent (left, right) with
    the merged token, left-to-right greedy (matching reference BPE:
    in ``aaa`` the merge (a,a) produces ``[aa, a]``).

    Pure-JVM fold: acc starts empty; each symbol either fuses with the
    fold's last element or appends. The ``size(acc) > 0`` guard
    short-circuits the ANSI-mode ``element_at`` on the empty array.
    """
    lit_l, lit_r, lit_m = F.lit(left), F.lit(right), F.lit(left + right)
    folded = F.aggregate(
        F.col("symbols"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lit_l)
            & (s == lit_r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(lit_m)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return vocab.select("word", "weight", folded.alias("symbols"))


def learn_bpe_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    *,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns a DataFrame
    ``(rank, left, right, merged, weight)`` ordered by rank.

    Each iteration runs one distributed pair-count job and collects
    exactly one row (the argmax pair) — driver traffic is
    O(n_merges), independent of corpus size. Stops early if no pair
    remains. The vocabulary table is localCheckpoint'ed every
    ``checkpoint_every`` iterations to keep the fold lineage flat.
    """
    spark = df.sparkSession
    vocab = word_symbol_table(df, text_col).localCheckpoint(eager=True)
    merges: list[BpeMerge] = []
    for rank in range(n_merges):
        best = (
            pair_counts(vocab)
            .orderBy(F.desc("pair_weight"), "left", "right")
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        merges.append(
            BpeMerge(rank, b["left"], b["right"], b["left"] + b["right"],
                     int(b["pair_weight"]))
        )
        vocab = _apply_merge(vocab, b["left"], b["right"])
        if (rank + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return spark.createDataFrame(
        [(m.rank, m.left, m.right, m.merged, m.weight) for m in merges],
        "rank int, left string, right string, merged string, weight long",
    )


def segment_words(vocab_or_df: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge list to a ``(word, weight, symbols)``
    table (tokenizer application — the inference half of BPE).
    Merges apply in rank order, each as one JVM fold; no shuffles.
    """
    out = vocab_or_df
    for left, right in merges:
        out = _apply_merge(out, left, right)
    return out


def encode_documents(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer INFERENCE — encode documents with a learned merge
    list (the deployment half of BPE: training corpora are tokenized
    with exactly this op before packing/counting).

    The classic scalability trick again, in the other direction:
    encoding is a function of the DISTINCT-WORD table, not the
    corpus — each distinct word is segmented ONCE (merges applied in
    rank order as pure-JVM folds, the :func:`segment_words`
    machinery), then the corpus joins its word occurrences back to
    the ≤vocabulary-sized (word → tokens) map. A 100 TB corpus pays
    one explode + one word-keyed join; the merge folds run over the
    tiny distinct-word relation only.

    Unlike training (which drops sub-``min_word_len`` words — they
    carry no pairs), encoding must cover EVERY word: single-char
    words pass through as their own symbol.

    Returns (id, tokens array<string>, n_tokens) — token order is the
    document's word order with per-word segment order (positions ride
    the aggregation, so the result is partitioning-independent).
    """
    if not merges:
        raise ValueError("encode_documents needs a non-empty merge list")
    words_pos = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.col(text_col), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("_pos", "word"),
    )
    vocab = (
        words_pos.select("word")
        .distinct()
        .select(
            "word",
            F.lit(1).cast("long").alias("weight"),
            F.split("word", "").alias("symbols"),
        )
    )
    seg = segment_words(vocab, merges).select(
        "word", F.col("symbols").alias("_toks")
    )
    per_word = words_pos.join(seg, "word")
    return (
        per_word.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_toks"))
                    ),
                    lambda s: s["_toks"],
                )
            ).alias("tokens")
        )
        .select(
            id_col,
            "tokens",
            F.size("tokens").cast("long").alias("n_tokens"),
        )
    )


def fertility_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    group_cols: tuple = ("lang", "source"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer FERTILITY / compression statistics per corpus
    stratum — the numbers a tokenizer owner watches before training
    on a new mixture: tokens-per-word (fertility; >1 means words
    fragment) and chars-per-token (compression; higher is better) by
    language / source.

    Exact-arithmetic contract: the grouped sums (docs, words,
    whitespace-free chars, BPE tokens) are exact BIGINTs; each ratio
    is ONE IEEE division of those exact sums — bit-identical
    cross-engine. Word = non-empty whitespace split (the
    word_symbol_table contract); chars count the whitespace-free
    text so the denominator is tokenizer-visible characters.
    Documents with zero words tokenize to nothing and are excluded
    from every sum including n_docs (the inner join on the encoded
    relation — mirrored in the oracle).

    Scale shape: token counts ride :func:`encode_documents` (merge
    folds over the DISTINCT-WORD relation, one word-keyed join —
    never per-corpus-row Python); the stats are one groupBy over
    (id, counts) pairs. A 100 TB corpus pays the encode join plus a
    |strata|-sized aggregate.

    Returns (group_cols…, n_docs, n_words, n_chars, n_tokens,
    tokens_per_word, chars_per_token) ordered by the group columns.
    """
    enc = encode_documents(
        docs, merges, text_col=text_col, id_col=id_col
    ).select(id_col, "n_tokens")
    base = docs.select(
        F.col(id_col),
        *[F.col(c) for c in group_cols],
        F.size(
            F.filter(
                F.split(F.col(text_col), r"\s+"), lambda x: x != ""
            )
        ).cast("long").alias("n_words"),
        F.length(
            F.regexp_replace(F.col(text_col), r"\s+", "")
        ).cast("long").alias("n_chars"),
    )
    gcols = [F.col(c) for c in group_cols]
    return (
        base.join(enc, id_col, "inner")
        .groupBy(*gcols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .select(
            *gcols,
            "n_docs",
            "n_words",
            "n_chars",
            "n_tokens",
            (F.col("n_tokens").cast("double")
             / F.col("n_words").cast("double")).alias("tokens_per_word"),
            (F.col("n_chars").cast("double")
             / F.col("n_tokens").cast("double")).alias("chars_per_token"),
        )
        .orderBy(*[F.col(c).asc_nulls_first() for c in group_cols])
    )
