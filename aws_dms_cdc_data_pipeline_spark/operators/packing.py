"""Sequence packing — fill fixed-token training sequences from chunks.

After chunking (operators/chunking.py), a pretraining pipeline packs
variable-length pieces into fixed-``max_tokens`` sequences to avoid
padding waste. Packing is inherently sequential (which pack a piece
lands in depends on every earlier placement), so this is the
documented custom-operator escape hatch: Arrow-batched
``applyInPandas`` running first-fit-decreasing per shard — NOT
expressible as relational algebra, hence no SQL oracle (the driver
records the weaker rows-only check; pytest asserts the invariants).

Scale shape: items hash into ``num_shards`` shards (deterministic —
pmod(xxhash64(ids))), one shuffle groups each shard onto one task,
and FFD runs on shard-local pandas batches. Packing quality is
shard-local, but FFD's guarantee (≤ 11/9·OPT + 1 bins per shard)
holds per shard and shards are statistically identical samples, so
global waste stays within the same bound. Choose num_shards so a
shard's items fit executor memory (items are (ids, token-count)
tuples — tiny; 1e8 items/shard is still <10 GB).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    items: DataFrame,
    *,
    id_cols: Sequence[str] = ("doc_id", "chunk_id"),
    token_col: str = "n_tokens",
    max_tokens: int = 512,
    num_shards: int = 64,
) -> DataFrame:
    """Assign every item a (shard, pack_id) with Σ tokens ≤ max_tokens
    per pack (an oversized single item gets a pack of its own).

    Deterministic: shard = pmod(xxhash64(id_cols), num_shards); within
    a shard, items are processed in (-tokens, *id_cols) order and
    placed first-fit. Output = input columns + shard + pack_id, so the
    result joins back to the chunk text by the id columns.
    """
    ids = list(id_cols)
    out_schema = T.StructType(
        [items.schema[c] for c in items.columns]
        + [
            T.StructField("shard", T.IntegerType(), False),
            T.StructField("pack_id", T.LongType(), False),
        ]
    )

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [token_col, *ids], ascending=[False] + [True] * len(ids)
        ).reset_index(drop=True)
        remaining: list[int] = []  # free tokens per open pack
        assigned = []
        for tok in pdf[token_col].astype(int):
            placed = None
            for pid, free in enumerate(remaining):
                if tok <= free:
                    placed = pid
                    remaining[pid] = free - tok
                    break
            if placed is None:  # new pack (oversize items sit alone)
                placed = len(remaining)
                remaining.append(max(max_tokens - tok, 0))
            assigned.append(placed)
        pdf["pack_id"] = pd.Series(assigned, dtype="int64")
        return pdf

    sharded = items.withColumn(
        "shard",
        F.pmod(F.xxhash64(*[F.col(c) for c in ids]), F.lit(num_shards)).cast(
            "int"
        ),
    )
    return sharded.groupBy("shard").applyInPandas(ffd, out_schema)


def pack_fixed_blocks(
    items: DataFrame,
    *,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    block_tokens: int = 512,
    num_partitions: int | None = None,
) -> DataFrame:
    """GPT-style concat-and-chunk packing: concatenate every item's
    token stream in deterministic ``id_col`` order and cut it into
    fixed ``block_tokens`` blocks. Items SPLIT across block boundaries
    — zero padding waste, the complement of :func:`pack_sequences`
    (FFD never splits an item but leaves per-pack slack).

    Returns one row per (item × block it overlaps):
    (id_col, block_id, doc_tok_start, doc_tok_end, block_offset) —
    token half-open ranges relative to the item, plus where the slice
    starts inside the block. Zero-token items vanish (they contribute
    no tokens). Pure integer arithmetic → bit-exact cross-engine.

    Scale shape — the global exclusive prefix sum WITHOUT a
    single-partition window: range-partition by id, cumsum within
    each partition (window keyed on the partition id, so no second
    shuffle), then per-partition totals (one tiny row each) prefix-sum
    over ≤ num_partitions rows and broadcast back. The block explode
    emits ceil(tokens/block) rows per item — map-side, no shuffle.
    """
    d = items.select(id_col, F.col(token_col).cast("long").alias("_t")).filter(
        F.col("_t") > 0
    )
    P = num_partitions or d.sparkSession.sparkContext.defaultParallelism
    # ONE full-data exchange: range-partition by id, sort WITHIN each
    # partition (narrow), then an order-preserving Arrow pass computes
    # the partition-local exclusive cumsum. A Window.partitionBy on the
    # partition id would re-shuffle the whole relation a second time —
    # Catalyst can't see that rows are already co-located.
    d = (
        d.repartitionByRange(P, F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .sortWithinPartitions(id_col)
    )

    def _cumsum(batches):
        run = 0
        for pdf in batches:
            t = pdf["_t"]
            pdf = pdf.assign(_local=t.cumsum() - t + run)
            run += int(t.sum())
            yield pdf

    # persisted: both the totals branch and the block explode read this
    # relation — unpersisted, the range shuffle + cumsum would run twice
    # (same plan-keyed cache policy as dedup's inverted index)
    d = d.mapInPandas(
        _cumsum,
        schema=(
            f"`{id_col}` {d.schema[id_col].dataType.simpleString()}, "
            "_t long, _pid int, _local long"
        ),
    ).persist()
    # per-partition totals: ≤ P rows — the single-partition prefix
    # window below is bounded by the partition count, never the data
    totals = d.groupBy("_pid").agg(F.sum("_t").alias("_ptot"))
    w_prefix = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    prefix = totals.withColumn(
        "_poff", F.coalesce(F.sum("_ptot").over(w_prefix), F.lit(0))
    ).select("_pid", "_poff")
    d = d.join(F.broadcast(prefix), "_pid").withColumn(
        "_start", F.col("_poff") + F.col("_local")
    )
    B = F.lit(block_tokens).cast("long")
    blocks = d.select(
        id_col,
        "_start",
        "_t",
        F.explode(
            F.sequence(
                F.expr(f"_start div {block_tokens}"),
                F.expr(f"(_start + _t - 1) div {block_tokens}"),
            )
        ).alias("block_id"),
    )
    lo = F.greatest(F.col("_start"), F.col("block_id") * B)
    hi = F.least(F.col("_start") + F.col("_t"), (F.col("block_id") + 1) * B)
    return blocks.select(
        id_col,
        F.col("block_id").cast("long").alias("block_id"),
        (lo - F.col("_start")).cast("long").alias("doc_tok_start"),
        (hi - F.col("_start")).cast("long").alias("doc_tok_end"),
        (lo - F.col("block_id") * B).cast("long").alias("block_offset"),
    )


def chunk_documents(
    docs: DataFrame,
    *,
    size: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window token chunking — the RAG / long-context
    training shape :func:`pack_fixed_blocks` cannot express: cut each
    document into OVERLAPPING ``size``-token windows every ``stride``
    tokens (overlap = size − stride), so every token appears in ≥1
    chunk and boundary context is preserved. The chunk set covers the
    document and stops at coverage: chunk ``i`` starts at
    ``i·stride``; the count is ``1 + ceil((n − size)/stride)``
    (clamped ≥ 1), so no trailing chunk is emitted whose tokens were
    all covered by its predecessor. Token-less documents vanish.

    Tokens are the engine's standard ``[^a-z0-9]+`` lowercase split —
    chunk boundaries agree with every other token-counting operator
    (E9 token counts, E91 packing, the search tokenizer).

    Returns (id, chunk_idx, start_token, n_tokens, chunk_text);
    ``n_tokens < size`` only on a document's last chunk.

    Scale shape: NO shuffle anywhere — tokenize, a `sequence`
    explode (≤ ceil(n/stride) rows per doc, map-side), and a
    `slice` + `concat_ws` projection, all whole-stage-codegen'd
    JVM expressions; the output stays partitioned like the scan.
    Pure integer arithmetic decides boundaries → bit-exact
    cross-engine.
    """
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")
    if stride > size:
        raise ValueError(
            "stride must be <= size (gaps would drop tokens entirely)"
        )
    S, T = int(size), int(stride)
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        ).alias("_toks"),
    ).withColumn("_n", F.size("_toks").cast("long"))
    # 1 + max(0, ceil((n-S)/T)); integer ceil via (n-S+T-1) DIV T.
    # DIV truncates and DuckDB // floors, but the two only disagree
    # on negative quotients, which the greatest(0, ·) clamp erases.
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0).cast("long"),
        F.expr(f"(_n - {S} + {T - 1}) DIV {T}").cast("long"),
    )
    chunks = (
        toks.filter(F.col("_n") > 0)
        .select(
            F.col(id_col),
            F.col("_toks"),
            F.col("_n"),
            F.explode(
                F.sequence(F.lit(0).cast("long"), n_chunks - F.lit(1))
            ).alias("chunk_idx"),
        )
    )
    start = F.col("chunk_idx") * T
    length = F.least(F.lit(S).cast("long"), F.col("_n") - start)
    return chunks.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_token"),
        length.cast("long").alias("n_tokens"),
        F.concat_ws(
            " ", F.slice("_toks", (start + F.lit(1)).cast("int"), S)
        ).alias("chunk_text"),
    )


def chunk_documents_oracle_sql(
    *,
    size: int,
    stride: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SQL computing the identical chunk set (same tokenizer,
    same integer boundary arithmetic, same space-joined chunk
    text)."""
    S, T = int(size), int(stride)
    return f"""
    WITH toks AS (
        SELECT {id_col},
               list_filter(string_split_regex(lower({text_col}),
                                              '[^a-z0-9]+'),
                           x -> x <> '') AS _toks
        FROM {table}
    ),
    sized AS (
        SELECT {id_col}, _toks,
               CAST(len(_toks) AS BIGINT) AS _n
        FROM toks
        WHERE len(_toks) > 0
    ),
    chunks AS (
        SELECT {id_col}, _toks, _n, CAST(g.i AS BIGINT) AS chunk_idx
        FROM sized,
             LATERAL (SELECT unnest(generate_series(
                 0,
                 greatest(CAST(0 AS BIGINT),
                          (_n - {S} + {T - 1}) // {T})
             )) AS i) g
    )
    SELECT {id_col},
           chunk_idx,
           chunk_idx * {T} AS start_token,
           least(CAST({S} AS BIGINT), _n - chunk_idx * {T}) AS n_tokens,
           array_to_string(
               list_slice(_toks,
                          CAST(chunk_idx * {T} + 1 AS BIGINT),
                          CAST(chunk_idx * {T} + {S} AS BIGINT)),
               ' ') AS chunk_text
    FROM chunks
    """


def span_corruption(
    docs: DataFrame,
    *,
    noise_density: float = 0.15,
    mean_span_length: int = 3,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """T5/UL2-style span corruption — build denoising training
    examples (Raffel et al. 2020 §3.1.4): mask ~``noise_density`` of
    each document's tokens in contiguous spans of mean length
    ``mean_span_length``; the input keeps unmasked tokens with one
    sentinel per masked span, the target holds each sentinel followed
    by the tokens it replaced. Reconstructing input+target
    reproduces the original sequence exactly (asserted in tests).

    DETERMINISTIC where the published recipe samples: span starts
    are chosen by a seeded per-(doc, position) hash threshold
    (P(start) = noise_density / mean_span_length, the stationary
    rate that yields the target density in expectation), span length
    by a second hash over 1..2·mean−1 (mean-preserving). A corpus
    re-run — or the same doc on a different partitioning — always
    produces identical examples; no RNG state anywhere.

    Runs in one Arrow-batched ``mapInPandas`` pass over the
    scan-partitioned corpus (per-doc greedy span walk is inherently
    sequential within a doc — exactly the per-partition imperative
    case the Pandas path exists for). Zero shuffles.

    Returns (id, input_tokens, target_tokens, n_masked, n_spans) —
    sentinels are ``<extra_id_K>`` strings, K in span order (the T5
    convention).
    """
    import hashlib

    import pandas as pd

    if not (0.0 < noise_density < 1.0):
        raise ValueError("noise_density must be in (0, 1)")
    if mean_span_length < 1:
        raise ValueError("mean_span_length must be >= 1")
    start_p = noise_density / mean_span_length
    # threshold on a 32-bit hash slice; span length uniform over
    # 1..2·mean−1 (mean-preserving, matches the integer mean)
    thresh = int(start_p * (1 << 32))
    len_mod = 2 * mean_span_length - 1

    def h32(doc_id, pos, salt):
        raw = hashlib.md5(
            f"{seed}\x1f{salt}\x1f{doc_id}\x1f{pos}".encode()
        ).digest()
        return int.from_bytes(raw[:4], "big")

    id_type = docs.schema[id_col].dataType.simpleString()

    def corrupt(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = {
                id_col: [], "input_tokens": [], "target_tokens": [],
                "n_masked": [], "n_spans": [],
            }
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in (text or "").lower().split() if t]
                inp, tgt = [], []
                i, k, masked = 0, 0, 0
                n = len(toks)
                while i < n:
                    if h32(doc_id, i, "s") < thresh and i < n:
                        span = 1 + h32(doc_id, i, "l") % len_mod
                        sent = f"<extra_id_{k}>"
                        inp.append(sent)
                        tgt.append(sent)
                        tgt.extend(toks[i : i + span])
                        masked += min(span, n - i)
                        i += span
                        k += 1
                    else:
                        inp.append(toks[i])
                        i += 1
                out[id_col].append(doc_id)
                out["input_tokens"].append(inp)
                out["target_tokens"].append(tgt)
                out["n_masked"].append(masked)
                out["n_spans"].append(k)
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(
        corrupt,
        schema=(
            f"{id_col} {id_type}, input_tokens array<string>, "
            "target_tokens array<string>, n_masked long, n_spans long"
        ),
    )


def prefix_lm_split(
    docs: DataFrame,
    *,
    min_prefix: float = 0.1,
    max_prefix: float = 0.9,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Prefix-LM (sequential denoiser) examples — UL2's S-denoiser
    (Tay et al. 2022): split each document at a point drawn from
    [min_prefix, max_prefix] of its length; input = the prefix,
    target = the suffix. DETERMINISTIC split: the fraction comes
    from a seeded per-doc hash (pmod(xxhash64(id, seed), 1000)/1000
    scaled into the band), so re-runs and repartitions agree.

    Pure-JVM expressions (split + slice in one codegen stage), zero
    shuffles. Docs shorter than 2 tokens are dropped (no valid
    split). Returns (id, input_tokens, target_tokens, split_at).
    """
    if not (0.0 <= min_prefix < max_prefix <= 1.0):
        raise ValueError("need 0 <= min_prefix < max_prefix <= 1")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda x: x != F.lit(""),
    )
    base = docs.select(F.col(id_col), toks.alias("_t")).filter(
        F.size("_t") >= 2
    )
    frac = (
        F.lit(float(min_prefix))
        + F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1000))
        .cast("double")
        / F.lit(1000.0)
        * F.lit(float(max_prefix - min_prefix))
    )
    cut = F.greatest(
        F.lit(1),
        F.least(
            F.size("_t") - F.lit(1),
            F.floor(F.size("_t").cast("double") * frac).cast("int"),
        ),
    )
    return base.select(
        F.col(id_col),
        F.slice("_t", F.lit(1), cut).alias("input_tokens"),
        F.slice("_t", cut + F.lit(1), F.size("_t") - cut).alias(
            "target_tokens"
        ),
        cut.cast("long").alias("split_at"),
    )


def ul2_denoiser_mix(
    docs: DataFrame,
    *,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """UL2 mixture-of-denoisers (Tay et al. 2022): every document is
    deterministically assigned one denoiser by hash —

    - ``[R]`` regular span corruption (noise 0.15, mean span 3), 50%
    - ``[X]`` extreme span corruption (noise 0.5, mean span 8), 25%
    - ``[S]`` sequential prefix-LM split, 25%

    — and produces one training example under that objective, with
    the UL2 mode token prepended to the input. The assignment hash,
    the span-corruption hashes, and the prefix split are all seeded
    pure functions of (doc, position): the mixture is reproducible
    across runs and partitionings.

    Each leg processes ONLY its hash-assigned subset (the filters
    push to the scan); the union preserves the per-leg shapes.
    Returns (id, denoiser, input_tokens, target_tokens).
    """
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed + 101)), F.lit(4))
    r_docs = docs.filter(bucket.isin(0, 1))
    x_docs = docs.filter(bucket == 2)
    s_docs = docs.filter(bucket == 3)

    def tag(df, mode):
        return df.select(
            F.col(id_col),
            F.lit(mode).alias("denoiser"),
            F.concat(F.array(F.lit(mode)), F.col("input_tokens")).alias(
                "input_tokens"
            ),
            F.col("target_tokens"),
        )

    r_leg = tag(
        span_corruption(
            r_docs, noise_density=0.15, mean_span_length=3, seed=seed,
            text_col=text_col, id_col=id_col,
        ),
        "[R]",
    )
    x_leg = tag(
        span_corruption(
            x_docs, noise_density=0.5, mean_span_length=8, seed=seed,
            text_col=text_col, id_col=id_col,
        ),
        "[X]",
    )
    s_leg = tag(
        prefix_lm_split(
            s_docs, seed=seed, text_col=text_col, id_col=id_col
        ),
        "[S]",
    )
    return r_leg.unionByName(x_leg).unionByName(s_leg)
