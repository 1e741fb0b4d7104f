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
from pyspark.sql import DataFrame
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
