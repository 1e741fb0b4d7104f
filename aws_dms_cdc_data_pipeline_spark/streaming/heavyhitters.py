"""Streaming frequent-items sketch — the E92 heavy-hitters operator's
streaming leg.

Batch ``operators/heavyhitters.heavy_hitters`` proves exact φ-heavy
hitters with a per-partition Misra-Gries candidate pass. On a stream
the same summary runs as CHECKPOINTED state: items shard by content
hash, each shard group maintains one bounded MG(k) counter set inside
``applyInPandasWithState``, and every trigger emits the shard's
current summary. State per shard is ≤ k counters — independent of
both stream length and key cardinality, which is the whole point: a
``groupBy(key).count()`` streaming aggregate would grow state with
every distinct key ever seen.

Downstream, the union of shard summaries at any moment satisfies the
mergeable-summaries bound (Agarwal et al., PODS'12): a key with true
count > Σ_shards n_s/k appears in at least one summary, and each
estimate undercounts by at most n_s/k. Exactness, when needed, comes
from the same second pass the batch operator uses (semi-join the
candidates against the archived stream).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "shard int, item string, est bigint, shard_rows bigint"
STATE_SCHEMA = "items array<string>, counts array<bigint>, n bigint"


def _make_update(k: int):
    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n = state.get
            c = dict(zip(items, counts))
        else:
            c, n = {}, 0
        for pdf in pdfs:
            for v in pdf["item"]:
                n += 1
                if v in c:
                    c[v] += 1
                elif len(c) < k:
                    c[v] = 1
                else:
                    dead = [kk for kk in c if c[kk] == 1]
                    for kk in c:
                        c[kk] -= 1
                    for kk in dead:
                        del c[kk]
        state.update((list(c.keys()), [int(x) for x in c.values()], int(n)))
        # sentinel row (item NULL) ALWAYS emits: an all-distinct shard
        # legitimately ends with an empty MG summary (every counter
        # decremented away — that IS the no-heavy-hitters answer), and
        # without the sentinel such a shard would emit nothing, hiding
        # its row count n_s from the deficit bound Σ n_s/k downstream.
        yield pd.DataFrame(
            {
                "shard": [key[0]] * (len(c) + 1),
                "item": [None, *c.keys()],
                "est": [0, *(int(x) for x in c.values())],
                "shard_rows": [int(n)] * (len(c) + 1),
            }
        )

    return update


def streaming_heavy_hitter_candidates(
    stream: DataFrame,
    col: str,
    *,
    k: int = 256,
    num_shards: int = 8,
) -> DataFrame:
    """Per-trigger MG(k) summaries of ``col`` (cast to string), sharded
    by content hash. Emits (shard, item, est, shard_rows) rows in
    update mode; the latest rows per shard form the live candidate
    set with deficit bound Σ shard_rows / k. Every triggered shard
    also emits one sentinel row with ``item`` NULL carrying its total
    row count — filter ``item IS NOT NULL`` for the candidates.
    """
    prepared = (
        stream.select(F.col(col).cast("string").alias("item"))
        .filter(F.col("item").isNotNull())
        .withColumn(
            "shard",
            F.pmod(F.xxhash64("item"), F.lit(num_shards)).cast("int"),
        )
    )
    return prepared.groupBy("shard").applyInPandasWithState(
        _make_update(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


__all__ = ["streaming_heavy_hitter_candidates"]
