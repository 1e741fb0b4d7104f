"""Exact φ-heavy hitters with a bounded-memory candidate pass.

The problem at 100 TB: "which keys exceed φ of all rows" via plain
``groupBy(key).count()`` shuffles EVERY distinct key — the full key
cardinality crosses the wire to answer a question about a handful of
keys. This operator answers it exactly while shuffling almost
nothing:

1. **Candidate pass** — one narrow ``mapInPandas`` scan runs a
   Misra-Gries(k) summary per partition (bounded state: k counters,
   pure Python dict over Arrow batches). MG's deficit bound says an
   item absent from a partition's summary has partition-local count
   ≤ n_p/k; summing over partitions, any item with global count
   > n/k appears in at least one summary. With k ≥ 1/φ the union of
   summaries (≤ k·P tiny rows) therefore CONTAINS every true
   φ-heavy hitter — a proof, not a heuristic.
2. **Exact pass** — the candidate set broadcasts back; only rows
   matching a candidate are counted (semi-join prunes before the
   shuffle), and the exact counts filter on ``cnt·den ≥ n·num``
   (φ = num/den kept rational — integer comparison, bit-exact on
   any engine).

Result: exact answers, two scans, and a shuffle of k·P candidate
rows + candidate-key rows instead of every key. The same MG summary
is the classic streaming frequent-items sketch; the batch shape here
is its mergeable-summaries form (Agarwal et al., "Mergeable
Summaries", PODS'12 — public literature).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries(k) summary keys, one narrow pass."""
    field = df.schema[col]
    out_ddl = f"`{col}` {field.dataType.simpleString()}"

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({col: list(counters.keys())})

    return df.select(col).filter(F.col(col).isNotNull()).mapInPandas(
        mg, schema=out_ddl
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    *,
    phi_num: int = 1,
    phi_den: int = 100,
    k: int | None = None,
) -> DataFrame:
    """Keys of ``col`` whose exact count ≥ (phi_num/phi_den) of all
    non-NULL rows, with their exact counts — (col, cnt, total) rows.

    ``k`` (candidate summary size) defaults to 2·den/num — twice the
    1/φ proof requirement, halving the candidate false-positive rate
    for free (candidates cost ~nothing; only their exact counting
    touches the shuffle).
    """
    if phi_num <= 0 or phi_den <= 0:
        raise ValueError("phi must be a positive fraction")
    k = k or max(2, (2 * phi_den) // phi_num)
    if k * phi_num < phi_den:
        raise ValueError(
            f"k={k} < den/num={phi_den // phi_num}: the MG containment "
            "proof needs k >= 1/phi"
        )
    base = df.select(col).filter(F.col(col).isNotNull())
    cand = _mg_candidates(df, col, k).distinct()
    total = base.agg(F.count(F.lit(1)).cast("long").alias("total"))
    return (
        base.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(phi_den) >= F.col("total") * F.lit(phi_num))
        .select(col, "cnt", "total")
    )


__all__ = ["heavy_hitters"]
