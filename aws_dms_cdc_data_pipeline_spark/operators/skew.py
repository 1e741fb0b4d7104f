"""Skew mitigation: salted joins and two-phase salted aggregation.

AQE's skew-join split (on by default in session.py) handles most
sort-merge skew at runtime. Explicit salting remains the tool for

- **skewed aggregations** — one hot key funnels into one reduce task;
  a salt splits it into ``buckets`` partial groups that then combine,
- **deterministic layouts** — when a downstream contract (bucketed
  write, range sort) must not depend on AQE's runtime decisions,
- **broadcast-infeasible hot-key joins** — replicate the small side
  per salt bucket, salt the big side per row.

Salts are derived from deterministic row content, never ``rand()``:
retried/replayed tasks must salt identically or results drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, buckets: int):
    """Deterministic per-row salt in [0, buckets): hash of all columns.

    Same-key rows spread across buckets; identical rows co-locate
    (harmless — salting only needs cardinality, not uniqueness).
    """
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed ``big`` against ``small`` without one hot-key task.

    ``big`` rows get a content-hash salt; ``small`` is replicated once
    per bucket (explode of a literal range — |small| × buckets rows,
    only viable when small is dimension-sized). The join key becomes
    (key, salt): a key with 80% of the data now lands on ``buckets``
    tasks instead of one.

    ``how`` is restricted to big-side-preserving types (inner / left /
    left_semi / left_anti): the small side is replicated ×buckets, so
    right/full would emit every unmatched small-side row once per
    bucket — not a meaningful relation.
    """
    how_norm = how.replace("_", "").lower()
    how_norm = {"semi": "leftsemi", "anti": "leftanti"}.get(how_norm, how_norm)
    if how_norm not in {"inner", "left", "leftouter", "leftsemi", "leftanti"}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "right/full would duplicate unmatched small-side rows per bucket"
        )
    big_s = big.withColumn("_salt", _row_salt(big, buckets))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(b) for b in range(buckets)]))
    )
    out = big_s.join(small_s, [on, "_salt"], how_norm)
    return out.drop("_salt")


def salted_sum(
    df: DataFrame, key: str, value: str, *, buckets: int = 8, alias: str = "total"
) -> DataFrame:
    """Two-phase grouped sum for skewed keys.

    Phase 1 groups by (key, salt) — map-side combine plus ``buckets``
    parallel partials for a hot key; phase 2 combines the partials.
    Decimal accumulation keeps the result bit-identical to a direct
    single-phase sum regardless of how rows split across salts.
    """
    salted = df.withColumn("_salt", _row_salt(df, buckets))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(F.col(value).cast("decimal(18,6)")).alias("_p")
    )
    return partial.groupBy(key).agg(
        F.sum("_p").cast("double").alias(alias)
    )
