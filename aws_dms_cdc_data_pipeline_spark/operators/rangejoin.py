"""Range (interval) join — point-in-interval matching at scale.

Naively, ``events.ts BETWEEN iv.start AND iv.end`` plans as a
BroadcastNestedLoopJoin (fine for a handful of intervals, quadratic
disaster otherwise). The scale-clean shape is granule bucketing:

1. explode each interval into the time granules it covers,
2. equi-join events to intervals on the granule (hash join — pushes
   through AQE/skew machinery like any other key join),
3. re-check the exact bounds (granule overlap over-approximates).

Cost: |intervals| × avg_granules rows on the small side, one hash
join instead of a nested loop. Pick the granule near the median
interval length: too fine explodes the interval side, too coarse
inflates candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    ts_col: str,
    start_col: str,
    end_col: str,
    granule: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval containing them.

    ``[start, end)`` semantics. ``granule`` is any Spark window
    duration string; it only affects cost, never the result: the exact
    bounds live INSIDE the join condition (not a post-filter), so
    granule-overlap false positives are non-matches for every join
    type — a left-joined point whose granule collides but whose ts
    misses the bounds correctly comes back NULL-extended.

    ``how`` is restricted to point-side-preserving types (inner /
    left / left_semi / left_anti): right/full would emit the exploded
    interval side's unmatched rows once per granule, which is not a
    meaningful relation.
    """
    how_norm = how.replace("_", "").lower()
    # Spark's bare "semi"/"anti" aliases are point-side-preserving too
    how_norm = {"semi": "leftsemi", "anti": "leftanti"}.get(how_norm, how_norm)
    if how_norm not in {"inner", "left", "leftouter", "leftsemi", "leftanti"}:
        raise ValueError(
            f"range_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "right/full would duplicate unmatched intervals per granule"
        )
    g = F.lit(_granule_seconds(granule))
    iv = intervals.withColumn(
        "_g",
        F.explode(
            F.sequence(
                (F.unix_timestamp(start_col) / g).cast("long"),
                ((F.unix_timestamp(end_col) - F.lit(0.001)) / g).cast("long"),
            )
        ),
    ).alias("_iv")
    pts = points.withColumn(
        "_g", (F.unix_timestamp(ts_col) / g).cast("long")
    ).alias("_pts")
    # granule equality drives the hash join; exact bounds ride along in
    # the same condition (a point hits ≤1 granule row per interval, so
    # no dedup is needed for any supported join type)
    # backtick-quote user column names so dots/specials don't parse
    # as struct access
    cond = (
        (F.col("_pts._g") == F.col("_iv._g"))
        & (F.col(f"_pts.`{ts_col}`") >= F.col(f"_iv.`{start_col}`"))
        & (F.col(f"_pts.`{ts_col}`") < F.col(f"_iv.`{end_col}`"))
    )
    joined = pts.join(iv, cond, how)
    if how_norm in {"leftsemi", "leftanti"}:
        return joined.drop("_g")
    return joined.drop(F.col("_pts._g")).drop(F.col("_iv._g"))


def _granule_seconds(granule: str) -> int:
    qty, unit = granule.split()
    mult = {
        "second": 1,
        "seconds": 1,
        "minute": 60,
        "minutes": 60,
        "hour": 3600,
        "hours": 3600,
        "day": 86400,
        "days": 86400,
    }[unit]
    return int(qty) * mult


def time_rollup(
    df: DataFrame,
    *,
    ts_col: str,
    grains: tuple[str, ...] = ("hour", "day", "month"),
    agg_exprs: list | None = None,
) -> DataFrame:
    """Hypertable-style multi-granularity rollup.

    One pass computes the finest grain; each coarser level re-
    aggregates the previous level's partials (never the raw rows) —
    the continuous-aggregate shape: at 100 TB the day rollup reads
    hour partials (~1/3600 of the data), not the events.

    Output: one frame with a ``grain`` discriminator column and the
    truncated ``bucket`` timestamp. Aggregates must be re-aggregable
    (sum/count/min/max — avg callers carry sum+count).
    """
    agg_exprs = agg_exprs or [F.count(F.lit(1)).alias("n")]
    finest = grains[0]
    # each level persists: the union output references every level, and
    # without materialization Spark would recompute the finer chain
    # once per union branch (the hour agg would run N_grains times) —
    # defeating the whole partial-reuse point. Partials are tiny
    # relative to the input (one row per bucket).
    level = df.groupBy(F.date_trunc(finest, F.col(ts_col)).alias("bucket")).agg(
        *agg_exprs
    ).persist()
    value_cols = [c for c in level.columns if c != "bucket"]
    out = level.withColumn("grain", F.lit(finest))
    prev = level
    for grain in grains[1:]:
        prev = prev.groupBy(
            F.date_trunc(grain, F.col("bucket")).alias("bucket")
        ).agg(*[F.sum(c).alias(c) for c in value_cols]).persist()
        out = out.unionByName(prev.withColumn("grain", F.lit(grain)))
    return out.select("grain", "bucket", *value_cols)
