"""Re-aggregatable distinct-count sketches (HLL rollup).

The 100 TB problem this solves: "daily/weekly/monthly distinct
users" computed exactly forces a full rescan of the fact table per
granularity — COUNT(DISTINCT) does not re-aggregate (Σ daily
distincts ≠ weekly distinct). Datasketches HLL DOES: materialize one
tiny sketch per fine-grained bucket ONCE, then any coarser rollup is
a sketch-union over the pre-aggregated relation — bytes per bucket,
no second look at the fact table. This is the standard lakehouse
pre-agg pattern, built on Spark's native `hll_sketch_agg` /
`hll_union_agg` / `hll_sketch_estimate` (Apache DataSketches under
the hood, JVM-side, mergeable across partitions — map-side partials
work exactly like SUM).

Estimates carry ~1.6% relative standard error at lgConfigK=12
(default); tests pin tolerance accordingly. No SQL oracle — DuckdB's
approx_count_distinct uses a different sketch — so registry exposure
is rows-only; the pytest asserts the estimate against the exact
distinct within tolerance AND that rollup-of-sketches equals
sketching the coarser grain directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_sketches(
    df: DataFrame,
    bucket_expr: str,
    distinct_expr: str,
    *,
    bucket_alias: str = "bucket",
    lg_config_k: int = 12,
) -> DataFrame:
    """One HLL sketch (binary) + exact row count per bucket.

    The materialization pass: run once over the fact table at the
    finest grain you'll ever query; every coarser rollup then reads
    only this (tiny) relation.
    """
    return (
        df.groupBy(F.expr(bucket_expr).alias(bucket_alias))
        .agg(
            F.hll_sketch_agg(F.expr(distinct_expr), F.lit(lg_config_k)).alias(
                "sketch"
            ),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


def rollup_sketches(
    sketches: DataFrame,
    rollup_expr: str,
    *,
    rollup_alias: str = "rollup_bucket",
    bucket_alias: str = "bucket",
) -> DataFrame:
    """Coarser-grain distinct estimates from pre-aggregated sketches.

    ``rollup_expr`` maps the fine bucket column to the coarser key
    (e.g. day → week). Sketch union is associative + commutative, so
    this aggregates map-side like a SUM; the fact table is never
    touched.
    """
    return (
        sketches.groupBy(F.expr(rollup_expr).alias(rollup_alias))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch")))
            .cast("long")
            .alias("approx_distinct"),
            F.sum("n_rows").cast("long").alias("n_rows"),
        )
    )


__all__ = [
    "bucket_sketches",
    "rollup_sketches",
    "bottomk_value_sketches",
    "rollup_quantiles",
]


def bottomk_value_sketches(
    df: DataFrame,
    bucket_expr: str,
    value_col: str,
    id_expr: str,
    *,
    bucket_alias: str = "bucket",
    k: int = 1024,
    prefilter: bool = True,
    margin: int = 8,
) -> DataFrame:
    """Mergeable quantile sketch per bucket: the ``k`` rows with the
    SMALLEST ``xxhash64(id)`` keep their values (a KMV/bottom-k
    sketch — Bar-Yossef et al. 2002, the same mergeability backbone
    as theta sketches).

    Why bottom-k-by-hash and not a reservoir: bottom-k is CLOSED
    under union — bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
    bottom-k(B)) EXACTLY, so coarser rollups recompute nothing and
    equal the sketch built directly at the coarse grain bit-for-bit
    (asserted in tests). A seeded reservoir has no such property, and
    Spark's sample() churns with partitioning. The hash is uniform
    over row identities, so kept values are a uniform row sample and
    nearest-rank quantiles over them carry the standard
    O(1/sqrt(k)) rank error.

    Scale shape (``prefilter=True``, the default): collect_list's
    partial aggregation is unbounded — the naive one-pass build
    shuffles EVERY (hash, value) pair per bucket, O(rows) shuffle
    bytes. Instead this runs a cheap counting pass (long agg,
    map-side combined, #buckets output rows), derives a per-bucket
    hash threshold covering ``margin×k`` expected survivors, and
    broadcast-joins it onto the scan so only ~margin×k rows per
    bucket reach the sketch shuffle. The cut is exact whenever ≥
    min(k, n) rows survive — guaranteed in distribution terms
    (P[shortfall] < exp(-k·(margin-1)²/(2·margin)) ≈ 0 for k ≥ 64)
    and guarded structurally: buckets whose filtered sketch came up
    short are rebuilt unfiltered in-plan (AQE collapses the fallback
    branch to an empty relation when, as always in practice, no
    bucket fails). Output is bit-identical to ``prefilter=False``.
    Requires bucket cardinality to fit a broadcast (#buckets ≪
    data — true for time-grain buckets); pass ``prefilter=False``
    for pathological bucket counts, paying the unbounded shuffle.
    """
    base = df.select(
        F.expr(bucket_expr).alias(bucket_alias),
        F.xxhash64(F.expr(id_expr)).alias("_h"),
        F.col(value_col).cast("double").alias("_v"),
    )
    entry = F.struct(F.col("_h").alias("h"), F.col("_v").alias("v"))
    if not prefilter:
        return base.groupBy(bucket_alias).agg(
            F.slice(F.sort_array(F.collect_list(entry)), 1, k).alias("entries"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    counts = base.groupBy(bucket_alias).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    # xxhash64 is uniform over [-2^63, 2^63): keep h ≤ that range's
    # margin·k/n quantile. Double rounding of the cut position only
    # moves the expected-survivor count by ulps — margin dwarfs it.
    frac = F.least(F.lit(1.0), F.lit(float(margin * k)) / F.col("n_rows"))
    thr = counts.withColumn(
        "_t",
        F.when(frac >= 1.0, F.lit(2**63 - 1)).otherwise(
            (F.lit(-(2.0**63)) + frac * F.lit(2.0**64)).cast("long")
        ),
    )
    # every bucket join below is NULL-SAFE: groupBy treats NULL as a
    # group (counts and the prefilter=False path both emit it), so a
    # null-rejecting equi-join here would silently drop the NULL
    # bucket — breaking the bit-identical-to-prefilter=False contract.
    thr_r = thr.select(
        F.col(bucket_alias).alias("_tb"), "n_rows", "_t"
    )
    kept = base.join(
        F.broadcast(thr_r), F.col(bucket_alias).eqNullSafe(F.col("_tb"))
    ).filter(F.col("_h") <= F.col("_t"))
    sk = kept.groupBy(bucket_alias, "n_rows").agg(
        F.slice(F.sort_array(F.collect_list(entry)), 1, k).alias("entries")
    )
    good = sk.filter(F.size("entries") == F.least(F.lit(k), F.col("n_rows")))
    # buckets the probabilistic cut shorted (or dropped entirely):
    # rebuilt exactly; empty in practice, so AQE prunes this branch.
    bad = counts.join(
        good.select(F.col(bucket_alias).alias("_gb")),
        F.col(bucket_alias).eqNullSafe(F.col("_gb")),
        "left_anti",
    )
    bad_r = bad.select(F.col(bucket_alias).alias("_bb"), "n_rows")
    exact_bad = (
        base.join(
            F.broadcast(bad_r), F.col(bucket_alias).eqNullSafe(F.col("_bb"))
        )
        .groupBy(bucket_alias, "n_rows")
        .agg(F.slice(F.sort_array(F.collect_list(entry)), 1, k).alias("entries"))
    )
    return good.unionByName(exact_bad).select(bucket_alias, "entries", "n_rows")


def rollup_quantiles(
    sketches: DataFrame,
    rollup_expr: str,
    probs: list[float],
    *,
    rollup_alias: str = "rollup_bucket",
    k: int = 1024,
) -> DataFrame:
    """Quantile estimates at a coarser grain from pre-built bottom-k
    sketches — the fact table is never touched again.

    Union = flatten + re-sort + re-slice (exact bottom-k of the
    union); estimates are nearest-rank order statistics of the kept
    values, so the output is a deterministic pure function of the
    input multiset. One column per requested probability:
    ``q50``, ``q95``, ... (probability × 100, rounded).
    """
    merged = F.slice(
        F.sort_array(F.flatten(F.collect_list("entries"))), 1, k
    )
    vals = F.array_sort(F.transform(F.col("_m"), lambda e: e["v"]))
    cols = [
        F.element_at(
            vals,
            F.greatest(
                F.ceil(F.size(vals) * F.lit(float(p))).cast("int"), F.lit(1)
            ),
        ).alias(f"q{round(p * 100)}")
        for p in probs
    ]
    return (
        sketches.groupBy(F.expr(rollup_expr).alias(rollup_alias))
        .agg(
            merged.alias("_m"),
            F.sum("n_rows").cast("long").alias("n_rows"),
        )
        .select(rollup_alias, "n_rows", *cols)
    )


# ---------------------------------------------------------------------------
# Count-min sketches: re-aggregatable approximate FREQUENCIES
# ---------------------------------------------------------------------------
#
# The companion problem to the HLL rollup above: "how often did key X
# appear per day/week/month" for an unbounded key domain. Exact
# per-key counts re-aggregate fine but their CARDINALITY doesn't — a
# 100 TB fact table's (bucket, key) relation can be larger than the
# table. A count-min sketch (Cormode & Muthukrishnan 2005) is a fixed
# depth × width counter grid: point estimates overestimate only
# (min over depth rows), and the grid is LINEAR — element-wise sums
# merge sketches across buckets, partitions, or streams, exactly like
# SUM. depth·width longs per bucket, independent of the key domain.
#
# Determinism: row d hashes with xxhash64(key, d) pmod width — a pure
# function of the key, so sketches are bit-identical across runs and
# partitionings. No SQL oracle (DuckDB has no xxhash64) — registry
# exposure is rows-only, the HLL precedent; pytest pins the
# overestimate bound, collision-free exactness, and rollup linearity.


def cms_bucket_sketches(
    df: DataFrame,
    key_expr: str,
    bucket_expr: str,
    *,
    bucket_alias: str = "bucket",
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """One count-min grid per bucket: (bucket, cms array<long> of
    depth·width, n_rows). The materialization pass — run once at the
    finest grain; rollups and estimates never rescan the fact table.

    Build shape: each row contributes ``depth`` (bucket, cell)
    increments (the only expansion, bounded ×depth); one
    map-side-combined groupBy counts cells; the per-bucket grid
    reassembles with aggregate() over the ≤depth·width cell rows —
    sparse cells stay absent until the final dense array build.
    """
    if width < 8 or depth < 1:
        raise ValueError("need width >= 8 and depth >= 1")
    # per-depth cell expressions as one SQL string (identical parsed
    # expressions, no per-node py4j round trips — profiled r17)
    items = ",".join(
        f"cast({d * width} + pmod(xxhash64(cast(({key_expr}) as "
        f"string), {d}), {width}) as int)"
        for d in range(depth)
    )
    cells = df.selectExpr(
        f"({bucket_expr}) AS {bucket_alias}",
        f"explode(array({items})) AS _cell",
    )
    counted = cells.groupBy(bucket_alias, "_cell").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    # sparse → dense in O(depth·width): one cell→count map per
    # bucket, then a literal index sequence reads it (absent cell → 0)
    sparse = counted.groupBy(bucket_alias).agg(
        F.map_from_entries(
            F.collect_list(F.struct("_cell", "_n"))
        ).alias("_m"),
        (F.sum("_n") / F.lit(depth)).cast("long").alias("n_rows"),
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(depth * width - 1)),
        lambda i: F.coalesce(
            F.element_at("_m", i.cast("int")), F.lit(0).cast("long")
        ),
    )
    return sparse.select(
        F.col(bucket_alias), dense.alias("cms"), "n_rows"
    )


def cms_rollup(
    sketches: DataFrame,
    coarse_expr: str,
    *,
    bucket_alias: str = "bucket",
    coarse_alias: str = "bucket",
) -> DataFrame:
    """Merge fine-grained sketches to a coarser grain — element-wise
    array sums (CMS linearity), bytes per bucket, no fact-table
    rescan. Mirrors :func:`rollup_sketches` for HLL."""
    return (
        sketches.select(
            F.expr(coarse_expr).alias(coarse_alias),
            "cms",
            "n_rows",
        )
        .groupBy(coarse_alias)
        .agg(
            F.aggregate(
                F.collect_list("cms"),
                F.array_repeat(
                    F.lit(0).cast("long"),
                    F.size(F.first("cms")),
                ),
                lambda acc, arr: F.zip_with(
                    acc, arr, lambda a, b: a + b
                ),
            ).alias("cms"),
            F.sum("n_rows").cast("long").alias("n_rows"),
        )
    )


def cms_estimate(
    sketches: DataFrame,
    keys: list[str],
    *,
    width: int = 256,
    depth: int = 4,
    bucket_alias: str = "bucket",
) -> DataFrame:
    """Point estimates for literal ``keys`` against each bucket's
    grid: est(k) = min over rows d of cms[d·width + h_d(k)] — the CMS
    guarantee: never under, over only on collisions. Returns
    (bucket, key, est) ordered (bucket, key).

    All keys probe in ONE pass: an in-row explode of per-key
    (key, est) structs — a per-key union would re-execute the whole
    upstream sketch pipeline once per key (observed: 5 keys → 16
    shuffles / 5 scans before this shape)."""
    if not keys:
        raise ValueError("cms_estimate needs at least one key")

    def _esc(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    def est_sql(key: str) -> str:
        probes = [
            f"element_at(cms, cast({d * width} + pmod(xxhash64("
            f"cast('{_esc(key)}' as string), {d}), {width}) as int) + 1)"
            for d in range(depth)
        ]
        inner = probes[0] if depth == 1 else f"least({','.join(probes)})"
        return f"cast({inner} as long)"

    pairs = ",".join(
        f"named_struct('key', '{_esc(key)}', 'est', {est_sql(key)})"
        for key in keys
    )
    return (
        sketches.selectExpr(
            bucket_alias, f"inline(array({pairs}))"
        )
        .orderBy(bucket_alias, "key")
    )
