"""One-pass table profiling: per-column null / distinct / min / max stats.

The reference pipeline surfaces per-table statistics through the DMS
console and CloudWatch (reference: cdk_stacks/dms_serverless.py table
mappings select what is replicated; ops visibility comes from the
managed service). A self-hosted engine needs the same capability as a
query: given any table, produce the per-column profile a data engineer
checks before trusting a load — row counts, null counts, distinct
cardinality, and value ranges.

Execution shape (scale notes):

- ONE aggregation pass over the table: every statistic for every
  column is computed in a single ``df.agg(...)`` — no per-column scan
  loop, no driver-side iteration. Count/min/max partial-aggregate
  map-side, so the shuffle carries one row per task.
- ``approx=False`` (exact distinct counts) uses one ``count_distinct``
  per column; Spark plans multiple distinct aggregates with an Expand
  node that replicates each input row once per profiled column. That
  is the exact-answer cost everywhere; it is what the DuckDB oracle
  verifies at test scale.
- ``approx=True`` is the 100 TB path: HyperLogLog++ sketches
  (``approx_count_distinct``) keep the pass expansion-free — a single
  map-side-combined aggregation regardless of column count.
- The wide 1-row aggregate is unpivoted to long format with ``stack``
  — a pure projection, no extra shuffle.

Min/max values are normalized to strings so one result schema covers
heterogeneous column types, with engine-portable formats: integrals
and strings cast directly, timestamps formatted to
``yyyy-MM-dd HH:mm:ss``, and floating-point quantized to fixed-point
micro-units (``floor(x * 1e6)``) — the same trick the query oracles
use, avoiding shortest-repr vs binary float-formatting drift between
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FP = 1_000_000  # 6-fractional-digit fixed point, matches plans/queries.py


def _norm_value(col: Column, dtype: str) -> Column:
    """Engine-portable string form of a min/max value of type ``dtype``."""
    if dtype in ("double", "float"):
        return F.floor(col.cast("double") * F.lit(float(_FP))).cast("long").cast(
            "string"
        )
    if dtype.startswith("timestamp"):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column profile of ``df`` in a single aggregation pass.

    Returns one row per profiled column:
    ``(column_name, n_null, n_non_null, n_distinct, min_value,
    max_value)`` with min/max rendered as portable strings (see module
    docstring). ``approx=True`` swaps exact distinct counts for
    HyperLogLog++ estimates with relative error ``rsd`` — the default
    for very wide or very large tables; the exact path is what the
    cross-engine oracle checks.

    Complex types (arrays, structs, maps, binary) are not orderable /
    not meaningfully min-maxed; pass ``columns`` to select profilable
    ones. Raises on unsupported dtypes rather than guessing.
    """
    dtypes = dict(df.dtypes)
    cols = list(columns) if columns is not None else list(df.columns)
    unknown = [c for c in cols if c not in dtypes]
    if unknown:
        raise ValueError(f"profile_table: columns not in DataFrame: {unknown}")
    bad = [
        c
        for c in cols
        if dtypes[c].startswith(("array", "struct", "map", "binary"))
    ]
    if bad:
        raise ValueError(
            f"profile_table: unorderable column types for {bad}; "
            "pass `columns` excluding them"
        )
    if not cols:
        raise ValueError("profile_table: no columns to profile")

    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        nd = (
            F.approx_count_distinct(c, rsd)
            if approx
            else F.count_distinct(F.col(c))
        )
        aggs.append(nd.alias(f"{c}__nd"))
        aggs.append(_norm_value(F.min(c), dtypes[c]).alias(f"{c}__mn"))
        aggs.append(_norm_value(F.max(c), dtypes[c]).alias(f"{c}__mx"))

    wide = df.agg(*aggs)

    stack_args = ", ".join(
        f"'{c}', __total - `{c}__nn`, `{c}__nn`, `{c}__nd`, `{c}__mn`, `{c}__mx`"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_null, n_non_null, n_distinct, min_value, max_value)"
    )


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact Pearson correlation matrix over numeric columns —
    cross-engine deterministic, one scan, one reduce row.

    Every moment (n, Σx, Σxy) is computed on floor(x·1e6)-quantized
    values in DECIMAL(38,0) — exact integer arithmetic, so any engine
    produces identical moments; the final correlation touches floats
    only in the last step (one correctly-rounded sqrt + divide per
    pair, identical IEEE on identical inputs). Built-in `corr()`
    aggregates float partials in partition order — run-to-run
    nondeterministic in the last ulp and unverifiable across engines;
    this formulation is the validation-grade version.

    One scan, map-side partial aggregation of k + k(k+1)/2 sums into
    a SINGLE row; the pair matrix unfolds driver-free via `stack`.
    NULLs drop listwise. A constant column yields NULL correlations
    (zero variance — try_divide). Capacity: |x·1e6| ≤ M, n rows needs
    n·M² < 1e38 — e.g. M=1e12 allows n up to 1e14 rows.

    Returns (col_a, col_b, corr, n_rows) for a ≤ b (diag included).
    """
    base = df.select(*cols).na.drop()
    q = {
        c: F.floor(F.col(c).cast("double") * F.lit(1e6)).cast("decimal(38,0)")
        for c in cols
    }
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("_n")]
    aggs += [F.sum(q[c]).alias(f"_s_{c}") for c in cols]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]
    aggs += [F.sum(q[a] * q[b]).alias(f"_q_{a}_{b}") for a, b in pairs]
    row = base.agg(*aggs)

    def corr_expr(a: str, b: str):
        n = F.col("_n")
        num = (n * F.col(f"_q_{a}_{b}") - F.col(f"_s_{a}") * F.col(f"_s_{b}")).cast(
            "double"
        )
        var_a = (n * F.col(f"_q_{a}_{a}") - F.col(f"_s_{a}") * F.col(f"_s_{a}")).cast(
            "double"
        )
        var_b = (n * F.col(f"_q_{b}_{b}") - F.col(f"_s_{b}") * F.col(f"_s_{b}")).cast(
            "double"
        )
        return F.round(F.try_divide(num, F.sqrt(var_a) * F.sqrt(var_b)), 6)

    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        corr_expr(a, b).alias("corr"),
                        F.col("_n").cast("long").alias("n_rows"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("_p")
    )
    return stacked.select("_p.col_a", "_p.col_b", "_p.corr", "_p.n_rows")
