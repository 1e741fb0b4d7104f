"""Range-clustered table layout — data skipping for selective scans.

At 100 TB the cheapest query is the one that never reads the data:
parquet scans prune at two levels (file listing via partition dirs,
row groups via min/max statistics), but BOTH only work if the
writer physically clustered the data on the filter axis. A table
written in arrival order has every file spanning the full time
range — min/max stats prune nothing and a one-day query scans a
year. This job rewrites a table clustered on the caller's columns:

    repartitionByRange(cols)        # range-partition: each output
                                    #   task owns a contiguous slice
      .sortWithinPartitions(cols)   # row groups inside a file are
                                    #   internally ordered too
      .write.parquet(...)           # per-file + per-row-group
                                    #   min/max stats become tight,
                                    #   disjoint intervals

This is the open-source equivalent of Delta's OPTIMIZE ZORDER for
the (overwhelmingly common) single-axis case: linear clustering is
strictly better than Z-order for one column and within ~2× for two
when the leading column dominates selectivity. The range shuffle
samples the column distribution (Spark's RangePartitioner), so
skew doesn't produce giant tasks.

Cost model: one full shuffle + sort per rewrite — amortized over
every selective scan that follows; run it from the compaction
cadence (maintenance/compact.py), not per-trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_MAX_RECORDS_PER_FILE = 1_000_000


def cluster_by(
    df: DataFrame,
    out_path: str,
    cols: list[str],
    *,
    num_files: int | None = None,
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
) -> None:
    """Rewrite ``df`` at ``out_path`` range-clustered on ``cols``.

    ``num_files`` fixes the output file count (defaults to Spark's
    shuffle parallelism); ``max_records_per_file`` caps file size
    either way.
    """
    if not cols:
        raise ValueError("cluster_by needs at least one clustering column")
    part = (
        df.repartitionByRange(num_files, *cols)
        if num_files is not None
        else df.repartitionByRange(*cols)
    )
    (
        part.sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(out_path)
    )


def file_stat_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per parquet file — the exact stats a
    scan's pruning consults. Driver-side footer reads only."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, name))
        idx = md.schema.names.index(column)
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def overlap_fraction(ranges: list[tuple]) -> float:
    """How much the per-file ranges overlap: 0.0 = perfectly disjoint
    (ideal pruning), → 1.0 = every file spans everything (no
    pruning). Defined as 1 − span_covered_once / span_total_weighted."""
    spans = [(lo, hi) for lo, hi in ranges if lo is not None and hi != lo]
    if len(spans) < 2:
        return 0.0
    total = sum((hi - lo).total_seconds() if hasattr(hi - lo, "total_seconds")
                else (hi - lo) for lo, hi in spans)
    overall_lo = min(lo for lo, _ in spans)
    overall_hi = max(hi for _, hi in spans)
    overall = ((overall_hi - overall_lo).total_seconds()
               if hasattr(overall_hi - overall_lo, "total_seconds")
               else overall_hi - overall_lo)
    if overall <= 0:
        return 0.0
    return max(0.0, 1.0 - overall / total) if total > overall else 0.0


__all__ = ["cluster_by", "cluster_by_zorder", "z_value", "normalized_rank", "file_stat_ranges", "overlap_fraction"]


def z_value(cols, bits: int = 16):
    """Z-order (Morton) key: bit-interleave of per-column ranks.

    Each column must already be normalized to an integer in
    [0, 2^bits) — see :func:`normalized_rank`. Interleaving puts bit
    i of column j at position ``i * ncols + j``, so sorting by the
    result clusters rows that are close in EVERY dimension — the
    multi-dimensional extension of :func:`cluster_by` (Delta's
    OPTIMIZE ZORDER equivalent). Pure bit arithmetic: shiftright /
    AND / shiftleft chains, fully inside whole-stage codegen.

    ``bits * len(cols)`` must fit a long (≤ 62).
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 2:
        raise ValueError("z_value needs >= 2 columns (use cluster_by for 1)")
    if bits * n > 62:
        raise ValueError(f"bits*ncols = {bits * n} exceeds long range")
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def normalized_rank(col, lo, hi, bits: int = 16):
    """Scale a numeric column into [0, 2^bits) given its [lo, hi]
    bounds (two driver scalars from one cheap agg — at 100 TB this is
    a parquet-footer-level min/max, not a data scan)."""
    from pyspark.sql import functions as F

    top = (1 << bits) - 1
    # None bounds = empty table or all-NULL column: the column carries
    # no ordering information, so it contributes a constant rank (same
    # treatment as a constant column, hi == lo) instead of a TypeError
    # deep inside the comparison.
    if lo is None or hi is None or hi <= lo:
        return F.lit(0).cast("long")
    return F.least(
        F.lit(top).cast("long"),
        ((col.cast("double") - float(lo)) * (top / (float(hi) - float(lo))))
        .cast("long"),
    )


def cluster_by_zorder(
    df: DataFrame,
    out_path: str,
    cols: list[str],
    *,
    bits: int = 16,
    num_files: int | None = None,
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
) -> None:
    """Rewrite ``df`` clustered on the Z-order key of ``cols`` (each
    numeric or timestamp). Every listed dimension's per-file min/max
    stats tighten simultaneously, so selective scans on ANY of them
    (or boxes over several) prune files — where single-axis
    clustering serves only its leading column."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if len(cols) < 2:
        raise ValueError("cluster_by_zorder needs >= 2 columns")

    def as_long(c):
        t = df.schema[c].dataType
        if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
            return F.unix_micros(F.col(c).cast("timestamp"))
        return F.col(c).cast("long")

    bounds = df.agg(
        *[F.min(as_long(c)).alias(f"_lo_{c}") for c in cols],
        *[F.max(as_long(c)).alias(f"_hi_{c}") for c in cols],
    ).first()
    ranks = [
        normalized_rank(as_long(c), bounds[f"_lo_{c}"], bounds[f"_hi_{c}"], bits)
        for c in cols
    ]
    zed = df.withColumn("_z", z_value(ranks, bits))
    part = (
        zed.repartitionByRange(num_files, "_z")
        if num_files is not None
        else zed.repartitionByRange("_z")
    )
    (
        part.sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(out_path)
    )
