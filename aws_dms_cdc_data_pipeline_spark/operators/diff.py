"""Snapshot diff: classify row changes between two keyed table states.

The reference pipeline's value proposition is keeping a replica in
sync with a source; the operational question that follows is "what
actually changed between these two points in time?". Combined with
:func:`~aws_dms_cdc_data_pipeline_spark.operators.upsert.state_as_of`
(time-travel snapshots from the CDC log), this operator answers it as
a query: every key is classified as ``insert`` (new side only),
``delete`` (old side only), or ``update`` (present in both with at
least one compared column differing, reported as a comma-joined
``changed_cols`` list). Unchanged keys are dropped.

Execution shape (scale notes):

- ONE full-outer join keyed on the snapshot PK. When both snapshots
  come from windows partitioned by the same key (the state_as_of
  path), the exchange is already in place and the join adds only the
  per-partition sort — no second shuffle of either snapshot.
- Column comparison is null-safe JVM expression work (``<=>``), no
  UDFs; ``changed_cols`` is a ``concat_ws`` over per-column CASE
  markers, evaluated inside whole-stage codegen.
- Output is one row per changed key — for CDC-shaped data this is a
  small fraction of either snapshot, so downstream consumers (audit
  sinks, incremental refreshes) see delta-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str] | str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshots of the same keyed table.

    Returns ``(*keys, change_type, changed_cols)`` where
    ``change_type ∈ {'insert', 'delete', 'update'}`` and
    ``changed_cols`` is a comma-joined list of differing compared
    columns (in ``compare_cols`` order; empty for insert/delete).
    Comparison is null-safe: NULL == NULL is "unchanged",
    NULL vs value is a change.

    ``compare_cols`` defaults to every non-key column present in BOTH
    snapshots. Raises if a key or compare column is missing on either
    side.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c not in keys and c in old.columns
        ]
    missing = [
        (side, c)
        for side, df in (("old", old), ("new", new))
        for c in (*keys, *compare_cols)
        if c not in df.columns
    ]
    if missing:
        raise ValueError(f"snapshot_diff: missing columns: {missing}")
    if not compare_cols:
        raise ValueError("snapshot_diff: no columns to compare")

    o = old.select(
        *keys,
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(1).alias("_o_present"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(1).alias("_n_present"),
    )
    # USING-style join: key columns are coalesced across sides.
    j = o.join(n, on=keys, how="full")

    changed = F.concat_ws(
        ",",
        *[
            F.when(
                ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
            )
            for c in compare_cols
        ],
    )
    change_type = (
        F.when(F.col("_o_present").isNull(), F.lit("insert"))
        .when(F.col("_n_present").isNull(), F.lit("delete"))
        .when(changed != F.lit(""), F.lit("update"))
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .withColumn(
            "changed_cols",
            F.when(F.col("change_type") == "update", changed).otherwise(
                F.lit("")
            ),
        )
        .select(*keys, "change_type", "changed_cols")
    )
