"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the latest right row with the same key and
``right_ts <= left_ts``. The classic implementations are a range
cross-join (quadratic blowup) or a sort-merge with custom iteration
(not expressible declaratively). This one is the union+window trick:

    union(left tagged 1, right tagged 0)
      → window PARTITION BY key ORDER BY (ts, tag, right_tiebreak)
      → last(right_payload, ignorenulls) over rows UNBOUNDED..CURRENT
      → keep left rows

One shuffle on the key, cumulative frame evaluated in a single pass
per partition — exactly the sort-merge shape, but built from public
window primitives, so it inherits AQE/skew handling and stays
whole-stage friendly. Right rows at equal ts order by the caller's
``right_order`` column, making the match deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_order: str,
    right_payload: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Latest-right-row-per-left-row join (``right_ts <= left_ts``).

    ``right_order`` breaks ties among right rows sharing (key, ts) —
    pass a unique column (e.g. the event id). Payload columns come
    back as ``{prefix}{col}`` (NULL when no right row precedes).

    The tie-break keeps ``right_order``'s NATIVE type (string ids sort
    lexicographically, ints numerically); a non-orderable type (map,
    variant) raises instead of silently degrading to nondeterministic
    equal-timestamp matches.
    """
    rord_type = right.schema[right_order].dataType
    if isinstance(rord_type, T.MapType) or (
        type(rord_type).__name__ == "VariantType"
    ):
        raise TypeError(
            f"asof_join right_order={right_order!r} has non-orderable type "
            f"{rord_type.simpleString()}; pass an orderable column (id, "
            "timestamp, string) or hash it first (xxhash64)"
        )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_kind"),
        F.lit(None).cast(rord_type).alias("_rord"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None)
        .cast(
            "struct<"
            + ", ".join(
                f"`{c}`: {right.schema[c].dataType.simpleString()}"
                for c in right_payload
            )
            + ">"
        )
        .alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_kind"),
        F.col(right_order).alias("_rord"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        F.struct(*right_payload).alias("_r"),
    )
    # right rows sort before left rows at equal ts (kind 0 < 1): a
    # right row AT the left row's timestamp matches (<= semantics)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_kind"), F.col("_rord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l_tagged.unionByName(r_tagged).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    out_cols: list[Column] = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_payload]
    return matched.filter(F.col("_kind") == 1).select(*out_cols)
