"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the latest right row with the same key and
``right_ts <= left_ts`` (direction="backward"; "forward" and
"nearest" mirror pandas ``merge_asof``). The classic implementations
are a range cross-join (quadratic blowup) or a sort-merge with
custom iteration (not expressible declaratively). This one is the
union+window trick:

    union(left tagged 1, right tagged 0)
      → window PARTITION BY key ORDER BY (ts, tag, right_tiebreak)
      → last(right_payload, ignorenulls) over rows UNBOUNDED..CURRENT
      → keep left rows

One shuffle on the key, cumulative frame evaluated in a single pass
per partition — exactly the sort-merge shape, but built from public
window primitives, so it inherits AQE/skew handling and stays
whole-stage friendly. Right rows at equal ts order by the caller's
``right_order`` column, making the match deterministic. "forward"
runs the same pass with the sort reversed; "nearest" runs both over
the SAME (key) partitioning — Catalyst plans one Exchange with two
sorts — and picks the closer side per row (ties → backward, pandas
semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ts_micros(col: Column, dtype) -> Column:
    """Orderable timestamp → integer µs for tolerance arithmetic."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col)
    return col.cast("long")


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
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Point-in-time join (``backward``: latest right_ts <= left_ts;
    ``forward``: earliest right_ts >= left_ts; ``nearest``: closer of
    the two, backward on distance ties).

    ``right_order`` breaks ties among right rows sharing (key, ts) —
    pass a unique column (e.g. the event id); the largest value wins
    in every direction. Payload columns come back as
    ``{prefix}{col}`` (NULL when nothing matches).

    ``tolerance_us`` bounds the time distance (microseconds for
    timestamp columns, storage units for numeric ts): matches farther
    away null out, exactly like pandas ``merge_asof(tolerance=...)``.

    The tie-break keeps ``right_order``'s NATIVE type (string ids sort
    lexicographically, ints numerically); a non-orderable type (map,
    variant) raises instead of silently degrading to nondeterministic
    equal-timestamp matches.
    """
    if direction not in {"backward", "forward", "nearest"}:
        raise ValueError(
            f"asof_join direction must be backward/forward/nearest, got {direction!r}"
        )
    rord_type = right.schema[right_order].dataType
    if isinstance(rord_type, T.MapType) or (
        type(rord_type).__name__ == "VariantType"
    ):
        raise TypeError(
            f"asof_join right_order={right_order!r} has non-orderable type "
            f"{rord_type.simpleString()}; pass an orderable column (id, "
            "timestamp, string) or hash it first (xxhash64)"
        )
    ts_type = left.schema[left_ts].dataType

    # match struct carries the payload plus the matched right ts (for
    # tolerance / nearest arithmetic), then projects the ts away
    payload_struct = F.struct(
        F.col(right_ts).alias("_mts"), *[F.col(c) for c in right_payload]
    )
    payload_type = (
        "struct<`_mts`: "
        + right.schema[right_ts].dataType.simpleString()
        + ", "
        + ", ".join(
            f"`{c}`: {right.schema[c].dataType.simpleString()}"
            for c in right_payload
        )
        + ">"
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_kind"),
        F.lit(None).cast(rord_type).alias("_rord"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(payload_type).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_kind"),
        F.col(right_order).alias("_rord"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        payload_struct.alias("_r"),
    )
    both = l_tagged.unionByName(r_tagged)

    # right rows sort before left rows at equal ts (kind 0 < 1) in
    # BOTH directions: a right row AT the left row's timestamp matches
    # (<= / >= semantics). _rord ascending makes last() pick the
    # largest tie-break in both traversals.
    w_back = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_kind").asc(), F.col("_rord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").desc(), F.col("_kind").asc(), F.col("_rord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def within(match: Column, sign: int) -> Column:
        """NULL out matches beyond tolerance (sign: +1 back, -1 fwd)."""
        if tolerance_us is None:
            return match
        dist = sign * (
            _ts_micros(F.col("_ts"), ts_type)
            - _ts_micros(match["_mts"], ts_type)
        )
        return F.when(dist <= tolerance_us, match)

    if direction == "backward":
        matched = both.withColumn(
            "_match", within(F.last("_r", ignorenulls=True).over(w_back), 1)
        )
    elif direction == "forward":
        matched = both.withColumn(
            "_match", within(F.last("_r", ignorenulls=True).over(w_fwd), -1)
        )
    else:  # nearest
        b = within(F.last("_r", ignorenulls=True).over(w_back), 1)
        fwd = within(F.last("_r", ignorenulls=True).over(w_fwd), -1)
        lts = _ts_micros(F.col("_ts"), ts_type)
        nearer_back = (lts - _ts_micros(b["_mts"], ts_type)) <= (
            _ts_micros(fwd["_mts"], ts_type) - lts
        )
        matched = both.withColumn(
            "_match",
            F.when(b.isNull(), fwd).when(fwd.isNull(), b).when(nearer_back, b).otherwise(fwd),
        )

    out_cols: list[Column] = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_payload]
    return matched.filter(F.col("_kind") == 1).select(*out_cols)
