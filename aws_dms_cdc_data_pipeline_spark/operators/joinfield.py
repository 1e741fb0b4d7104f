"""Parent/child join-field queries — OpenSearch ``has_child`` /
``has_parent``.

Reference parity: OpenSearch models 1:N document relations with a
``join`` field on one index and answers "parents with a matching
child" (``has_child``, with ``score_mode`` and ``min_children`` /
``max_children``) and "children of a matching parent"
(``has_parent``). On the relational CDC tables the same relation is
orders (parent) → lineitem (children); these operators express the
join-field semantics as plain DataFrame joins so Catalyst plans them
(shuffle-hash / sort-merge on the key, broadcast when a side is
small, AQE re-planning at runtime) instead of the block-join
machinery a document store needs.

Determinism: child scores aggregate as quantized longs (the repo's
fixed-point contract), so ``sum``/``avg`` score modes are exact and
order-independent across any partitioning.

Scale shape: ``has_child`` is (filtered child scan → per-parent-key
partial aggregate → key-shuffle join with parents). The child
aggregate happens BEFORE the join, so the shuffle moves one row per
matching parent key, not one per child row. ``has_parent`` filters
the parent side first and joins back to children — when the filtered
parent set is small Catalyst broadcasts it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCORE_MODES = ("none", "sum", "min", "max", "avg")
_FP = 1_000_000


def has_child(
    parents: DataFrame,
    children: DataFrame,
    *,
    parent_key: str,
    child_key: str,
    child_filter: Column,
    score_col: str | None = None,
    score_mode: str = "none",
    min_children: int = 1,
    max_children: int | None = None,
    parent_cols: list[str] | None = None,
) -> DataFrame:
    """``has_child`` query: parents having between ``min_children``
    and ``max_children`` children matching ``child_filter``, scored
    by ``score_mode`` over the children's ``score_col``.

    Returns (parent_key, *parent_cols, n_children, score) — score is
    NULL under ``score_mode='none'`` (ES returns the parent with
    constant score there). Unordered (a filter, not a ranking —
    callers order as needed).
    """
    if score_mode not in _SCORE_MODES:
        raise ValueError(f"score_mode must be one of {_SCORE_MODES}")
    if score_mode != "none" and score_col is None:
        raise ValueError(f"score_mode {score_mode!r} needs score_col")
    if min_children < 1:
        raise ValueError("min_children must be >= 1")
    kids = children.filter(child_filter)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_children")]
    if score_mode != "none":
        # quantized-long child scores: exact under any partitioning
        sq = F.round(F.col(score_col).cast("double") * _FP, 0).cast("long")
        kids = kids.withColumn("_sq", sq)
        if score_mode == "sum":
            sc = F.sum("_sq").cast("decimal(38,0)") / F.lit(_FP)
        elif score_mode == "min":
            sc = F.min("_sq").cast("decimal(38,0)") / F.lit(_FP)
        elif score_mode == "max":
            sc = F.max("_sq").cast("decimal(38,0)") / F.lit(_FP)
        else:  # avg: exact long sum, ONE double division by the count
            sc = (
                F.sum("_sq").cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(float(_FP))
            )
        aggs.append(sc.cast("double").alias("score"))
    else:
        aggs.append(F.lit(None).cast("double").alias("score"))
    grouped = kids.groupBy(F.col(child_key).alias(parent_key)).agg(*aggs)
    cond = F.col("n_children") >= min_children
    if max_children is not None:
        cond = cond & (F.col("n_children") <= max_children)
    keep = parent_cols or []
    return (
        parents.join(grouped, parent_key, "inner")
        .filter(cond)
        .select(parent_key, *keep, "n_children", "score")
    )


def has_child_oracle_sql(
    *,
    parent_table: str,
    child_table: str,
    parent_key: str,
    child_key: str,
    child_filter_sql: str,
    score_col: str | None = None,
    score_mode: str = "none",
    min_children: int = 1,
    max_children: int | None = None,
    parent_cols: list[str] | None = None,
) -> str:
    """DuckDB SQL computing the identical has_child result."""
    keep = "".join(f", p.{c}" for c in (parent_cols or []))
    if score_mode == "none":
        sc = "CAST(NULL AS DOUBLE)"
    elif score_mode == "avg":
        sc = (
            f"CAST(SUM(CAST(round(CAST({score_col} AS DOUBLE) * {_FP}, 0) "
            f"AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) "
            f"/ CAST({float(_FP)!r} AS DOUBLE)"
        )
    else:
        agg = score_mode.upper()
        sc = (
            f"CAST(CAST({agg}(CAST(round(CAST({score_col} AS DOUBLE) "
            f"* {_FP}, 0) AS BIGINT)) AS DECIMAL(38,0)) / {_FP} AS DOUBLE)"
        )
    hi = (
        f" AND COUNT(*) <= {max_children}" if max_children is not None else ""
    )
    return f"""
    WITH g AS (
        SELECT {child_key} AS {parent_key},
               CAST(COUNT(*) AS BIGINT) AS n_children,
               {sc} AS score
        FROM {child_table}
        WHERE {child_filter_sql}
        GROUP BY {child_key}
        HAVING COUNT(*) >= {min_children}{hi}
    )
    SELECT g.{parent_key}{keep}, g.n_children, g.score
    FROM {parent_table} p JOIN g USING ({parent_key})
    """


def has_parent(
    parents: DataFrame,
    children: DataFrame,
    *,
    parent_key: str,
    child_key: str,
    parent_filter: Column,
    parent_score_col: str | None = None,
    child_cols: list[str] | None = None,
) -> DataFrame:
    """``has_parent`` query: children whose parent matches
    ``parent_filter``; each child inherits its parent's
    ``parent_score_col`` as the score (ES's ``score: true`` mode;
    NULL score without one).

    Returns (child_key, *child_cols, score). The filtered parent
    projection is (key, score) only — when the match set is small
    Catalyst broadcasts it and the children are never shuffled.
    """
    score = (
        F.col(parent_score_col).cast("double")
        if parent_score_col
        else F.lit(None).cast("double")
    )
    psel = parents.filter(parent_filter).select(
        F.col(parent_key).alias(child_key), score.alias("score")
    )
    keep = child_cols or []
    return children.join(psel, child_key, "inner").select(
        child_key, *keep, "score"
    )


def has_parent_oracle_sql(
    *,
    parent_table: str,
    child_table: str,
    parent_key: str,
    child_key: str,
    parent_filter_sql: str,
    parent_score_col: str | None = None,
    child_cols: list[str] | None = None,
) -> str:
    """DuckDB SQL computing the identical has_parent result."""
    keep = "".join(f", c.{col}" for col in (child_cols or []))
    sc = (
        f"CAST(p.{parent_score_col} AS DOUBLE)"
        if parent_score_col
        else "CAST(NULL AS DOUBLE)"
    )
    return f"""
    SELECT c.{child_key}{keep}, {sc} AS score
    FROM {child_table} c
    JOIN {parent_table} p ON c.{child_key} = p.{parent_key}
    WHERE {parent_filter_sql}
    """


__all__ = [
    "has_child",
    "has_child_oracle_sql",
    "has_parent",
    "has_parent_oracle_sql",
]
