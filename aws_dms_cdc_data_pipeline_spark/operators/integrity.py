"""Referential-integrity audit: FK orphan counts across table relations.

A CDC replica is only trustworthy if its relationships survived the
trip: the reference replicates parent and child tables independently
(table mappings in cdk_stacks/dms_serverless.py select tables one by
one), so out-of-order application or partial loads can leave child
rows pointing at missing parents. This operator measures that as a
query: for each declared relation it reports child row count, NULL
foreign keys, and orphans (non-NULL FK with no matching parent key).

Execution shape (scale notes):

- Per relation: project the child to its FK column only, project the
  parent to DISTINCT keys only, LEFT join, aggregate counts in one
  pass. Column pruning reaches both scans; the parent key set is
  dimension-sized in star schemas, so Catalyst broadcasts it and the
  fact side never shuffles.
- The per-relation 1-row aggregates are unioned — no cross joins, no
  driver-side counting; the whole audit is one job whose branches run
  in parallel.
- Counts, not row dumps: output size is O(#relations) regardless of
  data scale. Pair with an anti-join query on a flagged relation to
  fetch the offending rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (relation_name, child_df, child_fk_col, parent_df, parent_key_col)
Relation = tuple[str, DataFrame, str, DataFrame, str]


def fk_orphan_audit(relations: list[Relation]) -> DataFrame:
    """One row per relation: ``(relation, n_child, n_null_fk, n_orphans)``.

    ``n_orphans`` counts child rows whose FK is non-NULL but matches
    no parent key; NULL FKs are counted separately (SQL FK semantics:
    NULL references violate nothing).
    """
    if not relations:
        raise ValueError("fk_orphan_audit: no relations given")
    parts = []
    for name, child, fk, parent, pk in relations:
        if fk not in child.columns:
            raise ValueError(f"{name}: child column {fk!r} missing")
        if pk not in parent.columns:
            raise ValueError(f"{name}: parent column {pk!r} missing")
        c = child.select(F.col(fk).alias("_fk"))
        p = (
            parent.select(F.col(pk).alias("_pk"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        j = c.join(p, c["_fk"] == p["_pk"], "left")
        parts.append(
            j.agg(
                F.count(F.lit(1)).alias("n_child"),
                F.sum(
                    F.when(F.col("_fk").isNull(), 1).otherwise(0)
                ).alias("n_null_fk"),
                F.sum(
                    F.when(
                        F.col("_fk").isNotNull() & F.col("_hit").isNull(), 1
                    ).otherwise(0)
                ).alias("n_orphans"),
            ).select(
                F.lit(name).alias("relation"),
                "n_child",
                "n_null_fk",
                "n_orphans",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
