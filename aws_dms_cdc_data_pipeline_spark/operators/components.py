"""Connected components + near-dup cluster collapse.

The dedup operators (operators/dedup.py) emit near-duplicate PAIRS;
the endgame of a training-data dedup pass is GROUPS: the transitive
closure of the pair graph, with one canonical document kept per
group. This module closes that gap — an extension beyond the
reference's managed-service surface (SURVEY.md §2.7), sized for the
100 TB case.

Algorithm: iterative min-label propagation. Every node starts
labelled with its own id; each round a node adopts the minimum label
among itself and its neighbours; at fixpoint the label is the
minimum node id of the component. Rounds needed = graph diameter.
Near-duplicate graphs are dense local cliques (everything within a
cluster pairs with almost everything else), so diameter is tiny
(2–4) and the loop converges in a handful of rounds; the
large-star/small-star variant that helps path-shaped graphs would
add complexity for no win on this workload.

Scale shape per round: one key-shuffled join (edges ⋈ labels on the
source id) + one groupBy-min — both hash-partitioned on node id, no
broadcast of anything unbounded, no driver-side data. Lineage is cut
every round with an eager ``localCheckpoint`` so the plan doesn't
grow with iterations (on a multi-node cluster prefer
``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` — local
checkpoints die with an executor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Below this many (deduped, undirected) edges the whole graph solves
# in ONE task via executor-side union-find instead of iterating: the
# pair graph of a deduped corpus is orders of magnitude smaller than
# the corpus itself (sf0.1: 256 edges from 5,000 docs), and each
# label-propagation round costs a full scheduled job — the iteration
# is pure scheduling floor until the graph outgrows a partition.
# 1M (id, id) pairs is ~tens of MB in one Arrow batch: comfortably a
# single task, far past any fixture. The iterative path stays the
# scale path beyond it.
_SINGLE_TASK_EDGE_LIMIT = 1_000_000

# (edges-plan semanticHash, appId, limit) -> bool; see connected_components
_SMALL_GRAPH_MEMO: dict = {}


def _components_single_task(und: DataFrame, limit: int) -> DataFrame:
    """All edges → one group → union-find in one Arrow batch.

    Executor-side (groupBy on a constant + applyInPandas), NOT a
    driver collect: the result comes back as a distributed DataFrame
    and nothing routes through the driver. Label = min member id
    under Python ordering, which matches Spark/SQL binary ordering
    for the integer and ASCII-string id types dedup emits.
    """
    import pandas as pd

    id_type = und.schema["s"].dataType.simpleString()

    def uf(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > limit:  # guard: caller miscounted — fail loudly
            raise RuntimeError(
                f"single-task components got {len(pdf)} edges (> {limit})"
            )
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for s, t in zip(pdf["s"], pdf["t"]):
            rs, rt = find(s), find(t)
            if rs != rt:
                # union by label: smaller id becomes the root, so the
                # root IS the component label (min member id)
                lo, hi = (rs, rt) if rs < rt else (rt, rs)
                parent[hi] = lo
        nodes = set(pdf["s"]) | set(pdf["t"])
        return pd.DataFrame(
            {"id": list(nodes), "comp": [find(n) for n in nodes]}
        )

    return (
        und.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(uf, schema=f"id {id_type}, comp {id_type}")
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iterations: int = 20,
) -> DataFrame:
    """(id, component) for every node in ``edges``; component = min
    node id reachable through the undirected pair graph.

    Deterministic (min-label is order-independent). Raises if the
    label propagation hasn't converged within ``max_iterations`` —
    for near-dup graphs that means the pair threshold is admitting a
    giant chained component and the caller should tighten it rather
    than silently get partial clusters.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    und = e.union(
        e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).distinct()
    # persist, not localCheckpoint: both make the edge set compute
    # once ACROSS ROUNDS, but a checkpoint is a fresh RDD per call —
    # re-CONSTRUCTING the same closure (back-to-back runs, the
    # sizes+collapse double consumer) re-materialized the whole
    # upstream pair computation eagerly each time (measured: the
    # near-dup closure query spent ~2.7 of its 4.1 s there). persist
    # is plan-keyed, so identical inputs legally share one
    # materialization under the documented caller-owned cache
    # policy; eviction only costs a recompute from lineage.
    und = und.persist()

    # The single-task-vs-iterative choice needs |edges| — an ACTION
    # (profiled r17: 0.3-0.4 s per call, serialized inside query
    # construction). The DECISION memoizes per (analyzed-plan
    # semanticHash, limit) — the fan_out_scan decision-memo pattern:
    # identical edge plans make identical choices, nothing about data
    # or results is cached, and a stale hit on a changed-underneath
    # input is caught loudly by _components_single_task's runtime
    # row-count guard (the iterative path is correct at any size).
    try:
        key = (
            und._jdf.queryExecution().analyzed().semanticHash(),
            und.sparkSession.sparkContext.applicationId,
            _SINGLE_TASK_EDGE_LIMIT,
        )
    except Exception:
        key = None
    small = _SMALL_GRAPH_MEMO.get(key) if key is not None else None
    if small is None:
        small = und.count() <= _SINGLE_TASK_EDGE_LIMIT
        if key is not None:
            if len(_SMALL_GRAPH_MEMO) >= 256:
                _SMALL_GRAPH_MEMO.pop(next(iter(_SMALL_GRAPH_MEMO)))
            _SMALL_GRAPH_MEMO[key] = small
    if small:
        return _components_single_task(und, _SINGLE_TASK_EDGE_LIMIT)

    labels = (
        und.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        neighbour = und.join(labels, und["s"] == labels["id"]).select(
            F.col("t").alias("id"), F.col("comp")
        )
        new_labels = (
            labels.unionByName(neighbour)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("comp", "_old"), "id"
            )
            .filter(F.col("comp") != F.col("_old"))
            .head(1)
        )
        labels = new_labels
        if not changed:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds; "
        "the pair graph has a long chained component — tighten the pair "
        "threshold or raise max_iterations"
    )


def near_dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(id_col, cluster_id) over EVERY document: transitive closure of
    the near-dup ``pairs``, singletons keeping their own id.

    ``pairs`` is any of the dedup operators' outputs (minhash_lsh /
    simhash / ngram_jaccard / embedding near-dup). cluster_id is the
    min member id — stable under re-runs and growing corpora as long
    as ids are stable.
    """
    comp = connected_components(pairs, src, dst)
    return docs.select(id_col).join(
        comp, docs[id_col] == comp["id"], "left"
    ).select(
        id_col, F.coalesce("comp", F.col(id_col)).alias("cluster_id")
    )


def keep_canonical(
    docs: DataFrame,
    clusters: DataFrame,
    *,
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """Collapse each near-dup cluster to ONE document.

    Default canonical = the min-id member (== cluster_id, so the kept
    set is just the distinct cluster ids — a semi-join, no extra
    aggregation). With ``quality_col``, keeps the member maximising
    (quality, id) instead — deterministic via the id tie-break,
    type-agnostic in the id column.
    """
    if quality_col is None:
        reps = clusters.select(
            F.col("cluster_id").alias(id_col)
        ).distinct()
        return docs.join(reps, id_col, "left_semi")
    scored = docs.join(clusters, id_col)
    reps = scored.groupBy("cluster_id").agg(
        F.max_by(
            id_col,
            F.struct(F.col(quality_col).alias("q"), F.col(id_col).alias("tb")),
        ).alias(id_col)
    )
    return docs.join(reps.select(id_col), id_col, "left_semi")
