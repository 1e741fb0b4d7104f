"""sf10 scale probe: the dedup/text operators one decade past the
scale tier (500 k docs, documents-only — tools/make_scaled_sf.py with
``tables=["documents"]``), answering the question the sf1 tier can't:
does candidate volume keep growing LINEARLY and do the walls stay
disk-bound rather than exploding? Design numbers (PERF.md): raw band
candidates ~10× the sf1 count (~8 M; pair work grows linearly with
the corpus because replicas share no shingles), and the minhash
verify join is the quantified irreducible term (spills local disk on
one box — fine on a cluster).

Runs each probe query cold (fresh cache) and steady (plan-keyed
caches warm); records walls, the raw LSH band-candidate count, and
result sizes. Invoked per-round from bench.py into
``BENCH_LOCAL.json["scale_probe_sf10"]``; skip with
SPARK_GRAFT_SKIP_PROBE=1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spill_totals(spark) -> tuple[int, int]:
    """Cumulative (memoryBytesSpilled, diskBytesSpilled) across every
    stage this session has run, from the AppStatusStore — per-phase
    spill is the delta around the phase. Spill is the probe's third
    axis: at sf10 the minhash verify join is EXPECTED to spill on one
    box (PERF.md) — the number quantifies by how much, so a future
    plan change that silently turns a disk-bound join into an OOM-
    bound one shows up in the artifact."""
    sc = spark.sparkContext
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        sc._gateway.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    it = stages.iterator()
    mem = disk = 0
    while it.hasNext():
        sd = it.next()
        mem += sd.memoryBytesSpilled()
        disk += sd.diskBytesSpilled()
    return mem, disk


def _max_stage_id(spark) -> int:
    """Highest stage id the session has allocated — stage ids are
    monotonic, so a delta counts stages SUBMITTED between two
    snapshots even after the status store evicts old entries (a
    retained-count delta saturates at spark.ui.retainedStages)."""
    sc = spark.sparkContext
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        sc._gateway.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    it = stages.iterator()
    mx = 0
    while it.hasNext():
        mx = max(mx, it.next().stageId())
    return mx


def _noop_floor_sec(spark, runs: int = 5) -> float:
    """Measured per-stage scheduling floor: a 2-stage EMPTY-PLAN job
    (1 row through one exchange, noop sink — no scan, no compute),
    best-of-N, divided by its stage count. This is the fixed cost
    local[32] charges every stage regardless of data; subtracting
    floor x stage-count from a query's wall isolates its actual
    scan+compute so the star-query ratios stop conflating the two
    (r15 verdict ask #3: prove or retire the amortization story)."""
    # 32 input partitions -> 32-task stages, the same task width the
    # bench queries schedule (spark.sql.shuffle.partitions=32): a
    # 2-task toy job understates the floor ~4x (task-launch cost
    # scales with task count on local[32])
    df = spark.range(0, 32, 1, 32).repartition(32)
    df.write.format("noop").mode("overwrite").save()  # warm codegen
    best = float("inf")
    for _ in range(max(runs, 1)):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best / 2.0


def run(spark, src: str = "/root/testdata/sf0.1", dst: str | None = None,
        factor: int = 100) -> dict:
    from pyspark.sql import functions as F

    from aws_dms_cdc_data_pipeline_spark.operators import dedup as D
    from aws_dms_cdc_data_pipeline_spark.plans.queries import REGISTRY

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = dst or os.path.join(repo, ".benchdata", "sf10")
    docs_path = os.path.join(dst, "documents.parquet")
    if not os.path.exists(docs_path):  # build OFF the clock
        from tools.make_scaled_sf import build

        build(src, dst, factor, tables=["documents"])

    docs = spark.read.parquet(docs_path)
    out: dict = {"dir": dst, "factor": factor, "n_docs": docs.count()}

    def timed(key: str, name: str, count_rows: bool = False) -> None:
        # cold and steady passes materialize IDENTICALLY (noop write)
        # so the delta measures cache warmth, not materialization
        # strategy; the row count rides the warm caches untimed.
        spark.catalog.clearCache()
        m0, d0 = _spill_totals(spark)
        t0 = time.time()
        REGISTRY[name].fn(spark, dst).write.format("noop").mode(
            "overwrite"
        ).save()
        out[f"{key}_cold_sec"] = round(time.time() - t0, 3)
        s0 = _max_stage_id(spark)
        t0 = time.time()
        REGISTRY[name].fn(spark, dst).write.format("noop").mode(
            "overwrite"
        ).save()
        out[f"{key}_sec"] = round(time.time() - t0, 3)
        out[f"{key}_stages"] = _max_stage_id(spark) - s0
        m1, d1 = _spill_totals(spark)
        out[f"{key}_spill_mem_mb"] = round((m1 - m0) / 2**20, 1)
        out[f"{key}_spill_disk_mb"] = round((d1 - d0) / 2**20, 1)
        if count_rows:
            out[f"{key}_rows"] = REGISTRY[name].fn(spark, dst).count()

    timed("minhash", "minhash_lsh_pairs", count_rows=True)
    # raw band-join candidate volume (pre size-filter): the number the
    # LSH design bounds; rides the still-warm shingle cache
    hashed = D._hashed_shingles(docs, "text", "doc_id", 5).persist()
    banded = D._bands_of(
        D._with_signature(hashed, 32).withColumn(
            "_n", F.size("_bh").cast("long")
        ),
        "doc_id", 32, 8, carry=("_n",),
    )
    a, b = banded.alias("a"), banded.alias("b")
    out["minhash_candidates"] = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).count()
    )

    timed("near_dedup", "near_dedup_canonical", count_rows=True)
    # build the token + position indexes OFF the clock (one-time cost
    # a serving deployment pays at ingest, not per query) so the
    # indexed-search cold numbers below measure query cost
    import re as _re

    from aws_dms_cdc_data_pipeline_spark.operators.search import (
        ensure_position_index,
        ensure_token_index,
    )

    idx_name = _re.sub(r"[^a-zA-Z0-9]+", "_", dst.strip("/")).lower()
    t0 = time.time()
    ensure_token_index(spark, docs, idx_name)
    ensure_position_index(spark, docs, idx_name)
    out["index_build_sec"] = round(time.time() - t0, 3)
    timed("bm25_indexed", "bm25_keyword_search_indexed")
    # r14 curation ops at the decade tier: DSIR's model stays a
    # constant <=1024-row relation at 500k docs (the hashed-feature
    # guarantee), CCNet's cut table stays <=|langs| rows — these walls
    # should track the tokenize pass, nothing quadratic
    timed("dsir", "dsir_importance_weights")
    timed("ccnet", "ccnet_perplexity_buckets")
    spark.catalog.clearCache()

    # --- relational tier: the TPC-H star queries one decade past sf1.
    # At sf0.1 these are scheduling-floor-dominated (PERF.md q1
    # decomposition: ~0.3-0.5 s/stage constant vs a 0.16 s DuckDB
    # denominator); the floor-amortization claim predicts the ratio
    # trends toward ~1x as rows grow 100x. Tables build once OFF the
    # clock (60 M-row lineitem); DuckDB runs the same oracle SQL on
    # the same files for the ratio.
    rel_tables = ["lineitem", "orders", "customer", "supplier",
                  "nation", "region"]
    if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
        from tools.make_scaled_sf import build

        build(src, dst, factor, tables=rel_tables)
    if not os.path.exists(os.path.join(dst, "events.parquet")):
        from tools.make_scaled_sf import build

        build(src, dst, factor, tables=["events"])
    import duckdb

    con = duckdb.connect()
    for t in rel_tables + ["events", "documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(dst, t + '.parquet')}')"
        )
    # measured noop-stage floor (r15 ask #3): raw ratios conflate the
    # per-stage scheduling constant with real compute; the corrected
    # ratio subtracts floor x measured-stage-count and is the number
    # that extrapolates to a cluster (where the floor pipelines
    # across queries instead of serializing one query's stages)
    floor = _noop_floor_sec(spark)
    out["noop_stage_floor_sec"] = round(floor, 4)
    # every query the r13 verdict flagged >2x at sf1 gets a measured
    # decade ratio here, so the floor-amortization trend is evidence,
    # not extrapolation
    for key, name in (("q1", "q1_pricing_summary"),
                      ("regional", "regional_revenue"),
                      ("topk", "topk_customers_by_revenue"),
                      ("transition", "event_transition_matrix"),
                      ("exact_dedup", "exact_dedup_docs"),
                      # the four r14-weak search rows: each gets a
                      # measured decade ratio like the stars, so
                      # "0.38-1.46x at r13, >2x on the degraded r14
                      # boot" resolves on evidence (r14 verdict #6)
                      ("phrase", "phrase_search_docs"),
                      ("phrase_indexed", "phrase_search_docs_indexed"),
                      ("prox_indexed", "proximity_search_docs_indexed")):
        timed(key, name)
        sql = REGISTRY[name].oracle
        con.execute(sql).fetchall()
        t0 = time.time()
        con.execute(sql).fetchall()
        out[f"{key}_duckdb_sec"] = round(time.time() - t0, 3)
        out[f"{key}_ratio"] = round(
            out[f"{key}_sec"] / out[f"{key}_duckdb_sec"], 2
        )
        corrected = max(
            out[f"{key}_sec"] - floor * out[f"{key}_stages"], 0.0
        )
        out[f"{key}_floor_corrected_sec"] = round(corrected, 3)
        out[f"{key}_floor_corrected_ratio"] = round(
            corrected / out[f"{key}_duckdb_sec"], 2
        )
    # bm25_indexed was timed in the text tier above (warm-index
    # steady pass); attach its decade ratio from the same oracle
    sql = REGISTRY["bm25_keyword_search_indexed"].oracle
    con.execute(sql).fetchall()
    t0 = time.time()
    con.execute(sql).fetchall()
    out["bm25_indexed_duckdb_sec"] = round(time.time() - t0, 3)
    out["bm25_indexed_ratio"] = round(
        out["bm25_indexed_sec"] / out["bm25_indexed_duckdb_sec"], 2
    )
    corrected = max(
        out["bm25_indexed_sec"] - floor * out["bm25_indexed_stages"], 0.0
    )
    out["bm25_indexed_floor_corrected_sec"] = round(corrected, 3)
    out["bm25_indexed_floor_corrected_ratio"] = round(
        corrected / out["bm25_indexed_duckdb_sec"], 2
    )
    spark.catalog.clearCache()
    return out


if __name__ == "__main__":
    from aws_dms_cdc_data_pipeline_spark.session import get_spark

    import json

    print(json.dumps(run(get_spark("bench-probe")), indent=2))
