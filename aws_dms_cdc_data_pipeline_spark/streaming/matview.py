"""Incrementally-maintained aggregate view over the CDC current state.

The reference pipeline's analytics surface is "query the latest
version per key" (OpenSearch index / Athena over S3 — reference
README.md:457, firehose.py:114-155). Any dashboard query over that
surface is a GROUP BY over current state — recomputed from scratch
on every refresh. This module maintains such an aggregate
*incrementally*: per micro-batch work is O(batch + touched groups),
never O(state), which at 100 TB state with a 60 s trigger is the
difference between a sub-second view refresh and a full-table scan
per minute.

How (classic incremental view maintenance over abelian aggregates):

- :class:`~aws_dms_cdc_data_pipeline_spark.sinks.state_store.StateStore`
  already versions its key-hashed buckets and keeps each touched
  bucket's previous version directory for one generation. The view
  snapshots the store manifest BEFORE a merge and diffs it against
  the manifest AFTER: the changed buckets' old and new directories
  are both on disk, so per-group contributions of `old` and `new`
  (COUNT of live rows + SUMs, computed on integer/decimal-exact
  types) subtract into an exact per-group delta — no re-read of any
  untouched bucket, no change-data beyond what the store already
  writes.
- COUNT and SUM form an abelian group (subtraction is well-defined),
  so delta application is a keyed add; AVG and friends derive from
  (count, sum) at read time. Non-subtractable aggregates (MIN/MAX/
  DISTINCT) are out of scope by design — they need per-group
  recomputation on retraction, which `rebuild()` provides.
- The view table itself is versioned-and-swapped exactly like the
  store (``v=N`` dirs + ``_MANIFEST``): readers are never torn, a
  crashed writer's partial directory is invisible, and a replayed
  epoch is harmless — a replayed ``merge`` writes content-identical
  buckets, so the old-vs-new diff is zero rows.
- Crash recovery: the view records the store generation it reflects.
  If an ``advance`` finds it has missed a generation (crash between
  a merge and the view apply), or a needed old directory was already
  garbage-collected, it falls back to ``rebuild()`` — a one-off full
  recompute, correct by construction. The normal path never pays it.

Scale note: the view table is one row per group and is rewritten per
batch. For group cardinalities where that rewrite matters, shard the
view by ``pmod(hash(group), B)`` exactly as StateStore shards keys
and rewrite only shards whose groups appear in the delta; the diff
side needs no change. Not needed at the fixture scales this repo
tests, so the simple layout stays.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark import schema as S
from aws_dms_cdc_data_pipeline_spark.sinks.state_store import StateStore


class IncrementalAggView:
    """COUNT + SUM aggregate over live current-state rows, maintained
    incrementally from StateStore generation diffs.

    ``group_expr`` is a SQL expression over the envelope (e.g.
    ``data.device``); ``sums`` maps output column name → SQL
    expression, each accumulated as a long (exact integer addition —
    callers quantize decimals the way plans/queries.py's ``_q6``
    does if the source column is fractional).
    """

    def __init__(
        self,
        store: StateStore,
        path: str,
        *,
        group_expr: str = "data.device",
        group_alias: str = "group_key",
        sums: dict[str, str] | None = None,
    ):
        self.store = store
        self.spark = store.spark
        self.path = path
        self.group_expr = group_expr
        self.group_alias = group_alias
        self.sums = dict(sums or {"amount_sum": "data.amount"})
        if "n_rows" in self.sums or group_alias in self.sums:
            raise ValueError("sum aliases must not collide with n_rows/group")
        os.makedirs(path, exist_ok=True)

    # -- manifest (same atomic-swap discipline as StateStore) -------------
    @property
    def _manifest_file(self) -> str:
        return os.path.join(self.path, "_MANIFEST")

    def _manifest(self) -> dict:
        try:
            with open(self._manifest_file) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"v": -1, "store_gen": -1}

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_file)

    def _vdir(self, v: int) -> str:
        return os.path.join(self.path, f"v={v}")

    # -- read --------------------------------------------------------------
    def table(self) -> DataFrame:
        """Current view contents: group, n_rows, <sum columns>."""
        m = self._manifest()
        if m["v"] < 0:
            return self.spark.createDataFrame([], self._schema_ddl())
        return self.spark.read.schema(self._schema_ddl()).parquet(self._vdir(m["v"]))

    def _schema_ddl(self) -> str:
        sum_cols = ", ".join(f"{a} long" for a in self.sums)
        return f"{self.group_alias} string, n_rows long, {sum_cols}"

    # -- maintenance protocol ----------------------------------------------
    def begin(self) -> dict:
        """Snapshot the store manifest; call immediately BEFORE merge."""
        return self.store._manifest()

    def advance(self, pre_manifest: dict) -> int:
        """Apply the delta between ``pre_manifest`` and the store's
        current manifest; call immediately AFTER a successful merge.
        Returns the new view version. Falls back to :meth:`rebuild`
        when the incremental path is impossible (missed generation or
        GC'd old directory)."""
        post = self.store._manifest()
        m = self._manifest()
        if post["generation"] <= m["store_gen"]:
            return m["v"]  # already reflects this (or a later) merge
        if m["v"] >= 0 and pre_manifest["generation"] != m["store_gen"]:
            # the view missed at least one merge (crash between merge
            # and advance): the intermediate diff is unrecoverable
            return self.rebuild()
        if m["v"] < 0:
            return self.rebuild()

        changed = [
            b
            for b, v in post["buckets"].items()
            if pre_manifest["buckets"].get(b) != v
        ]
        old_dirs = [
            self.store._bdir(int(b), pre_manifest["buckets"][b])
            for b in changed
            if b in pre_manifest["buckets"]
        ]
        if any(not os.path.isdir(d) for d in old_dirs):
            return self.rebuild()  # previous version already GC'd
        new_dirs = [self.store._bdir(int(b), post["buckets"][b]) for b in changed]

        old_c = self._contrib(old_dirs)
        new_c = self._contrib(new_dirs)
        g = self.group_alias
        metrics = ["n_rows", *self.sums]
        delta = (
            new_c.alias("n")
            .join(old_c.alias("o"), on=g, how="full")
            .select(
                F.col(g),
                *[
                    (
                        F.coalesce(F.col(f"n.{c}"), F.lit(0))
                        - F.coalesce(F.col(f"o.{c}"), F.lit(0))
                    ).alias(c)
                    for c in metrics
                ],
            )
            .filter(
                " OR ".join(f"{c} != 0" for c in metrics)
            )
        )
        merged = (
            self.table()
            .alias("cur")
            .join(delta.alias("d"), on=g, how="full")
            .select(
                F.col(g),
                *[
                    (
                        F.coalesce(F.col(f"cur.{c}"), F.lit(0))
                        + F.coalesce(F.col(f"d.{c}"), F.lit(0))
                    ).cast("long").alias(c)
                    for c in metrics
                ],
            )
            .filter(F.col("n_rows") > 0)
        )
        return self._swap_in(merged, post["generation"])

    def update(self, merge_fn) -> int:
        """Convenience: ``begin`` → ``merge_fn()`` → ``advance``."""
        pre = self.begin()
        merge_fn()
        return self.advance(pre)

    def rebuild(self) -> int:
        """Full recompute from the store (initial build / crash
        recovery). O(state) — the incremental path exists so this is
        rare."""
        env = self.store.envelopes()
        gen = self.store.version()
        if env is None:
            empty = self.spark.createDataFrame([], self._schema_ddl())
            return self._swap_in(empty, gen)
        return self._swap_in(self._contrib_df(env), gen)

    # -- internals ----------------------------------------------------------
    def _contrib_df(self, env: DataFrame) -> DataFrame:
        # NULL group values fold to a sentinel so the delta/apply
        # full-outer joins (which don't match NULL = NULL) stay keyed;
        # NULL-valued sum inputs contribute 0 so the incremental and
        # rebuilt tables are byte-identical.
        live = env.filter(F.col("metadata.operation") != F.lit(S.OP_DELETE))
        return live.groupBy(
            F.coalesce(
                F.expr(self.group_expr).cast("string"), F.lit("<null>")
            ).alias(self.group_alias)
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            *[
                F.coalesce(F.sum(F.expr(e).cast("long")), F.lit(0))
                .cast("long")
                .alias(a)
                for a, e in self.sums.items()
            ],
        )

    def _contrib(self, dirs: list[str]) -> DataFrame:
        if not dirs:
            return self.spark.createDataFrame([], self._schema_ddl())
        return self._contrib_df(self.spark.read.parquet(*dirs))

    def _swap_in(self, df: DataFrame, store_gen: int) -> int:
        m = self._manifest()
        new_v = m["v"] + 1
        out = self._vdir(new_v)
        if os.path.exists(out):
            shutil.rmtree(out)  # crashed earlier attempt
        # the view is small (one row per group): single file keeps
        # reads cheap; shard by group hash before this matters
        df.coalesce(1).write.mode("overwrite").parquet(out)
        self._write_manifest({"v": new_v, "store_gen": store_gen})
        # keep one previous version for in-flight readers, GC the rest
        for v in range(new_v - 1):
            shutil.rmtree(self._vdir(v), ignore_errors=True)
        return new_v


__all__ = ["IncrementalAggView"]
