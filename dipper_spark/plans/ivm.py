"""Incremental view maintenance (round 4 — beyond-survey): keep a
grouped SUM/COUNT aggregate view of a changefeed-enabled table in
sync by consuming ONLY the row-level changes, never rescanning the
base table.

The classic delta rule for sum-decomposable aggregates (the DBSP /
differential-dataflow shape, restricted to SUM and COUNT — MIN/MAX
are NOT maintainable from deltas without per-group state and are
rejected by construction here since every agg is a SUM over a row
expression):

    I  ->  + e(after)
    U  ->  + e(after) - e(before)
    D  ->  - e(before)

`before` is the changefeed's pre-image struct (the LIVE values the
change replaced; null when nothing live was replaced — inserts,
resurrections over tombstones, deletes of dead keys — in which case
the before-side contribution is correctly zero).

Scale shape (100 TB base table, small-ish view): refresh cost is
O(new changes) + O(|view|) — the feed read is directory-pruned to
unconsumed (scope, batch) partitions, the delta is one groupBy over
those changes, and folding the delta into the view is one groupBy
over (old view ∪ delta), never a base-table scan.  The view itself
is rewritten per refresh (views are aggregates — orders of magnitude
smaller than the base); the swap is atomic via the meta pointer.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .target import KEY_COLUMNS, LocalCowTable

_N = "_n_live"  # auto-maintained live-row count per group


class IncrementalView:
    """A grouped aggregate view maintained from the changefeed.

    group_cols: grouping columns — table key columns or data columns
      (data-column groups are re-derived from the pre-image on the
      minus side, so updates that MOVE a row between groups maintain
      both groups correctly).
    aggs: {result_name: row_expression} where the view value is
      SUM(row_expression) over the group's live rows.  COUNT is the
      expression "1"; AVG is sum/count downstream.  A live-row count
      `_n_live` is always maintained and groups are dropped when it
      reaches zero (all rows deleted).
    """

    META = "view_meta.json"

    def __init__(self, spark: SparkSession, table: LocalCowTable, root: str,
                 group_cols: list[str], aggs: dict[str, str]):
        bad = [n for n in aggs if n in group_cols or n == _N]
        if bad:
            raise ValueError(f"agg names collide with group/internal columns: {bad}")
        self.spark, self.table, self.root = spark, table, root
        self.group_cols, self.aggs = list(group_cols), dict(aggs)
        os.makedirs(root, exist_ok=True)

    # ---------------- meta (consumed watermark + current data pointer) ----
    def _meta_path(self) -> str:
        return os.path.join(self.root, self.META)

    def _meta(self) -> dict:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"consumed": {}, "current": None}

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_path() + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._meta_path())  # atomic: view + watermark swap together

    # ---------------- read ----------------
    def read(self) -> DataFrame:
        meta = self._meta()
        if meta["current"] is None:
            fields = (", ".join(f"`{c}` string" for c in self.group_cols)
                      + ", " + ", ".join(f"`{n}` long" for n in self.aggs)
                      + f", {_N} long")
            return self.spark.createDataFrame([], fields)
        return self.spark.read.parquet(os.path.join(self.root, meta["current"]))

    # ---------------- refresh ----------------
    def _pending(self, consumed: dict) -> list[tuple[str, list[int]]]:
        """Unconsumed (scope_tag, [batch ids]) — driver-side directory
        listing, the same metadata the feed's Hive pruning uses."""
        base = os.path.join(self.table.root, "_changes")
        if not os.path.isdir(base):
            return []
        out = []
        for d in sorted(os.listdir(base)):
            if not d.startswith("scope="):
                continue
            tag = d.split("=", 1)[1]
            seen = set(consumed.get(tag, []))
            batches = sorted(
                int(b.split("=", 1)[1])
                for b in os.listdir(os.path.join(base, d)) if b.startswith("batch=")
            )
            new = [b for b in batches if b not in seen]
            if new:
                out.append((tag, new))
        return out

    def _delta(self, changes: DataFrame) -> DataFrame:
        """Per-group delta of every agg (and the live count) from a set
        of change rows — one shuffle, on the group key."""
        names = list(self.aggs) + [_N]
        exprs = {**self.aggs, _N: "1"}
        # plus side: the post-image of I and U rows
        plus = (changes.filter(F.col("change_op") != "D")
                .select(*self.group_cols,
                        *[F.expr(e).cast("long").alias(n) for n, e in exprs.items()]))
        # minus side: the pre-image of U and D rows that replaced a
        # LIVE row (before is null otherwise — nothing to subtract).
        # Group columns that are data columns come from the pre-image
        # too: a group-moving update must decrement its OLD group.
        pre = (changes.filter(F.col("before").isNotNull())
               .select(*KEY_COLUMNS, "before.*"))
        minus = pre.select(*self.group_cols,
                           *[(-F.expr(e).cast("long")).alias(n) for n, e in exprs.items()])
        return (plus.unionByName(minus)
                .groupBy(*self.group_cols)
                .agg(*[F.sum(n).alias(n) for n in names]))

    def refresh(self) -> dict:
        """Fold all unconsumed changefeed batches into the view.
        Idempotent: no pending batches -> no-op.  Crash-safe: the data
        dir is written first, then the meta pointer + watermark swap
        atomically; a crash in between leaves the old view and an
        orphan dir that the next refresh overwrites."""
        meta = self._meta()
        pending = self._pending(meta["consumed"])
        if not pending:
            return {"consumed": {}, "groups": None, "noop": True}
        feed = self.table.changefeed()
        cond = reduce(or_, [
            (F.col("scope") == tag) & F.col("batch").isin(batches)
            for tag, batches in pending
        ])
        delta = self._delta(feed.filter(cond))
        names = list(self.aggs) + [_N]
        base = delta if meta["current"] is None else self.read().unionByName(delta)
        merged = (base
                  .groupBy(*self.group_cols)
                  .agg(*[F.sum(n).alias(n) for n in names])
                  .filter(F.col(_N) > 0))  # fully-deleted groups drop out
        new_rel = f"view_{uuid.uuid4().hex[:8]}.parquet"
        merged.write.mode("overwrite").parquet(os.path.join(self.root, new_rel))
        old = meta["current"]
        for tag, batches in pending:
            meta["consumed"].setdefault(tag, []).extend(batches)
        meta["current"] = new_rel
        self._write_meta(meta)
        if old:
            shutil.rmtree(os.path.join(self.root, old), ignore_errors=True)
        return {"consumed": dict(pending), "groups": None, "noop": False}

    # ---------------- verification ----------------
    def full_recompute(self) -> DataFrame:
        """The same view computed the expensive way — a full groupBy
        over the base table's live rows.  For tests/audits only."""
        snap = self.table.read().filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        names = list(self.aggs) + [_N]
        exprs = {**self.aggs, _N: "1"}
        return (snap.select(*self.group_cols,
                            *[F.expr(e).cast("long").alias(n) for n, e in exprs.items()])
                .groupBy(*self.group_cols)
                .agg(*[F.sum(n).alias(n) for n in names]))
