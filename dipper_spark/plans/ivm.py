"""Incremental view maintenance (rounds 4-5 — beyond-survey): keep a
grouped aggregate view of a changefeed-enabled table in sync by
consuming ONLY the row-level changes, never rescanning the base table
on the hot path.

Aggregate classes (the DBSP / differential-dataflow taxonomy):

  * SUM / COUNT (`aggs`) — sum-decomposable, maintained purely from
    deltas by the classic rule
        I  ->  + e(after)
        U  ->  + e(after) - e(before)
        D  ->  - e(before)
    `before` is the changefeed's pre-image struct (the LIVE values the
    change replaced; null when nothing live was replaced — inserts,
    resurrections over tombstones, deletes of dead keys — in which
    case the before-side contribution is correctly zero).
  * AVG (`avgs`) — derived: a hidden (sum, non-null count) pair is
    SUM-maintained and the ratio is computed at read time.
  * MIN / MAX (`extrema`) — NOT delta-maintainable in general (a
    retraction of the current extremum needs information deltas don't
    carry).  Maintained by plus-side folding with
    RESCAN-ON-RETRACTION (round 5, VERDICT r4 #3): per refresh, a
    group is folded cheaply as least/greatest(old extremum, batch
    extremum) UNLESS some retracted pre-image value ties-or-beats the
    folded candidate — only those "dirty" groups are re-derived from
    the base table, via one scan filtered to exactly the dirty groups.
    Correctness: in the non-dirty case every old live row >= old
    extremum >= candidate and every added row >= batch extremum >=
    candidate (for MIN; symmetric for MAX), and the candidate's
    witness row provably survived (otherwise its retraction would have
    marked the group dirty) — so the fold IS the true extremum.

Scale shape (100 TB base table, small-ish view): refresh cost is
O(new changes) + O(|view|) + (only under retraction storms) one
base-table scan filtered to the dirty groups.  The feed read is
directory-pruned to unconsumed (scope, batch) partitions, the delta
is one groupBy over those changes, and folding the delta into the
view is one groupBy over (old view ∪ delta).  The view itself is
rewritten per refresh (views are aggregates — orders of magnitude
smaller than the base); the swap is atomic via the meta pointer.

Retention interplay (round 5): refresh detects when changefeed
retention expired batches this view NEVER CONSUMED (per-scope batch
ids are dense, so a pending floor above consumed-watermark + 1 is a
hole) and raises ChangefeedExpiredError instead of going silently
stale; batches that were already consumed may expire freely.
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

from .target import KEY_COLUMNS, ChangefeedExpiredError, LocalCowTable

_N = "_n_live"  # auto-maintained live-row count per group


# ---------------- shared feed-consumer bookkeeping ----------------
# Used by every incremental changefeed consumer (IncrementalView here,
# MirrorTable in plans/mirror.py): per-scope consumed-batch watermark
# compacted to hwm + sparse extras, and the directory-level pending
# probe with retention-hole detection.

def consumed_parts(entry) -> tuple[int, set[int]]:
    """(high-watermark, sparse extra ids) of a consumed entry; accepts
    the legacy plain-list form on read.  The legacy form is COMPACTED
    here (dense prefix -> hwm), not just wrapped: returning hwm=-1 for
    a list that covers batches 0..k would make the retention-hole probe
    (floor > hwm + 1) spuriously report already-consumed batches as an
    expired hole."""
    if isinstance(entry, dict):
        return int(entry.get("hwm", -1)), set(entry.get("extra", []))
    extra = set(entry or [])
    hwm = -1
    while hwm + 1 in extra:
        hwm += 1
        extra.discard(hwm)
    return hwm, extra


def mark_consumed(entry, new_ids) -> dict:
    hwm, extra = consumed_parts(entry)
    extra |= set(new_ids)
    while hwm + 1 in extra:
        hwm += 1
        extra.discard(hwm)
    return {"hwm": hwm, "extra": sorted(extra)}


def batch_dir_readable(d: str, consumer: str = "consumer") -> bool:
    """True when a published feed batch dir holds parquet parts; False
    for applied-nothing batches (just _SUCCESS — consume the id, read
    nothing).  A dir removed by a CONCURRENT retention pass between the
    pending probe and this listing surfaces as the typed retention
    error, not a raw FileNotFoundError: the dir was pending
    (unconsumed), so its removal is a real hole."""
    try:
        return any(f.endswith(".parquet") for f in os.listdir(d))
    except FileNotFoundError:
        raise ChangefeedExpiredError(
            f"changefeed batch dir {d} was expired by a concurrent "
            f"retention pass before this {consumer} consumed it — "
            "re-bootstrap, or register a consumer_name so keep-consumed "
            "retention holds its batches") from None


def pending_feed_batches(table: LocalCowTable, consumed: dict,
                         consumer: str = "consumer") -> list[tuple[str, list[int]]]:
    """Unconsumed (scope_tag, [batch ids]) of a table's changefeed —
    driver-side directory listing, the same metadata the feed's Hive
    pruning uses.  Raises ChangefeedExpiredError when retention
    removed batches this consumer never consumed (dense per-scope ids
    make the hole detectable: floor > consumed hwm + 1)."""
    base = os.path.join(table.root, "_changes")
    if not os.path.isdir(base):
        return []
    floors = table._load().get("changefeed_floor", {})
    out = []
    for d in sorted(os.listdir(base)):
        if not d.startswith("scope="):
            continue
        tag = d.split("=", 1)[1]
        hwm, extra = consumed_parts(consumed.get(tag))
        floor = int(floors.get(tag, 0))
        if floor > hwm + 1:
            raise ChangefeedExpiredError(
                f"changefeed batches {hwm + 1}..{floor - 1} of scope tag "
                f"{tag} expired before this {consumer} consumed them — it "
                "can no longer be maintained incrementally; re-bootstrap "
                "from a table snapshot (or rebuild from a fresh feed)")
        batches = sorted(
            int(b.split("=", 1)[1])
            for b in os.listdir(os.path.join(base, d)) if b.startswith("batch="))
        new = [b for b in batches if b > hwm and b not in extra]
        if new:
            out.append((tag, new))
    return out


class IncrementalView:
    """A grouped aggregate view maintained from the changefeed.

    group_cols: grouping columns — table key columns or data columns
      (data-column groups are re-derived from the pre-image on the
      minus side, so updates that MOVE a row between groups maintain
      both groups correctly).
    aggs: {result_name: row_expression} where the view value is
      SUM(row_expression) over the group's live rows, evaluated as
      BIGINT (fractional expressions are truncated per row — use
      `avgs` for fractional means).  COUNT is the expression "1".
    avgs: {result_name: row_expression} maintained as a hidden
      (sum, non-null-count) pair; read() exposes the double ratio
      (null when the group has no non-null values).
    extrema: {result_name: ("min"|"max", row_expression)} maintained
      by plus-side folding + rescan-on-retraction (module docstring);
      evaluated as BIGINT (truncation toward zero is monotonic, so the
      result IS the true extremum, cast to long).
    A live-row count `_n_live` is always maintained and groups are
    dropped when it reaches zero (all rows deleted).
    """

    META = "view_meta.json"

    def __init__(self, spark: SparkSession, table: LocalCowTable, root: str,
                 group_cols: list[str], aggs: dict[str, str],
                 avgs: dict[str, str] | None = None,
                 extrema: dict[str, tuple[str, str]] | None = None,
                 consumer_name: str | None = None,
                 source: str = "changefeed"):
        """source='changefeed' (default) consumes the write-time feed;
        source='changelog' consumes the snapshot-diff changelog between
        retained versions (time_travel tables, ANY write mode — the
        consumer path for MoR tables, which cannot emit a write-time
        feed).  The delta rule is identical: the net changelog carries
        the same change_op/before shape, and net changes give the same
        SUM/COUNT/AVG deltas because the rule is linear."""
        if source not in ("changefeed", "changelog"):
            raise ValueError(f"source must be 'changefeed' or 'changelog', got {source!r}")
        self.spark, self.table, self.root = spark, table, root
        self.source = source
        # consumer_name: register this view in the table's changefeed
        # consumer group — each refresh acks its consumed watermark, so
        # expire_changefeed(keep_consumed=True) never expires batches
        # the view still needs (see target.py "consumer groups").  For
        # changelog views the analog is a snapshot TAG pinned to the
        # last-synced version (moved after each refresh), which
        # expire_snapshots honors — same never-expire-what-a-consumer-
        # still-needs contract, on version retention instead of feed
        # retention.
        self.consumer_name = consumer_name
        self.group_cols, self.aggs = list(group_cols), dict(aggs)
        self.avgs, self.extrema = dict(avgs or {}), dict(extrema or {})
        for name, (kind, _e) in self.extrema.items():
            if kind not in ("min", "max"):
                raise ValueError(f"extrema[{name!r}]: kind must be 'min' or 'max'")
        names = list(self.aggs) + list(self.avgs) + list(self.extrema)
        bad = [n for n in names if n in group_cols or n == _N or n.startswith("_")]
        if bad or len(set(names)) != len(names):
            raise ValueError(f"agg names collide: {bad or names}")
        os.makedirs(root, exist_ok=True)
        if consumer_name and source == "changefeed":
            table.register_consumer(consumer_name)
        elif consumer_name:
            # hold the oldest still-retained version until the first
            # refresh/bootstrap moves the pin (the pre-registered-
            # consumer-holds-everything analog)
            if self._meta().get("version") is None:
                table.move_tag(self._pin_tag(), table.versions()[0])

    def _pin_tag(self) -> str:
        return f"consumer/{self.consumer_name}"

    # hidden storage columns for the AVG pairs
    def _avg_cols(self, name: str) -> tuple[str, str]:
        return f"_avg_sum_{name}", f"_avg_cnt_{name}"

    def _sum_names(self) -> list[str]:
        """All SUM-maintained storage columns (aggs + avg pairs + _n_live)."""
        out = list(self.aggs)
        for n in self.avgs:
            out.extend(self._avg_cols(n))
        return out + [_N]

    def _sum_exprs(self) -> dict[str, object]:
        """storage column -> (row expr, contributes-null-as-zero).

        `aggs` (and extrema, elsewhere) evaluate their row expression
        as BIGINT — the documented integral-SUM contract.  AVG pairs
        sum as DOUBLE: the surface is advertised as the true ratio, so
        truncating each row's value before summing would silently
        floor fractional inputs (the mean of truncations is not the
        mean)."""
        exprs: dict[str, object] = {n: F.expr(e).cast("long") for n, e in self.aggs.items()}
        for n, e in self.avgs.items():
            s, c = self._avg_cols(n)
            exprs[s] = F.coalesce(F.expr(e).cast("double"), F.lit(0.0))
            exprs[c] = F.expr(e).isNotNull().cast("long")
        exprs[_N] = F.lit(1).cast("long")
        return exprs

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

    # Consumed-batch bookkeeping is compacted to a high-watermark +
    # sparse extras per scope (ADVICE r4: plain lists grow unboundedly
    # on long-lived views).  Legacy list form is accepted on read.
    # Shared with MirrorTable — see the module-level helpers above.
    _consumed_parts = staticmethod(consumed_parts)
    _mark_consumed = staticmethod(mark_consumed)

    # ---------------- read ----------------
    def _stored_schema_ddl(self) -> str:
        avg_sums = {self._avg_cols(n)[0] for n in self.avgs}
        cols = [f"`{c}` string" for c in self.group_cols]
        cols += [f"`{n}` {'double' if n in avg_sums else 'long'}"
                 for n in self._sum_names()]
        cols += [f"`{n}` long" for n in self.extrema]
        return ", ".join(cols)

    def read(self) -> DataFrame:
        """The view: group columns, SUM aggs, AVG ratios (double),
        extrema, `_n_live`.  Hidden AVG pair columns are projected
        away."""
        df = self._read_stored()
        for n in self.avgs:
            s, c = self._avg_cols(n)
            df = df.withColumn(
                n, F.when(F.col(c) > 0, F.col(s).cast("double") / F.col(c)))
            df = df.drop(s, c)
        order = (self.group_cols + list(self.aggs) + list(self.avgs)
                 + list(self.extrema) + [_N])
        return df.select(*order)

    def _read_stored(self) -> DataFrame:
        meta = self._meta()
        if meta["current"] is None:
            return self.spark.createDataFrame([], self._stored_schema_ddl())
        return self.spark.read.parquet(os.path.join(self.root, meta["current"]))

    # ---------------- refresh ----------------
    def _pending(self, consumed: dict) -> list[tuple[str, list[int]]]:
        """Unconsumed (scope_tag, [batch ids]) — shared probe, see
        pending_feed_batches above."""
        return pending_feed_batches(self.table, consumed, consumer="view")

    def _delta(self, changes: DataFrame) -> DataFrame:
        """Per-group delta of every SUM-maintained column — one
        shuffle, on the group key."""
        exprs = self._sum_exprs()
        names = list(exprs)
        # plus side: the post-image of I and U rows
        plus = (changes.filter(F.col("change_op") != "D")
                .select(*self.group_cols, *[e.alias(n) for n, e in exprs.items()]))
        # minus side: the pre-image of U and D rows that replaced a
        # LIVE row (before is null otherwise — nothing to subtract).
        # Group columns that are data columns come from the pre-image
        # too: a group-moving update must decrement its OLD group.
        pre = (changes.filter(F.col("before").isNotNull())
               .select(*KEY_COLUMNS, "before.*"))
        minus = pre.select(*self.group_cols,
                           *[(-e).alias(n) for n, e in exprs.items()])
        return (plus.unionByName(minus)
                .groupBy(*self.group_cols)
                .agg(*[F.sum(n).alias(n) for n in names]))

    # ---------------- extrema (min/max) maintenance ----------------
    def _extrema_updates(self, changes: DataFrame, old: DataFrame | None) -> DataFrame:
        """Per-group folded extrema + dirty flag.

        Output: group_cols, one column per extremum name (the folded
        candidate), `_dirty` boolean.  Dirty groups must be re-derived
        from the base table; clean groups' candidates are exact.
        old=None on the bootstrap refresh (no stored view yet)."""
        plus_rows = (changes.filter(F.col("change_op") != "D")
                     .select(*self.group_cols,
                             *[F.expr(e).cast("long").alias(n)
                               for n, (_k, e) in self.extrema.items()]))
        retr_rows = (changes.filter(F.col("before").isNotNull())
                     .select(*KEY_COLUMNS, "before.*")
                     .select(*self.group_cols,
                             *[F.expr(e).cast("long").alias(n)
                               for n, (_k, e) in self.extrema.items()]))
        plus_agg = plus_rows.groupBy(*self.group_cols).agg(
            *[(F.min(n) if k == "min" else F.max(n)).alias(f"_plus_{n}")
              for n, (k, _e) in self.extrema.items()])
        retr_agg = retr_rows.groupBy(*self.group_cols).agg(
            *[(F.min(n) if k == "min" else F.max(n)).alias(f"_retr_{n}")
              for n, (k, _e) in self.extrema.items()])
        j = plus_agg.join(retr_agg, on=self.group_cols, how="full_outer")
        if old is not None:
            cur = old.select(*self.group_cols,
                             *[F.col(n).alias(f"_old_{n}") for n in self.extrema])
            j = j.join(cur, on=self.group_cols, how="full_outer")
        else:
            for n in self.extrema:
                j = j.withColumn(f"_old_{n}", F.lit(None).cast("long"))
        cand_cols, dirty_terms = [], []
        for n, (k, _e) in self.extrema.items():
            fold = F.least if k == "min" else F.greatest
            cand = fold(F.col(f"_old_{n}"), F.col(f"_plus_{n}"))  # null-skipping
            cand_cols.append(cand.alias(n))
            retr = F.col(f"_retr_{n}")
            beats = (retr <= cand) if k == "min" else (retr >= cand)
            # a retraction with no surviving candidate is dirty too
            # (e.g. every valued row of the group was retracted)
            dirty_terms.append(retr.isNotNull() & (cand.isNull() | beats))
        dirty = reduce(or_, dirty_terms) if dirty_terms else F.lit(False)
        return j.select(*self.group_cols, *cand_cols,
                        F.coalesce(dirty, F.lit(False)).alias("_dirty"))

    def _rescan_groups(self, dirty_keys: DataFrame) -> DataFrame:
        """Re-derive extrema for the dirty groups from the base table:
        ONE scan filtered to those groups (left-semi against the —
        small, broadcastable — dirty key set), one groupBy."""
        snap = self.table.read().filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        rows = (snap.join(F.broadcast(dirty_keys), on=self.group_cols, how="left_semi")
                .select(*self.group_cols,
                        *[F.expr(e).cast("long").alias(n)
                          for n, (_k, e) in self.extrema.items()]))
        return rows.groupBy(*self.group_cols).agg(
            *[(F.min(n) if k == "min" else F.max(n)).alias(n)
              for n, (k, _e) in self.extrema.items()])

    def refresh(self) -> dict:
        """Fold all unconsumed changefeed batches into the view.
        Idempotent: no pending batches -> no-op.  Crash-safe: the data
        dir is written first, then the meta pointer + watermark swap
        atomically; a crash in between leaves the old view plus an
        orphan view_* dir, which the NEXT refresh sweeps (uuid dir
        names are never reused, so the sweep is the only GC)."""
        if self.source == "changelog":
            return self._refresh_changelog()
        self._sweep_orphans()
        meta = self._meta()
        pending = self._pending(meta["consumed"])
        if not pending:
            return {"consumed": {}, "rescanned_groups": 0, "noop": True}
        # read exactly the pending (scope, batch) dirs — not the whole
        # feed: retention may have legitimately expired already-consumed
        # batches (changefeed(None) would refuse), and at scale this
        # avoids listing all of history.  basePath surfaces scope/batch
        # as partition columns; mergeSchema unions across ADD-column
        # evolution boundaries.
        base = os.path.join(self.table.root, "_changes")
        dirs = [os.path.join(base, f"scope={tag}", f"batch={b}")
                for tag, batches in pending for b in batches]
        dirs = [d for d in dirs if batch_dir_readable(d, consumer="view")]
        if not dirs:
            for tag, batches in pending:
                meta["consumed"][tag] = self._mark_consumed(
                    meta["consumed"].get(tag), batches)
            self._write_meta(meta)
            self._ack(meta)
            return {"consumed": dict(pending), "rescanned_groups": 0, "noop": False}
        changes = (self.spark.read.option("mergeSchema", "true")
                   .option("basePath", base).parquet(*dirs))
        old = self._read_stored() if meta["current"] is not None else None
        merged, rescanned = self._fold_changes(changes, old)

        old_rel = meta["current"]
        for tag, batches in pending:
            meta["consumed"][tag] = self._mark_consumed(
                meta["consumed"].get(tag), batches)
        self._publish(merged, meta, old_rel)
        self._ack(meta)
        return {"consumed": dict(pending), "rescanned_groups": rescanned,
                "noop": False}

    def _fold_changes(self, changes: DataFrame,
                      old: DataFrame | None) -> tuple[DataFrame, int]:
        """Fold one batch of change rows (feed or changelog — same
        change_op/before shape) into the stored view frame."""
        sums = self._delta(changes)
        names = self._sum_names()
        base = sums if old is None else (
            old.select(*self.group_cols, *names).unionByName(sums))
        merged = (base
                  .groupBy(*self.group_cols)
                  .agg(*[F.sum(n).alias(n) for n in names])
                  .filter(F.col(_N) > 0))  # fully-deleted groups drop out

        rescanned = 0
        if self.extrema:
            ext = self._extrema_updates(changes, old)
            dirty_keys = ext.filter("_dirty").select(*self.group_cols)
            # tiny driver-side count: decides whether the rescan job is
            # needed at all (retraction storms only)
            rescanned = dirty_keys.count()
            clean = ext.filter(~F.col("_dirty")).drop("_dirty")
            if rescanned:
                redone = self._rescan_groups(dirty_keys)
                ext_final = clean.unionByName(redone, allowMissingColumns=False)
            else:
                ext_final = clean
            # groups untouched by these changes keep their stored
            # extrema (ext covers changed ∪ old-view groups, so the
            # left join below always finds a row for surviving groups)
            merged = merged.join(ext_final, on=self.group_cols, how="left")
        return merged.select(*self.group_cols, *names, *list(self.extrema)), rescanned

    def _publish(self, merged: DataFrame, meta: dict, old_rel: str | None) -> None:
        """Write the new view frame, swap the meta pointer atomically,
        drop the superseded frame.  Caller mutates meta's watermark
        fields BEFORE calling (the swap commits view + watermark
        together)."""
        new_rel = f"view_{uuid.uuid4().hex[:8]}.parquet"
        merged.write.mode("overwrite").parquet(os.path.join(self.root, new_rel))
        meta["current"] = new_rel
        self._write_meta(meta)
        if old_rel:
            shutil.rmtree(os.path.join(self.root, old_rel), ignore_errors=True)

    # ---------------- changelog-sourced refresh (round 5) ----------------
    def _refresh_changelog(self) -> dict:
        """Refresh a source='changelog' view: diff the table between
        the last-synced retained version and the current one and fold
        the net changes.  Net deltas give identical SUM/COUNT/AVG
        results because the delta rule is linear; extrema use the same
        plus-fold + rescan-on-retraction.  The first refresh diffs
        from v0 (all-inserts) unless bootstrap() seeded the view.

        Retention: an expired `from` version surfaces as
        ChangefeedExpiredError (the consumer fell behind snapshot
        retention) — re-seed with bootstrap().  A consumer_name holds
        a snapshot tag on the last-synced version, so
        expire_snapshots never creates that hole."""
        self._sweep_orphans()
        meta = self._meta()
        cur = int(self.table._load()["version"])
        synced = meta.get("version")
        frm = 0 if synced is None else int(synced)
        if frm == cur:
            return {"from_version": frm, "to_version": cur,
                    "rescanned_groups": 0, "noop": True}
        try:
            man_a = self.table._load_as_of(frm)
        except FileNotFoundError as e:
            raise ChangefeedExpiredError(
                f"table version {frm} expired before this view consumed it "
                f"(retained: {self.table.versions()}) — the view can no "
                "longer be maintained incrementally; re-seed it with "
                "bootstrap()") from e
        if type(self.table).same_data(man_a, self.table._load_as_of(cur)):
            # metadata-only range (tags/acks/DDL): fast-forward, no job
            meta["version"] = cur
            self._write_meta(meta)
            return {"from_version": frm, "to_version": cur,
                    "rescanned_groups": 0, "noop": True}
        changes = self.table.changelog_between(frm, cur)
        old = self._read_stored() if meta["current"] is not None else None
        merged, rescanned = self._fold_changes(changes, old)
        old_rel = meta["current"]
        meta["version"] = cur
        self._publish(merged, meta, old_rel)
        if self.consumer_name:
            self.table.move_tag(self._pin_tag(), cur)
        return {"from_version": frm, "to_version": cur,
                "rescanned_groups": rescanned, "noop": False}

    def bootstrap(self) -> dict:
        """Seed a source='changelog' view from the CURRENT table state
        (one full recompute) and fast-forward the version watermark —
        for views created after snapshot retention already expired the
        history their first refresh would diff over.  The version is
        read BEFORE the recompute scans, so a concurrent commit is at
        worst re-folded by the next refresh as a net no-op diff."""
        if self.source != "changelog":
            raise ValueError("bootstrap() applies to source='changelog' views "
                             "(changefeed views re-seed by rebuilding the feed)")
        meta = self._meta()
        cur = int(self.table._load()["version"])
        merged = self._recompute_stored()
        old_rel = meta["current"]
        meta["version"] = cur
        self._publish(merged, meta, old_rel)
        if self.consumer_name:
            self.table.move_tag(self._pin_tag(), cur)
        return {"bootstrapped": True, "version": cur}

    def _recompute_stored(self) -> DataFrame:
        """full_recompute in STORED shape (hidden AVG pairs, no
        ratios) — the bootstrap seed frame."""
        snap = self.table.read().filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        exprs = self._sum_exprs()
        rows = snap.select(
            *self.group_cols, *[e.alias(n) for n, e in exprs.items()],
            *[F.expr(e).cast("long").alias(n) for n, (_k, e) in self.extrema.items()])
        return rows.groupBy(*self.group_cols).agg(
            *[F.sum(n).alias(n) for n in exprs],
            *[(F.min(n) if k == "min" else F.max(n)).alias(n)
              for n, (k, _e) in self.extrema.items()])

    def _ack(self, meta: dict) -> None:
        """Publish this view's consumed hwm into the table's consumer
        group (crash between meta write and ack only UNDER-reports —
        retention stays conservative, never unsafe)."""
        if self.consumer_name:
            self.table.ack_consumer(
                self.consumer_name,
                {tag: consumed_parts(e)[0]
                 for tag, e in meta["consumed"].items()})

    def _sweep_orphans(self) -> None:
        """Delete view_* dirs not referenced by meta['current'] —
        leftovers of a crash between data write and meta swap."""
        current = self._meta()["current"]
        for d in os.listdir(self.root):
            p = os.path.join(self.root, d)
            if (d.startswith("view_") and d.endswith(".parquet")
                    and d != current and os.path.isdir(p)):
                shutil.rmtree(p, ignore_errors=True)

    # ---------------- verification ----------------
    def full_recompute(self) -> DataFrame:
        """The same view computed the expensive way — a full groupBy
        over the base table's live rows.  For tests/audits only."""
        snap = self.table.read().filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        exprs = self._sum_exprs()
        rows = snap.select(
            *self.group_cols, *[e.alias(n) for n, e in exprs.items()],
            *[F.expr(e).cast("long").alias(n) for n, (_k, e) in self.extrema.items()])
        df = rows.groupBy(*self.group_cols).agg(
            *[F.sum(n).alias(n) for n in exprs],
            *[(F.min(n) if k == "min" else F.max(n)).alias(n)
              for n, (k, _e) in self.extrema.items()])
        for n in self.avgs:
            s, c = self._avg_cols(n)
            df = df.withColumn(
                n, F.when(F.col(c) > 0, F.col(s).cast("double") / F.col(c)))
            df = df.drop(s, c)
        order = (self.group_cols + list(self.aggs) + list(self.avgs)
                 + list(self.extrema) + [_N])
        return df.select(*order)
