"""Changefeed-driven table replication (round 5 — beyond-survey,
cascading CDC): maintain a downstream `LocalCowTable` replica purely
from an upstream table's row-level changefeed — the OUT half of the
engine feeding the IN half, closing the loop a real pipeline runs at
scale (ingest cluster -> lake table -> changefeed -> derived replicas
in other regions / layouts / retention domains).

Shape at 10^10 events: the replica never scans the upstream base
table after bootstrap — each sync reads ONLY unconsumed feed batches
(Hive `scope=/batch=` dirs, directory-pruned), collapses them LWW per
key, and merges into the downstream with the same bucket-aligned CoW
merge every other writer uses.  Feed batches carry at most one row
per key each (they are applied net-changes), so the cross-batch
collapse groups tiny frames — no salting needed.  The replica may use
a DIFFERENT bucket count than the upstream (a re-layout replica), and
may itself be changefeed-enabled, which chains: a mirror of a mirror
stays consistent (pinned by tests/test_mirror.py).

Exactly-once, three independent layers (same story as ingest):
  1. the consumed watermark (per upstream scope tag, hwm + extras)
     in `_mirror.json` — crash AFTER merge, BEFORE meta write simply
     re-reads the batches;
  2. the downstream ledger — each sync merge uses the deterministic
     (scope "mirror/<tag>", batch_id = max consumed upstream batch)
     identity, so a re-run is ledger-skipped;
  3. the (ts, lsn) merge guard — even a torn re-application is a
     row-level no-op.

Retention contract: syncing detects holes (upstream expired batches
this mirror never consumed) via the shared probe and raises
ChangefeedExpiredError; `bootstrap()` re-seeds from the upstream
snapshot and fast-forwards the watermark (listing feed dirs BEFORE
reading the snapshot, so a concurrent upstream commit is at worst
re-applied as a (ts, lsn) no-op, never skipped).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ivm import (batch_dir_readable, consumed_parts, mark_consumed,
                  pending_feed_batches)
from .target import (
    KEY_COLUMNS,
    SYSTEM_FIELDS,
    ChangefeedExpiredError,
    CommitConflict,
    LocalCowTable,
)

_FEED_META = {"change_op", "before", "change_ts", "change_lsn", "scope", "batch"}


def _feed_to_events(feed: DataFrame) -> tuple[DataFrame, list[str]]:
    """Feed rows -> the collapsed-batch event shape merge() expects:
    keys + data columns + (ts, lsn, is_delete).  The post-image data
    columns of a D row are null in the feed, which is exactly the
    tombstone shape; `before` is not needed for replication.

    `ts` is special: in the engine it is BOTH a data column and the
    event-time ordering column (merge nulls the stored copy for
    tombstones while keeping _op_ts).  The feed's change_ts IS the
    winner's event ts — identical to the post-image ts on I/U rows,
    and the only non-null copy on D rows — so it becomes the single
    `ts` and the post-image duplicate is dropped."""
    data_cols = [c for c in feed.columns
                 if c not in KEY_COLUMNS and c not in _FEED_META
                 and c != "ts"]
    ev = feed.select(
        *KEY_COLUMNS, *data_cols,
        F.col("change_ts").alias("ts"),
        F.col("change_lsn").alias("lsn"),
        (F.col("change_op") == "D").alias("is_delete"),
    )
    return ev, data_cols


def _collapse_events(ev: DataFrame, data_cols: list[str]) -> DataFrame:
    """Cross-batch LWW collapse of feed-derived events: one row per
    key, winner by (ts, lsn).  Unsalted — the feed has <= 1 row per
    key PER upstream batch, so per-key cardinality here is bounded by
    the number of batches in the sync window, not by event volume
    (contrast operators/cdc.lww_collapse, which faces raw dup storms)."""
    ordk = F.struct(F.col("ts"), F.col("lsn"))
    carried = data_cols + ["ts", "lsn", "is_delete"]
    val = F.struct(*[F.col(c) for c in carried])
    g = ev.groupBy(*KEY_COLUMNS).agg(
        F.max_by(val, ordk).alias("_w"),
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(F.col("lsn")).alias("n_unique"),
    )
    return g.select(
        *KEY_COLUMNS,
        *[F.col(f"_w.{c}").alias(c) for c in carried],
        "n_events", "n_unique",
    )


class MirrorTable:
    """A downstream replica synced from an upstream table's changefeed.

    The downstream is a full-fledged LocalCowTable: snapshot(), time
    travel, its own changefeed (chaining), compaction and rescaling
    all work on it.  Direct writes to the downstream are not forbidden
    but void the replica guarantee (the mirror only promises
    state == upstream snapshot when it is the sole writer)."""

    META = "_mirror.json"

    def __init__(self, spark: SparkSession, upstream_root: str, root: str,
                 consumer_name: str | None = None,
                 source: str = "changefeed"):
        """source='changefeed' (default) tails the upstream's write-time
        feed; source='changelog' diffs retained upstream versions via
        the snapshot-diff changelog (time_travel upstreams, ANY write
        mode — the replication path for MoR upstreams, which cannot
        emit a write-time feed)."""
        if source not in ("changefeed", "changelog"):
            raise ValueError(f"source must be 'changefeed' or 'changelog', got {source!r}")
        self.spark = spark
        self.up = LocalCowTable(spark, upstream_root)
        self.down = LocalCowTable(spark, root)
        self.root = root
        self.source = source
        # consumer_name: register in the upstream's changefeed consumer
        # group — each sync/bootstrap acks, so
        # expire_changefeed(keep_consumed=True) never expires batches
        # this mirror still needs (a lagging mirror HOLDS retention
        # instead of being forced into a re-bootstrap).  Changelog
        # mirrors pin a snapshot TAG on the last-synced upstream
        # version instead — expire_snapshots honors tags, so the same
        # a-lagging-consumer-holds-retention contract applies to
        # version retention.
        self.consumer_name = consumer_name
        if consumer_name and source == "changefeed":
            self.up.register_consumer(consumer_name)
        elif consumer_name and self._read_meta_or_none() is None:
            self.up.move_tag(self._pin_tag(), self.up.versions()[0])

    def _pin_tag(self) -> str:
        return f"consumer/{self.consumer_name}"

    def _read_meta_or_none(self) -> dict | None:
        try:
            return self._meta()
        except FileNotFoundError:
            return None

    # ---------------- lifecycle ----------------
    @classmethod
    def create(cls, spark: SparkSession, upstream_root: str, root: str,
               n_buckets: int = 32, changefeed: bool = False,
               time_travel: bool = False,
               consumer_name: str | None = None,
               source: str = "changefeed") -> "MirrorTable":
        if not os.path.exists(os.path.join(upstream_root, LocalCowTable.MANIFEST)):
            raise FileNotFoundError(f"upstream table {upstream_root} does not exist")
        up_man = LocalCowTable(spark, upstream_root)._load()
        if source == "changelog":
            if not up_man.get("time_travel"):
                raise ValueError(
                    f"upstream {upstream_root} was not created with "
                    "time_travel=True — a changelog mirror diffs retained "
                    "versions; without them use a changefeed upstream")
        elif not up_man.get("changefeed"):
            raise ValueError(
                f"upstream {upstream_root} was not created with changefeed=True — "
                "a mirror replicates the feed, not the base files "
                "(or use source='changelog' on a time_travel upstream)")
        LocalCowTable.create(spark, root, n_buckets=n_buckets,
                             changefeed=changefeed, time_travel=time_travel)
        m = cls(spark, upstream_root, root, consumer_name=consumer_name,
                source=source)
        if not os.path.exists(m._meta_path()):
            m._write_meta({"upstream": upstream_root, "consumed": {}})
        return m

    def _meta_path(self) -> str:
        return os.path.join(self.root, self.META)

    def _meta(self) -> dict:
        with open(self._meta_path()) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_path() + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._meta_path())

    # ---------------- sync (batch) ----------------
    def sync(self) -> dict:
        """Fold all unconsumed upstream feed batches into the replica.
        One merge commit per upstream scope tag (per-tag batch ids are
        dense, giving each merge a deterministic idempotent identity);
        cross-tag ordering is irrelevant because the (ts, lsn) guard
        makes merge application order-independent.  The consumed
        watermark is advanced per tag AFTER its merge commits."""
        if self.source == "changelog":
            return self._sync_changelog()
        meta = self._meta()
        pending = pending_feed_batches(self.up, meta["consumed"], consumer="mirror")
        if not pending:
            return {"consumed": {}, "merges": 0, "noop": True}
        base = os.path.join(self.up.root, "_changes")
        merges = 0
        for tag, batches in pending:
            paths = [os.path.join(base, f"scope={tag}", f"batch={b}") for b in batches]
            # applied-nothing batches publish no parquet parts — consume
            # their ids without a read (a tag whose pending set is ALL
            # empty must not reach spark.read: zero-file reads cannot
            # infer a schema); concurrent expiry of a pending dir raises
            # the typed retention error (batch_dir_readable)
            paths = [p for p in paths if batch_dir_readable(p, consumer="mirror")]
            if paths:
                feed = (self.spark.read.option("mergeSchema", "true")
                        .option("basePath", base).parquet(*paths))
                ev, data_cols = _feed_to_events(feed)
                collapsed = _collapse_events(ev, data_cols)
                self._merge_retrying(collapsed, batch_id=max(batches),
                                     scope=f"mirror/{tag}")
                merges += 1
            meta["consumed"][tag] = mark_consumed(meta["consumed"].get(tag), batches)
            self._write_meta(meta)
        self._ack(meta)
        return {"consumed": {t: b for t, b in pending}, "merges": merges,
                "noop": False}

    def _ack(self, meta: dict) -> None:
        """Publish consumed hwms into the upstream consumer group (a
        crash before the ack only under-reports — retention stays
        conservative, never unsafe)."""
        if not self.consumer_name:
            return
        if self.source == "changelog":
            if meta.get("version") is not None:
                self.up.move_tag(self._pin_tag(), int(meta["version"]))
            return
        self.up.ack_consumer(
            self.consumer_name,
            {tag: consumed_parts(e)[0]
             for tag, e in meta["consumed"].items()})

    # ---------------- sync via snapshot-diff changelog (round 5) ----------
    def _sync_changelog(self) -> dict:
        """Replicate by diffing the upstream between the last-synced
        retained version and the current one (source='changelog' — the
        MoR-upstream path).  The net changes convert to the same
        collapsed-event shape the feed path merges, with the
        deterministic identity (scope 'mirror/changelog', batch_id =
        to-version): a crash between merge commit and watermark write
        re-runs as a ledger skip, and a wider re-diff re-applies net
        rows as (ts, lsn) no-ops — the same three exactly-once layers.

        Two loud edges, both resolved by bootstrap():
          * the `from` version expired (fell behind snapshot
            retention; a consumer_name pin prevents this);
          * upstream compact(drop_tombstones=True) inside the window
            erased a delete's (ts, lsn) identity — without it the
            tombstone could not beat a staler resurrection downstream,
            so the mirror refuses rather than risking divergence."""
        meta = self._meta()
        cur = int(self.up._load()["version"])
        synced = meta.get("version")
        frm = 0 if synced is None else int(synced)
        if frm == cur:
            return {"from_version": frm, "to_version": cur, "merges": 0,
                    "noop": True}
        try:
            man_a = self.up._load_as_of(frm)
        except FileNotFoundError as e:
            raise ChangefeedExpiredError(
                f"upstream version {frm} expired before this mirror synced "
                f"it (retained: {self.up.versions()}) — re-seed with "
                "bootstrap()") from e
        if LocalCowTable.same_data(man_a, self.up._load_as_of(cur)):
            # metadata-only range (tags/acks/DDL): fast-forward, no job
            meta["version"] = cur
            self._write_meta(meta)
            self._ack(meta)
            return {"from_version": frm, "to_version": cur, "merges": 0,
                    "noop": True}
        ch = self.up.changelog_between(frm, cur)
        ev, data_cols = _feed_to_events(ch)
        lost = ev.filter(F.col("is_delete") & F.col("lsn").isNull()).count()
        if lost:
            raise ChangefeedExpiredError(
                f"{lost} delete(s) in upstream versions ({frm}, {cur}] lost "
                "their (ts, lsn) identity to compact(drop_tombstones=True) — "
                "a changelog mirror cannot order them against later "
                "resurrections; re-seed with bootstrap()")
        collapsed = _collapse_events(ev, data_cols)
        self._merge_retrying(collapsed, batch_id=cur, scope="mirror/changelog")
        meta["version"] = cur
        self._write_meta(meta)
        self._ack(meta)
        return {"from_version": frm, "to_version": cur, "merges": 1,
                "noop": False}

    # ---------------- bootstrap (snapshot seed) ----------------
    def bootstrap(self) -> dict:
        """Seed the replica from the upstream SNAPSHOT and fast-forward
        the watermark — for mirrors created after feed retention
        already expired history (sync() would raise
        ChangefeedExpiredError), or to skip replaying a long feed.

        Order matters: the feed dirs are listed BEFORE the snapshot is
        read, so every listed batch is fully contained in the snapshot
        (the manifest swap publishes feed and data atomically).  A
        commit landing between the listing and the snapshot read is
        re-applied by the next sync() — a (ts, lsn)-guarded no-op."""
        # changelog mirrors: the version watermark plays the role the
        # feed listing plays below — captured BEFORE the snapshot read
        # for the same reason (a commit in between is re-applied by the
        # next sync as a (ts, lsn) no-op, never skipped)
        cur = int(self.up._load()["version"])
        base = os.path.join(self.up.root, "_changes")
        listed: dict[str, list[int]] = {}
        if os.path.isdir(base):
            for d in sorted(os.listdir(base)):
                if d.startswith("scope="):
                    tag = d.split("=", 1)[1]
                    listed[tag] = sorted(
                        int(b.split("=", 1)[1])
                        for b in os.listdir(os.path.join(base, d))
                        if b.startswith("batch="))
        # floors too: expired batches are consumed-by-definition after
        # a snapshot bootstrap (the snapshot contains their effects)
        floors = self.up._load().get("changefeed_floor", {})
        snap = self.up.read(include_system=True)
        sys_names = {f.name for f in SYSTEM_FIELDS}
        # same ts duality as _feed_to_events: _op_ts is the one copy
        # that is non-null on tombstones too
        data_cols = [c for c in snap.columns
                     if c not in KEY_COLUMNS and c not in sys_names
                     and c != "ts"]
        ev = snap.select(
            *KEY_COLUMNS, *data_cols,
            F.col("_op_ts").alias("ts"),
            F.col("_lsn").alias("lsn"),
            F.coalesce(F.col("_deleted"), F.lit(False)).alias("is_delete"),
        ).withColumn("n_events", F.lit(1).cast("long")) \
         .withColumn("n_unique", F.lit(1).cast("long"))
        # GHOST PURGE: replica rows whose key is absent from the
        # upstream snapshot entirely — the upstream deleted them AND
        # erased the tombstone (compact(drop_tombstones=True)), so no
        # event in `ev` can remove them.  Synthesize a tombstone per
        # ghost at (its own ts, lsn + 1): strictly newer than the stale
        # row (the guard applies it) by the MINIMAL margin, so any
        # genuinely newer upstream event still wins.  Empty on a fresh
        # replica; one key-column anti-join otherwise.
        if self.down._load()["schema"] is not None:
            mine = self.down.read(include_system=True)
            ghosts = (mine.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
                      .join(snap.select(*KEY_COLUMNS),
                            on=list(KEY_COLUMNS), how="left_anti"))
            purge = ghosts.select(
                *KEY_COLUMNS,
                *[F.lit(None).cast(snap.schema[c].dataType).alias(c)
                  for c in data_cols],
                F.col("_op_ts").alias("ts"),
                (F.col("_lsn") + F.lit(1)).cast("long").alias("lsn"),
                F.lit(True).alias("is_delete"),
                F.lit(1).cast("long").alias("n_events"),
                F.lit(1).cast("long").alias("n_unique"),
            )
            ev = ev.unionByName(purge)
        # batch_id=None: every bootstrap gets a FRESH ledger identity.
        # A fixed id would make a SECOND bootstrap (mirror fell behind
        # retention again) ledger-skip the snapshot merge while the
        # watermark below still fast-forwards — silently losing the
        # expired range.  Re-applying a snapshot is always safe: every
        # row the mirror already has is a (ts, lsn) no-op.
        self._merge_retrying(ev, batch_id=None, scope="mirror-bootstrap")
        meta = self._meta()
        for tag in set(listed) | set(floors):
            lo = int(floors.get(tag, 0))
            hwm0, extra0 = consumed_parts(meta["consumed"].get(tag))
            seed = {"hwm": max(hwm0, lo - 1), "extra": sorted(extra0)}
            meta["consumed"][tag] = mark_consumed(seed, listed.get(tag, []))
        if self.source == "changelog":
            meta["version"] = max(cur, int(meta.get("version") or 0))
        self._write_meta(meta)
        self._ack(meta)
        return {"bootstrapped": True, "consumed": listed,
                **({"version": meta["version"]}
                   if self.source == "changelog" else {})}

    def _merge_retrying(self, collapsed: DataFrame, batch_id: int | None,
                        scope: str) -> None:
        """Explicit-batch-id merges don't self-retry inside
        LocalCowTable (the CDC path treats a conflict as fatal), but a
        mirror merge is safely re-derivable: each attempt re-reads the
        downstream manifest, a replayed (scope, batch) is
        ledger-skipped, and torn replays are (ts, lsn) no-ops — so a
        bounded retry after a concurrent downstream commit is always
        correct."""
        for attempt in range(self.down.COMMIT_RETRIES):
            try:
                self.down.merge(collapsed, batch_id=batch_id, scope=scope,
                                single_pass=False)
                return
            except CommitConflict:
                if attempt == self.down.COMMIT_RETRIES - 1:
                    raise

    # ---------------- sync (streaming) ----------------
    def sync_stream(self, checkpoint: str,
                    max_files_per_trigger: int | None = None,
                    fail_on_data_loss: bool = True):
        """Continuous replication: tail the upstream changefeed_stream
        and apply each micro-batch through the same collapse + merge.
        Exactly-once composes: the stream checkpoint pins which feed
        files each epoch saw, the downstream ledger skips a replayed
        (mirror-stream, epoch) merge after a crash-in-commit, and the
        (ts, lsn) guard makes even torn replays row-level no-ops.
        Returns the StreamingQuery (caller awaits/stops it)."""
        feed = self.up.changefeed_stream(
            max_files_per_trigger=max_files_per_trigger,
            fail_on_data_loss=fail_on_data_loss)

        def _apply(batch_df: DataFrame, epoch_id: int) -> None:
            ev, data_cols = _feed_to_events(batch_df)
            collapsed = _collapse_events(ev, data_cols)
            # ledger scope = checkpoint path (same convention as
            # streaming ingest): epoch ids restart per checkpoint
            self.down.merge(collapsed, batch_id=int(epoch_id),
                            scope=f"mirror-stream:{checkpoint}",
                            single_pass=False)

        return (feed.writeStream.foreachBatch(_apply)
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True).start())

    # ---------------- reads ----------------
    def snapshot(self, as_of: int | None = None) -> DataFrame:
        return self.down.snapshot(as_of=as_of)

    def read(self, **kw) -> DataFrame:
        return self.down.read(**kw)
