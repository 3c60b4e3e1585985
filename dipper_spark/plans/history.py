"""SCD2 row-version history derived from the changefeed (round 5,
beyond-survey — the classic CDC *downstream* shape after replication
and IVM: an audit / slowly-changing-dimension-type-2 view).

`scd2_history(table)` turns the row-level changefeed (CDC OUT,
target.py changefeed()) into one row per key VERSION:

  - the data columns as of that version;
  - `version_op`        — the change_op (I/U) that opened it;
  - `effective_from_ts` / `effective_from_lsn` — the opening change's
    winning (ts, lsn);
  - `effective_to_ts` / `effective_to_lsn` — the NEXT change's
    (ts, lsn), null while the version is still open;
  - `end_op`            — what closed it ('U' superseded, 'D' deleted,
    null while open);
  - `is_current`        — open AND not deleted (exactly the snapshot).

Semantics (pinned by tests/test_history.py):
  - The current slice (`is_current`) equals `snapshot()` exactly.
  - Per key the intervals are disjoint and, where `end_op = 'U'`,
    contiguous: `effective_to_* = ` next version's `effective_from_*`.
    A 'D' end leaves a gap until a later resurrection re-opens.
  - Reconstructing "state at (ts, lsn) point P" = versions with
    `effective_from <= P < effective_to` — valid because the merge
    guard makes each key's applied-change sequence STRICTLY increasing
    in (ts, lsn), so (change_ts, change_lsn) is a total per-key
    version clock even across scopes (whose `batch` ids are
    independent clocks and can NOT be compared).

Scale: one shuffle of the FEED (not the table) on the key columns,
then a per-key window — partition-parallel, no driver-side work; the
window state per key is a handful of versions.  The view is derived,
not stored: for repeated point-in-time queries at 100 TB, land it
once with `.write.parquet(...)` and filter by the effective range
(both bounds are plain columns, so predicate pushdown prunes).

Retention contract: history needs the FULL feed — changefeed() raises
ChangefeedExpiredError if any batch has been expired, in which case
history before the retention floor is unrecoverable (re-seed from a
time-travel snapshot if the table keeps them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import KEY_COLUMNS

#: feed bookkeeping columns that are not data columns
_FEED_META = {"change_op", "before", "change_ts", "change_lsn",
              "scope", "batch"}


def scd2_history(table, scope: str | None = None,
                 source: str = "feed",
                 from_version: int | str | None = None) -> DataFrame:
    """One row per key version (see module docstring).

    source='feed' (default): `table` is a changefeed-enabled
    LocalCowTable; `scope` optionally restricts to one writer scope's
    feed (only sound if that scope is the sole writer of those keys).

    source='changelog': derive the history from SNAPSHOT-DIFF
    per-commit changelog steps instead (changelog_between,
    granularity='commit') — this is how tables WITHOUT a write-time
    changefeed (merge-on-read especially, plain time-travel CoW too)
    get an SCD2 view.  Resolution is per RETAINED COMMIT, exactly as
    fine as snapshot retention: changes netted within one commit (or
    across expired intermediate versions) collapse to one row version.
    History older than the earliest retained version (or
    `from_version`) is SEEDED from that snapshot's live rows, whose
    (_op_ts, _lsn) stamps are precisely the opening stamps of the
    versions current at that point — the seed composes with later
    steps under the same strictly-increasing per-key clock.  Renames
    in range resolve through field ids (both the steps and the seed
    conform to the newest schema).  Refuses when a
    compact(drop_tombstones=True) erased a deletion's (ts, lsn)
    identity inside the range: such a D step cannot be placed on the
    version clock (choose a from_version after the purge instead)."""
    if source == "changelog":
        if scope is not None:
            raise ValueError("scope filtering applies to the write-time "
                             "feed only; the snapshot-diff changelog is "
                             "already net across all scopes")
        return _scd2_from_changelog(table, from_version)
    if source != "feed":
        raise ValueError(f"source must be 'feed' or 'changelog', got {source!r}")
    feed = table.changefeed(scope=scope)
    data_cols = [c for c in feed.columns if c not in _FEED_META]
    # strictly increasing per key (merge guard) -> a total version clock
    w = (Window.partitionBy(*KEY_COLUMNS)
         .orderBy("change_ts", "change_lsn"))
    nxt = (feed
           .withColumn("_to_ts", F.lead("change_ts").over(w))
           .withColumn("_to_lsn", F.lead("change_lsn").over(w))
           .withColumn("_end_op", F.lead("change_op").over(w)))
    return (nxt.filter(F.col("change_op") != "D")
            .select(*data_cols,
                    F.col("change_op").alias("version_op"),
                    F.col("change_ts").alias("effective_from_ts"),
                    F.col("change_lsn").alias("effective_from_lsn"),
                    F.col("_to_ts").alias("effective_to_ts"),
                    F.col("_to_lsn").alias("effective_to_lsn"),
                    F.col("_end_op").alias("end_op"),
                    F.col("_end_op").isNull().alias("is_current"),
                    "scope", "batch"))


def _scd2_from_changelog(table, from_version) -> DataFrame:
    from pyspark.sql import types as T

    if not table._load().get("time_travel"):
        raise ValueError("source='changelog' needs a time_travel=True "
                         "table (retained versions are the change source)")
    vs = table.versions()
    v0 = (vs[0] if from_version is None
          else table._resolve_as_of(from_version))
    v_last = vs[-1]
    man_to = table._load_as_of(v_last)
    steps = table.changelog_between(v0, v_last, granularity="commit")
    # a tombstone-purged delete has no (ts, lsn) identity -> no place
    # on the version clock; refuse loudly (cost: one action over the
    # bucket-pruned changelog, O(changed keys))
    if steps.filter((F.col("change_op") == "D")
                    & F.col("change_ts").isNull()).limit(1).count():
        raise ValueError(
            "a delete inside the range lost its (ts, lsn) identity to "
            "compact(drop_tombstones=True) and cannot be placed on the "
            "version clock — derive history with from_version set after "
            "the purge, or keep tombstones on audited tables")
    data_cols = [c for c in steps.columns
                 if c not in _FEED_META and c != "commit_version"
                 and c not in KEY_COLUMNS]
    # seed: versions already open at v0 (their _op_ts/_lsn ARE the
    # opening stamps), conformed to the newest schema via field ids
    schema = T.StructType.fromJson(man_to["schema"])
    fids = man_to.get("field_ids")
    man_v0 = table._load_as_of(v0)
    if fids:
        table._ensure_field_ids(man_v0)
    base = (table._read_resolved(man_v0, schema, fids=fids)
            .filter(~F.coalesce(F.col("_deleted"), F.lit(False))))
    seed = base.select(
        *KEY_COLUMNS, *data_cols,
        F.lit("I").alias("change_op"),
        F.col("_op_ts").alias("change_ts"),
        F.col("_lsn").alias("change_lsn"),
        F.lit(int(v0)).cast("int").alias("batch"))
    events = seed.unionByName(steps.select(
        *KEY_COLUMNS, *data_cols, "change_op", "change_ts", "change_lsn",
        F.col("commit_version").alias("batch")))
    w = (Window.partitionBy(*KEY_COLUMNS)
         .orderBy("change_ts", "change_lsn"))
    nxt = (events
           .withColumn("_to_ts", F.lead("change_ts").over(w))
           .withColumn("_to_lsn", F.lead("change_lsn").over(w))
           .withColumn("_end_op", F.lead("change_op").over(w)))
    return (nxt.filter(F.col("change_op") != "D")
            .select(*KEY_COLUMNS, *data_cols,
                    F.col("change_op").alias("version_op"),
                    F.col("change_ts").alias("effective_from_ts"),
                    F.col("change_lsn").alias("effective_from_lsn"),
                    F.col("_to_ts").alias("effective_to_ts"),
                    F.col("_to_lsn").alias("effective_to_lsn"),
                    F.col("_end_op").alias("end_op"),
                    F.col("_end_op").isNull().alias("is_current"),
                    F.lit("changelog").alias("scope"), "batch"))


def state_at(history: DataFrame, ts, lsn: int | None = None) -> DataFrame:
    """The table state at (ts, lsn): versions whose effective range
    covers the point.  `lsn=None` means 'after every event with
    change_ts <= ts' (point = (ts, +inf)).  Pure filter over the
    history frame — pushdown-prunable when the history is landed as
    parquet."""
    big = 2 ** 62 if lsn is None else int(lsn)
    point = F.struct(F.lit(ts).cast("timestamp").alias("ts"),
                     F.lit(big).alias("lsn"))
    frm = F.struct(F.col("effective_from_ts").alias("ts"),
                   F.col("effective_from_lsn").alias("lsn"))
    to = F.struct(F.col("effective_to_ts").alias("ts"),
                  F.col("effective_to_lsn").alias("lsn"))
    return history.filter(
        (frm <= point) & (F.col("effective_to_ts").isNull() | (to > point)))
