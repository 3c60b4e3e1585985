"""TargetTable — the lake table the change stream is applied to
(SURVEY.md ops C9, C10, C11, C16, C17; design §7.3).

Two backends with identical MERGE semantics:

  * LocalCowTable — hash-bucketed parquet files + an atomically-swapped
    JSON manifest.  This is Iceberg's copy-on-write MERGE reduced to
    its essentials: data files are immutable, a commit is an atomic
    metadata (manifest) replace, readers see either the old or the new
    snapshot, and an embedded batch ledger makes `foreachBatch`
    replays no-ops.  Fully exercised by the test suite.

  * IcebergTable — the production backend (real `MERGE INTO` /
    `DataFrame.mergeInto`, ALTER TABLE schema evolution, snapshot
    commits).  The sandbox has no Iceberg runtime jar and no network
    (SURVEY.md §0.3), so this class is thin and NOT testable here; it
    documents exactly what runs on a real cluster.

Merge rule (BASELINE.json north_star):
  source row wins iff target key absent OR
  struct(s.ts, s.lsn) > struct(t._op_ts, t._lsn)   -- (ts, lsn) max-order
  winner op 'D' writes a TOMBSTONE (kept, hidden from snapshots) so a
  staler event can never resurrect a deleted key -> the final state is
  independent of micro-batch boundaries and of replay/redelivery.

Scale notes (10^10 events / 100 TB):
  - The target is bucketed by pmod(murmur3(conv_id, turn_idx), N) —
    deliberately the SAME function Spark's HashPartitioning uses for a
    shuffle on the merge keys.  The merge join's output is therefore
    already bucket-aligned: when the join ran with N shuffle
    partitions, partition i holds exactly bucket i's rows, so the CoW
    write needs NO repartition — `partitionBy("_bucket")` splits each
    task's rows into whole-bucket files without moving data.  (If the
    session's shuffle partitioning disagrees with N, merge falls back
    to one explicit repartition — the pre-round-2 behavior.)
  - Key-hash bucketing also defuses hot-conversation write skew: a hot
    conv's turns spread over buckets instead of landing in one.
  - A merge touches only the buckets its batch keys hash to, and the
    collapse (op C7/C8) has already reduced events to <= one row per
    key, so the join input is net-changes, not raw events.
  - On Iceberg the same layout is `bucket(N, conv_id, turn_idx)`
    partitioning + storage-partitioned joins; here the full-outer join
    shuffles both sides on the key, which AQE sizes at runtime.
"""

from __future__ import annotations

import base64
import calendar
import fcntl
import hashlib
import json
import re
import os
import shutil
import time
import uuid
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass
from functools import reduce

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import KEY_COLUMNS, SPEC_COLUMNS

# lineage.py imports MergeStats from here — keep this constant local
# (same value as lineage.DEAD_LETTER_DIR) to avoid the import cycle
DEAD_LETTER_DIR = "_deadletter"

SYSTEM_FIELDS = [
    T.StructField("_op_ts", T.TimestampType(), True),
    T.StructField("_lsn", T.LongType(), True),
    T.StructField("_deleted", T.BooleanType(), True),
]
_NON_DATA = set(KEY_COLUMNS) | {c.name for c in SYSTEM_FIELDS} | {
    "op", "lsn", "n_events", "n_unique", "is_delete", "source", "source_offset", "_bucket",
}

_WIDENINGS = {("integer", "long"), ("float", "double"), ("integer", "double")}

# Columns that can never be renamed or dropped: merge keys (bucketing +
# MERGE ON clause) and engine-managed system columns.  They carry no
# field ids and always resolve by their canonical names.
_NO_RENAME = set(KEY_COLUMNS) | {f.name for f in SYSTEM_FIELDS}


# ---------------- per-file conv_id Bloom filters (round 5) ----------------
# Iceberg stores value-membership sketches in Puffin sidecar blobs,
# computed by a separate `compute_table_stats` maintenance action —
# NOT on the write path — and planning consults them to skip files a
# predicate value can't be in.  Same split here: `compute_stats()`
# builds one small Bloom filter over each live file's DISTINCT conv
# ids (commits stay footer-stats-only and fast), and conv lookups test
# it after the min/max range check.  On a hash-bucketed base the conv
# *range* of a file is nearly always [first conv, last conv] — hashing
# mixes conversations — so range stats only ever prune tiny MoR delta
# files; the Bloom is what lets a point lookup skip base files too.
# Hashing is pure-Python blake2b (deterministic everywhere; the
# per-file distinct-conv sets these digest are small by construction).

_BLOOM_K = 4  # probes per value; with m >= 10 bits/value fpp ~ 1.2%
_BLOOM_MAX_DISTINCT = 8192  # beyond this a file-level bloom is noise
_BLOOM_MAX_BITS = 1 << 16


def _bloom_probes(value: str, m: int) -> list[int]:
    """k bit positions via Kirsch-Mitzenmacher double hashing over the
    two 64-bit halves of blake2b-128 (h2 forced odd so, m being a
    power of two, the probe stride never degenerates)."""
    d = hashlib.blake2b(value.encode("utf-8"), digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [(h1 + i * h2) % m for i in range(_BLOOM_K)]


def _bloom_build(values) -> dict | None:
    """Bloom dict for an iterable of conv ids: m sized to >= 10 bits
    per distinct value (power of two, capped).  A file with more
    distinct convs than the cap gets a `{"m": 0}` saturated marker —
    recorded so compute_stats never re-reads it, never pruned on."""
    vals = {v for v in values if v is not None}
    if not vals:
        return None
    n = len(vals)
    if n > _BLOOM_MAX_DISTINCT:
        return {"m": 0, "n": n}
    m = 256
    while m < 10 * n and m < _BLOOM_MAX_BITS:
        m <<= 1
    bits = bytearray(m // 8)
    for v in vals:
        for p in _bloom_probes(v, m):
            bits[p >> 3] |= 1 << (p & 7)
    return {"m": m, "n": n,
            "bits": base64.b64encode(bytes(bits)).decode("ascii")}


def _bloom_maybe_contains(bloom: dict | None, value: str) -> bool:
    """False only when the file provably does not contain `value`.
    Absent or saturated blooms never prune (True)."""
    if not bloom or not bloom.get("m"):
        return True
    bits = base64.b64decode(bloom["bits"])
    return all(bits[p >> 3] & (1 << (p & 7))
               for p in _bloom_probes(value, bloom["m"]))


def _scan_race(e: BaseException) -> bool:
    """True when a Spark job died because a data file it planned over
    was GC'd by a concurrent commit (the one-commit grace window was
    outrun by two+ commits during planning) — retryable: re-planning
    against the current manifest reads current files."""
    return "FileNotFoundException" in str(e)


class SchemaEvolutionError(ValueError):
    pass


class ChangefeedExpiredError(ValueError):
    """The requested changefeed range includes batches that retention
    already removed (Kafka's OffsetOutOfRange / Iceberg's expired-
    snapshot incremental-read error).  The consumer must re-bootstrap
    from a full snapshot instead of tailing the feed."""


class ConstraintViolation(ValueError):
    """An incoming batch violates an ENFORCE-mode CHECK constraint
    (Delta's InvariantViolationException shape).  Raised before any
    file is written or committed — the merge was NOT applied.  The
    message carries per-constraint violation counts; quarantine-mode
    constraints never raise (violating rows are routed to the
    dead-letter sink instead)."""

    def __init__(self, counts: dict[str, int]):
        self.counts = dict(counts)
        super().__init__(
            "CHECK constraint violation(s) in incoming batch: "
            + ", ".join(f"{n}={c} rows" for n, c in sorted(counts.items())))


class CommitConflict(RuntimeError):
    """Optimistic-concurrency failure: another writer committed a
    conflicting change between this writer's manifest read and its
    commit attempt (Iceberg's ValidationException shape).  The commit
    was NOT applied; nothing was lost.  Callers that can re-derive
    their source from current table state (upsert/delete_where/compact)
    retry automatically; streaming ingest is single-writer per
    checkpoint by contract and propagates."""


@dataclass
class MergeStats:
    batch_id: int
    skipped: bool = False
    rows_in: int = 0
    rows_unique: int = 0
    rows_applied: int = 0
    inserts: int = 0
    updates: int = 0
    deletes: int = 0
    conflicts: int = 0
    max_lsn: int | None = None
    offset_min: int | None = None
    offset_max: int | None = None
    wall_ms: int = 0
    rows_quarantined: int = 0


class LocalCowTable:
    """Hash-bucketed copy-on-write parquet table with atomic manifest commits."""

    MANIFEST = "manifest.json"
    # Ledger retention: the manifest embeds the batch ledger, so an
    # unbounded ledger makes total manifest I/O O(batches^2) on long
    # streams.  Only the recent tail is needed for the fast replay
    # skip — a batch older than the window re-merges as a NO-OP anyway
    # because the (ts, lsn) guard rejects every stale event (layer 3 of
    # the exactly-once story).
    LEDGER_CAP = 512

    def __init__(self, spark: SparkSession, root: str, branch: str | None = None):
        """`branch` opens a handle onto a named branch (see
        create_branch): reads and writes go to the branch's manifest
        under _branches/, data files land in the shared data/ dir
        (uuid names never collide), and nothing is visible on main
        until fast_forward() publishes — the Iceberg branch / WAP
        (write-audit-publish) shape."""
        self.spark = spark
        self.root = root
        self.branch = branch

    # ---------------- manifest ----------------
    @classmethod
    def create(cls, spark: SparkSession, root: str, n_buckets: int = 32,
               changefeed: bool = False, time_travel: bool = False,
               write_mode: str = "cow") -> "LocalCowTable":
        if write_mode not in ("cow", "mor"):
            raise ValueError(f"write_mode must be 'cow' or 'mor', got {write_mode!r}")
        if write_mode == "mor" and changefeed:
            # The changefeed's I/U/D ops and before-images come from the
            # CoW merge join against the target; an MoR merge never
            # reads the target (that is its point), so it cannot know
            # whether an appended row inserts or updates.  Iceberg has
            # the same shape: MoR CDC needs the changelog procedure to
            # join delta against base after the fact.
            raise ValueError("changefeed requires write_mode='cow' "
                             "(MoR merges never read the target, so I/U ops "
                             "and before-images are unknowable at write time)")
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        t = cls(spark, root)
        with t._commit_lock():  # two concurrent create()s: one wins, one no-ops
            if not os.path.exists(t._manifest_path()):
                t._write_manifest(
                {
                    "format_version": 2,  # v2: bucket fn = pmod(murmur3(key), N)
                    "version": 0,
                    "n_buckets": n_buckets,
                    "schema": None,  # defined by the first applied batch
                    "schemas": [],  # every schema ever written, in order
                    "buckets": {},  # bucket id (str) -> [[rel path, schema id]]
                    "ledger": [],  # [{batch_id, max_lsn, rows_applied, committed_at}]
                    # per-scope monotonic NEXT batch id for API-allocated
                    # writes — independent of ledger trimming, so ids
                    # never restart (a restarted id would overwrite its
                    # old _changes/ dir and be skipped by consumers)
                    "scope_seq": {},
                    # changefeed: every merge also emits its applied
                    # row-level changes under _changes/ for downstream
                    # incremental consumers (see changefeed())
                    "changefeed": changefeed,
                    # time_travel: every commit also retains its manifest
                    # under _versions/ and superseded data files are NOT
                    # GC'd at commit — snapshot(as_of=v) reads any
                    # retained version; expire_snapshots() reclaims space
                    "time_travel": time_travel,
                    # write_mode (round 5): 'cow' rewrites touched
                    # buckets per merge (read-optimized); 'mor' appends
                    # per-bucket DELTA files and resolves LWW winners
                    # at read (write-optimized — the Iceberg v2
                    # merge-on-read shape; see the "merge-on-read"
                    # section below).  compact() folds deltas back into
                    # base either way.
                    "write_mode": write_mode,
                    "deltas": {},  # bucket id (str) -> [[rel path, schema id, commit ver]]
                }
            )
        return t

    @staticmethod
    def _mode(man: dict) -> str:
        """Write mode; manifests written before round 5 are CoW."""
        return man.get("write_mode", "cow")

    def set_write_mode(self, mode: str) -> None:
        """Switch the table's write mode (locked metadata commit).
        Either direction is safe at any time: reads always resolve
        outstanding deltas, and a CoW merge over a bucket with deltas
        folds that bucket's deltas into its rewrite (see _merge_inner's
        target read + _commit_merge's delta clearing)."""
        if mode not in ("cow", "mor"):
            raise ValueError(f"write_mode must be 'cow' or 'mor', got {mode!r}")
        with self._commit_lock():
            cur = self._load()
            if self._mode(cur) == mode:
                return
            if mode == "mor" and cur.get("changefeed"):
                raise ValueError("changefeed tables cannot switch to MoR "
                                 "(feed ops/before-images need the CoW merge join)")
            cur["version"] += 1
            cur["write_mode"] = mode
            self._finish_commit(cur, [])

    def _manifest_path(self) -> str:
        if self.branch:
            return os.path.join(self.root, "_branches", f"{self.branch}.json")
        return os.path.join(self.root, self.MANIFEST)

    @staticmethod
    def _bucket_expr(nb: int, fmt: int = 2):
        """Bucket id, dispatched on the manifest's format_version.

        v2 (current): pmod(murmur3(conv_id, turn_idx), nb) — IDENTICAL
        to Spark's HashPartitioning id for a shuffle on the merge keys
        with nb partitions, so a key-partitioned plan is already
        bucket-aligned (see module docstring).  Correctness never
        depends on the alignment: files land in dirs by the COLUMN
        value.

        v1 (legacy): pmod(xxhash64(conv_id), nb).  A v1 table MUST keep
        hashing with the v1 function — probing a v1 layout with the v2
        hash reads the wrong bucket files, misses existing keys, and
        silently duplicates them (the (ts, lsn) guard never sees the
        match).  compact() migrates v1 -> v2 (it rewrites every bucket
        from a full read, so it can switch hash functions safely).

        turn_idx is hashed AS LONG regardless of the stored type: the
        assignment must survive int->long widening (murmur3 of int 3
        and long 3 differ).  The engine pipeline already carries
        turn_idx as long (normalize.decode_payload), so the alignment
        with shuffle partitioning holds on the hot path; direct merges
        of int-typed frames stay correct, merely unaligned."""
        if fmt == 1:
            return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(nb)).cast("int")
        if fmt != 2:
            raise ValueError(f"unknown table format_version {fmt!r}")
        return F.pmod(
            F.hash(F.col("conv_id"), F.col("turn_idx").cast("long")), F.lit(nb)
        ).cast("int")

    @staticmethod
    def _fmt(man: dict) -> int:
        """Manifest format version; manifests written before the field
        existed are v1 (xxhash64 bucketing)."""
        return int(man.get("format_version", 1))

    def _load(self) -> dict:
        with open(self._manifest_path()) as f:
            return json.load(f)

    # ---------------- concurrency control (round 5) ----------------
    # Commit protocol: optimistic, Iceberg-style.  All Spark work (the
    # merge join, the CoW file write) runs OUTSIDE any lock against the
    # manifest version the writer read at start.  The commit itself —
    # rename the new files into data/, validate that no concurrent
    # commit invalidated what this writer read, swap the manifest — is
    # a few-millisecond metadata critical section under an advisory
    # flock (works across threads AND processes on a local/NFS-style
    # FS; on an object store this is the catalog's atomic CAS).
    #
    # Validation & rebase rules (per commit kind):
    #   * merge: the ledger must not already contain this (scope,
    #     batch_id) [concurrent duplicate replay -> skip, it IS this
    #     batch]; the file lists of the TOUCHED buckets must be
    #     byte-identical to what the merge joined against, and the
    #     logical schema unchanged -> rebase onto the current manifest
    #     (carry forward the other writer's buckets + ledger rows) and
    #     commit.  Anything else raises CommitConflict.
    #   * API writes (upsert/delete_where, batch id auto-allocated):
    #     additionally re-allocate the batch id at commit time from the
    #     per-scope monotonic sequence, so two concurrent API writers
    #     never collide on a changefeed (scope, batch) directory.
    #   * compact / expire: touch every bucket -> strict version CAS.
    #
    # Reader note: non-time-travel tables GC superseded files right
    # after commit, so a reader holding a pre-commit manifest can lose
    # files mid-read (same window as before this round).  Readers that
    # need snapshot isolation under concurrent writers use
    # time_travel=True (deferred GC + expire_snapshots), exactly like
    # Iceberg.
    LOCKFILE = "_commit.lock"

    @contextmanager
    def _commit_lock(self):
        fd = os.open(os.path.join(self.root, self.LOCKFILE),
                     os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def _finish_commit(self, cur: dict, replaced: list[str]) -> None:
        """Swap the manifest and run ONE-COMMIT-DEFERRED GC (must be
        called under the commit lock).  Files superseded by THIS commit
        go to manifest `pending_gc`; files superseded by the PREVIOUS
        commit are deleted now.  The one-commit grace keeps concurrent
        planners alive: a merge/reader that loaded manifest v still
        finds v's files on disk while a single concurrent commit lands
        — its own commit-time validation (or retry) handles the
        staleness.  Only a SECOND concurrent commit can pull files out
        from under an in-flight plan, which surfaces as a
        FileNotFound-translated CommitConflict and a retry.
        Time-travel tables defer all GC to expire_snapshots()."""
        gc_now: list[str] = []
        if not cur.get("time_travel") and not cur.get("branch_name"):
            # branch commits never GC: a file this branch superseded
            # may still be referenced by main (or another branch) —
            # space is reclaimed by expire_snapshots' cross-root
            # refcount after publish/abandon
            gc_now = list(cur.get("pending_gc", []))
            cur["pending_gc"] = replaced
        self._write_manifest(cur)  # <-- the atomic commit point
        for rel in gc_now:
            try:
                os.remove(os.path.join(self.root, rel))
            except OSError:
                pass

    def _write_manifest(self, man: dict) -> None:
        # every committed manifest knows its own wall-clock commit time
        # (Iceberg snapshot timestamp-ms) — age-based expire_snapshots
        # reads this; legacy retained versions fall back to file mtime
        man["committed_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                            time.gmtime())
        tmp = self._manifest_path() + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, self._manifest_path())  # atomic commit point
        if man.get("time_travel") and not man.get("branch_name"):
            # retained copy for snapshot(as_of=...).  Written AFTER the
            # commit point: a crash in between loses only the as-of
            # alias for this version (current state is never at risk),
            # and a retried batch rewrites it.
            vdir = os.path.join(self.root, "_versions")
            os.makedirs(vdir, exist_ok=True)
            vtmp = os.path.join(vdir, f".v{man['version']:06d}.tmp")
            with open(vtmp, "w") as f:
                json.dump(man, f, indent=1)
            os.replace(vtmp, os.path.join(vdir, f"v{man['version']:06d}.json"))

    # ---------------- schema ----------------
    def schema(self) -> T.StructType | None:
        s = self._load().get("schema")
        return T.StructType.fromJson(s) if s else None

    def ledger(self) -> list[dict]:
        return self._load()["ledger"]

    def _evolve_schema(self, man: dict, batch: DataFrame) -> T.StructType:
        """Schema evolution, merge-on-write (op C9): ADD new columns,
        widen int->long / float->double; reject narrowing or type
        conflicts with a clear error.  Mirrors Iceberg's safe
        promotions."""
        incoming = [f for f in batch.schema.fields if f.name not in _NON_DATA]
        if man["schema"] is None:
            fields = (
                [T.StructField("conv_id", T.StringType(), False),
                 T.StructField("turn_idx", batch.schema["turn_idx"].dataType, False)]
                + [T.StructField(f.name, f.dataType, True) for f in incoming]
                + SYSTEM_FIELDS
            )
            return T.StructType(fields)
        cur = T.StructType.fromJson(man["schema"])
        by_name = {f.name: f for f in cur.fields}
        out = list(cur.fields)
        for f in incoming + [T.StructField("turn_idx", batch.schema["turn_idx"].dataType, False)]:
            if f.name not in by_name:
                # ADD COLUMN (old rows read as null)
                out.insert(len(out) - len(SYSTEM_FIELDS), T.StructField(f.name, f.dataType, True))
                by_name[f.name] = f
                continue
            have, new = by_name[f.name].dataType, f.dataType
            if have == new:
                continue
            ht, nt = have.typeName(), new.typeName()
            if (ht, nt) in _WIDENINGS:
                i = next(i for i, x in enumerate(out) if x.name == f.name)
                out[i] = T.StructField(f.name, new, out[i].nullable)
            elif (nt, ht) in _WIDENINGS:
                pass  # incoming is narrower: cast up at write, no evolution
            else:
                raise SchemaEvolutionError(
                    f"incompatible type change for column {f.name!r}: {ht} -> {nt} "
                    "(only int->long / float->double widening is allowed; "
                    "renames/drops must be explicit)"
                )
        return T.StructType(out)

    # ---------------- field ids (rename/drop evolution, round 5) -------
    # Iceberg resolves columns by STABLE FIELD ID, not name — that is
    # what makes rename a metadata-only commit and keeps a dropped-then-
    # re-added column from resurrecting old data.  Reduced to this
    # manifest model: `field_ids` maps the CURRENT logical data columns
    # to ids, `next_field_id` is a monotonic allocator (never rewinds,
    # even across rollback — like scope_seq), and `schema_field_ids`
    # stamps, per registered physical schema id, which field id each
    # physical column name carried AT WRITE TIME.  Reads resolve
    # logical -> physical per sid through these stamps (_colmap).

    @staticmethod
    def _ensure_field_ids(cur: dict) -> None:
        """Initialize field-id tracking on a pre-feature manifest.
        By-name stamping of the existing physical schemas is exact: no
        rename/drop can predate the tracking that enables it."""
        if cur.get("field_ids") is not None:
            return
        fids: dict[str, int] = {}
        nxt = 1
        for f in (cur.get("schema") or {"fields": []})["fields"]:
            if f["name"] not in _NO_RENAME:
                fids[f["name"]] = nxt
                nxt += 1
        cur["field_ids"] = fids
        cur["next_field_id"] = nxt
        cur["schema_field_ids"] = {
            str(i): {f["name"]: fids[f["name"]]
                     for f in sj["fields"] if f["name"] in fids}
            for i, sj in enumerate(cur.get("schemas", []))
        }

    def _register_schema(self, cur: dict, sj: dict) -> int:
        """Register a physical schema about to be written; returns its
        schema id.  Assigns field ids to any column the logical
        mapping has not seen (ADD evolution, or a re-add after DROP —
        which therefore gets a FRESH id and never reads old data), and
        reuses an existing sid only when BOTH the schema json AND its
        field-id stamp match — a re-added column whose physical schema
        json happens to equal a pre-drop one must not alias onto the
        old sid's stamp."""
        self._ensure_field_ids(cur)
        fids = cur["field_ids"]
        desired: dict[str, int] = {}
        for f in sj["fields"]:
            n = f["name"]
            if n in _NO_RENAME:
                continue
            if n not in fids:
                fids[n] = cur["next_field_id"]
                cur["next_field_id"] += 1
            desired[n] = fids[n]
        schemas = cur.setdefault("schemas", [])
        sfi = cur.setdefault("schema_field_ids", {})
        for i, s in enumerate(schemas):
            if s == sj and sfi.get(str(i)) == desired:
                return i
        schemas.append(sj)
        sid = len(schemas) - 1
        sfi[str(sid)] = desired
        return sid

    def _refuse_constraint_refs(self, man: dict, column: str, what: str) -> None:
        for name, c in (man.get("check_constraints") or {}).items():
            if re.search(rf"\b{re.escape(column)}\b", c["expr"]):
                raise ValueError(
                    f"cannot {what} column {column!r}: CHECK constraint "
                    f"{name!r} references it ({c['expr']!r}) — drop the "
                    "constraint first")

    def rename_column(self, old: str, new: str) -> int:
        """Rename a data column — METADATA-ONLY commit (Iceberg field-id
        rename): no file is rewritten; reads resolve old physical files
        through the stable field id, and CoW rewrites materialize the
        new name bucket-by-bucket as they touch.  As-of reads of
        pre-rename versions keep the old name (each retained manifest
        carries its own schema).  Key/system columns refuse (merge keys
        and guards are positional contracts).  Changefeed tables refuse:
        feed files are immutable under their write-time names, so a
        rename would split the column across the feed history for every
        consumer — the snapshot-diff changelog (changelog_between)
        resolves ids per endpoint and is the CDC surface that composes
        with renames.  NB source-side name matching is unchanged
        (Iceberg writer behavior): a CDC/upsert batch still matching the
        OLD name will ADD it back as a fresh column."""
        with self._commit_lock():
            man = self._load()
            self._check_rename_target(man, old, new, "rename")
            if any(f["name"] == new for f in man["schema"]["fields"]):
                raise ValueError(f"cannot rename {old!r} -> {new!r}: "
                                 f"{new!r} already exists")
            if new in _NO_RENAME:
                raise ValueError(f"cannot rename {old!r} -> {new!r}: "
                                 f"{new!r} is a reserved key/system name")
            if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", new):
                raise ValueError(f"invalid column name {new!r}")
            new_man = dict(man)
            new_man["schema"] = {
                **man["schema"],
                "fields": [{**f, "name": new} if f["name"] == old else f
                           for f in man["schema"]["fields"]],
            }
            fids = dict(new_man["field_ids"])
            fids[new] = fids.pop(old)
            new_man["field_ids"] = fids
            new_man["version"] = man["version"] + 1
            self._finish_commit(new_man, [])
            return new_man["version"]

    def drop_column(self, name: str) -> int:
        """Drop a data column — metadata-only commit.  Old files keep
        the bytes (reclaimed as buckets rewrite / compact), but the
        field id retires with the column: re-adding the same name later
        allocates a FRESH id, so pre-drop values never resurrect —
        they read NULL (the Iceberg drop/re-add contract).  Same
        refusals as rename_column."""
        with self._commit_lock():
            man = self._load()
            self._check_rename_target(man, name, None, "drop")
            new_man = dict(man)
            new_man["schema"] = {
                **man["schema"],
                "fields": [f for f in man["schema"]["fields"]
                           if f["name"] != name],
            }
            fids = dict(new_man["field_ids"])
            del fids[name]
            new_man["field_ids"] = fids
            new_man["version"] = man["version"] + 1
            self._finish_commit(new_man, [])
            return new_man["version"]

    def add_column(self, name: str, dtype: str) -> int:
        """ALTER TABLE ADD COLUMN — metadata-only commit.  Existing
        rows read NULL; the column gets a fresh field id (so if it
        shadows a previously DROPPED name, old bytes never resurrect —
        same contract as the drop/re-add path).  Semantically identical
        to the implicit merge-time ADD evolution, but available without
        having to write data.  `dtype` is a Spark DDL type string
        ('string', 'double', 'array<float>', ...).  Changefeed tables
        accept (ADD composes with the feed: old feed files read the new
        column as NULL, exactly like old data files)."""
        if name in _NO_RENAME:
            raise ValueError(f"cannot add {name!r}: reserved key/system name")
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(f"invalid column name {name!r}")
        field = T.StructType.fromDDL(f"{name} {dtype}")[name]
        fj = {**field.jsonValue(), "nullable": True}
        with self._commit_lock():
            man = self._load()
            if man["schema"] is None:
                raise ValueError(
                    "empty table: the first write defines the schema "
                    "(add_column evolves an existing one)")
            if any(f["name"] == name for f in man["schema"]["fields"]):
                raise ValueError(f"column {name!r} already exists")
            new_man = dict(man)
            self._ensure_field_ids(new_man)
            fields = list(man["schema"]["fields"])
            sys_names = {f.name for f in SYSTEM_FIELDS}
            at = next((i for i, f in enumerate(fields)
                       if f["name"] in sys_names), len(fields))
            fields.insert(at, fj)  # data columns precede system columns
            new_man["schema"] = {**man["schema"], "fields": fields}
            fids = dict(new_man["field_ids"])
            fids[name] = new_man["next_field_id"]
            new_man["next_field_id"] += 1
            new_man["field_ids"] = fids
            new_man["version"] = man["version"] + 1
            self._finish_commit(new_man, [])
            return new_man["version"]

    def _check_rename_target(self, man: dict, col: str, new: str | None,
                             what: str) -> None:
        if man.get("changefeed"):
            raise ValueError(
                f"changefeed tables cannot {what} columns: feed files are "
                "immutable under their write-time names, so every consumer "
                "would see the column split across the feed history — use "
                "changelog_between (snapshot-diff CDC resolves field ids "
                "per endpoint) or recreate consumers from a bootstrap")
        if man.get("schema") is None:
            raise ValueError(f"cannot {what} on an empty table (no schema yet)")
        if col in _NO_RENAME:
            raise ValueError(f"cannot {what} key/system column {col!r}")
        if not any(f["name"] == col for f in man["schema"]["fields"]):
            raise ValueError(f"no such column {col!r}")
        self._refuse_constraint_refs(man, col, what)
        self._ensure_field_ids(man)

    # ---------------- read ----------------
    def _conform(self, df: DataFrame, schema: T.StructType,
                 colmap: dict | None = None) -> DataFrame:
        """Project a physical frame onto the logical schema.  `colmap`
        (logical name -> physical name | None) is the FIELD-ID
        resolution for one physical schema id — a renamed column reads
        its old physical name, a dropped-then-re-added column reads
        NULL from pre-drop files (Iceberg field-id semantics).  Absent
        colmap falls back to by-name (pre-rename tables and legacy
        footer-read files, where names never moved)."""
        cols = []
        for f in schema.fields:
            src = colmap.get(f.name, f.name) if colmap else f.name
            if src is not None and src in df.columns:
                cols.append(F.col(src).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return df.select(*cols)

    @staticmethod
    def _colmap(schema: T.StructType, req_fids: dict | None,
                sfi: dict | None, sid: int | None) -> dict | None:
        """logical name -> physical column name for physical schema id
        `sid`, resolved through stable field ids: `req_fids` names the
        REQUESTED logical columns (the manifest whose schema we conform
        to), `sfi` records each sid's physical-name -> field-id stamp
        from write time.  None = resolve by name (tables/files that
        predate field-id tracking — exact, since no rename can predate
        its own feature).  Key and system columns have no field ids and
        always resolve by their canonical names."""
        if not req_fids or sid is None:
            return None
        m = (sfi or {}).get(str(sid))
        if m is None:
            return None
        inv = {fid: n for n, fid in m.items()}
        out = {}
        for f in schema.fields:
            if f.name in _NO_RENAME:
                out[f.name] = f.name  # keys/system: canonical names
            elif f.name in req_fids:
                out[f.name] = inv.get(req_fids[f.name])  # None -> NULL fill
            else:
                # data column with no id yet: an ADD (or a re-add after
                # DROP) still uncommitted at read time — never resolve
                # it by name, or a dropped column's old bytes would
                # leak back (and possibly under a new type)
                out[f.name] = None
        return out

    @staticmethod
    def _entries(man: dict, bucket_ids=None) -> list[tuple[str, int | None]]:
        """(rel path, schema id) pairs for the given buckets (all when
        None).  Legacy v1 manifests stored bare path strings — those
        surface with schema id None (footer-read fallback)."""
        if bucket_ids is None:
            lists = man["buckets"].values()
        else:
            lists = (man["buckets"].get(str(b), []) for b in bucket_ids)
        out: list[tuple[str, int | None]] = []
        for fs in lists:
            for e in fs:
                out.append((e, None) if isinstance(e, str) else (e[0], e[1]))
        return out

    def _read_files(self, entries: list[tuple[str, int | None]], man: dict,
                    schema: T.StructType, fids: dict | None = None) -> DataFrame:
        if not entries:
            return self.spark.createDataFrame([], schema)
        if fids is None:
            fids = man.get("field_ids")
        # Bucket files may carry different physical schemas after ADD/widen
        # evolution (untouched buckets are never rewritten).  Group by the
        # schema id stamped into the manifest at WRITE time — zero metadata
        # I/O (the pre-r3 version did a driver-side pq.read_schema per file
        # per merge: an O(files) stall at 10^10 scale).  Each group is read
        # with its recorded physical schema (no footer inference), conformed
        # to the logical schema by cast, then unioned.  Legacy entries with
        # no schema id pay one footer read each.
        schemas = man.get("schemas", [])
        groups: dict[object, list[str]] = defaultdict(list)
        for rel, sid in entries:
            p = os.path.join(self.root, rel)
            key = sid if sid is not None else ("footer", str(pq.read_schema(p)))
            groups[key].append(p)
        parts = []
        for key, ps in groups.items():
            rd = self.spark.read
            cm = None
            if isinstance(key, int):
                rd = rd.schema(T.StructType.fromJson(schemas[key]))
                cm = self._colmap(schema, fids, man.get("schema_field_ids"), key)
            parts.append(self._conform(rd.parquet(*ps), schema, cm))
        return reduce(DataFrame.unionAll, parts)

    # ---------------- merge-on-read (round 5) ----------------
    @staticmethod
    def _delta_entries(man: dict, bucket_ids=None) -> list[tuple[str, int, int]]:
        """(rel path, schema id, commit version) triples for the given
        buckets' outstanding MoR delta files (all buckets when None)."""
        d = man.get("deltas", {})
        if bucket_ids is None:
            lists = d.values()
        else:
            lists = (d.get(str(b), []) for b in bucket_ids)
        return [(e[0], e[1], e[2]) for fs in lists for e in fs]

    def _read_resolved(self, man: dict, schema: T.StructType,
                       bucket_ids=None, fids: dict | None = None) -> DataFrame:
        """Base ∪ outstanding deltas with read-time LWW resolution —
        the merge-on-read read path.  When the buckets have no deltas
        this IS the plain base read (zero extra plan nodes).

        Winner per key = max_by over the ordering tuple
        (_op_ts, _lsn, -commit_version): strictly newer (ts, lsn) wins
        exactly like the CoW merge guard, and on a full (ts, lsn) tie
        the EARLIEST commit wins (base carries version 0), matching
        CoW's "target wins ties" strict guard — so a replayed or
        duplicated append can never flip an already-applied winner.
        Within one commit keys are unique by construction (the collapse
        emits <= 1 row per key), so the tuple is a total order.

        Scale — two plans, picked by outstanding delta BYTES (driver-
        side stat of the manifest's delta files, no Spark job):

        * broadcast (deltas ≤ DIPPER_MOR_BROADCAST_BYTES, default
          32 MB, AND base ≥ DIPPER_MOR_BROADCAST_MIN_BASE, default
          256 MB): LWW winners are first resolved AMONG the deltas (a
          groupBy over only the small delta frame), then applied to
          the base scan MAP-ONLY — one full-width base scan
          left-joining the broadcast winners (strictly-newer winner
          replaces in place), plus one key-column-pruned probe scan
          for delta keys absent from base.  The base is NEVER
          shuffled — the same shape as Iceberg readers applying
          equality-delete files broadcast against the data scan.
        * shuffle fallback (large delta debt, or a base small enough
          that shuffling it is cheaper than the broadcast plan's
          fixed overheads — measured: at a 90k-row base the shuffle
          plan reads 5.7s vs broadcast 8.5s, while at scale the
          shuffle writes+reads the ENTIRE base vs one extra key-only
          scan): one hash shuffle of base+delta rows of the probed
          buckets on the merge keys — which is exactly the compact()
          plan, the signal that compaction is overdue.

        File sizes come from driver-side stat of the manifest's file
        lists (bounded by files-per-table here; a production catalog
        records sizes in the manifest like Iceberg, making this
        metadata-only)."""
        if fids is None:
            fids = man.get("field_ids")
        base = self._read_files(self._entries(man, bucket_ids), man, schema, fids)
        dents = self._delta_entries(man, bucket_ids)
        if not dents:
            return base
        groups: dict[tuple[int, int], list[str]] = defaultdict(list)
        delta_bytes = 0
        for rel, sid, seq in dents:
            p = os.path.join(self.root, rel)
            groups[(sid, seq)].append(p)
            try:
                delta_bytes += os.path.getsize(p)
            except OSError:
                delta_bytes += 1 << 60  # missing stat: force the safe fallback
        schemas = man.get("schemas", [])
        parts = []
        for (sid, seq), ps in groups.items():
            rd = self.spark.read.schema(T.StructType.fromJson(schemas[sid]))
            cm = self._colmap(schema, fids, man.get("schema_field_ids"), sid)
            parts.append(self._conform(rd.parquet(*ps), schema, cm)
                         .withColumn("_seq", F.lit(seq).cast("long")))
        delta = reduce(DataFrame.unionAll, parts)
        others = [f.name for f in schema.fields if f.name not in KEY_COLUMNS]
        row = F.struct(*[F.col(c).alias(c) for c in others])
        ordk = F.struct(F.col("_op_ts"), F.col("_lsn"), (-F.col("_seq")).alias("_negseq"))

        limit = int(os.environ.get("DIPPER_MOR_BROADCAST_BYTES", str(32 << 20)))
        min_base = int(os.environ.get("DIPPER_MOR_BROADCAST_MIN_BASE", str(256 << 20)))
        base_bytes = 0
        for rel, _sid in self._entries(man, bucket_ids):
            try:
                base_bytes += os.path.getsize(os.path.join(self.root, rel))
            except OSError:
                base_bytes += 1 << 60  # missing stat: err toward broadcast
        if delta_bytes > limit or base_bytes < min_base:
            allr = base.withColumn("_seq", F.lit(0).cast("long")).unionAll(delta)
            return (allr.groupBy(*KEY_COLUMNS)
                    .agg(F.max_by(row, ordk).alias("_r"))
                    .select(*KEY_COLUMNS, *[F.col(f"_r.{c}").alias(c) for c in others]))

        # winners among the deltas only (small), ties to earliest commit
        wd = (delta.groupBy(*KEY_COLUMNS)
              .agg(F.max_by(row, ordk).alias("_r"))
              .select(*KEY_COLUMNS, *[F.col(f"_r.{c}").alias(c) for c in others]))
        # part 1 — ONE full-width base scan, map-only: every base row
        # left-joins the broadcast winners; a winner strictly newer in
        # (ts, lsn) replaces the row in place (ties keep base = CoW
        # strict guard)
        t, s = base.alias("t"), wd.alias("s")
        j = t.join(F.broadcast(s),
                   on=[F.col(f"s.{k}") == F.col(f"t.{k}") for k in KEY_COLUMNS],
                   how="left_outer")
        src_wins = F.col("s.conv_id").isNotNull() & (
            F.struct(F.col("s._op_ts"), F.col("s._lsn"))
            > F.struct(F.col("t._op_ts"), F.col("t._lsn")))
        pick = lambda c: (F.when(src_wins, F.col(f"s.{c}"))  # noqa: E731
                          .otherwise(F.col(f"t.{c}")).alias(c))
        resolved = j.select(*[F.col(f"t.{k}").alias(k) for k in KEY_COLUMNS],
                            *[pick(c) for c in others])
        # part 2 — delta keys ABSENT from base (fresh inserts): probe
        # base with a key-pruned map-only broadcast semi scan (output
        # ≤ |winners|, so it broadcasts back), then anti the winners
        hit_keys = base.select(*KEY_COLUMNS).join(
            F.broadcast(wd.select(*KEY_COLUMNS)), on=list(KEY_COLUMNS), how="left_semi")
        news = wd.join(F.broadcast(hit_keys), on=list(KEY_COLUMNS), how="left_anti")
        cols = [f.name for f in schema.fields]
        return resolved.select(*cols).unionAll(news.select(*cols))

    def read(self, include_system: bool = True,
             as_of: int | str | None = None) -> DataFrame:
        """Full snapshot, system columns included (tombstones too).
        `as_of` reads a retained table version (time_travel tables) —
        a version int or a tag name (tag_snapshot).  Outstanding MoR
        deltas are resolved (LWW) transparently."""
        man = (self._load() if as_of is None
               else self._load_as_of(self._resolve_as_of(as_of)))
        schema = T.StructType.fromJson(man["schema"]) if man["schema"] else T.StructType(
            [T.StructField("conv_id", T.StringType(), False),
             T.StructField("turn_idx", T.IntegerType(), False)] + SYSTEM_FIELDS
        )
        df = self._read_resolved(man, schema)
        return df if include_system else df.drop(*[f.name for f in SYSTEM_FIELDS])

    # ---------------- time travel ----------------
    def _versions_dir(self) -> str:
        return os.path.join(self.root, "_versions")

    def versions(self) -> list[int]:
        """Retained as-of-readable versions (ascending), current last.
        Non-time-travel tables expose only the current version."""
        vd = self._versions_dir()
        out = set()
        if os.path.isdir(vd):
            for fn in os.listdir(vd):
                if fn.startswith("v") and fn.endswith(".json"):
                    out.add(int(fn[1:-5]))
        out.add(self._load()["version"])
        return sorted(out)

    # ---------------- snapshot tags (round 5) ----------------
    # Named pins on retained versions (Iceberg tag shape): a tagged
    # version survives expire_snapshots until the tag is dropped, and
    # every as_of read surface accepts the tag name in place of the
    # version int.  Metadata-only — a dict in the manifest.

    def tag_snapshot(self, name: str, version: int | None = None) -> int:
        """Pin `name` to a retained version (default: current).
        Requires time_travel=True — without retained manifests a tag
        would dangle as soon as the next commit lands."""
        with self._commit_lock():
            man = self._load()
            if not man.get("time_travel"):
                raise ValueError("tags need a time_travel=True table "
                                 "(nothing is retained to pin otherwise)")
            v = man["version"] if version is None else int(version)
            if v != man["version"]:
                self._load_as_of(v)  # raises if not retained
            tags = man.setdefault("tags", {})
            if name in tags:
                raise ValueError(f"tag {name!r} already exists (-> v{tags[name]})")
            tags[name] = v
            man["version"] += 1
            self._write_manifest(man)
            return v

    def drop_tag(self, name: str) -> None:
        with self._commit_lock():
            man = self._load()
            if man.get("tags", {}).pop(name, None) is None:
                raise ValueError(f"no such tag {name!r}")
            man["version"] += 1
            self._write_manifest(man)

    def move_tag(self, name: str, version: int | None = None) -> int:
        """Create-or-move a tag in ONE locked commit (no expire can
        slip between a drop and a re-add).  The changelog-consumer
        retention pin: IncrementalView/MirrorTable with
        source='changelog' re-point their tag to the version they just
        synced, so expire_snapshots never reclaims the `from` side of
        their next diff — the snapshot-retention analog of changefeed
        consumer groups.

        Deliberately does NOT bump the table version: a tag is reader
        bookkeeping, not data state, and a version-bumping pin would
        ratchet — every consumer ack would create a new version for
        the next ack to diff over, so consumers could never converge
        to a no-op.  (tag_snapshot/drop_tag keep their bump: they are
        explicit user commits, and an extra retained version there is
        harmless.)  Concurrent optimistic writers are unaffected — the
        commit CAS validates schema/layout/buckets, none of which a
        tag touches, and the write happens under the same lock."""
        with self._commit_lock():
            man = self._load()
            if not man.get("time_travel"):
                raise ValueError("tags need a time_travel=True table "
                                 "(nothing is retained to pin otherwise)")
            v = man["version"] if version is None else int(version)
            if v != man["version"]:
                self._load_as_of(v)  # raises if not retained
            man.setdefault("tags", {})[name] = v
            self._write_manifest(man)
            return v

    def tags(self) -> dict:
        """Registered tags -> pinned version int."""
        return dict(self._load().get("tags", {}))

    # ---------------- metadata inspection tables (round 5) ----------
    # Iceberg metadata-table shape (SELECT * FROM t.files / t.history /
    # t.snapshots / t.refs): the manifest rendered as queryable
    # DataFrames, so operators can join/filter table internals with
    # plain Spark SQL instead of reading JSON.  Driver-side O(manifest)
    # — the same cost class as Iceberg's manifest-backed metadata
    # tables; "files" additionally stats each live file for its size
    # (O(files) driver-side stat calls — an inspection surface, never
    # on a query hot path).

    def inspect(self, what: str) -> DataFrame:
        """Metadata tables: 'files' (live base+delta files with bucket,
        schema id, byte size and pruning stats), 'history' (the commit
        ledger — NB trimmed to LEDGER_CAP entries), 'snapshots'
        (retained versions with layout/file counts and rollback
        breadcrumbs), 'refs' (tags + branches, Iceberg refs shape),
        'consumers' (changefeed consumer-group watermarks),
        'constraints' (CHECK constraints)."""
        man = self._load()
        if what == "files":
            stats = man.get("file_stats", {})
            rows = []
            def _row(rel, sid, bucket, kind, seq):
                p = os.path.join(self.root, rel)
                try:
                    nbytes = os.path.getsize(p)
                except OSError:
                    nbytes = None
                st = stats.get(rel) or {}
                conv = st.get("conv") or [None, None]
                turn = st.get("turn") or [None, None]
                nrows = st.get("rows")  # absent on pre-feature stats
                lv = st.get("live_rows")
                bloom = st.get("bloom")
                return (rel, kind, int(bucket), int(sid) if sid is not None else None,
                        seq, nbytes,
                        int(nrows) if nrows is not None else None,
                        int(lv) if lv is not None else None,
                        bool(bloom.get("m")) if bloom is not None else None,
                        conv[0], conv[1],
                        int(turn[0]) if turn[0] is not None else None,
                        int(turn[1]) if turn[1] is not None else None)
            for b, ents in man.get("buckets", {}).items():
                for rel, sid in ents:
                    rows.append(_row(rel, sid, b, "base", None))
            for b, ents in man.get("deltas", {}).items():
                for rel, sid, seq in ents:
                    rows.append(_row(rel, sid, b, "delta", int(seq)))
            return self.spark.createDataFrame(
                rows, "path string, kind string, bucket int, schema_id int, "
                      "commit_version int, bytes long, rows long, "
                      "live_rows long, has_bloom boolean, conv_min string, "
                      "conv_max string, turn_min long, turn_max long")
        if what == "history":
            rows = [(int(e["batch_id"]), e.get("scope", "default"),
                     int(e["max_lsn"]) if e.get("max_lsn") is not None else None,
                     int(e.get("rows_applied", 0)), e.get("committed_at"))
                    for e in man.get("ledger", [])]
            return self.spark.createDataFrame(
                rows, "batch_id long, scope string, max_lsn long, "
                      "rows_applied long, committed_at string")
        if what == "snapshots":
            cur = man["version"]
            rows = []
            for v in self.versions():
                try:
                    m = self._load_as_of(v)
                except FileNotFoundError:
                    continue
                n_files = sum(len(e) for e in m.get("buckets", {}).values())
                n_deltas = sum(len(e) for e in m.get("deltas", {}).values())
                rows.append((int(v), v == cur, int(m.get("n_buckets", 0)),
                             self._fmt(m), self._mode(m), n_files, n_deltas,
                             len(m.get("schemas", [])),
                             m.get("rolled_back_to")))
            return self.spark.createDataFrame(
                rows, "version long, is_current boolean, n_buckets int, "
                      "format_version int, write_mode string, file_count long, "
                      "delta_file_count long, n_schemas int, rolled_back_to long")
        if what == "refs":
            rows = [(name, "tag", int(v)) for name, v in
                    sorted(man.get("tags", {}).items())]
            rows += [(name, "branch", int(base)) for name, base in
                     sorted(self.branches().items())]
            return self.spark.createDataFrame(
                rows, "name string, type string, version long")
        if what == "consumers":
            rows = []
            for name, ent in sorted(man.get("changefeed_consumers", {}).items()):
                for scope, batch in sorted((ent or {}).items()):
                    rows.append((name, scope, int(batch)))
                if not ent:
                    rows.append((name, None, None))
            return self.spark.createDataFrame(
                rows, "consumer string, scope string, acked_through_batch long")
        if what == "constraints":
            rows = [(name, c["expr"], c.get("mode", "enforce"))
                    for name, c in sorted(man.get("check_constraints", {}).items())]
            return self.spark.createDataFrame(
                rows, "name string, expr string, mode string")
        if what == "schema":
            fids = man.get("field_ids") or {}
            rows = []
            for f in (man.get("schema") or {"fields": []})["fields"]:
                kind = ("key" if f["name"] in KEY_COLUMNS
                        else "system" if f["name"] in _NO_RENAME else "data")
                rows.append((f["name"],
                             f["type"] if isinstance(f["type"], str) else "struct",
                             bool(f.get("nullable", True)), kind,
                             fids.get(f["name"])))
            return self.spark.createDataFrame(
                rows, "name string, type string, nullable boolean, "
                      "kind string, field_id int")
        raise ValueError(f"unknown metadata table {what!r} (files, history, "
                         "snapshots, refs, consumers, constraints, schema)")

    def advise(self) -> DataFrame:
        """Maintenance recommendations (plans/advisor.py): delta debt
        vs the broadcast-resolve budget, fragmented buckets, snapshot/
        changefeed retention pressure, bucket-layout sizing, crash
        debris — each row names the CLI/API verb that resolves it.
        Driver-side metadata + stat/listdir only; empty == healthy."""
        from .advisor import advise as _advise

        return _advise(self)

    def maintain(self, *, dry_run: bool = False, allow_rescale: bool = False,
                 vacuum_ttl: int = 3600) -> list[dict]:
        """Run the advisor's recommendations (plans/advisor.py
        maintain): minor compaction, retention expiry, vacuum, analyze
        — re-advising between passes so resolved items can surface the
        next one.  Policy decisions (rescale, an unconsumed-changefeed
        retention floor) are skipped with a reason unless explicitly
        opted in.  Returns the execution log."""
        from .advisor import maintain as _maintain

        return _maintain(self, dry_run=dry_run, allow_rescale=allow_rescale,
                         vacuum_ttl=vacuum_ttl)

    def fsck(self, data: bool = False,
             buckets: list[int] | None = None) -> DataFrame:
        """Integrity checker (plans/fsck.py): manifest invariants
        driver-side, plus (data=True) one key-columns scan proving
        physical bucket placement and live-key uniqueness —
        `buckets=[...]` samples the data tier for very large tables.
        Returns finding rows; empty == healthy.  Never mutates."""
        from .fsck import fsck_df

        return fsck_df(self, data=data, buckets=buckets)

    # ---------------- branches / write-audit-publish (round 5) ----------
    # Iceberg branch semantics reduced to this manifest model: a branch
    # is a full manifest copy under _branches/<name>.json recording the
    # main version it forked from.  A LocalCowTable(root, branch=name)
    # handle reads and writes THAT manifest — merges, upserts, deletes,
    # constraints, compaction all work unchanged; data files land in
    # the shared data/ dir under uuid names, so branch and main writers
    # never collide on files, and branch commits never GC (a superseded
    # file may still be referenced by main).  fast_forward() publishes
    # the branch onto main in one locked commit IF main has not moved
    # since the fork (Iceberg's fast-forward condition) — the WAP flow:
    # write to the branch, audit its snapshot, publish or drop it.
    # Changefeed tables refuse branches: feed emission is a side effect
    # under _changes/ that consumers would see pre-publish.  The
    # snapshot-diff changelog composes fine (it diffs published
    # versions).

    def _branches_dir(self) -> str:
        return os.path.join(self.root, "_branches")

    def _require_main(self, what: str) -> None:
        if self.branch:
            raise ValueError(f"{what} must run on the main handle, not "
                             f"branch {self.branch!r}")

    def create_branch(self, name: str,
                      from_version: int | str | None = None) -> "LocalCowTable":
        """Fork a branch from the current version (or a retained
        `from_version` on time_travel tables) and return a handle onto
        it.  One locked commit; refuses name collisions."""
        self._require_main("create_branch")
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"bad branch name {name!r}")
        with self._commit_lock():
            man = self._load()
            if man.get("changefeed"):
                raise ValueError(
                    "changefeed tables cannot branch: branch merges would "
                    "emit feed batches under _changes/ that consumers see "
                    "BEFORE publish — use the snapshot-diff changelog for "
                    "CDC over branch/publish workflows")
            if not man.get("time_travel"):
                raise ValueError(
                    "branches need a time_travel=True table: non-TT main "
                    "commits GC superseded files after one commit, which "
                    "would pull shared files out from under a live branch "
                    "(TT tables defer all GC to the branch-aware "
                    "expire_snapshots)")
            src = (man if from_version is None
                   else self._load_as_of(self._resolve_as_of(from_version)))
            p = os.path.join(self._branches_dir(), f"{name}.json")
            if os.path.exists(p):
                raise ValueError(f"branch {name!r} already exists")
            br = dict(src)
            br["branch_name"] = name
            br["branch_base"] = man["version"]  # publish CAS anchor
            br.pop("pending_gc", None)  # main's deferred GC is not ours
            os.makedirs(self._branches_dir(), exist_ok=True)
            tmp = p + f".tmp.{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(br, f, indent=1)
            os.replace(tmp, p)
        return LocalCowTable(self.spark, self.root, branch=name)

    def branches(self) -> dict[str, int]:
        """branch name -> main version it forked from."""
        d = self._branches_dir()
        out = {}
        if os.path.isdir(d):
            for fn in sorted(os.listdir(d)):
                if fn.endswith(".json") and not fn.startswith("."):
                    with open(os.path.join(d, fn)) as f:
                        out[fn[:-5]] = int(json.load(f).get("branch_base", -1))
        return out

    def drop_branch(self, name: str) -> None:
        """Abandon a branch (its unpublished data files are reclaimed
        by the next expire_snapshots refcount)."""
        self._require_main("drop_branch")
        p = os.path.join(self._branches_dir(), f"{name}.json")
        if not os.path.exists(p):
            raise ValueError(f"no such branch {name!r}")
        os.remove(p)

    def fast_forward(self, name: str) -> int:
        """Publish branch `name` onto main in one locked commit —
        succeeds only when main is still AT the branch's fork version
        (Iceberg's fast-forward condition); a diverged main raises
        CommitConflict, and the caller re-forks and re-applies (or
        rebases by re-deriving its writes).  The branch file is
        removed on publish.  Returns the published main version."""
        self._require_main("fast_forward")
        p = os.path.join(self._branches_dir(), f"{name}.json")
        with self._commit_lock():
            man = self._load()
            if not os.path.exists(p):
                raise ValueError(f"no such branch {name!r}")
            with open(p) as f:
                br = json.load(f)
            if man["version"] != br.get("branch_base"):
                raise CommitConflict(
                    f"main moved v{br.get('branch_base')} -> "
                    f"v{man['version']} since branch {name!r} forked — "
                    "fast-forward impossible; re-fork and re-apply")
            new = dict(br)
            new.pop("branch_name", None)
            new.pop("branch_base", None)
            if new["version"] == man["version"]:  # no branch commits
                os.remove(p)
                return man["version"]
            new["pending_gc"] = man.get("pending_gc", [])
            # tags can move WITHOUT a version bump (move_tag — the
            # changelog-consumer retention pin), so the version CAS
            # above does not protect them: publishing the branch's
            # fork-time tags verbatim would silently revert pins moved
            # on main after the fork, letting a later expire reclaim a
            # version a consumer still diffs from.  Main's current tag
            # state wins; tags created on the branch itself publish
            # unless main holds the same name.
            new["tags"] = {**new.get("tags", {}), **man.get("tags", {})}
            # _write_manifest targets MAIN on this handle; time_travel
            # retention applies to the published version as usual
            self._write_manifest(new)
            os.remove(p)
            return new["version"]

    def rollback(self, to_version: int | str) -> int:
        """Reset the table's DATA state to a retained version — as a
        NEW commit (Iceberg rollback_to_snapshot shape: history only
        moves forward).  Nothing is rewritten: the new manifest simply
        references the old version's files, so this is a metadata-only
        locked commit, O(manifest) at any table size.

        Restored (data state): schema + schema history, bucket/delta
        file lists and their stats, n_buckets/format_version layout,
        and the commit LEDGER — the ledger describes which batches the
        data reflects, so a post-rollback re-send of an un-done batch
        re-applies (the undo-and-reingest story), while batches inside
        the restored state still dedupe.  Kept from current
        (administrative state, Iceberg table-property analog): tags,
        changefeed consumers, CHECK constraints, write_mode, and the
        per-scope batch-id sequence — scope_seq never rewinds, so API
        writers after a rollback can never reuse a batch id.

        Requires time_travel=True (the target must be retained; its
        files are then guaranteed on disk by the expire refcount, and
        the rollback commit itself re-pins them).  Changefeed tables
        refuse: their replay invariant is "the feed reproduces the
        snapshot", and a rollback would silently break every consumer
        past the rolled-back batches — undo flows for CDC tables are
        the snapshot-diff changelog's job (changelog_between diffs any
        two retained versions, including across a rollback).  Main
        handle only; branch forks keep their own manifests and their
        fast-forward CAS sees the rollback as main movement."""
        self._require_main("rollback")
        with self._commit_lock():
            man = self._load()
            if man.get("changefeed"):
                raise ValueError(
                    "changefeed tables cannot rollback: consumers past the "
                    "rolled-back batches would silently diverge from the "
                    "snapshot (feed replay no longer reproduces it) — use "
                    "changelog_between for undo flows, or rebuild consumers "
                    "via bootstrap()")
            if not man.get("time_travel"):
                raise ValueError("rollback needs a time_travel=True table "
                                 "(the target version must be retained)")
            v = self._resolve_as_of(to_version)
            if v == man["version"]:
                return v  # already there — no empty commit
            old = self._load_as_of(v)  # raises if not retained
            new = dict(man)
            for k in ("schema", "schemas", "buckets", "deltas", "ledger",
                      "n_buckets", "format_version", "file_stats",
                      "field_ids", "schema_field_ids"):
                if k in old:
                    new[k] = old[k]
                else:
                    new.pop(k, None)
            # the field-id allocator NEVER rewinds (scope_seq rule): a
            # column re-added after the rollback must not reuse an id
            # from the undone timeline, or retained post-rollback
            # manifests would read its old values
            new["next_field_id"] = max(int(man.get("next_field_id", 1)),
                                       int(old.get("next_field_id", 1)))
            new["version"] = man["version"] + 1
            new["rolled_back_from"] = man["version"]  # audit breadcrumb
            new["rolled_back_to"] = v
            self._finish_commit(new, [])
            return new["version"]

    # ---------------- clone (round 5) ----------------
    def clone(self, dest_root: str, deep: bool = False,
              as_of: int | str | None = None) -> "LocalCowTable":
        """Clone the table's CURRENT state into a new independent root —
        the Delta `CLONE` / Iceberg snapshot-export shape, for forking a
        dev/test copy or migrating a table without re-replaying its log.

        `as_of` (version int or snapshot tag, time-travel tables only —
        Delta's `CLONE ... VERSION AS OF`) forks a RETAINED version's
        full manifest state instead: that version's files, schema
        history, ledger and batch sequence.  Retention guarantees the
        files still exist (expire keeps every file any retained
        manifest references), and the commit lock holds a concurrent
        expire off for the duration of the link pass.

        Shallow (default, zero-copy): live data files are HARDLINKED
        into the clone's data/ dir — no bytes move, and copy-on-write
        falls out of the engine's own invariants: data files are
        immutable and uuid-named, each side's later commits write NEW
        files under its own root, and either side's GC (commit-time,
        compact, expire, vacuum) only unlinks its own directory entry —
        the shared inode survives until BOTH sides drop it, so neither
        side can break the other, ever.  `deep=True` copies bytes
        instead (no shared inodes; also the automatic fallback when the
        destination is on a different filesystem, where hardlinks are
        impossible).

        Carried: current data state (base + MoR delta files), schema
        history + field ids, bucket layout + per-file pruning stats,
        write_mode, CHECK constraints, the changefeed/time_travel
        flags, and the commit ledger + per-scope batch-id sequence —
        so a re-delivered batch is still skipped in the clone and new
        feed batch ids never collide with pre-clone history.

        NOT carried (the clone is a NEW table at the source's current
        state, not a shared-history sibling): retained older versions
        (as_of below the clone point raises "not retained"), tags and
        branches, consumer groups, quarantined rows, and changefeed
        HISTORY — _changes/ is not copied; instead every scope's
        retention floor is set to its next batch id, so a consumer
        asking for pre-clone batches gets the typed
        ChangefeedExpiredError (-> bootstrap from snapshot()), never a
        silently truncated feed.

        Runs under the SOURCE's commit lock (the link pass is metadata-
        only — O(files) inode ops, no data read — so the critical
        section stays short even for large tables); this blocks a
        concurrent commit's GC from removing a live file mid-clone.
        Refuses branch handles (fast_forward first), a non-empty or
        nested destination, and cross-filesystem shallow clones fall
        back to copies per-file."""
        self._require_main("clone")
        dest_root = os.path.abspath(dest_root)
        src_root = os.path.abspath(self.root)
        if dest_root == src_root:
            raise ValueError("clone destination is the source itself")
        if (dest_root.startswith(src_root + os.sep)
                or src_root.startswith(dest_root + os.sep)):
            raise ValueError("clone destination must not nest inside the "
                             "source root (or vice versa)")
        if os.path.exists(dest_root) and os.listdir(dest_root):
            raise ValueError(f"clone destination {dest_root} exists and is "
                             "not empty")
        os.makedirs(os.path.join(dest_root, "data"), exist_ok=True)
        with self._commit_lock():
            man = (self._load() if as_of is None
                   else self._load_as_of(self._resolve_as_of(as_of)))
            rels = [rel for rel, _sid in self._entries(man)]
            rels += [rel for rel, _sid, _seq in self._delta_entries(man)]
            for rel in rels:
                src = os.path.join(self.root, rel)
                dst = os.path.join(dest_root, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                if deep:
                    shutil.copy2(src, dst)
                else:
                    try:
                        os.link(src, dst)  # zero-copy shared immutable inode
                    except OSError:  # cross-device / FS without hardlinks
                        shutil.copy2(src, dst)
            new = {k: v for k, v in man.items()
                   if k not in ("tags", "changefeed_consumers", "pending_gc",
                                "changefeed_floor", "branch_name",
                                "fork_version")}
            if man.get("changefeed"):
                # floor = next batch id per scope: API scopes from the
                # persisted sequence, engine scopes from the ledger tail
                # (older-than-ledger batches are below the floor anyway)
                nxt = {s: int(v) for s, v in man.get("scope_seq", {}).items()}
                for e in man.get("ledger", []):
                    s = e.get("scope", "default")
                    nxt[s] = max(nxt.get(s, 0), int(e["batch_id"]) + 1)
                floors = {self._scope_tag(s): n for s, n in nxt.items() if n > 0}
                if floors:
                    new["changefeed_floor"] = floors
            new["cloned_from"] = {"root": src_root, "version": man["version"],
                                  "deep": bool(deep)}
        out = LocalCowTable(self.spark, dest_root)
        with out._commit_lock():
            out._write_manifest(new)
        return out

    def _resolve_as_of(self, as_of: int | str) -> int:
        if isinstance(as_of, str):
            tags = self._load().get("tags", {})
            if as_of not in tags:
                raise ValueError(f"no such tag {as_of!r} (tags: {sorted(tags)})")
            return int(tags[as_of])
        return int(as_of)

    def _load_as_of(self, version: int) -> dict:
        man = self._load()
        if version == man["version"]:
            return man
        p = os.path.join(self._versions_dir(), f"v{version:06d}.json")
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"table version {version} is not retained (available: "
                f"{self.versions()}) — create the table with "
                "time_travel=True and don't expire the version"
            )
        with open(p) as f:
            return json.load(f)

    def expire_snapshots(self, keep_last: int = 1,
                         changefeed_keep_batches: int | None = None,
                         older_than_s: float | None = None) -> dict:
        """Reclaim time-travel space: keep the newest `keep_last`
        retained versions (the CURRENT version is always kept), drop
        older version manifests, and delete data files referenced by
        NO retained manifest.  Mirrors Iceberg expire_snapshots.
        `changefeed_keep_batches` additionally applies changefeed
        retention (expire_changefeed) in the same maintenance pass.

        `older_than_s` is Iceberg's age policy composed with the count
        policy: a version is dropped only when it is BOTH beyond
        `keep_last` AND older than `older_than_s` seconds (by its
        manifest's `committed_at`; legacy retained manifests without
        one fall back to the version file's mtime) — i.e. age can only
        RETAIN more, exactly like `expire_snapshots(older_than =>
        ..., retain_last => N)`.

        Metadata-only (reference counting over manifests) — no data
        read; at 100 TB this is a driver-side set difference over file
        lists, then object deletes.

        Runs under the commit lock: data files enter data/ only inside
        a locked commit, so under the lock every file is either
        referenced by a retained manifest or provably garbage (a
        superseded version's file, or a crashed commit's orphan) —
        expire can never race a concurrent writer into deleting a
        file that is about to be committed.

        Branch-aware: files referenced by ANY live branch manifest are
        kept — this is also where abandoned/published branches' private
        files are reclaimed (branch commits themselves never GC)."""
        self._require_main("expire_snapshots")
        with self._commit_lock():
            man = self._load()
            vd = self._versions_dir()
            all_vs = self.versions()
            keep = set(all_vs[-max(1, keep_last):]) | {man["version"]}
            if older_than_s is not None:
                cutoff = time.time() - older_than_s
                for v in all_vs:
                    p = os.path.join(vd, f"v{v:06d}.json")
                    ts = None
                    try:
                        with open(p) as f:
                            iso = json.load(f).get("committed_at")
                        if iso:
                            # ADVICE r5: timegm is timezone/DST-free;
                            # mktime applied local DST (tm_isdst=-1) and
                            # could age versions by an hour, expiring
                            # them earlier than the policy allows.
                            ts = calendar.timegm(time.strptime(
                                iso, "%Y-%m-%dT%H:%M:%SZ"))
                    except (OSError, ValueError):
                        pass
                    if ts is None:
                        try:
                            ts = os.path.getmtime(p)
                        except OSError:
                            continue
                    if ts > cutoff:  # still young: age policy retains it
                        keep.add(v)
            # tagged versions are pinned until their tag is dropped
            keep |= {int(v) for v in man.get("tags", {}).values()}
            live: set = set()
            for v in keep:
                try:
                    m = self._load_as_of(v)
                except FileNotFoundError:  # current version of a non-TT table
                    m = man
                for rel, _sid in self._entries(m):
                    live.add(rel)
                for rel, _sid, _seq in self._delta_entries(m):
                    live.add(rel)
            bd = self._branches_dir()
            if os.path.isdir(bd):
                for fn in os.listdir(bd):
                    if not fn.endswith(".json") or fn.startswith("."):
                        continue
                    with open(os.path.join(bd, fn)) as f:
                        bm = json.load(f)
                    for rel, _sid in self._entries(bm):
                        live.add(rel)
                    for rel, _sid, _seq in self._delta_entries(bm):
                        live.add(rel)
            # non-TT tables: files in pending_gc are the ONE-COMMIT
            # GRACE window (_finish_commit) — a planner holding the
            # previous manifest may still read them; the next commit
            # reclaims them.  Expire must not collapse that window.
            live |= set(man.get("pending_gc", []))
            dropped_files = 0
            if os.path.isdir(os.path.join(self.root, "data")):
                for fn in os.listdir(os.path.join(self.root, "data")):
                    rel = os.path.join("data", fn)
                    if fn.endswith(".parquet") and rel not in live:
                        try:
                            os.remove(os.path.join(self.root, rel))
                            dropped_files += 1
                        except OSError:
                            pass
            dropped_versions = 0
            if os.path.isdir(vd):
                for v in all_vs:
                    if v not in keep:
                        try:
                            os.remove(os.path.join(vd, f"v{v:06d}.json"))
                            dropped_versions += 1
                        except OSError:
                            pass
        out = {"kept_versions": sorted(keep), "dropped_versions": dropped_versions,
               "dropped_files": dropped_files}
        if changefeed_keep_batches is not None:
            out["changefeed"] = self.expire_changefeed(
                keep_last_batches=changefeed_keep_batches)
        return out

    def lookup(self, conv_id: str, turn_idx: int | None = None) -> DataFrame:
        """Point read with bucket pruning.  With turn_idx given, hashes
        the key to its single bucket and scans ONLY that bucket's files
        — at 100 TB this is a constant-size read instead of a table
        scan.  Conv-only lookups prune at PLANNING time via the
        manifest's per-file key stats: the global turn range bounds
        the candidate bucket set {bucket(conv, t)} (_candidate_buckets
        — transcripts have few turns, so this cuts the scan to
        ~turns/n_buckets of the files), per-file conv_id ranges drop
        non-covering files (pays on MoR deltas), and the conv_id
        predicate still prunes parquet row groups inside the
        survivors.  Files committed before the stats feature are
        kept, never mis-pruned."""
        man = self._load()
        schema = T.StructType.fromJson(man["schema"]) if man["schema"] else None
        if schema is None:
            return self.spark.createDataFrame([], "conv_id string, turn_idx long")
        if turn_idx is not None:
            b = (
                self.spark.createDataFrame([(conv_id, turn_idx)], "conv_id string, turn_idx long")
                .select(self._bucket_expr(man["n_buckets"], self._fmt(man)).alias("b"))
                .first()["b"]
            )
            df = self._read_resolved(man, schema, [b]).filter(
                (F.col("conv_id") == conv_id) & (F.col("turn_idx") == turn_idx)
            )
        else:
            df = self._read_resolved(
                self._prune_man_by_conv(man, conv_id), schema,
                self._candidate_buckets(man, conv_id)
            ).filter(F.col("conv_id") == conv_id)
        return df.filter(~F.coalesce(F.col("_deleted"), F.lit(False))).drop(
            *[f.name for f in SYSTEM_FIELDS]
        )

    @classmethod
    def _metadata_live_count(cls, man: dict) -> int | None:
        """Exact live-row count from the manifest alone, or None when
        metadata can't know it: outstanding MoR deltas overlap base
        keys (the LWW winner isn't a per-file property), and files
        without a `live_rows` stat need a scan.  Base files of one
        manifest hold disjoint live keys by construction (the CoW
        merge rewrites whole buckets), so the per-file counts add."""
        if man["schema"] is None:
            return 0
        if cls._delta_entries(man):
            return None
        stats = man.get("file_stats", {})
        rels = [r for r, _sid in cls._entries(man)]
        total = 0
        for r in rels:
            lv = stats.get(r, {}).get("live_rows")
            if lv is None:
                return None
            total += int(lv)
        return total

    def count_rows(self, as_of: int | str | None = None) -> int:
        """Exact live-row count — answered from MANIFEST METADATA when
        possible (Iceberg's planning-time COUNT(*) pushdown: zero tasks,
        zero file reads at any table size), falling back to one
        column-pruned Spark job otherwise.  Metadata answers when the
        table has no outstanding MoR deltas and every base file carries
        a `live_rows` stat — free at write time for tombstone-free
        files (footer boolean stats are decisive), and backfilled
        exactly by compute_stats() / CLI `analyze` for mixed files."""
        man = self._load() if as_of is None else self._load_as_of(
            self._resolve_as_of(as_of))
        n = self._metadata_live_count(man)
        if n is not None:
            return n
        return (self.read(as_of=as_of)
                .filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
                .count())

    def snapshot(self, as_of: int | str | None = None) -> DataFrame:
        """Stable-order finalization (op C16): live rows, spec columns,
        ordered by (conv_id, turn_idx).  `as_of` time-travels to a
        retained table version — int or tag name (see
        create(time_travel=True), tag_snapshot)."""
        df = self.read(as_of=as_of).filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        cols = [c for c in SPEC_COLUMNS if c in df.columns]
        return df.select(*cols).orderBy(*KEY_COLUMNS)

    # ---------------- merge (op C10 + ledger C11) ----------------
    def merge(self, collapsed: DataFrame, batch_id: int | None, scope: str = "default",
              single_pass: bool = True) -> MergeStats:
        """Apply one collapsed batch (<= 1 row per key, from op C7/C8)
        idempotently.  A replayed (scope, batch_id) is skipped via the
        ledger — `scope` identifies the run/checkpoint, because batch
        ids restart at 0 under a fresh checkpoint; even torn/partial
        replays are no-ops thanks to the (ts, lsn) guard.

        batch_id=None (the API-write path: upsert/delete_where)
        allocates the next id from the manifest's per-scope monotonic
        sequence — and RE-allocates it at commit time under the commit
        lock if a concurrent writer took it first, so ids are unique
        per scope forever (never reused even after ledger trimming).

        Concurrency: the join and CoW write run optimistically against
        the manifest read here; the commit validates under the commit
        lock that no concurrent commit changed the touched buckets (or
        the schema) and rebases onto the latest manifest — otherwise
        raises CommitConflict with nothing applied (see the
        "concurrency control" section above).

        single_pass: on a FRESH table (no data files), run the whole
        pipeline as one job and discover touched buckets from the
        write output — the fast path for big backfills.  Streaming
        callers pass False: foreachBatch micro-batch plans only fire
        caller-attached Observations when the subtree is materialized
        (persist) before the write, and micro-batches are small enough
        that the extra materialization is noise."""
        t0 = time.monotonic()
        man = self._load()
        api_alloc = batch_id is None
        if api_alloc:
            batch_id = self._next_batch_id(man, scope)
        elif any(e["batch_id"] == batch_id and e.get("scope", "default") == scope
                 for e in man["ledger"]):
            return MergeStats(batch_id=batch_id, skipped=True)

        # Plan the whole merge pipeline with shuffle partitions == the
        # TABLE's bucket count: the table layout is fixed at creation
        # while cluster size varies, and alignment (bucket fn ==
        # partition-id fn, see module docstring) only holds when the
        # planned exchange count matches nb.  AQE may still coalesce
        # small stages — unions of adjacent partitions keep whole
        # buckets per task, so the write stays one-file-per-bucket.
        sp_key = "spark.sql.shuffle.partitions"
        old_sp = self.spark.conf.get(sp_key)
        self.spark.conf.set(sp_key, str(man["n_buckets"]))
        try:
            # merge-on-read dispatch: in MoR mode every batch APPENDS
            # delta files (no target read, no join) — except a fresh-
            # table single-pass backfill, which keeps the CoW fast path
            # (it writes BASE files in the same single job, so the
            # backfill never pays read-time resolution).
            empty = (not any(man["buckets"].values())
                     and not any(man.get("deltas", {}).values()))
            if self._mode(man) == "mor" and not (single_pass and empty):
                return self._merge_mor_inner(collapsed, batch_id, scope, man, t0,
                                             api_alloc)
            return self._merge_inner(collapsed, batch_id, scope, man, t0, single_pass,
                                     api_alloc)
        finally:
            self.spark.conf.set(sp_key, old_sp)

    def _merge_inner(self, collapsed: DataFrame, batch_id: int, scope: str,
                     man: dict, t0: float, single_pass: bool,
                     api_alloc: bool = False) -> MergeStats:

        schema = self._evolve_schema(man, collapsed)
        data_cols = [f.name for f in schema.fields
                     if f.name not in KEY_COLUMNS and f.name not in {x.name for x in SYSTEM_FIELDS}]
        nb = man["n_buckets"]
        fmt = self._fmt(man)
        bucket_expr = self._bucket_expr(nb, fmt)
        # NB: the write schema's manifest registry id (sid) is resolved
        # at COMMIT time against the CURRENT manifest — resolving it
        # here against the base manifest would record a wrong index if
        # a concurrent commit appended a schema first.

        # --- source side: conform to target schema, tombstone deletes ---
        # NB: capture the ordering tuple (_op_ts from the event ts) BEFORE
        # nulling data columns — tombstones must keep their (ts, lsn).
        s = collapsed.withColumn(
            "_op_ts", F.col("ts") if "ts" in collapsed.columns else F.lit(None).cast("timestamp")
        )
        for c in data_cols:
            dt = schema[c].dataType
            src = F.col(c).cast(dt) if c in s.columns else F.lit(None).cast(dt)
            s = s.withColumn(c, F.when(F.col("is_delete"), F.lit(None).cast(dt)).otherwise(src))
        s = (
            s.withColumn("_lsn", F.col("lsn"))
            .withColumn("_deleted", F.col("is_delete"))
            .withColumn("turn_idx", F.col("turn_idx").cast(schema["turn_idx"].dataType))
            .withColumn("_bucket", bucket_expr)
        )
        has_off = "source_offset" in collapsed.columns
        keep = (KEY_COLUMNS + data_cols + ["_op_ts", "_lsn", "_deleted", "_bucket", "n_events", "n_unique"]
                + (["source_offset"] if has_off else []))
        # Materialize the net-changes: they are <= one row per key by
        # construction (op C7/C8) and feed three consumers (the
        # touched-bucket probe, the join, the write).  persist() keeps
        # the groupBy's hash-partitioning on the merge keys, so the
        # downstream full-outer join adds NO exchange on the s side and
        # the bucket-aligned write stays shuffle-free — measured
        # end-to-end (canary-gated interleaved A/B, 10.4M-event batch):
        # persist 30.9s vs parquet-stage 35.8s at local[32], 50.6s vs
        # 74.0s at local[8] (the stage round-trip loses the
        # partitioning, forcing a re-shuffle in the join).  The parquet
        # stage remains available (DIPPER_NETCHANGE_MAT=stage) for
        # memory-constrained executors: it spills to files by nature.
        s = s.select(*[c for c in keep if c in s.columns])
        # FRESH table (no data files yet — the first backfill batch):
        # there is nothing to join against and nothing to prune, so the
        # probe materialization is pure waste — run the whole
        # scan->decode->collapse->write pipeline as ONE pass and
        # discover the touched buckets from the written dirs instead.
        # CHECK constraints keep the fresh single-pass fast path: the
        # violation scan READS BACK the just-written (pre-commit) tmp
        # files — a column-pruned scan of only the constraint columns,
        # the same trick as the fresh-path changefeed.  Measured on a
        # 1.24M-event backfill at local[32] (interleaved reps): plain
        # 3.9s; + clean text-column constraint 5.1s (the read-back agg
        # must scan the text column); the materialized-path
        # alternative cost 6.5s; a VIOLATING quarantine batch adds one
        # filtered rewrite of tmp (6.4s) — paid only when rows
        # actually violated.  Enforce still aborts with nothing
        # committed (tmp is deleted before the manifest ever sees it).
        # Non-fresh merges check the persisted net-change frame
        # pre-write as before (~free: the frame is already cached).
        cons = man.get("check_constraints", {})
        fresh = (single_pass and not any(man["buckets"].values())
                 and not any(man.get("deltas", {}).values()))
        stage_dir = None
        persisted = False
        if fresh:
            s = s.alias("s")
        elif os.environ.get("DIPPER_NETCHANGE_MAT", "persist") == "persist":
            s = s_cached = s.alias("s").persist()
            persisted = True
        else:
            stage_dir = os.path.join(self.root, f"_stage_b{batch_id}_{uuid.uuid4().hex[:8]}")
            s.write.mode("overwrite").parquet(stage_dir)
            s = self.spark.read.parquet(stage_dir).alias("s")

        # --- CHECK constraints (Delta invariant shape, ANSI null
        # semantics: NULL passes; deletes are exempt — null payload).
        # One aggregation over the persisted net-change frame gives
        # per-constraint violation counts; enforce-mode violations
        # abort with nothing written, quarantine-mode rows go to the
        # dead-letter sink and the rest of the batch applies.
        quarantined = 0
        quarantine_stage = None

        def _passes(expr: str):
            return (F.coalesce(F.col("_deleted"), F.lit(False))
                    | F.coalesce(F.expr(expr), F.lit(True)))

        if cons and not fresh:
            counts = s.agg(*[
                F.sum((~_passes(c["expr"])).cast("long")).alias(name)
                for name, c in cons.items()]).first()
            enforce_bad = {n: counts[n] for n, c in cons.items()
                           if c.get("mode", "enforce") == "enforce"
                           and (counts[n] or 0) > 0}
            if enforce_bad:
                if persisted:
                    s_cached.unpersist()
                elif stage_dir is not None:
                    shutil.rmtree(stage_dir, ignore_errors=True)
                raise ConstraintViolation(enforce_bad)
            q_exprs = [c["expr"] for c in cons.values()
                       if c.get("mode", "enforce") == "quarantine"]
            quarantined = sum(counts[n] or 0 for n, c in cons.items()
                              if c.get("mode", "enforce") == "quarantine")
            if quarantined:
                # stage-then-publish like the changefeed: the locked
                # commit renames this under the FINAL batch id (api
                # ids may be re-allocated there), so concurrent
                # writers never clobber each other's quarantine and a
                # crash leaves only an invisible .stage_* orphan
                passes_q = reduce(lambda a, b: a & b, map(_passes, q_exprs))
                quarantine_stage = os.path.join(
                    self.root, DEAD_LETTER_DIR, "constraints",
                    f".stage_{uuid.uuid4().hex[:8]}")
                (s.filter(~passes_q)
                 .select(*KEY_COLUMNS, *data_cols, "_op_ts", "_lsn")
                 .write.mode("overwrite").parquet(quarantine_stage))
                s = s.filter(passes_q).alias("s")

        # --- touched buckets only (partition pruning by construction) ---
        if fresh:
            touched = None  # discovered from the write output below
        else:
            touched = sorted(r["_bucket"] for r in s.select("_bucket").distinct().collect())
        # Target side reads base ∪ outstanding MoR deltas RESOLVED (a
        # CoW merge after a mor->cow mode switch, or interleaved with
        # MoR writers): the rewrite then folds the touched buckets'
        # deltas into base, and _commit_merge clears their delta
        # entries atomically with the file swap.
        t = (self.spark.createDataFrame([], schema) if fresh
             else self._read_resolved(man, schema, touched)
             ).withColumn("_bucket", bucket_expr).alias("t")

        joined = t.join(s, on=[F.col(f"s.{k}") == F.col(f"t.{k}") for k in KEY_COLUMNS], how="full_outer")
        src_has = F.col("s._lsn").isNotNull()
        tgt_has = F.col("t._lsn").isNotNull()
        src_wins = src_has & (
            ~tgt_has
            | (F.struct(F.col("s._op_ts"), F.col("s._lsn")) > F.struct(F.col("t._op_ts"), F.col("t._lsn")))
        )

        pick = lambda c: F.when(src_wins, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        out_cols = (
            [F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k) for k in KEY_COLUMNS]
            + [pick(c) for c in data_cols]
            + [pick("_op_ts"), pick("_lsn"), pick("_deleted")]
            + [F.coalesce(F.col("s._bucket"), F.col("t._bucket")).alias("_bucket")]
        )
        markers = [
            src_wins.alias("_w"),
            (src_wins & ~tgt_has & ~F.col("s._deleted")).alias("_ins"),
            (src_wins & tgt_has & ~F.col("s._deleted")).alias("_upd"),
            (src_wins & F.col("s._deleted")).alias("_del"),
            (src_has & ~src_wins).alias("_conf"),
            F.col("s.n_events").alias("_ne"),
            F.col("s.n_unique").alias("_nu"),
            F.col("s._lsn").alias("_slsn"),
            (F.col("s.source_offset") if has_off else F.lit(None).cast("long")).alias("_soff"),
        ]
        if man.get("changefeed"):
            # pre-image (Debezium-style `before`) for the changefeed:
            # the target's LIVE values this change replaced — null for
            # inserts, resurrections over tombstones, and deletes of
            # absent/dead keys.  Only carried when a feed consumer
            # exists; `final` drops it so the table never widens.
            live_t = tgt_has & ~F.coalesce(F.col("t._deleted"), F.lit(False))
            markers.append(
                F.when(live_t, F.struct(*[F.col(f"t.{c}").alias(c) for c in data_cols]))
                .alias("_before"))
        merged = joined.select(*out_cols, *markers)

        obs = Observation(f"merge_{batch_id}")
        merged = merged.observe(
            obs,
            F.sum(F.col("_w").cast("long")).alias("applied"),
            F.sum(F.col("_ins").cast("long")).alias("ins"),
            F.sum(F.col("_upd").cast("long")).alias("upd"),
            F.sum(F.col("_del").cast("long")).alias("dele"),
            F.sum(F.col("_conf").cast("long")).alias("conf"),
            F.sum("_ne").alias("rows_in"),
            F.sum("_nu").alias("rows_uniq"),
            F.max("_slsn").alias("max_lsn"),
            F.min("_soff").alias("off_min"),
            F.max("_soff").alias("off_max"),
        )
        final = merged.drop("_w", "_ins", "_upd", "_del", "_conf", "_ne", "_nu",
                            "_slsn", "_soff", "_before")

        # --- changefeed OUT (CDC both directions): emit this batch's
        # APPLIED row-level changes for downstream incremental
        # consumers (e.g. a training-data pipeline tailing the table).
        # Written to a UNIQUE stage dir before the commit, renamed to
        # the final _changes/scope=/batch= dir inside the locked commit
        # (round 5): concurrent writers can never clobber each other's
        # feed, a crash leaves only an invisible .stage_* orphan (dot
        # dirs are skipped by Spark and the IVM dir listing; swept by
        # expire_changefeed), and a ledger-skipped replay never writes
        # at all — the feed commits atomically with the table.
        # Costs one extra action over the (persisted) net-change plan.
        # Fresh-table single-pass backfills take a cheaper route: with
        # no target, every applied row is exactly what the CoW write
        # just produced (insert or tombstone, before-image always
        # null), so the feed is emitted by READING BACK the written
        # files after the rename loop below — a columnar scan of the
        # final rows instead of a second full pipeline pass (measured
        # 1.76x -> see tools/changefeed_bench.py).
        # scope=/batch= Hive-style dirs give readers partition pruning
        # for "changes since batch N".
        feed_stage = (os.path.join(self.root, "_changes", f".stage_{uuid.uuid4().hex[:8]}")
                      if man.get("changefeed") else None)
        if man.get("changefeed") and not fresh:
            ch_op = (F.when(F.col("_del"), F.lit("D"))
                      .when(F.col("_upd"), F.lit("U"))
                      .otherwise(F.lit("I")).alias("change_op"))
            (merged.filter(F.col("_w"))
             .select(*KEY_COLUMNS, ch_op, *data_cols,
                     F.col("_before").alias("before"),
                     F.col("_op_ts").alias("change_ts"),
                     F.col("_lsn").alias("change_lsn"))
             .write.mode("overwrite")
             .parquet(feed_stage))

        # --- copy-on-write: rewrite touched buckets into fresh files ---
        tmp = os.path.join(self.root, f"_tmp_b{batch_id}_{uuid.uuid4().hex[:8]}")
        try:
            # The join output is hash-partitioned on the merge keys; if
            # that shuffle used nb partitions it is ALREADY bucket-
            # aligned (bucket fn == partition-id fn — v2 tables only)
            # and the write can split by dir with zero movement.
            # Otherwise pay one explicit aligning repartition.  Legacy
            # v1 (xxhash64) layouts can never align with Spark's
            # murmur3 partitioning, so they group rows by the bucket
            # COLUMN instead — one partition (hence ~one file) per
            # bucket, correctness by dir value as always.
            if fmt != 2:
                final = final.repartition(nb, F.col("_bucket"))
            elif int(self.spark.conf.get("spark.sql.shuffle.partitions")) != nb:
                final = final.repartition(nb, *KEY_COLUMNS)
            final.write.mode("overwrite").partitionBy("_bucket").parquet(tmp)
        finally:
            if stage_dir is not None:
                shutil.rmtree(stage_dir, ignore_errors=True)
            elif persisted:
                s_cached.unpersist()
        if touched is None:
            touched = sorted(
                int(d.split("=", 1)[1]) for d in os.listdir(tmp) if d.startswith("_bucket=")
            )
        m = obs.get

        # fresh-path CHECK constraints: read back the written tmp
        # files (column-pruned to the constraint columns + _deleted —
        # runs BEFORE the feed read-back so a violating row never
        # enters the changefeed, and before the commit so enforce
        # aborts with nothing published).
        if cons and fresh:
            def _tmp_paths():
                return [os.path.join(tmp, f"_bucket={b}", fn)
                        for b in touched
                        if os.path.isdir(os.path.join(tmp, f"_bucket={b}"))
                        for fn in sorted(os.listdir(os.path.join(tmp, f"_bucket={b}")))
                        if fn.endswith(".parquet")]
            paths = _tmp_paths()
            back = self.spark.read.schema(schema).parquet(*paths) if paths else None
            counts = (back.agg(*[
                F.sum((~_passes(c["expr"])).cast("long")).alias(name)
                for name, c in cons.items()]).first() if back is not None
                else {n: 0 for n in cons})
            enforce_bad = {n: counts[n] for n, c in cons.items()
                           if c.get("mode", "enforce") == "enforce"
                           and (counts[n] or 0) > 0}
            if enforce_bad:
                shutil.rmtree(tmp, ignore_errors=True)
                raise ConstraintViolation(enforce_bad)
            quarantined = sum(counts[n] or 0 for n, c in cons.items()
                              if c.get("mode", "enforce") == "quarantine")
            if quarantined:
                q_exprs = [c["expr"] for c in cons.values()
                           if c.get("mode", "enforce") == "quarantine"]
                passes_q = reduce(lambda a, b: a & b, map(_passes, q_exprs))
                quarantine_stage = os.path.join(
                    self.root, DEAD_LETTER_DIR, "constraints",
                    f".stage_{uuid.uuid4().hex[:8]}")
                (back.filter(~passes_q)
                 .select(*KEY_COLUMNS, *data_cols, "_op_ts", "_lsn")
                 .write.mode("overwrite").parquet(quarantine_stage))
                # rewrite tmp without the violating rows (one extra
                # pass over written data, only on a violating batch)
                tmp2 = tmp + ".q"
                (back.filter(passes_q).withColumn("_bucket", bucket_expr)
                 .repartition(nb, F.col("_bucket"))
                 .write.mode("overwrite").partitionBy("_bucket").parquet(tmp2))
                shutil.rmtree(tmp, ignore_errors=True)
                os.replace(tmp2, tmp)
                touched = sorted(
                    int(d.split("=", 1)[1]) for d in os.listdir(tmp)
                    if d.startswith("_bucket="))

        # fresh-table changefeed: read back the files the CoW write
        # just produced (from the tmp dir, pre-commit, so the
        # exactly-once story is unchanged) — every row is this batch's
        # applied change.
        if man.get("changefeed") and fresh:
            paths = [os.path.join(tmp, f"_bucket={b}", fn)
                     for b in touched
                     if os.path.isdir(os.path.join(tmp, f"_bucket={b}"))
                     for fn in sorted(os.listdir(os.path.join(tmp, f"_bucket={b}")))
                     if fn.endswith(".parquet")]
            phys = schema  # the write schema already carries the system fields
            before_t = T.StructType(
                [T.StructField(c, schema[c].dataType, True) for c in data_cols])
            if paths:
                (self.spark.read.schema(phys).parquet(*paths)
                 .select(*KEY_COLUMNS,
                         F.when(F.coalesce(F.col("_deleted"), F.lit(False)),
                                F.lit("D")).otherwise(F.lit("I")).alias("change_op"),
                         *data_cols,
                         F.lit(None).cast(before_t).alias("before"),
                         F.col("_op_ts").alias("change_ts"),
                         F.col("_lsn").alias("change_lsn"))
                 .write.mode("overwrite")
                 .parquet(feed_stage))
            else:
                feed_stage = None  # empty batch: nothing staged, nothing to publish

        ledger_entry = {
            "batch_id": batch_id,
            "scope": scope,
            "max_lsn": m["max_lsn"],
            "rows_applied": int(m["applied"] or 0),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        try:
            batch_id = self._commit_merge(
                man, scope, batch_id, touched, tmp, schema, ledger_entry,
                api_alloc, feed_stage, quarantine_stage)
        except BaseException:
            # unpublished stages: remove, nothing committed
            for stg in (feed_stage, quarantine_stage):
                if stg:
                    shutil.rmtree(stg, ignore_errors=True)
            raise
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        if batch_id is None:  # concurrent writer committed this same (scope, batch)
            return MergeStats(batch_id=ledger_entry["batch_id"], skipped=True)

        # fresh-path quarantine: the Observation ran on the pre-filter
        # plan, so applied/insert counts include the rows later
        # quarantined by the read-back — correct them here
        fresh_q = int(quarantined) if fresh else 0
        return MergeStats(
            batch_id=batch_id,
            rows_in=int(m["rows_in"] or 0),
            rows_unique=int(m["rows_uniq"] or 0),
            rows_applied=int(m["applied"] or 0) - fresh_q,
            inserts=int(m["ins"] or 0) - fresh_q,
            updates=int(m["upd"] or 0),
            deletes=int(m["dele"] or 0),
            conflicts=int(m["conf"] or 0),
            max_lsn=m["max_lsn"],
            offset_min=m["off_min"],
            offset_max=m["off_max"],
            wall_ms=int((time.monotonic() - t0) * 1000),
            rows_quarantined=int(quarantined),
        )

    def _merge_mor_inner(self, collapsed: DataFrame, batch_id: int, scope: str,
                         man: dict, t0: float, api_alloc: bool) -> MergeStats:
        """Merge-on-read apply (round 5): APPEND the collapsed batch as
        per-bucket delta files — no target read, no join, no bucket
        rewrite.  One Spark job per batch (prep -> bucket-aligned
        write); the LWW winner selection the CoW join does at write
        time happens instead at read (_read_resolved), and compact()
        folds deltas back into base.

        Why this exists at 10^10-event scale: CoW write amplification
        is O(bucket size) per merge — a micro-batch touching all N
        buckets rewrites the whole table.  MoR writes O(batch) bytes
        per merge regardless of table size, trading bounded read
        amplification (delta count between compactions).  Iceberg v2
        calls the same trade 'write.merge.mode = merge-on-read'.

        Stats semantics: rows_applied counts the appended net-change
        rows; inserts/updates/conflicts are READ-time concepts here
        (they need the base row) and report 0 — deletes counts
        appended tombstones.  Idempotency is unchanged: ledger skip
        for replayed (scope, batch_id), and a re-applied trimmed batch
        appends rows whose (ts, lsn, commit) ordering tuple can never
        beat the original application (ties prefer the earlier
        commit), so the resolved state is unchanged — the same three
        exactly-once layers as CoW."""
        schema = self._evolve_schema(man, collapsed)
        data_cols = [f.name for f in schema.fields
                     if f.name not in KEY_COLUMNS and f.name not in {x.name for x in SYSTEM_FIELDS}]
        nb = man["n_buckets"]
        fmt = self._fmt(man)
        bucket_expr = self._bucket_expr(nb, fmt)

        # source prep: identical canonicalization to the CoW path
        s = collapsed.withColumn(
            "_op_ts", F.col("ts") if "ts" in collapsed.columns else F.lit(None).cast("timestamp")
        )
        for c in data_cols:
            dt = schema[c].dataType
            src = F.col(c).cast(dt) if c in s.columns else F.lit(None).cast(dt)
            s = s.withColumn(c, F.when(F.col("is_delete"), F.lit(None).cast(dt)).otherwise(src))
        s = (
            s.withColumn("_lsn", F.col("lsn"))
            .withColumn("_deleted", F.col("is_delete"))
            .withColumn("turn_idx", F.col("turn_idx").cast(schema["turn_idx"].dataType))
            .withColumn("_bucket", bucket_expr)
        )
        has_off = "source_offset" in collapsed.columns

        cons = man.get("check_constraints", {})
        quarantined = 0
        quarantine_stage = None
        persisted = False
        if cons:
            # constraints need a second action over the frame -> persist
            s = s_cached = s.persist()
            persisted = True

            def _passes(expr: str):
                return (F.coalesce(F.col("_deleted"), F.lit(False))
                        | F.coalesce(F.expr(expr), F.lit(True)))

            counts = s.agg(*[
                F.sum((~_passes(c["expr"])).cast("long")).alias(name)
                for name, c in cons.items()]).first()
            enforce_bad = {n: counts[n] for n, c in cons.items()
                           if c.get("mode", "enforce") == "enforce"
                           and (counts[n] or 0) > 0}
            if enforce_bad:
                s_cached.unpersist()
                raise ConstraintViolation(enforce_bad)
            q_exprs = [c["expr"] for c in cons.values()
                       if c.get("mode", "enforce") == "quarantine"]
            quarantined = sum(counts[n] or 0 for n, c in cons.items()
                              if c.get("mode", "enforce") == "quarantine")
            if quarantined:
                passes_q = reduce(lambda a, b: a & b, map(_passes, q_exprs))
                quarantine_stage = os.path.join(
                    self.root, DEAD_LETTER_DIR, "constraints",
                    f".stage_{uuid.uuid4().hex[:8]}")
                (s.filter(~passes_q)
                 .select(*KEY_COLUMNS, *data_cols, "_op_ts", "_lsn")
                 .write.mode("overwrite").parquet(quarantine_stage))
                s = s.filter(passes_q)

        obs = Observation(f"mor_merge_{batch_id}")
        s = s.observe(
            obs,
            F.count(F.lit(1)).alias("applied"),
            F.sum(F.col("_deleted").cast("long")).alias("dele"),
            F.sum("n_events").alias("rows_in"),
            F.sum("n_unique").alias("rows_uniq"),
            F.max("_lsn").alias("max_lsn"),
            F.min(F.col("source_offset") if has_off else F.lit(None).cast("long")).alias("off_min"),
            F.max(F.col("source_offset") if has_off else F.lit(None).cast("long")).alias("off_max"),
        )
        # physical delta schema == the logical write schema (same sid
        # registry as base files) so _read_resolved reads deltas with
        # zero per-file metadata I/O
        final = s.select(
            *[F.col(f.name) for f in schema.fields], F.col("_bucket"))
        # bucket-aligned append: the collapse hash-partitioned s on the
        # merge keys with nb shuffle partitions == pmod(murmur3) bucket
        # fn (v2), so partitionBy splits whole buckets with no movement
        if fmt != 2:
            final = final.repartition(nb, F.col("_bucket"))
        elif int(self.spark.conf.get("spark.sql.shuffle.partitions")) != nb:
            final = final.repartition(nb, *KEY_COLUMNS)
        tmp = os.path.join(self.root, f"_tmp_b{batch_id}_{uuid.uuid4().hex[:8]}")
        try:
            final.write.mode("overwrite").partitionBy("_bucket").parquet(tmp)
        finally:
            if persisted:
                s_cached.unpersist()
        touched = sorted(
            int(d.split("=", 1)[1]) for d in os.listdir(tmp) if d.startswith("_bucket="))
        m = obs.get
        ledger_entry = {
            "batch_id": batch_id,
            "scope": scope,
            "max_lsn": m["max_lsn"],
            "rows_applied": int(m["applied"] or 0),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        try:
            batch_id = self._commit_mor(man, scope, batch_id, touched, tmp, schema,
                                        ledger_entry, api_alloc, quarantine_stage)
        except BaseException:
            if quarantine_stage:
                shutil.rmtree(quarantine_stage, ignore_errors=True)
            raise
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        if batch_id is None:  # concurrent writer committed this same (scope, batch)
            return MergeStats(batch_id=ledger_entry["batch_id"], skipped=True)
        return MergeStats(
            batch_id=batch_id,
            rows_in=int(m["rows_in"] or 0),
            rows_unique=int(m["rows_uniq"] or 0),
            rows_applied=int(m["applied"] or 0),
            deletes=int(m["dele"] or 0),
            max_lsn=m["max_lsn"],
            offset_min=m["off_min"],
            offset_max=m["off_max"],
            wall_ms=int((time.monotonic() - t0) * 1000),
            rows_quarantined=int(quarantined),
        )

    def _commit_mor(self, base_man: dict, scope: str, batch_id: int,
                    touched: list[int], tmp: str, schema: T.StructType,
                    ledger_entry: dict, api_alloc: bool,
                    quarantine_stage: str | None = None) -> int | None:
        """The locked MoR commit: append delta entries — nothing is
        replaced, so there is NO touched-bucket staleness check
        (appends commute with any concurrent commit that kept the
        schema and bucket layout).  Two concurrent MoR writers both
        land; their ordering tuples resolve at read.  Schema or layout
        changes still conflict, exactly like CoW."""
        sj = schema.jsonValue()
        with self._commit_lock():
            cur = self._load()
            dup = any(e["batch_id"] == batch_id and e.get("scope", "default") == scope
                      for e in cur["ledger"])
            if api_alloc:
                seq = self._next_batch_id(cur, scope)
                if dup or batch_id < seq:
                    batch_id = max(seq, batch_id + 1)
                    ledger_entry = {**ledger_entry, "batch_id": batch_id}
            elif dup:
                return None
            if cur["version"] != base_man["version"]:
                if cur["schema"] != base_man["schema"]:
                    raise CommitConflict(
                        f"concurrent schema change on {self.root} between read "
                        f"(v{base_man['version']}) and commit (v{cur['version']})")
                if (cur["n_buckets"] != base_man["n_buckets"]
                        or self._fmt(cur) != self._fmt(base_man)):
                    raise CommitConflict(
                        f"bucket layout changed concurrently on {self.root} "
                        f"({base_man['n_buckets']}/v{self._fmt(base_man)} -> "
                        f"{cur['n_buckets']}/v{self._fmt(cur)}) — retry re-plans "
                        "against the new layout")
                # the batch was filtered/quarantined against the
                # constraint set read at start: a concurrently
                # added/dropped constraint means these staged rows were
                # never validated against the current contract
                if ((cur.get("check_constraints") or {})
                        != (base_man.get("check_constraints") or {})):
                    raise CommitConflict(
                        f"CHECK constraints changed concurrently on {self.root} "
                        "— retry re-validates the batch against the current set")
            ver = cur["version"] + 1
            sid = self._register_schema(cur, sj)
            new_deltas = {k: list(v) for k, v in cur.get("deltas", {}).items()}
            new_rels: list[str] = []
            for b in touched:
                bdir = os.path.join(tmp, f"_bucket={b}")
                if not os.path.isdir(bdir):
                    continue
                for i, fn in enumerate(sorted(f for f in os.listdir(bdir) if f.endswith(".parquet"))):
                    rel = os.path.join(
                        "data", f"d{b:05d}_v{ver}_{i}_{uuid.uuid4().hex[:8]}.parquet")
                    os.replace(os.path.join(bdir, fn), os.path.join(self.root, rel))
                    new_deltas.setdefault(str(b), []).append([rel, sid, ver])
                    new_rels.append(rel)
            if quarantine_stage is not None and os.path.isdir(quarantine_stage):
                q_base = os.path.join(self.root, DEAD_LETTER_DIR, "constraints",
                                      f"scope={self._scope_tag(scope)}")
                q_dir = os.path.join(q_base, f"batch={batch_id}")
                if os.path.isdir(q_dir):  # torn-merge orphan from a crash retry
                    shutil.rmtree(q_dir)
                os.makedirs(q_base, exist_ok=True)
                os.replace(quarantine_stage, q_dir)
            cur["version"] = ver
            cur["schema"] = sj
            cur["deltas"] = new_deltas
            self._refresh_stats(cur, new_rels)
            cur["ledger"].append(ledger_entry)
            if len(cur["ledger"]) > self.LEDGER_CAP:
                cur["ledger"] = cur["ledger"][-self.LEDGER_CAP:]
            seqs = cur.setdefault("scope_seq", {})
            seqs[scope] = max(int(seqs.get(scope, 0)), batch_id + 1)
            self._finish_commit(cur, [])
        return batch_id

    def delta_file_count(self) -> int:
        """Outstanding MoR delta files (read-amplification gauge;
        0 after compact())."""
        return len(self._delta_entries(self._load()))

    def _commit_merge(self, base_man: dict, scope: str, batch_id: int,
                      touched: list[int], tmp: str, schema: T.StructType,
                      ledger_entry: dict, api_alloc: bool,
                      feed_stage: str | None,
                      quarantine_stage: str | None = None) -> int | None:
        """The locked commit: validate against the CURRENT manifest,
        rebase, rename the written files into data/, publish the
        changefeed stage, swap the manifest.  Pure metadata + renames —
        milliseconds, no Spark work.  Returns the final batch id, or
        None when a concurrent duplicate replay already committed this
        batch.  Raises CommitConflict when a concurrent commit
        invalidated this writer's read (touched-bucket file lists or
        the logical schema changed) — nothing is applied in that
        case."""
        sj = schema.jsonValue()
        feed_base = os.path.join(self.root, "_changes", f"scope={self._scope_tag(scope)}")
        with self._commit_lock():
            cur = self._load()
            if cur.get("changefeed"):
                self._adopt_legacy_scope(scope, cur)
            dup = any(e["batch_id"] == batch_id and e.get("scope", "default") == scope
                      for e in cur["ledger"])
            if api_alloc:
                seq = self._next_batch_id(cur, scope)
                if dup or batch_id < seq:
                    # a concurrent API writer took this id — re-allocate
                    # from the monotonic per-scope sequence (the ledger-
                    # append rebase: ids never collide, never reuse)
                    batch_id = max(seq, batch_id + 1)
                    ledger_entry = {**ledger_entry, "batch_id": batch_id}
            elif dup:
                return None
            if cur["version"] != base_man["version"]:
                # optimistic validation (Iceberg's model): a concurrent
                # commit is fine iff it left everything THIS merge read
                # untouched — then rebasing onto it is byte-identical
                # to having run after it.
                if cur["schema"] != base_man["schema"]:
                    raise CommitConflict(
                        f"concurrent schema change on {self.root} between read "
                        f"(v{base_man['version']}) and commit (v{cur['version']})")
                # Layout guard: a merge's bucket ids, shuffle width and
                # touched-bucket probe all derive from (n_buckets,
                # format_version) read at start.  After a concurrent
                # rescale/migration the per-bucket file-list compare
                # below is meaningless (same id, different key range) —
                # an empty-in-both bucket would pass it and commit
                # files whose rows hash to a DIFFERENT bucket under the
                # new layout, silently orphaning keys.  Always conflict.
                if (cur["n_buckets"] != base_man["n_buckets"]
                        or self._fmt(cur) != self._fmt(base_man)):
                    raise CommitConflict(
                        f"bucket layout changed concurrently on {self.root} "
                        f"({base_man['n_buckets']}/v{self._fmt(base_man)} -> "
                        f"{cur['n_buckets']}/v{self._fmt(cur)}) — retry re-plans "
                        "against the new layout")
                # same constraint-set guard as _commit_mor: the staged
                # rows were validated against base_man's constraints
                if ((cur.get("check_constraints") or {})
                        != (base_man.get("check_constraints") or {})):
                    raise CommitConflict(
                        f"CHECK constraints changed concurrently on {self.root} "
                        "— retry re-validates the batch against the current set")
                stale = [b for b in touched
                         if cur["buckets"].get(str(b), []) != base_man["buckets"].get(str(b), [])
                         or cur.get("deltas", {}).get(str(b), [])
                         != base_man.get("deltas", {}).get(str(b), [])]
                if stale:
                    raise CommitConflict(
                        f"buckets {stale} changed concurrently on {self.root} "
                        f"(read v{base_man['version']}, now v{cur['version']}) — "
                        "the merge joined against stale files; retry re-reads")
            ver = cur["version"] + 1
            sid = self._register_schema(cur, sj)
            new_buckets = dict(cur["buckets"])
            new_deltas = dict(cur.get("deltas", {}))
            replaced: list[str] = []
            new_rels: list[str] = []
            for b in touched:
                bdir = os.path.join(tmp, f"_bucket={b}")
                rels = []
                if os.path.isdir(bdir):
                    for i, fn in enumerate(sorted(f for f in os.listdir(bdir) if f.endswith(".parquet"))):
                        # uuid suffix: concurrent writers at the same base
                        # version must never collide on a data file name
                        rel = os.path.join(
                            "data", f"b{b:05d}_v{ver}_{i}_{uuid.uuid4().hex[:8]}.parquet")
                        os.replace(os.path.join(bdir, fn), os.path.join(self.root, rel))
                        rels.append([rel, sid])
                        new_rels.append(rel)
                replaced += [e if isinstance(e, str) else e[0]
                             for e in cur["buckets"].get(str(b), [])]
                # the CoW rewrite read this bucket RESOLVED, so its
                # outstanding MoR deltas are folded into the new files
                replaced += [e[0] for e in new_deltas.pop(str(b), [])]
                new_buckets[str(b)] = rels
            if feed_stage is not None and os.path.isdir(feed_stage):
                final_dir = os.path.join(feed_base, f"batch={batch_id}")
                if os.path.isdir(final_dir):  # torn-merge orphan from a crash retry
                    shutil.rmtree(final_dir)
                os.makedirs(feed_base, exist_ok=True)
                os.replace(feed_stage, final_dir)
            if quarantine_stage is not None and os.path.isdir(quarantine_stage):
                q_base = os.path.join(self.root, DEAD_LETTER_DIR, "constraints",
                                      f"scope={self._scope_tag(scope)}")
                q_dir = os.path.join(q_base, f"batch={batch_id}")
                if os.path.isdir(q_dir):  # torn-merge orphan from a crash retry
                    shutil.rmtree(q_dir)
                os.makedirs(q_base, exist_ok=True)
                os.replace(quarantine_stage, q_dir)
            cur["version"] = ver
            cur["schema"] = sj
            cur["buckets"] = new_buckets
            cur["deltas"] = new_deltas
            self._refresh_stats(cur, new_rels)
            cur["ledger"].append(ledger_entry)
            if len(cur["ledger"]) > self.LEDGER_CAP:
                cur["ledger"] = cur["ledger"][-self.LEDGER_CAP:]
            seqs = cur.setdefault("scope_seq", {})
            seqs[scope] = max(int(seqs.get(scope, 0)), batch_id + 1)
            self._finish_commit(cur, replaced)
        return batch_id

    # ---------------- public MERGE surface (arbitrary DataFrames) ----------
    def _next_batch_id(self, man: dict, scope: str) -> int:
        """Next API batch id for a scope: the manifest's monotonic
        per-scope sequence, floored by whatever the (possibly trimmed)
        ledger still shows.  The sequence survives LEDGER_CAP trimming,
        so ids never restart — a restarted id would silently overwrite
        its old _changes/ dir and be skipped by feed consumers whose
        watermark already passed it."""
        ids = [e["batch_id"] for e in man["ledger"]
               if e.get("scope", "default") == scope]
        seq = int(man.get("scope_seq", {}).get(scope, 0))
        return max(seq, (max(ids) + 1) if ids else 0)

    # Bounded optimistic retries for the self-rederiving API writers:
    # each attempt re-reads the manifest and re-plans against current
    # state, so a retry after CommitConflict is always correct.
    COMMIT_RETRIES = 4

    def upsert(self, df: DataFrame, scope: str = "api",
               batch_id: int | None = None) -> MergeStats:
        """Delta-style MERGE of an arbitrary keyed DataFrame — the
        user-facing upsert surface (no changelog required).

        Contract: df carries the key columns, any data columns, and an
        event-time `ts`; rows REPLACE the whole row per key (the
        engine's merge rule — columns absent from df become null, new
        columns schema-evolve).  Conflict resolution is the same LWW
        (ts, lsn) order as the CDC path: a source row applies iff its
        (ts, lsn) beats the target's, so stale upserts are rejected
        rather than clobbering newer data.  An optional boolean
        `is_delete` column marks tombstone rows.  Multiple source rows
        per key are collapsed to the LWW winner first (same kernel as
        the changelog path).

        `lsn` defaults to a deterministic hash of (key, ts, ALL payload
        columns), which pins the tie rule for same-key-same-ts writes:
        among equal-ts upserts the winner is the row with the GREATER
        content hash — deterministic and arrival-order-independent
        (replay-stable), while a byte-identical re-upsert hashes equal
        and is rejected by the strict (ts, lsn) guard, i.e. it is a
        no-op.  Callers that need true last-arrival-wins at equal ts
        must supply their own monotonic `lsn`.

        Concurrency: batch ids are allocated from the manifest's
        per-scope monotonic sequence under the commit lock; on
        CommitConflict (overlapping concurrent write) the merge is
        re-planned against fresh state up to COMMIT_RETRIES times."""
        from ..operators.cdc import lww_collapse

        if "ts" not in df.columns:
            raise ValueError("upsert frame must carry an event-time 'ts' column")
        # parquet written by pandas/pyarrow often surfaces as
        # timestamp_ntz; the engine's event time is session-tz timestamp
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        if "lsn" not in df.columns:
            payload = sorted(c for c in df.columns if c not in (*KEY_COLUMNS, "ts"))
            df = df.withColumn(
                "lsn", F.xxhash64(
                    *KEY_COLUMNS, F.col("ts").cast("string"),
                    *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in payload]))
        if "is_delete" in df.columns:
            df = df.withColumn(
                "op", F.when(F.coalesce(F.col("is_delete"), F.lit(False)),
                             F.lit("D")).otherwise(F.lit("U"))).drop("is_delete")
        elif "op" not in df.columns:
            df = df.withColumn("op", F.lit("U"))
        carry = ["op", "ts", "lsn"] + [c for c in df.columns
                                       if c not in KEY_COLUMNS
                                       and c not in ("op", "ts", "lsn")]
        collapsed = lww_collapse(df, carry=carry)
        last = self.COMMIT_RETRIES - 1
        for attempt in range(self.COMMIT_RETRIES):
            try:
                return self.merge(collapsed, batch_id=batch_id, scope=scope)
            except CommitConflict:
                if batch_id is not None or attempt == last:
                    raise
            except Exception as e:
                if attempt == last or not _scan_race(e):
                    raise

    def delete_where(self, predicate: str, scope: str = "api") -> MergeStats:
        """Predicate delete: tombstone every LIVE row matching the SQL
        predicate.  Reads only the matching rows (parquet row-group
        pruning applies), emits tombstones that win by construction —
        same ts as the victim row, lsn + 1 — so the delete lands
        exactly once and an identical re-run is a no-op (no live rows
        match anymore).  Staler events still cannot resurrect the key:
        the tombstone's (ts, lsn) guards it like any CDC delete.
        On CommitConflict the victim set is re-derived from current
        table state and retried (bounded)."""
        for attempt in range(self.COMMIT_RETRIES):
            live = self.read().filter(
                ~F.coalesce(F.col("_deleted"), F.lit(False))).filter(predicate)
            src = live.select(
                *KEY_COLUMNS,
                F.col("_op_ts").alias("ts"),
                (F.col("_lsn") + 1).alias("lsn"),
                F.lit("D").alias("op"),
                F.lit(1).cast("long").alias("n_events"),
                F.lit(1).cast("long").alias("n_unique"),
                F.lit(True).alias("is_delete"),
            )
            try:
                return self.merge(src, batch_id=None, scope=scope)
            except CommitConflict:
                if attempt == self.COMMIT_RETRIES - 1:
                    raise
            except Exception as e:
                if attempt == self.COMMIT_RETRIES - 1 or not _scan_race(e):
                    raise

    @staticmethod
    def _scope_tag(scope: str) -> str:
        """Filesystem-safe tag for a scope (checkpoint paths are not
        safe dir names; collisions at 7 hex over a handful of scopes
        per table are negligible).  The leading 's' keeps the Hive
        partition value non-numeric so batch-feed partition inference
        types `scope` as STRING — identical to changefeed_stream()'s
        declared schema (an all-digit tag would infer as int)."""
        import hashlib as _hl

        return "s" + _hl.sha256(scope.encode()).hexdigest()[:7]

    @staticmethod
    def _legacy_scope_tag(scope: str) -> str:
        """Round-4 tag format: 8 hex chars, no prefix.  An all-digit
        tag makes Hive partition inference type `scope` as int — the
        reason round 5 added the 's' prefix."""
        import hashlib as _hl

        return _hl.sha256(scope.encode()).hexdigest()[:8]

    def _adopt_legacy_scope(self, scope: str, man: dict) -> None:
        """Lazy migration of a pre-round-5 feed scope: rename
        _changes/scope=<legacy 8-hex> onto the current 's'+7-hex tag
        and re-key the scope's retention floor and consumer-group
        watermarks, so an upgraded table keeps its feed history,
        floors and acks under the tag every current surface computes
        (without this, the old dir is silently invisible to scoped
        reads/expiry forever).  Scope names hash one-way, so adoption
        happens lazily wherever a scope NAME is presented: merge
        commits, scoped changefeed() reads, scoped expiry.  Must run
        under the commit lock; persists the manifest immediately when
        bookkeeping was re-keyed (version unchanged — administrative,
        like move_tag).  No-op when no legacy dir or keys exist."""
        old_tag, new_tag = self._legacy_scope_tag(scope), self._scope_tag(scope)
        base = os.path.join(self.root, "_changes")
        old_dir = os.path.join(base, f"scope={old_tag}")
        new_dir = os.path.join(base, f"scope={new_tag}")
        if os.path.isdir(old_dir):
            if not os.path.isdir(new_dir):
                os.rename(old_dir, new_dir)
            else:  # both formats present: merge batch dirs (per-scope
                # ids are monotonic, so names never collide)
                for b in os.listdir(old_dir):
                    os.rename(os.path.join(old_dir, b), os.path.join(new_dir, b))
                os.rmdir(old_dir)
        meta_changed = False
        floors = man.get("changefeed_floor", {})
        if old_tag in floors:
            floors[new_tag] = max(int(floors.get(new_tag, 0)),
                                  int(floors.pop(old_tag)))
            meta_changed = True
        for entry in man.get("changefeed_consumers", {}).values():
            if old_tag in entry:
                hwm = int(entry.pop(old_tag))
                entry[new_tag] = max(int(entry.get(new_tag, -1)), hwm)
                meta_changed = True
        if meta_changed:
            self._write_manifest(man)

    def changefeed(self, since_batch: int | None = None,
                   scope: str | None = None) -> DataFrame:
        """Row-level change stream of a changefeed-enabled table
        (CDC OUT): one row per applied change with `change_op` I/U/D,
        the post-change data columns (nulls for D), a `before` struct
        holding the replaced LIVE values (null for I / resurrections /
        deletes of dead keys — the Debezium before/after shape, and
        what makes SUM/COUNT aggregates incrementally maintainable,
        see plans/ivm.py), the winning
        (change_ts, change_lsn), plus Hive-partition columns `scope`
        ('s'+7-hex tag, see _scope_tag) and `batch` for incremental
        consumption —
        `since_batch` prunes to `batch > since_batch` at the DIRECTORY
        level, so tailing consumers read only new commits.

        Replaying the feed in (batch, change_lsn) order reproduces the
        table snapshot exactly (pinned by tests/test_changefeed.py).

        Retention contract: expire_changefeed() may remove old batch
        dirs.  A read whose range would include an expired batch —
        `since_batch` older than the scope's retention floor minus one,
        or a full read (since_batch=None) after ANY expiry — raises
        ChangefeedExpiredError instead of silently returning a feed
        that no longer replays to the snapshot.  Consumers that fall
        behind retention must re-bootstrap from snapshot()."""
        base = os.path.join(self.root, "_changes")
        if not os.path.isdir(base):
            raise FileNotFoundError(
                f"{base} does not exist — was the table created with "
                f"changefeed=True and has a merge been applied?")
        if scope is not None:
            with self._commit_lock():
                self._adopt_legacy_scope(scope, self._load())
        floors: dict = self._load().get("changefeed_floor", {})
        tags = ([self._scope_tag(scope)] if scope is not None else sorted(
            {d.split("=", 1)[1] for d in os.listdir(base) if d.startswith("scope=")}
            | set(floors)))
        want_from = -1 if since_batch is None else since_batch  # reads batch > this
        for tag in tags:
            floor = int(floors.get(tag, 0))  # first retained batch id
            if want_from < floor - 1:
                raise ChangefeedExpiredError(
                    f"changefeed(scope tag {tag}) from batch {want_from + 1} "
                    f"is expired — retention floor is batch {floor}; "
                    "re-bootstrap the consumer from snapshot()")
        # mergeSchema: batches written before an ADD-column evolution
        # lack the new column — without the union the inferred schema
        # could come from an OLD batch and silently drop it
        df = self.spark.read.option("mergeSchema", "true").parquet(base)
        if scope is not None:
            df = df.filter(F.col("scope") == self._scope_tag(scope))
        if since_batch is not None:
            df = df.filter(F.col("batch") > since_batch)
        return df

    # ---------------- changefeed consumer groups (round 5) ----------------
    # The retention loop closed: floors + ChangefeedExpiredError make
    # falling behind LOUD (above), and registered consumers make it
    # AVOIDABLE — expire_changefeed(keep_consumed=True) only expires
    # batches EVERY registered consumer has passed, so a slow consumer
    # holds retention instead of breaking (Kafka's consumer-group
    # offset-retention shape).  IncrementalView(consumer_name=...) and
    # MirrorTable(consumer_name=...) ack automatically after each
    # refresh/sync.

    def register_consumer(self, name: str) -> None:
        """Pre-register a feed consumer with no progress yet: it holds
        retention from batch 0 of every scope until its first ack."""
        with self._commit_lock():
            man = self._load()
            if not man.get("changefeed"):
                raise ValueError("table was not created with changefeed=True")
            man.setdefault("changefeed_consumers", {}).setdefault(name, {})
            man["version"] += 1
            self._write_manifest(man)

    def ack_consumer(self, name: str, consumed: dict) -> None:
        """Record a consumer's per-scope-tag consumed high-watermarks
        (monotonic: acks never move backwards).  `consumed` maps scope
        TAG -> hwm int (or a {"hwm": N, ...} entry — only hwm is kept;
        sparse extras are not expressible, which is conservative for
        retention).  A concurrent merge commit is unaffected: the ack
        bumps the version but changes no schema/layout/bucket state,
        so optimistic writers rebase cleanly over it."""
        with self._commit_lock():
            man = self._load()
            if not man.get("changefeed"):
                raise ValueError("table was not created with changefeed=True")
            cons = man.setdefault("changefeed_consumers", {})
            ent = cons.setdefault(name, {})
            for tag, v in consumed.items():
                hwm = int(v.get("hwm", -1)) if isinstance(v, dict) else int(v)
                ent[tag] = max(int(ent.get(tag, -1)), hwm)
            man["version"] += 1
            self._write_manifest(man)

    def consumers(self) -> dict:
        """Registered feed consumers -> {scope tag: consumed hwm}."""
        return {n: dict(v) for n, v in
                self._load().get("changefeed_consumers", {}).items()}

    def unregister_consumer(self, name: str) -> None:
        """Drop a consumer from retention accounting (it stops holding
        batches; a later sync from it may raise ChangefeedExpiredError)."""
        with self._commit_lock():
            man = self._load()
            if man.get("changefeed_consumers", {}).pop(name, None) is not None:
                man["version"] += 1
                self._write_manifest(man)

    # ---------------- CHECK constraints (round 5) ----------------
    # Delta-style table invariants as a data-quality gate on every
    # write path (ingest, replay, upsert — they all go through
    # merge()).  ANSI CHECK null semantics: NULL passes; deletes are
    # exempt (their payload is nulled by construction).  Two modes:
    #   enforce     — a violating batch raises ConstraintViolation
    #                 before anything is written (Delta's invariant
    #                 shape; right for correctness invariants);
    #   quarantine  — violating rows are routed to the dead-letter
    #                 sink (_deadletter/constraints/scope=/batch=) and
    #                 the rest of the batch applies, counted in
    #                 MergeStats.rows_quarantined (right for dirty
    #                 upstream feeds where one bad producer must not
    #                 stall ingestion).
    # Cost: one extra aggregation over the PERSISTED net-change frame
    # per batch — not a second pipeline pass (merge() disables the
    # fresh single-pass path when constraints exist so the frame is
    # always materialized first).

    def add_check_constraint(self, name: str, expr: str,
                             mode: str = "enforce",
                             validate: bool = True) -> None:
        """Add a named CHECK constraint (SQL boolean expression over
        data/key columns).  With validate=True (default) EXISTING live
        rows are checked first and a violation raises — Delta's ADD
        CONSTRAINT contract — re-validated under version-CAS if a
        concurrent commit lands mid-validation."""
        if mode not in ("enforce", "quarantine"):
            raise ValueError(f"mode must be enforce|quarantine, got {mode!r}")
        for _attempt in range(self.COMMIT_RETRIES):
            man = self._load()
            v0 = man["version"]
            if name in man.get("check_constraints", {}):
                raise ValueError(f"constraint {name!r} already exists")
            if man.get("schema"):
                if validate:
                    bad = self.snapshot().filter(
                        ~F.coalesce(F.expr(expr), F.lit(True))).count()
                    if bad:
                        raise ConstraintViolation({name: bad})
                else:
                    # analysis only: parse errors / unknown columns
                    # fail here, not at the next merge
                    self.snapshot().limit(0).filter(expr).count()
            with self._commit_lock():
                man2 = self._load()
                if man2["version"] != v0:
                    continue  # state moved — revalidate against it
                man2.setdefault("check_constraints", {})[name] = {
                    "expr": expr, "mode": mode}
                man2["version"] += 1
                self._write_manifest(man2)
                return
        raise CommitConflict(
            f"add_check_constraint({name!r}): table kept changing during "
            f"validation ({self.COMMIT_RETRIES} attempts)")

    def drop_check_constraint(self, name: str) -> None:
        with self._commit_lock():
            man = self._load()
            if man.get("check_constraints", {}).pop(name, None) is None:
                raise ValueError(f"no such constraint {name!r}")
            man["version"] += 1
            self._write_manifest(man)

    def check_constraints(self) -> dict:
        """Registered constraints -> {"expr": sql, "mode": ...}."""
        return {n: dict(c) for n, c in
                self._load().get("check_constraints", {}).items()}

    def quarantined(self) -> DataFrame:
        """Rows routed to the constraint dead-letter sink, all scopes
        and batches (Hive-partitioned by (scope, batch) for pruning).
        Empty frame (current schema + ordering tuple + partition cols)
        when nothing was ever quarantined."""
        base = os.path.join(self.root, DEAD_LETTER_DIR, "constraints")
        has_batches = os.path.isdir(base) and any(
            d.startswith("scope=")
            and any(b.startswith("batch=")
                    for b in os.listdir(os.path.join(base, d)))
            for d in os.listdir(base))
        if not has_batches:
            man = self._load()
            fields = ([T.StructType.fromJson(man["schema"])[c]
                       for c in (T.StructType.fromJson(man["schema"]).names)
                       if not c.startswith("_")] if man.get("schema") else [])
            empty = T.StructType(
                fields + [T.StructField("_op_ts", T.TimestampType(), True),
                          T.StructField("_lsn", T.LongType(), True),
                          T.StructField("scope", T.StringType(), True),
                          T.StructField("batch", T.IntegerType(), True)])
            return self.spark.createDataFrame([], empty)
        # mergeSchema: quarantine batches written before an ADD-column
        # evolution lack the new column — same reasoning as changefeed()
        return self.spark.read.option("mergeSchema", "true").parquet(base)

    def requeue_quarantined(self, scope: str | None = None,
                            purge: bool = True) -> dict:
        """Re-apply constraint-quarantined rows after the cause is
        fixed (constraint dropped/relaxed, or quarantine was judged
        wrong) — the operator workflow the dead-letter sink exists
        for.  Each quarantined row kept its original (ts, lsn)
        identity, so the requeue is just an upsert with the ORIGINAL
        ordering tuple: the strict merge guard means a key that
        received a NEWER version since quarantine is left alone (the
        requeued row lost the LWW race it would have lost live), and
        re-running a requeue is a no-op.  Rows that still violate an
        active constraint behave exactly like any incoming batch —
        enforce raises (nothing applied, nothing purged), quarantine
        routes them right back.  `purge=True` removes the drained
        quarantine dirs afterwards (only on full success)."""
        q = self.quarantined()
        if scope is not None:
            # quarantine dirs are partitioned by the scope TAG
            q = q.filter(F.col("scope") == self._scope_tag(scope))
        rows = q.count()
        if rows == 0:
            return {"rows_requeued": 0, "batches_purged": 0}
        # snapshot the batch dirs being DRAINED before applying: a
        # still-active quarantine constraint re-routes rows into a NEW
        # batch dir during the upsert, which purge must not touch
        base = os.path.join(self.root, DEAD_LETTER_DIR, "constraints")
        drained: list[str] = []
        for sd in sorted(os.listdir(base)) if os.path.isdir(base) else []:
            if not sd.startswith("scope="):
                continue
            if scope is not None and sd != f"scope={self._scope_tag(scope)}":
                continue
            sdir = os.path.join(base, sd)
            drained += [os.path.join(sdir, bd) for bd in sorted(os.listdir(sdir))
                        if bd.startswith("batch=")]
        # `ts` (data column) and `_op_ts` (ordering tuple) are equal by
        # construction on quarantined rows — re-emit ts from _op_ts so
        # the requeue carries the ORIGINAL LWW identity
        data_cols = [c for c in q.columns
                     if c not in ("ts", "_op_ts", "_lsn", "scope", "batch")]
        stats = self.upsert(q.select(
            *data_cols,
            F.col("_op_ts").alias("ts"), F.col("_lsn").alias("lsn")))
        purged = 0
        if purge:
            with self._commit_lock():
                for bd in drained:
                    shutil.rmtree(bd, ignore_errors=True)
                    purged += 1
                for sd in (os.listdir(base) if os.path.isdir(base) else []):
                    sdir = os.path.join(base, sd)
                    if sd.startswith("scope=") and not os.listdir(sdir):
                        shutil.rmtree(sdir, ignore_errors=True)
        return {"rows_requeued": rows, "batches_purged": purged,
                "rows_applied": stats.rows_applied,
                "conflicts_lww_lost": stats.conflicts,
                "rows_requarantined": stats.rows_quarantined}

    def vacuum(self, ttl_seconds: int = 3600) -> dict:
        """Sweep crash debris older than `ttl_seconds` (Delta VACUUM /
        Iceberg remove-orphan-files shape, for THIS table's root):
        `_tmp_b*` CoW write dirs, `_stage_b*` net-change stages, and
        `.stage_*` orphans under `_changes/` and
        `_deadletter/constraints/` — all are pre-commit artifacts a
        crashed writer left behind; live writers' dirs are younger
        than any sane TTL (a merge holds its tmp for seconds, not
        hours).  Unreferenced `data/` files are already reclaimed by
        expire_snapshots (refcount over retained manifests) and
        one-commit-deferred `pending_gc`.  Metadata-only: directory
        listings + rmtree, under the commit lock so an in-flight
        commit's rename window is never raced."""
        now = time.time()
        swept: list[str] = []

        def _sweep(base: str, prefixes: tuple[str, ...]):
            if not os.path.isdir(base):
                return
            for d in os.listdir(base):
                p = os.path.join(base, d)
                if (d.startswith(prefixes) and os.path.isdir(p)
                        and now - os.path.getmtime(p) > ttl_seconds):
                    shutil.rmtree(p, ignore_errors=True)
                    swept.append(os.path.relpath(p, self.root))

        with self._commit_lock():
            _sweep(self.root, ("_tmp_b", "_stage_b", "_tmp_compact_"))
            _sweep(os.path.join(self.root, "_changes"), (".stage_",))
            _sweep(os.path.join(self.root, DEAD_LETTER_DIR, "constraints"),
                   (".stage_",))
        return {"swept": sorted(swept)}

    def expire_changefeed(self, keep_last_batches: int | None = None,
                          through_batch: int | None = None,
                          scope: str | None = None,
                          keep_consumed: bool = False) -> dict:
        """Changefeed retention (round 5, VERDICT r4 #2): without it a
        long-lived table accumulates an unbounded second copy of all
        history under _changes/.  Removes expired batch dirs and
        records the per-scope retention FLOOR (first retained batch id)
        in the manifest; changefeed()/IncrementalView then fail
        CRISPLY when asked for an expired range instead of silently
        under-replaying.

        Exactly one policy per call:
          * keep_last_batches=N — per scope, keep the newest N batch
            dirs (applies to every scope, or just `scope`);
          * through_batch=K (+ scope) — expire batch ids <= K of that
            scope (Kafka delete-records shape);
          * keep_consumed=True — expire only batches EVERY registered
            consumer (ack_consumer) has passed; a consumer with no
            progress on a scope holds that scope entirely.  Raises if
            no consumer is registered (nothing is provably safe).

        Metadata-only: a directory list + rmtree per expired batch, no
        data read.  Runs under the commit lock so a concurrent merge's
        just-published batch is never considered.  Also sweeps
        crash-orphaned .stage_* dirs older than an hour."""
        n_policies = sum([keep_last_batches is not None,
                          through_batch is not None, bool(keep_consumed)])
        if n_policies != 1:
            raise ValueError("pass exactly one of keep_last_batches / "
                             "through_batch / keep_consumed")
        if through_batch is not None and scope is None:
            raise ValueError("through_batch retention needs an explicit scope")
        base = os.path.join(self.root, "_changes")
        dropped: dict[str, list[int]] = {}
        with self._commit_lock():
            man = self._load()
            if not man.get("changefeed"):
                raise ValueError("table was not created with changefeed=True")
            floors = man.setdefault("changefeed_floor", {})
            cons = man.get("changefeed_consumers", {})
            if keep_consumed and not cons:
                raise ValueError(
                    "keep_consumed retention needs at least one registered "
                    "consumer (register_consumer / ack_consumer) — with none, "
                    "no batch is provably safe to expire")
            if scope is not None:
                self._adopt_legacy_scope(scope, man)
            if os.path.isdir(base):
                for d in sorted(os.listdir(base)):
                    if not d.startswith("scope="):
                        continue
                    tag = d.split("=", 1)[1]
                    if scope is not None and tag != self._scope_tag(scope):
                        continue
                    sdir = os.path.join(base, d)
                    batches = sorted(
                        int(b.split("=", 1)[1])
                        for b in os.listdir(sdir) if b.startswith("batch="))
                    if keep_consumed:
                        # safe floor = min over consumers of (hwm + 1);
                        # an entry-less consumer holds the whole scope
                        safe = min(int(e.get(tag, -1)) + 1 for e in cons.values())
                        expire = [b for b in batches if b < safe]
                    elif keep_last_batches is not None:
                        expire = batches[:-keep_last_batches] if keep_last_batches > 0 else batches
                    else:
                        expire = [b for b in batches if b <= through_batch]
                    for b in expire:
                        shutil.rmtree(os.path.join(sdir, f"batch={b}"), ignore_errors=True)
                    if expire:
                        floors[tag] = max(int(floors.get(tag, 0)), max(expire) + 1)
                        dropped[tag] = expire
                # crash-orphaned stage dirs: unpublished, invisible to
                # readers; age-gated so an in-flight writer's stage
                # (written outside the lock) is never swept
                now = time.time()
                for d in os.listdir(base):
                    p = os.path.join(base, d)
                    if d.startswith(".stage_") and now - os.path.getmtime(p) > 3600:
                        shutil.rmtree(p, ignore_errors=True)
            if dropped:
                self._write_manifest(man)
        return {"dropped": dropped,
                "floors": {t: int(v) for t, v in floors.items()}}

    def history(self, scope: str | None = None, source: str = "feed",
                from_version: int | str | None = None) -> DataFrame:
        """SCD2 row-version history: one row per key version with
        effective_from/to (ts, lsn), end_op, and is_current (the
        is_current slice == snapshot()).  source='feed' (default)
        derives it from the write-time changefeed (needs the full
        feed — raises ChangefeedExpiredError after any expiry);
        source='changelog' derives it from per-commit snapshot-diff
        steps instead, which is how MoR / plain time-travel tables
        without a feed get history (per-retained-commit resolution,
        seeded from the earliest retained — or `from_version` —
        snapshot).  See plans/history.py for semantics and scale."""
        from .history import scd2_history

        return scd2_history(self, scope=scope, source=source,
                            from_version=from_version)

    def changefeed_stream(self, max_files_per_trigger: int | None = None,
                          fail_on_data_loss: bool = True) -> DataFrame:
        """Tail the changefeed as a Structured Stream — the downstream
        consumer shape (e.g. an incremental training-data pipeline
        keeping a derived dataset in sync): each merge's change files
        arrive as new stream input, the consumer's checkpoint tracks
        what it has seen, and exactly-once composes end to end (the
        feed is exactly-once with the table; the file-source offset
        log is exactly-once with the consumer).

        Explicit schema (current table schema + change columns) — a
        streaming source cannot infer, and partition columns scope/
        batch are declared so Hive-dir values surface as columns.

        Retention contract (Kafka's failOnDataLoss shape): a RUNNING
        consumer is unaffected by expire_changefeed — its checkpoint's
        file-source offset log remembers files already processed, and
        expired files are simply absent from future listings.  But a
        consumer STARTING on a partially-expired feed would silently
        miss history, so with fail_on_data_loss=True (default) this
        raises ChangefeedExpiredError whenever any scope's retention
        floor is > 0.  Pass fail_on_data_loss=False to acknowledge the
        gap explicitly — correct for consumers RESUMING a checkpoint
        that already consumed the expired range, or consumers that
        bootstrapped from snapshot()."""
        man = self._load()
        if not man.get("changefeed"):
            raise ValueError("table was not created with changefeed=True")
        if fail_on_data_loss:
            floors = man.get("changefeed_floor", {})
            expired = {t: int(v) for t, v in floors.items() if int(v) > 0}
            if expired:
                raise ChangefeedExpiredError(
                    f"changefeed batches below the retention floor(s) {expired} "
                    "are expired; a fresh consumer would miss history — "
                    "bootstrap from snapshot() or pass fail_on_data_loss=False")
        if man["schema"] is None:
            raise FileNotFoundError("changefeed empty: no batch applied yet")
        schema = T.StructType.fromJson(man["schema"])
        data_fields = [f for f in schema.fields
                       if f.name not in KEY_COLUMNS
                       and f.name not in {x.name for x in SYSTEM_FIELDS}]
        fields = (
            [T.StructField(k, schema[k].dataType, False) for k in KEY_COLUMNS]
            + [T.StructField("change_op", T.StringType(), False)]
            + data_fields
            + [T.StructField("before", T.StructType(
                   [T.StructField(f.name, f.dataType, True) for f in data_fields]), True),
               T.StructField("change_ts", T.TimestampType(), True),
               T.StructField("change_lsn", T.LongType(), True),
               T.StructField("scope", T.StringType(), True),
               T.StructField("batch", T.IntegerType(), True)]
        )
        r = self.spark.readStream.schema(T.StructType(fields))
        if max_files_per_trigger:
            r = r.option("maxFilesPerTrigger", max_files_per_trigger)
        return r.option("basePath", os.path.join(self.root, "_changes")).parquet(
            os.path.join(self.root, "_changes"))

    # ---------------- snapshot-diff changelog (round 5) ----------------
    # CDC OUT for tables that did NOT pre-enable the write-time
    # changefeed — in particular MoR tables, whose merges never read
    # the target and so cannot classify I/U or capture a before-image
    # at write time.  Iceberg has the same split: write-time feeds vs
    # the after-the-fact `create_changelog_view` procedure that diffs
    # snapshots.  This is that procedure: net row-level changes between
    # two RETAINED table versions, derived purely from manifests +
    # data files, same column shape as changefeed() (minus scope/batch,
    # plus commit_version under granularity='commit').

    def changelog_between(self, from_version: int | str,
                          to_version: int | str | None = None,
                          granularity: str = "net") -> DataFrame:
        """Net row-level changes between two retained versions
        (time_travel tables; version ints or tag names).

        Net contract, judged purely by endpoint states:
          * key live at `to` but absent/dead at `from`  -> I
          * key live at both with a newer (ts, lsn) at `to` -> U
            (before = the `from` live values)
          * key live at `from` but dead/absent at `to`  -> D
            (before = the `from` live values; data columns null)
          * unchanged keys, and dead->dead keys, emit nothing.
        change_ts/change_lsn are the `to`-side winner's (null only for
        the compact(drop_tombstones)-erased-tombstone D edge, where the
        deleting event's identity is gone by design).

        granularity='commit' instead emits one net diff per RETAINED
        consecutive version pair in the range, each tagged with
        `commit_version` — per-commit resolution exactly as fine as
        snapshot retention (expired intermediates coarsen the steps,
        they never corrupt them).

        Scale: the manifest diff prunes the read to TOUCHED buckets
        (file-list inequality — driver-side metadata only), and when
        the range is pure delta appends (the MoR steady state: base
        file lists identical, delta lists append-only) both snapshot
        reads are further pruned to the NEW delta files' keys via a
        broadcast semi-join — the diff then reads O(changed keys)
        from each endpoint, never the table.  One key-hash shuffle
        pair for the full-outer diff; no driver-side row work."""
        if granularity not in ("net", "commit"):
            raise ValueError(f"granularity must be 'net' or 'commit', got {granularity!r}")
        man_b = (self._load() if to_version is None
                 else self._load_as_of(self._resolve_as_of(to_version)))
        man_a = self._load_as_of(self._resolve_as_of(from_version))
        if man_a["version"] > man_b["version"]:
            raise ValueError(
                f"from_version v{man_a['version']} is newer than "
                f"to_version v{man_b['version']}")
        if granularity == "net":
            return self._changelog_net(man_a, man_b)
        vs = [v for v in self.versions()
              if man_a["version"] <= v <= man_b["version"]]
        parts = []
        for va, vb in zip(vs, vs[1:]):
            step = self._changelog_net(self._load_as_of(va), self._load_as_of(vb))
            parts.append(step.withColumn("commit_version", F.lit(vb).cast("int")))
        if not parts:
            empty = self._changelog_net(man_a, man_a)
            return empty.withColumn("commit_version", F.lit(None).cast("int"))
        return reduce(DataFrame.unionAll, parts)

    # ---------------- manifest file statistics (round 5) ----------------
    # Iceberg manifests carry per-file column bounds so planning can
    # skip files before any task is scheduled.  Same idea here: each
    # commit records (min, max) of conv_id per new data file — one
    # footer read per file, driver-side, inside the commit (on a real
    # cluster the write tasks report these, like Iceberg's per-task
    # manifest entries).  Conv-only lookups then prune at PLANNING
    # time: O(matching files) scan tasks instead of O(all files) —
    # parquet row-group pushdown still prunes the rows, but only
    # after a task was scheduled and the footer read per file.

    @staticmethod
    def _file_key_stats(path: str) -> dict | None:
        """{'conv': [min, max], 'turn': [min, max]} of the key columns
        across the file's row groups, from the parquet footer — None
        when either column's stats are absent (the file is then never
        pruned; conv ids are short, far below parquet's
        stats-truncation thresholds)."""
        try:
            md = pq.ParquetFile(path).metadata
            idx = {}
            for i in range(md.num_columns):
                n = md.schema.column(i).name
                if n in ("conv_id", "turn_idx", "_deleted"):
                    idx[n] = i
            if "conv_id" not in idx or "turn_idx" not in idx:
                return None
            out = {"conv": [None, None], "turn": [None, None],
                   "rows": md.num_rows}
            # live-row count from the footer alone, when decisive: the
            # engine writes _deleted non-null, so null_count==0 with
            # max==False proves zero tombstones (live == rows) and
            # min==True proves all-tombstone (live == 0).  Mixed files
            # stay unset; compute_stats() fills them exactly.
            if "_deleted" in idx:
                lv = 0
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx["_deleted"]).statistics
                    if (st is None or not st.has_min_max
                            or st.null_count != 0):
                        lv = None
                        break
                    if st.max is False:
                        lv += md.row_group(rg).num_rows
                    elif st.min is not True:
                        lv = None
                        break
                if lv is not None:
                    out["live_rows"] = lv
            for rg in range(md.num_row_groups):
                for name, key in (("conv_id", "conv"), ("turn_idx", "turn")):
                    st = md.row_group(rg).column(idx[name]).statistics
                    if st is None or not st.has_min_max:
                        return None
                    mn, mx = st.min, st.max
                    if isinstance(mn, bytes):
                        mn, mx = mn.decode(), mx.decode()
                    lo, hi = out[key]
                    out[key] = [mn if lo is None or mn < lo else lo,
                                mx if hi is None or mx > hi else hi]
            return None if out["conv"][0] is None else out
        except Exception:
            return None  # never fail a commit over a stats read

    def _refresh_stats(self, cur: dict, new_rels: list[str]) -> None:
        """Record stats for newly committed files and prune entries of
        files this manifest no longer references (retained older
        manifests keep their own copies)."""
        stats = dict(cur.get("file_stats", {}))
        for rel in new_rels:
            s = self._file_key_stats(os.path.join(self.root, rel))
            if s:
                stats[rel] = s
        live = {rel for rel, _sid in self._entries(cur)}
        live |= {rel for rel, _sid, _seq in self._delta_entries(cur)}
        cur["file_stats"] = {r: v for r, v in stats.items() if r in live}

    def compute_stats(self) -> dict:
        """Build a conv_id Bloom filter for every live data/delta file
        that doesn't have one — Iceberg's `compute_table_stats`
        procedure (Puffin blob shape), run as MAINTENANCE so the write
        path stays footer-stats-only.  Conv lookups then skip base
        files at planning time (`_prune_man_by_conv`), which the wide
        hash-mixed conv *ranges* of base files never allow.

        Distributed: one column-pruned Spark job reads ONLY conv_id
        from the target files, reduces to per-file distinct convs (a
        shuffle bounded by files x distinct-convs-per-file), and builds
        each file's bloom in an Arrow-batched applyInPandas group —
        the driver collects one small row per file, never values.  The
        commit is a metadata-only manifest update under the commit
        lock; files replaced by a concurrent writer in the meantime
        are skipped (their stats entries died with them), so this
        commit commutes with everything and never raises
        CommitConflict.  Idempotent: saturated files (> _BLOOM_MAX_DISTINCT
        convs) get a marker so they are never re-read."""
        man = self._load()
        rels = [r for r, _sid in self._entries(man)]
        rels += [r for r, _sid, _seq in self._delta_entries(man)]
        stats0 = man.get("file_stats", {})
        # re-analyze files missing EITHER stat: blooms and live_rows
        # land together, but files analyzed by an older engine (or
        # whose footer was decisive for live_rows only) may have one
        targets = [r for r in rels
                   if "bloom" not in stats0.get(r, {})
                   or "live_rows" not in stats0.get(r, {})]
        if not targets:
            return {"files": len(rels), "computed": 0, "saturated": 0,
                    "unmapped": 0}

        import pandas as pd  # noqa: F811 — executor-side builder below

        sdf = (self.spark.read.schema("conv_id string, _deleted boolean")
               .parquet(*[os.path.join(self.root, r) for r in targets])
               .select(F.input_file_name().alias("f"), "conv_id",
                       (~F.coalesce(F.col("_deleted"), F.lit(False)))
                       .cast("long").alias("live"))
               .groupBy("f", "conv_id").agg(F.sum("live").alias("live")))

        def build(key, pdf):
            bl = _bloom_build(pdf["conv_id"])
            return pd.DataFrame({"f": [key[0]], "bloom": [json.dumps(bl)],
                                 "live": [int(pdf["live"].sum())]})

        rows = (sdf.groupBy("f")
                .applyInPandas(build, "f string, bloom string, live long")
                .collect())  # one row per file: bounded metadata
        root_abs = os.path.realpath(self.root)
        by_rel: dict[str, tuple[dict | None, int]] = {}
        for r in rows:
            # ADVICE r5: input_file_name() returns a URI — percent-
            # encoded (spaces etc.) — so decode it properly before
            # relpath, or tables under encodable roots silently drop
            # every stat and analyze never converges.
            from urllib.parse import unquote, urlparse
            u = urlparse(r["f"])
            p = unquote(u.path) if u.scheme else unquote(r["f"])
            by_rel[os.path.relpath(os.path.realpath(p), root_abs)] = (
                json.loads(r["bloom"]), int(r["live"]))

        # ADVICE r5: count scanned files whose executor path failed to
        # map back onto a manifest rel instead of dropping them
        # silently — a nonzero `unmapped` means analyze re-reads those
        # files every run and coverage never converges.
        target_set = set(targets)
        unmapped = sum(1 for rel in by_rel if rel not in target_set)

        computed = saturated = 0
        with self._commit_lock():
            cur = self._load()
            live = {rel for rel, _sid in self._entries(cur)}
            live |= {rel for rel, _sid, _seq in self._delta_entries(cur)}
            stats = dict(cur.get("file_stats", {}))
            for rel, (bl, live_rows) in by_rel.items():
                if rel not in live or bl is None:
                    continue
                ent = dict(stats.get(rel) or {})
                if "bloom" in ent and "live_rows" in ent:
                    continue
                if "turn" not in ent:
                    fs = self._file_key_stats(os.path.join(self.root, rel))
                    if fs:
                        ent.update(fs)
                ent.setdefault("bloom", bl)
                ent["live_rows"] = live_rows  # exact: enables count_rows
                stats[rel] = ent
                computed += 1
                saturated += int(not ent["bloom"].get("m"))
            if computed:
                cur["file_stats"] = stats
                # opt-in marker: the advisor only nags about stale bloom
                # coverage on tables that have been analyzed at least
                # once (Iceberg tables likewise only carry staleness
                # once a stats file exists)
                cur["analyzed"] = True
                cur["version"] += 1
                self._write_manifest(cur)
        return {"files": len(rels), "computed": computed,
                "saturated": saturated, "unmapped": unmapped}

    def _prune_man_by_conv(self, man: dict, conv_id: str) -> dict:
        """Manifest copy whose file lists keep only files whose
        recorded conv_id range covers `conv_id` (files without stats
        are kept).  Driver-side dict work — no I/O.  On the
        hash-bucketed base this range is usually wide (hashing mixes
        convs), so the file-range check mostly pays on small MoR delta
        files; the big planning win is _candidate_buckets below — and,
        where compute_stats() has run, the per-file conv Bloom filter,
        which prunes base files the range check never can."""
        stats = man.get("file_stats", {})

        def keep(rel: str) -> bool:
            s = stats.get(rel)
            if s is None:
                return True
            rng = s.get("conv")
            if rng is not None and not (rng[0] <= conv_id <= rng[1]):
                return False
            return _bloom_maybe_contains(s.get("bloom"), conv_id)

        m2 = dict(man)
        m2["buckets"] = {
            b: [e for e in fs if keep(e if isinstance(e, str) else e[0])]
            for b, fs in man["buckets"].items()}
        m2["deltas"] = {
            b: [e for e in fs if keep(e[0])]
            for b, fs in man.get("deltas", {}).items()}
        return m2

    _TURN_SPAN_CAP = 4096  # enumerable turn range for bucket probing

    def _candidate_buckets(self, man: dict, conv_id: str) -> list[int] | None:
        """Buckets that can possibly hold ANY (conv_id, t) key — the
        planning-time prune for conv-only lookups, None = all.

        The layout hashes (conv, turn), so a conv-only predicate can't
        name one bucket — but transcripts have FEW turns: the manifest
        stats give the global turn range [lo, hi], and the candidate
        set {bucket(conv, t) | lo <= t <= hi} is computed with one
        tiny single-task job over hi-lo+1 rows.  With 1024 buckets and
        turns 0..31 that's a 32/1024 scan instead of a full pass.
        Requires stats on EVERY file (an unstatted file could hold any
        turn) and a bounded span.  v1 layouts hash conv alone — there
        the conv already names exactly one bucket, no enumeration."""
        if self._fmt(man) == 1:
            b = (self.spark.createDataFrame([(conv_id,)], "conv_id string")
                 .select(self._bucket_expr(man["n_buckets"], 1).alias("b"))
                 .first()["b"])
            return [int(b)]
        stats = man.get("file_stats", {})
        rels = [rel for rel, _sid in self._entries(man)]
        rels += [rel for rel, _sid, _seq in self._delta_entries(man)]
        if not rels:
            return None
        # bloom-only entries (compute_stats on a footer-statless file)
        # don't carry a turn range — treat them as unstatted here
        if any("turn" not in stats.get(rel, {}) for rel in rels):
            return None
        lo = min(int(stats[r]["turn"][0]) for r in rels)
        hi = max(int(stats[r]["turn"][1]) for r in rels)
        if hi - lo + 1 > self._TURN_SPAN_CAP:
            return None
        rows = (self.spark.range(lo, hi + 1)
                .select(F.lit(conv_id).alias("conv_id"),
                        F.col("id").alias("turn_idx"))
                .select(self._bucket_expr(man["n_buckets"], self._fmt(man))
                        .alias("b"))
                .distinct().collect())
        return sorted({int(r["b"]) for r in rows})

    @staticmethod
    def same_data(man_a: dict, man_b: dict) -> bool:
        """True when two manifests reference identical data (layout,
        base file lists, delta lists) — the range between them is
        metadata-only (tags, acks, constraint DDL) and its changelog
        is empty by construction.  Driver-side dict compares only;
        consumers use this to fast-forward watermarks without a job."""
        return (man_a["n_buckets"] == man_b["n_buckets"]
                and LocalCowTable._fmt(man_a) == LocalCowTable._fmt(man_b)
                and man_a["buckets"] == man_b["buckets"]
                and man_a.get("deltas", {}) == man_b.get("deltas", {}))

    def _changelog_net(self, man_a: dict, man_b: dict) -> DataFrame:
        schema = (T.StructType.fromJson(man_b["schema"]) if man_b["schema"]
                  else None)
        data_cols = ([f.name for f in schema.fields
                      if f.name not in KEY_COLUMNS
                      and f.name not in {x.name for x in SYSTEM_FIELDS}]
                     if schema else [])
        out_fields = (
            ([T.StructField(k, schema[k].dataType, False) for k in KEY_COLUMNS]
             if schema else
             [T.StructField("conv_id", T.StringType(), False),
              T.StructField("turn_idx", T.LongType(), False)])
            + [T.StructField("change_op", T.StringType(), False)]
            + ([T.StructField(c, schema[c].dataType, True) for c in data_cols])
            + [T.StructField("before", T.StructType(
                   [T.StructField(c, schema[c].dataType, True) for c in data_cols]), True),
               T.StructField("change_ts", T.TimestampType(), True),
               T.StructField("change_lsn", T.LongType(), True)]
        )
        out_schema = T.StructType(out_fields)
        if schema is None or man_a["version"] == man_b["version"]:
            return self.spark.createDataFrame([], out_schema)

        # ---- driver-side manifest diff: touched buckets + fast path ----
        same_layout = (man_a["n_buckets"] == man_b["n_buckets"]
                       and self._fmt(man_a) == self._fmt(man_b))
        da, db = man_a.get("deltas", {}), man_b.get("deltas", {})
        if same_layout:
            touched = sorted(
                b for b in range(man_b["n_buckets"])
                if man_a["buckets"].get(str(b), []) != man_b["buckets"].get(str(b), [])
                or da.get(str(b), []) != db.get(str(b), []))
            if not touched:
                return self.spark.createDataFrame([], out_schema)
            base_same = all(
                man_a["buckets"].get(str(b), []) == man_b["buckets"].get(str(b), [])
                for b in touched)
            appended = all(
                db.get(str(b), [])[:len(da.get(str(b), []))] == da.get(str(b), [])
                for b in touched)
        else:
            touched = None  # rescale in range: diff everything
            base_same = appended = False

        keys_df = None
        if base_same and appended:
            # pure delta-append range: changed keys ⊆ the new delta
            # files' keys — one key-column-pruned scan of the (small)
            # new deltas, broadcast as a semi filter on both endpoints
            new = [e for b in touched
                   for e in db.get(str(b), [])[len(da.get(str(b), [])):]]
            key_schema = T.StructType([T.StructField(k, schema[k].dataType, False)
                                       for k in KEY_COLUMNS])
            paths = [os.path.join(self.root, e[0]) for e in new]
            keys_df = (self.spark.read.schema(key_schema).parquet(*paths)
                       .distinct())

        # Both endpoints are conformed to the TO schema through the TO
        # manifest's FIELD IDS, each resolved against its own manifest's
        # physical stamps — a pure rename in the range therefore lines
        # the same values up under the new name on both sides and emits
        # NO spurious changes; a drop simply leaves the diff's schema.
        # A pre-feature `from` manifest gets its stamps synthesized
        # in-memory by name (exact: renames cannot predate the feature,
        # and ADD evolution only ever appends, so field order is stable).
        fids_b = man_b.get("field_ids")
        if fids_b:
            self._ensure_field_ids(man_a)
        a = self._read_resolved(man_a, schema, touched, fids=fids_b).alias("a")
        b = self._read_resolved(man_b, schema, touched, fids=fids_b).alias("b")
        if keys_df is not None:
            a = a.join(F.broadcast(keys_df), on=list(KEY_COLUMNS), how="left_semi").alias("a")
            b = b.join(F.broadcast(keys_df), on=list(KEY_COLUMNS), how="left_semi").alias("b")

        j = a.join(b, on=[F.col(f"a.{k}") == F.col(f"b.{k}") for k in KEY_COLUMNS],
                   how="full_outer")
        has_a, has_b = F.col("a._lsn").isNotNull(), F.col("b._lsn").isNotNull()
        live_a = has_a & ~F.coalesce(F.col("a._deleted"), F.lit(False))
        live_b = has_b & ~F.coalesce(F.col("b._deleted"), F.lit(False))
        newer_b = has_b & (~has_a | (
            F.struct(F.col("b._op_ts"), F.col("b._lsn"))
            > F.struct(F.col("a._op_ts"), F.col("a._lsn"))))
        op = (F.when(live_b & ~live_a, F.lit("I"))
               .when(live_b & live_a & newer_b, F.lit("U"))
               .when(~live_b & live_a, F.lit("D")))
        before = F.when(live_a, F.struct(
            *[F.col(f"a.{c}").alias(c) for c in data_cols]))
        return (j.select(
                    *[F.coalesce(F.col(f"b.{k}"), F.col(f"a.{k}")).alias(k)
                      for k in KEY_COLUMNS],
                    op.alias("change_op"),
                    *[F.col(f"b.{c}").alias(c) for c in data_cols],
                    before.alias("before"),
                    F.col("b._op_ts").alias("change_ts"),
                    F.col("b._lsn").alias("change_lsn"))
                .filter(F.col("change_op").isNotNull()))

    # ---------------- maintenance (op C17) ----------------
    def compact(self, drop_tombstones: bool = False, *,
                buckets: list[int] | None = None, minor: bool = False,
                min_files: int = 2, sort: bool = False) -> int:
        """Rewrite buckets into single fresh files.  Returns the number
        of buckets rewritten.

        `sort=True` (Iceberg rewrite_data_files-with-sort-order shape)
        GUARANTEES each rewritten bucket's rows are ordered by
        (conv_id, turn_idx) — a per-partition sort inside the rewrite's
        existing shuffle, zero extra shuffle.  Sorted files keep the
        parquet row-group min/max tight on conv_id (pushdown prunes
        row groups inside a file), cluster a conversation's turns
        adjacently, and cheapen snapshot()'s ordered output.  Honest
        caveat: TODAY the engine's rewrites come out key-sorted anyway
        — max_by over a struct is not hash-aggregable, so every LWW
        resolution is a SortAggregate on the key, and the write's
        repartition elides into the agg's own exchange, preserving
        that order — but that is Catalyst's incidental physical choice
        (a future hash-capable max_by, or the MoR broadcast-resolve
        plan under different stats, silently loses it).  sort=True
        turns the accident into a contract, which is exactly what an
        Iceberg sort order is.  Opt-in: the sort costs CPU at
        maintenance time and merge writes don't re-establish it.

        Default (major) form rewrites EVERY bucket — it reads every
        row, folds all outstanding MoR deltas, and doubles as the
        v1 -> v2 format migration (re-buckets with the v2 murmur3 key
        hash and commits format_version 2 atomically).  Its commit is a
        strict version CAS — any concurrent commit raises
        CommitConflict and the whole compaction re-runs (bounded
        retries).

        `minor=True` (Iceberg rewrite_data_files-with-filter shape) is
        the 100 TB maintenance path: it selects ONLY the buckets that
        need work — outstanding MoR delta files, or >= `min_files` base
        files — and rewrites just those; `buckets=[...]` selects an
        explicit set instead.  Cost is O(selected-bucket bytes), never
        O(table).  Its commit uses the merge-style TOUCHED-BUCKET
        validation, not a strict CAS: a concurrent writer on an
        unselected bucket commits freely and the compaction rebases
        onto it; a concurrent write into a selected bucket raises
        CommitConflict and the compaction re-selects and re-runs.
        Minor compaction never changes the layout, so it requires a
        format-v2 table (a partial v1 re-bucket would split keys
        across hash functions — run a full compact() to migrate
        first).  `drop_tombstones` purges within the selected buckets
        only (safe: keys are bucket-local); as everywhere, only purge
        once no staler events can still arrive."""
        if minor or buckets is not None:
            for attempt in range(self.COMMIT_RETRIES):
                try:
                    return self._compact_minor_once(drop_tombstones, buckets,
                                                    min_files, sort=sort)
                except CommitConflict:
                    if attempt == self.COMMIT_RETRIES - 1:
                        raise
        for attempt in range(self.COMMIT_RETRIES):
            try:
                return self._compact_once(drop_tombstones, sort=sort)
            except CommitConflict:
                if attempt == self.COMMIT_RETRIES - 1:
                    raise

    def _compact_minor_once(self, drop_tombstones: bool,
                            bucket_ids: list[int] | None,
                            min_files: int, sort: bool = False) -> int:
        man = self._load()
        if man["schema"] is None:
            return 0
        if self._fmt(man) != 2:
            raise ValueError(
                "minor compaction requires a format-v2 layout (a partial "
                "re-bucket of a v1 table would split keys across hash "
                "functions) — run a full compact() first, which migrates")
        if bucket_ids is not None:
            sel = sorted({int(b) for b in bucket_ids})
            bad = [b for b in sel if not 0 <= b < man["n_buckets"]]
            if bad:
                raise ValueError(f"bucket ids out of range: {bad} "
                                 f"(n_buckets={man['n_buckets']})")
        else:
            deltas = man.get("deltas", {})
            sel = [b for b in range(man["n_buckets"])
                   if deltas.get(str(b))
                   or len(man["buckets"].get(str(b), [])) >= min_files]
        sel = [b for b in sel
               if man["buckets"].get(str(b)) or man.get("deltas", {}).get(str(b))]
        if not sel:
            return 0
        schema = T.StructType.fromJson(man["schema"])
        nb = man["n_buckets"]
        df = self._read_resolved(man, schema, sel)
        if drop_tombstones:
            df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        df = df.withColumn("_bucket", self._bucket_expr(nb))
        sj = schema.jsonValue()
        tmp = os.path.join(self.root, f"_tmp_compact_{uuid.uuid4().hex[:8]}")
        # same one-file-per-bucket shape as the merge write: partition i
        # holds exactly bucket i (murmur3 pmod); unselected buckets are
        # simply absent from the frame, so their partitions are empty
        out = df.repartition(nb, *KEY_COLUMNS)
        if sort:
            out = out.sortWithinPartitions(*KEY_COLUMNS)
        out.write.mode("overwrite").partitionBy("_bucket").parquet(tmp)
        try:
            with self._commit_lock():
                cur = self._load()
                if cur["version"] != man["version"]:
                    if cur["schema"] != man["schema"]:
                        raise CommitConflict(
                            f"concurrent schema change on {self.root} during "
                            "minor compact; re-running")
                    if (cur["n_buckets"] != man["n_buckets"]
                            or self._fmt(cur) != self._fmt(man)):
                        raise CommitConflict(
                            f"bucket layout changed concurrently on {self.root} "
                            "during minor compact; re-running")
                    stale = [b for b in sel
                             if cur["buckets"].get(str(b), []) != man["buckets"].get(str(b), [])
                             or cur.get("deltas", {}).get(str(b), [])
                             != man.get("deltas", {}).get(str(b), [])]
                    if stale:
                        raise CommitConflict(
                            f"buckets {stale} changed concurrently on "
                            f"{self.root} during minor compact; re-running")
                ver = cur["version"] + 1
                sid = self._register_schema(cur, sj)
                new_buckets = dict(cur["buckets"])
                new_deltas = {k: list(v) for k, v in cur.get("deltas", {}).items()}
                replaced: list[str] = []
                new_rels: list[str] = []
                for b in sel:
                    replaced += [e if isinstance(e, str) else e[0]
                                 for e in cur["buckets"].get(str(b), [])]
                    replaced += [e[0] for e in new_deltas.pop(str(b), [])]
                    bdir = os.path.join(tmp, f"_bucket={b}")
                    rels = []
                    if os.path.isdir(bdir):
                        for i, fn in enumerate(sorted(
                                f for f in os.listdir(bdir) if f.endswith(".parquet"))):
                            rel = os.path.join(
                                "data", f"b{b:05d}_v{ver}_{i}_{uuid.uuid4().hex[:8]}.parquet")
                            os.replace(os.path.join(bdir, fn), os.path.join(self.root, rel))
                            rels.append([rel, sid])
                            new_rels.append(rel)
                    if rels:
                        new_buckets[str(b)] = rels
                    else:  # tombstone purge emptied the bucket
                        new_buckets.pop(str(b), None)
                cur["version"] = ver
                cur["buckets"] = new_buckets
                cur["deltas"] = new_deltas
                self._refresh_stats(cur, new_rels)
                self._finish_commit(cur, replaced)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return len(sel)

    def rescale_buckets(self, new_n_buckets: int,
                        drop_tombstones: bool = False) -> int:
        """Online bucket-count change (Iceberg partition-evolution
        analog, round 5): rewrite the table into `new_n_buckets` hash
        buckets in ONE commit.  The initial bucket count is chosen at
        create() when the table is empty; at 10^10-event scale the
        right count is only known later (buckets bound both the merge
        shuffle width and the one-file-per-bucket layout), so growing
        a hot table — or shrinking an over-partitioned one — must not
        require a blocking offline migration.

        Semantics: identical row set (snapshot hash invariant, pinned
        by tests/test_rescale.py), new layout.  Readers are unaffected
        (they always bucket-probe with the manifest they loaded);
        writers planned against the OLD count are rejected at commit
        time by the layout guard in _commit_merge (n_buckets is part
        of what a merge "read": its shuffle width, bucket ids and
        touched-bucket probe all derive from it) and the API writers
        re-derive and retry.  Time-travel versions keep their own
        n_buckets in their retained manifests, so as-of reads across a
        rescale stay correct.

        Returns the number of non-empty buckets in the new layout."""
        if new_n_buckets < 1:
            raise ValueError(f"new_n_buckets must be >= 1, got {new_n_buckets}")
        for attempt in range(self.COMMIT_RETRIES):
            try:
                return self._compact_once(drop_tombstones, new_n=new_n_buckets)
            except CommitConflict:
                if attempt == self.COMMIT_RETRIES - 1:
                    raise

    def _compact_once(self, drop_tombstones: bool, new_n: int | None = None,
                      sort: bool = False) -> int:
        man = self._load()
        if man["schema"] is None:
            if new_n is not None:  # empty table: pure metadata rescale
                with self._commit_lock():
                    cur = self._load()
                    if cur["version"] != man["version"]:
                        raise CommitConflict(
                            f"table {self.root} advanced during rescale; re-running")
                    cur["version"] += 1
                    cur["n_buckets"] = new_n
                    self._finish_commit(cur, [])
            return 0
        schema = T.StructType.fromJson(man["schema"])
        nb = new_n if new_n is not None else man["n_buckets"]
        df = self.read()
        if drop_tombstones:
            df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        df = df.withColumn("_bucket", self._bucket_expr(nb))  # always v2: migrates v1
        sj = schema.jsonValue()
        tmp = os.path.join(self.root, f"_tmp_compact_{uuid.uuid4().hex[:8]}")
        # repartition on the KEY with nb partitions: partition i holds
        # exactly bucket i (same murmur3 pmod), one file per bucket
        out = df.repartition(nb, *KEY_COLUMNS)
        if sort:
            out = out.sortWithinPartitions(*KEY_COLUMNS)
        out.write.mode("overwrite").partitionBy("_bucket").parquet(tmp)
        try:
            with self._commit_lock():
                cur = self._load()
                if cur["version"] != man["version"]:
                    raise CommitConflict(
                        f"table {self.root} advanced v{man['version']} -> "
                        f"v{cur['version']} during compact; re-running")
                ver = cur["version"] + 1
                sid = self._register_schema(cur, sj)
                old = [e if isinstance(e, str) else e[0]
                       for fs in cur["buckets"].values() for e in fs]
                # compaction folds outstanding MoR deltas into base
                # (self.read() above resolved them), so their files are
                # superseded by this commit too
                old += [e[0] for fs in cur.get("deltas", {}).values() for e in fs]
                new_buckets: dict[str, list] = {}
                for b in range(nb):
                    bdir = os.path.join(tmp, f"_bucket={b}")
                    rels = []
                    if os.path.isdir(bdir):
                        for i, fn in enumerate(sorted(f for f in os.listdir(bdir) if f.endswith(".parquet"))):
                            rel = os.path.join(
                                "data", f"b{b:05d}_v{ver}_{i}_{uuid.uuid4().hex[:8]}.parquet")
                            os.replace(os.path.join(bdir, fn), os.path.join(self.root, rel))
                            rels.append([rel, sid])
                    if rels:
                        new_buckets[str(b)] = rels
                cur["version"] = ver
                cur["buckets"] = new_buckets
                cur["deltas"] = {}
                cur["n_buckets"] = nb  # rescale commits atomically with the layout
                cur["format_version"] = 2  # v1 tables are fully re-bucketed above
                self._refresh_stats(
                    cur, [e[0] for fs in new_buckets.values() for e in fs])
                self._finish_commit(cur, old)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return len(new_buckets)


class IcebergTable:
    """Production backend: real Iceberg MERGE INTO.

    UNRUNNABLE IN THIS SANDBOX: /opt/spark/jars has no iceberg runtime
    and there is no network to fetch one (SURVEY.md §0.3/§7.3) — but
    the generated MERGE mirrors LocalCowTable.merge's semantics
    exactly, clause by clause (tests parse-validate the SQL and assert
    the semantic mirror against target.py's src_wins predicate):

      * guard:  struct(s.ts, s.lsn) > struct(t._op_ts, t._lsn) —
        struct comparison, the valid Spark SQL spelling of the (ts,
        lsn) lexicographic max-order (LocalCowTable line `src_wins`).
      * deletes write TOMBSTONES, never DELETE: data columns nulled,
        _deleted=true, and the winning (ts, lsn) recorded — a staler
        redelivered event can then never resurrect the key.  A delete
        for an ABSENT key also inserts a tombstone (NOT-MATCHED path),
        for the same reason.
      * explicit UPDATE SET / INSERT column lists: the source
        (collapse output) carries ts/lsn/is_delete plus lineage
        counters; the target's system columns are _op_ts/_lsn/_deleted
        — `UPDATE SET *` / `INSERT *` cannot express that mapping.
      * snapshot readers filter `NOT coalesce(_deleted, false)` —
        same contract as LocalCowTable.snapshot().

    Exactly-once: batch-id skip uses Iceberg snapshot summary
    properties (`dipper.scope` / `dipper.batch_id`, checked before
    merging); even without the skip, replaying a batch is a no-op
    because the guard rejects <=-ordered events — identical layering
    to the CoW backend's ledger + guard.
    """

    # source columns that are engine metadata, never target data
    _META = {"op", "lsn", "ts", "is_delete", "n_events", "n_unique",
             "source", "source_offset"}

    def __init__(self, spark: SparkSession, identifier: str):
        self.spark = spark
        self.identifier = identifier

    def create_sql(self, n_buckets: int = 32, extra_data_cols: dict[str, str] | None = None) -> str:
        """CREATE TABLE DDL mirroring LocalCowTable's layout on a real
        catalog.  Pure string builder — unit-testable without an
        Iceberg runtime.

        * `PARTITIONED BY (bucket(N, conv_id))` — Iceberg's bucket
          transform is single-column, so the lake layout buckets on
          conv_id (co-locating a conversation's turns; the local CoW
          backend buckets on the full key).  MERGE INTO then prunes to
          touched buckets and storage-partitioned joins avoid the
          shuffle, same as the local bucket alignment.
        * format-version 2 + merge-on-read for DELETE/UPDATE: at
          10^10-event ingest rates, positional delete files amortize
          far better than rewriting data files per micro-batch;
          compaction (op C17) folds them in.
        * write.distribution-mode=hash aligns the MERGE write exchange
          with the bucket spec (one file per touched bucket per
          commit, not one per task).
        * system columns (_op_ts, _lsn, _deleted) are part of the
          schema — the (ts, lsn) guard and tombstones live in-table,
          identical contract to the local backend."""
        extra = extra_data_cols or {}
        cols = ", ".join(
            ["conv_id STRING NOT NULL", "turn_idx INT NOT NULL",
             "role STRING", "text STRING", "tool STRING", "ts TIMESTAMP"]
            + [f"{c} {t}" for c, t in extra.items()]
            + ["_op_ts TIMESTAMP", "_lsn BIGINT", "_deleted BOOLEAN"]
        )
        return (
            f"CREATE TABLE IF NOT EXISTS {self.identifier} ({cols})\n"
            f"USING iceberg\n"
            f"PARTITIONED BY (bucket({n_buckets}, conv_id))\n"
            f"TBLPROPERTIES (\n"
            f"  'format-version' = '2',\n"
            f"  'write.delete.mode' = 'merge-on-read',\n"
            f"  'write.update.mode' = 'merge-on-read',\n"
            f"  'write.merge.mode' = 'merge-on-read',\n"
            f"  'write.distribution-mode' = 'hash')"
        )

    def merge_sql(self, source_columns: list[str], source_view: str = "_dipper_src") -> str:
        """Build the MERGE statement for a collapse-output source with
        the given columns.  Pure string builder — unit-testable without
        an Iceberg runtime."""
        data_cols = [c for c in source_columns
                     if c not in KEY_COLUMNS and c not in self._META]
        guard = "struct(s.ts, s.lsn) > struct(t._op_ts, t._lsn)"
        # tombstone: nulled data columns; live row: source values.
        # `ts` doubles as a data column on the target (spec column),
        # which the source carries — handled like any other data col.
        # ONE assignment list (data + ts + system columns) so a source
        # with no data columns still yields valid SQL — the pre-r3
        # string-join emitted "UPDATE SET , t.ts = ..." in that case.
        set_clauses = (
            [f"t.{c} = CASE WHEN s.is_delete THEN NULL ELSE s.{c} END" for c in data_cols]
            + ["t.ts = CASE WHEN s.is_delete THEN NULL ELSE s.ts END",
               "t._op_ts = s.ts", "t._lsn = s.lsn", "t._deleted = s.is_delete"]
        )
        set_all = ",\n              ".join(set_clauses)
        ins_cols = ", ".join(
            KEY_COLUMNS + data_cols + ["ts", "_op_ts", "_lsn", "_deleted"]
        )
        ins_vals = ", ".join(
            [f"s.{k}" for k in KEY_COLUMNS]
            + [f"CASE WHEN s.is_delete THEN NULL ELSE s.{c} END" for c in data_cols]
            + ["CASE WHEN s.is_delete THEN NULL ELSE s.ts END", "s.ts", "s.lsn", "s.is_delete"]
        )
        return f"""
            MERGE INTO {self.identifier} t
            USING {source_view} s
            ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
            WHEN MATCHED AND {guard} THEN UPDATE SET
              {set_all}
            WHEN NOT MATCHED THEN INSERT ({ins_cols})
              VALUES ({ins_vals})
        """

    # How far back to scan snapshot summaries for the replay-skip
    # marker.  Mirrors LocalCowTable.LEDGER_CAP: a batch older than the
    # window re-merges as a NO-OP anyway (the (ts, lsn) guard rejects
    # every stale event), so a bounded scan is safe.
    MARKER_SCAN = 512

    def _seen(self, batch_id: int, scope: str) -> bool:
        """True if a recent snapshot already carries this (scope,
        batch_id) marker in its SUMMARY.  Summaries — not table
        properties: a table property is commit-level config, never
        surfaced per-snapshot, so a marker stored there could neither
        be scanned per-batch nor be atomic with the data commit."""
        rows = self.spark.sql(
            f"SELECT summary FROM {self.identifier}.snapshots "
            f"ORDER BY committed_at DESC LIMIT {self.MARKER_SCAN}"
        ).collect()
        return any(
            r["summary"].get("dipper.scope") == scope
            and r["summary"].get("dipper.batch_id") == str(batch_id)
            for r in rows
        )

    # Iceberg MERGE commits are optimistic: concurrent writers make the
    # commit fail with ValidationException / CommitFailedException.
    # Mirrors LocalCowTable.COMMIT_RETRIES — re-running the MERGE
    # re-plans against the new current snapshot, and the (ts, lsn)
    # guard keeps a re-planned MERGE correct (LWW is idempotent and
    # order-insensitive across retries).
    COMMIT_RETRIES = 4
    _RETRYABLE = ("CommitFailedException", "ValidationException",
                  "CommitStateUnknownException")

    def merge(self, collapsed: DataFrame, batch_id: int, scope: str = "default") -> None:
        if self._seen(batch_id, scope):
            return
        src_cols = [c for c in collapsed.columns if c != "ts"] + ["ts"]
        collapsed.createOrReplaceTempView("_dipper_src")
        stmt = self.merge_sql(src_cols)
        # Attach the marker to the MERGE's OWN snapshot summary so
        # marker and data commit atomically (a crash can never record
        # an unapplied batch, and a recorded batch is always applied).
        # Spark exposes this via Iceberg's CommitMetadata thread-local;
        # from PySpark it needs the JVM bridge.  ONLY bridge/class
        # acquisition failures fall back to an unmarked MERGE (the
        # skip optimization is lost but correctness stands — a replayed
        # MERGE is a no-op under the (ts, lsn) guard); errors raised by
        # the MERGE itself propagate (ADVICE r4: the old broad except
        # re-ran a failing MERGE unmarked and masked the real error).
        runner = None
        try:
            jvm = self.spark._jvm  # noqa: SLF001 — py4j gateway, documented Iceberg pattern
            # resolve the class FIRST: a missing iceberg runtime fails
            # here, not mid-MERGE
            jvm.java.lang.Class.forName("org.apache.iceberg.spark.CommitMetadata")
            props = jvm.java.util.HashMap()
            props.put("dipper.scope", scope)
            props.put("dipper.batch_id", str(batch_id))

            class _Run:
                def __init__(self, spark, sql):
                    self._spark, self._sql = spark, sql

                def call(self):
                    self._spark.sql(self._sql)

                class Java:
                    implements = ["java.util.concurrent.Callable"]

            cm = jvm.org.apache.iceberg.spark.CommitMetadata
            void = jvm.java.lang.Void._java_lang_class

            def runner():
                cm.withCommitProperties(props, _Run(self.spark, stmt), void)
        except Exception:
            runner = None  # no bridge / no iceberg jar: unmarked MERGE
        self._run_with_commit_retries(
            runner if runner is not None else (lambda: self.spark.sql(stmt)),
            batch_id, scope)

    def _run_with_commit_retries(self, run, batch_id: int, scope: str) -> None:
        """Bounded optimistic-retry wrapper (round 5, VERDICT r4 #8):
        concurrent Iceberg writers surface as retryable commit
        exceptions; anything else propagates on first failure.  Before
        each retry the (scope, batch_id) marker is re-checked — the
        CommitStateUnknown case may have actually committed."""
        last_err: Exception | None = None
        for _attempt in range(self.COMMIT_RETRIES):
            try:
                run()
                return
            except Exception as e:
                if not any(t in str(e) for t in self._RETRYABLE):
                    raise
                last_err = e
                if self._seen(batch_id, scope):
                    return  # unknown-state commit actually landed
        raise last_err

    def snapshot(self) -> DataFrame:
        return (
            self.spark.table(self.identifier)
            .filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
            .drop("_op_ts", "_lsn", "_deleted")
            .orderBy(*KEY_COLUMNS)
        )

    def add_column_sql(self, name: str, dtype: str) -> str:
        """Prod parity for LocalCowTable.add_column: Iceberg ALTER ADD
        is metadata-only with a fresh field id — the same contract the
        local backend implements.  Plain Spark SQL; parses without the
        Iceberg extensions jar (test_iceberg_sql)."""
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(f"invalid column name {name!r}")
        return (f"ALTER TABLE {self.identifier} "
                f"ADD COLUMNS ({name} {dtype})")

    def compute_stats_sql(self, columns: tuple[str, ...] = ("conv_id",)) -> str:
        """Prod parity for LocalCowTable.compute_stats: Iceberg's
        stats procedure writes Puffin blobs (NDV sketches / bloom
        metadata) that planning consults — the catalog-side analog of
        the local manifest blooms.  A `CALL` statement needs the
        Iceberg SQL extensions to PARSE, so unlike the DDL above this
        string is shape-documented only (cannot be parse-validated in
        this sandbox — SURVEY.md §0.3)."""
        cols = ", ".join(f"'{c}'" for c in columns)
        cat = self.identifier.split(".")[0]
        return (f"CALL {cat}.system.compute_table_stats("
                f"table => '{self.identifier}', columns => array({cols}))")
