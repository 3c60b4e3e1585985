"""Structured-Streaming ingest — the flagship entry point (SURVEY.md
§3.1, ops C1, C5, C6, C10-C14).

    changelog files (LSN-ordered, append-only)
      -> readStream (explicit schema; file-source offset log = WAL)
      -> [optional] withWatermark + dropDuplicatesWithinWatermark   [C5+C6]
      -> foreachBatch:
           decode_payload -> split_valid -> lww_collapse -> merge   [C3-C10]
           ledger skip on replayed batch_id                         [C11]
           lineage row per batch                                    [C13]

Exactly-once story (BASELINE.json north_star: "idempotent MERGE keyed
on change-LSN with a checkpointed offset log, resumable mid-stream"):
  1. the checkpoint dir write-ahead-logs source offsets per batch;
  2. a replayed batch_id is skipped via the table's embedded ledger
     (committed atomically with the data by the manifest swap);
  3. even a torn batch or out-of-band redelivery re-merges as a no-op
     because the (ts, lsn) guard rejects stale/equal events.
Layers 2-3 mean correctness never depends on the watermark — the
watermark only bounds dedup state (and late counters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.normalize import decode_payload, split_valid_observed
from ..operators.cdc import (
    absent_payload_columns,
    dedup_lsn,
    lww_collapse,
    lww_collapse_slim,
    normalize_winner_text,
    with_watermark,
)
from ..schemas import CHANGELOG_SCHEMA
from ..plans.lineage import emit_lineage, write_dead_letter
from ..plans.target import LocalCowTable, MergeStats


def parse_delay(delay: str):
    """'10 minutes' / '30 seconds' / '1 hour' -> timedelta."""
    from datetime import timedelta

    n, unit = delay.split()
    unit = unit.rstrip("s")
    return timedelta(**{{"second": "seconds", "minute": "minutes", "hour": "hours"}[unit]: int(n)})


def changelog_stream(
    spark: SparkSession,
    log_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Tail an append-only changelog directory (op C1).

    The file source's offset log in the checkpoint is the exactly-once
    WAL; maxFilesPerTrigger bounds batch size (the 10^10-scale knob —
    on Kafka this is maxOffsetsPerTrigger)."""
    r = spark.readStream.schema(CHANGELOG_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(log_path)


def binlog_stream(
    spark: SparkSession,
    log_path: str,
    checkpoint: str,
    max_chunks_per_trigger: int | None = None,
) -> DataFrame:
    """Tail the changelog through the CUSTOM binlog source (op C2) —
    the seekable-broker shape (own offsets via initialOffset/
    latestOffset/commit, not Spark's file listing).  This is the
    literal north-rule path: binlog/WAL tail -> lake upsert, with the
    same foreachBatch merge downstream as the file source.

    pacingDir is pinned inside the checkpoint so a restart under
    maxChunksPerTrigger resumes pacing where it left off instead of
    rewinding (see binlog_source.BinlogStreamReader docstring)."""
    import os

    from .binlog_source import BinlogDataSource

    try:
        spark.dataSource.register(BinlogDataSource)
    except Exception:
        pass  # already registered in this session
    r = spark.readStream.format("dipper_binlog").option("path", log_path)
    if max_chunks_per_trigger:
        r = (r.option("maxChunksPerTrigger", max_chunks_per_trigger)
              .option("pacingDir", os.path.join(checkpoint, "binlog_pacing")))
    return r.load()


def make_batch_applier(table: LocalCowTable, n_salts: int = 8,
                       fail_after: int | None = None, scope: str = "default",
                       collapse: str = "carry", watermark_delay: str = "10 minutes",
                       dead_letter: bool = False):
    """Build the foreachBatch callable.  `fail_after` injects a crash
    after N successful merges (for kill/resume tests).

    Lineage counters (ops C4/C12): a single-pass Observation on the
    decoded batch counts rows_bad and late_events (valid events whose
    ts is older than the previous batches' max event time minus
    `watermark_delay` — informational: the (ts, lsn) merge guard keeps
    late events CORRECT regardless).  With dead_letter=True the
    rejected rows are persisted under <table>/_deadletter/."""
    import uuid as _uuid

    stats_log: list[MergeStats] = []
    from ..operators.cdc import lww_collapse_dictkey, lww_collapse_window

    do_collapse = {"slim": lww_collapse_slim, "dictkey": lww_collapse_dictkey,
                   "window": lww_collapse_window, "carry": lww_collapse}.get(
        collapse, lww_collapse)
    delay = parse_delay(watermark_delay)
    state = {"max_ts": None}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if fail_after is not None and len([s for s in stats_log if not s.skipped]) >= fail_after:
            raise RuntimeError(f"injected failure before batch {batch_id}")
        thr = state["max_ts"] - delay if state["max_ts"] is not None else None
        ok, bad, obs = split_valid_observed(
            decode_payload(batch_df), f"c4_{batch_id}_{_uuid.uuid4().hex[:6]}", thr
        )
        existing = {f.name for f in (table.schema() or [])}
        absent = absent_payload_columns(batch_df, existing)
        pruned = ok.drop(*absent) if absent else ok
        collapsed = normalize_winner_text(do_collapse(pruned, n_salts=n_salts))
        # single_pass=False: the C4 Observation above only fires when
        # the micro-batch subtree is materialized before the write
        st = table.merge(collapsed, batch_id=batch_id, scope=scope, single_pass=False)
        stats_log.append(st)
        if st.skipped:
            return  # no action ran the observed plan; obs.get would block
        m = obs.get
        rows_bad = int(m["rows_bad"] or 0)
        if m["max_ts"] is not None and (state["max_ts"] is None or m["max_ts"] > state["max_ts"]):
            state["max_ts"] = m["max_ts"]
        if dead_letter and rows_bad:
            write_dead_letter(table.root, bad, batch_id)
        emit_lineage(table.root, st, rows_bad=rows_bad,
                     late_events=int(m["late_events"] or 0))

    apply_batch.stats_log = stats_log  # type: ignore[attr-defined]
    return apply_batch


def ingest(
    spark: SparkSession,
    log_path: str,
    table_root: str,
    checkpoint: str,
    n_salts: int = 8,
    n_buckets: int = 32,
    max_files_per_trigger: int | None = None,
    watermark_delay: str = "10 minutes",
    stream_dedup: bool = False,
    available_now: bool = True,
    fail_after: int | None = None,
    collapse: str = "carry",
    dead_letter: bool = False,
    source: str = "file",
    max_chunks_per_trigger: int | None = None,
    changefeed: bool = False,
    time_travel: bool = False,
    write_mode: str = "cow",
) -> tuple[LocalCowTable, "object", list[MergeStats]]:
    """Run the ingest stream; with available_now=True processes the
    current log to completion and returns (table, query, stats).

    collapse='carry' is the measured default in BOTH regimes: r3
    backfill A/B and the r4 220-micro-batch interleaved soak A/B
    (slim/carry = 1.188 per-batch median — BENCH/SOAK.md) both favor
    carry at transcript payload widths; 'slim' stays available for
    genuinely wide (KB+) payloads.  'window' (the round-6 one-exchange
    collapse that wins 2x on BATCH replays) was interleave-A/B'd here
    too and is a WASH at micro-batch scale (20-batch runs: window
    37.1s vs carry 38.9s, per-batch medians 1466 vs 1554 ms, final
    state hash-equal) — micro-batch wall is dominated by the merge
    join + CoW write, not the collapse — so the soak-pinned carry
    default stands for streaming.

    source='file' tails via Spark's file source (op C1);
    source='binlog' tails via the custom DataSource (op C2, own
    offsets, maxChunksPerTrigger/pacingDir) — identical downstream
    pipeline and exactly-once layering either way."""
    table = LocalCowTable.create(spark, table_root, n_buckets=n_buckets,
                                 changefeed=changefeed,
                                 time_travel=time_travel,
                                 write_mode=write_mode)
    if source == "binlog":
        stream = binlog_stream(spark, log_path, checkpoint, max_chunks_per_trigger)
    else:
        stream = changelog_stream(spark, log_path, max_files_per_trigger)
    if stream_dedup:
        # cross-micro-batch exact dedup; state bounded by the watermark
        stream = dedup_lsn(with_watermark(stream, watermark_delay), streaming=True)
    # ledger scope = checkpoint path: batch ids are only unique per
    # checkpoint; a fresh checkpoint must not collide with an old run.
    applier = make_batch_applier(table, n_salts=n_salts, fail_after=fail_after,
                                 scope=checkpoint, collapse=collapse,
                                 watermark_delay=watermark_delay, dead_letter=dead_letter)
    writer = (
        stream.writeStream.foreachBatch(applier)
        .option("checkpointLocation", checkpoint)
        .queryName("dipper_ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return table, query, applier.stats_log
