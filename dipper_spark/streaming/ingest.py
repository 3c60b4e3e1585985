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

from ..functions.normalize import decode_payload, split_valid
from ..operators.cdc import (
    absent_payload_columns,
    dedup_lsn,
    lww_collapse,
    normalize_winner_text,
    with_watermark,
)
from ..schemas import CHANGELOG_SCHEMA
from ..plans.lineage import emit_lineage
from ..plans.target import LocalCowTable, MergeStats


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


def make_batch_applier(table: LocalCowTable, n_salts: int = 8,
                       fail_after: int | None = None, scope: str = "default"):
    """Build the foreachBatch callable.  `fail_after` injects a crash
    after N successful merges (for kill/resume tests)."""
    stats_log: list[MergeStats] = []

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if fail_after is not None and len([s for s in stats_log if not s.skipped]) >= fail_after:
            raise RuntimeError(f"injected failure before batch {batch_id}")
        ok, bad = split_valid(decode_payload(batch_df))
        existing = {f.name for f in (table.schema() or [])}
        absent = absent_payload_columns(batch_df, existing)
        pruned = ok.drop(*absent) if absent else ok
        # merge() persists the net-changes internally (bounded: <= one
        # row per key), which both avoids recomputing the pipeline per
        # consumer and keeps Observation metrics working on micro-batch
        # plans with stateful nodes (dropDuplicatesWithinWatermark).
        collapsed = normalize_winner_text(lww_collapse(pruned, n_salts=n_salts))
        st = table.merge(collapsed, batch_id=batch_id, scope=scope)
        stats_log.append(st)
        if not st.skipped:
            emit_lineage(table.root, st)

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
) -> tuple[LocalCowTable, "object", list[MergeStats]]:
    """Run the ingest stream; with available_now=True processes the
    current log to completion and returns (table, query, stats)."""
    table = LocalCowTable.create(spark, table_root, n_buckets=n_buckets)
    stream = changelog_stream(spark, log_path, max_files_per_trigger)
    if stream_dedup:
        # cross-micro-batch exact dedup; state bounded by the watermark
        stream = dedup_lsn(with_watermark(stream, watermark_delay), streaming=True)
    # ledger scope = checkpoint path: batch ids are only unique per
    # checkpoint; a fresh checkpoint must not collide with an old run.
    applier = make_batch_applier(table, n_salts=n_salts, fail_after=fail_after, scope=checkpoint)
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
