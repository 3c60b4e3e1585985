"""Batch backfill / full replay (SURVEY.md op C15) — the benchmark path.

Applies an entire changelog directory to a target table with the same
kernel the streaming path uses per micro-batch:

    scan (explicit schema, parquet)            -- no inference pass
      -> decode_payload (from_json + Arrow UDF normalize)   [C3]
      -> split_valid                                        [C4]
      -> lww_collapse (salted two-stage argmax)             [C6-C8]
      -> LocalCowTable.merge (CoW, (ts,lsn)-guarded)        [C9-C11]

The whole replay is ONE Spark job chain: scan -> shuffle(key,salt) ->
shuffle(key) -> join target -> write.  Duplicates need no separate
dedup shuffle (see operators.cdc docstring).  `chunk_lsn` optionally
splits the log into LSN ranges applied as separate batches — this
exercises the multi-batch/idempotence path and bounds per-batch memory
for very large backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.normalize import decode_payload, split_valid
from ..operators.cdc import absent_payload_columns, lww_collapse, normalize_winner_text
from ..schemas import CHANGELOG_SCHEMA
from .lineage import emit_lineage
from .target import LocalCowTable, MergeStats


def read_changelog(spark: SparkSession, log_path: str) -> DataFrame:
    return spark.read.schema(CHANGELOG_SCHEMA).parquet(log_path)


def replay(
    spark: SparkSession,
    log_path: str,
    table_root: str,
    n_salts: int = 8,
    n_buckets: int = 32,
    chunk_lsn: int | None = None,
    lineage: bool = True,
) -> tuple[LocalCowTable, list[MergeStats]]:
    """Replay the full log; returns (table, per-batch merge stats)."""
    table = LocalCowTable.create(spark, table_root, n_buckets=n_buckets)
    raw = read_changelog(spark, log_path)
    decoded = decode_payload(raw)
    ok, bad = split_valid(decoded)

    ranges: list[tuple[int | None, int | None]]
    if chunk_lsn:
        hi = raw.agg(F.max("lsn")).first()[0] or 0
        ranges = [(lo, min(lo + chunk_lsn - 1, hi)) for lo in range(1, hi + 1, chunk_lsn)]
    else:
        ranges = [(None, None)]

    stats_all: list[MergeStats] = []
    for bid, (lo, hi) in enumerate(ranges):
        raw_part = raw if lo is None else raw.filter((F.col("lsn") >= lo) & (F.col("lsn") <= hi))
        part = ok if lo is None else ok.filter((F.col("lsn") >= lo) & (F.col("lsn") <= hi))
        # Evolution probe: one substring scan over raw payloads (no JSON
        # parse), and only while a candidate column is missing from the
        # target; then one single-pass collapse -> normalize -> merge.
        existing = {f.name for f in (table.schema() or [])}
        absent = absent_payload_columns(raw_part, existing)
        collapsed = normalize_winner_text(lww_collapse(part.drop(*absent) if absent else part, n_salts=n_salts))
        st = table.merge(collapsed, batch_id=bid, scope=f"replay:{log_path}")
        if lineage and not st.skipped:
            emit_lineage(table_root, st)
        stats_all.append(st)
    return table, stats_all
