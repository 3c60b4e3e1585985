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

from ..functions.normalize import decode_payload, split_valid_observed
from ..operators.cdc import (
    absent_payload_columns,
    lww_collapse,
    lww_collapse_dictkey,
    lww_collapse_slim,
    lww_collapse_window,
    normalize_winner_text,
)
from ..schemas import CHANGELOG_SCHEMA
from .lineage import emit_lineage, write_dead_letter
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
    collapse: str = "window",
    watermark_delay: str = "10 minutes",
    dead_letter: bool = False,
    changefeed: bool = False,
    time_travel: bool = False,
    write_mode: str = "cow",
) -> tuple[LocalCowTable, list[MergeStats]]:
    """Replay the full log; returns (table, per-batch merge stats).

    collapse='window' (default since round 6) runs the one-exchange
    window collapse (operators.cdc.lww_collapse_window): identical
    output to the salted two-phase groupBy via Exchange(key) + Sort +
    two linear window passes instead of THREE exchanges + six
    SortAggregates (max_by over a struct value is not hash-aggregable
    and count_distinct adds an exchange level — see
    plans/r06/cdc_collapse_{before,after}.txt and OPTIMIZATION_r06.md
    for the A/B numbers).  'carry' is the salted two-phase plan — use
    it for logs with a single degenerate hot key beyond the window
    variant's skew envelope (all rows of one key land on one reducer
    there).  'slim' shuffles only (key, ts, lsn) tuples and semi-joins
    winner payloads back — the choice for KB-wide payloads.  'dictkey'
    hashes the phase-1 group key to a 128-bit pair — measured-wash A/B
    variant."""
    import uuid as _uuid

    from ..streaming.ingest import parse_delay

    table = LocalCowTable.create(spark, table_root, n_buckets=n_buckets,
                                 changefeed=changefeed,
                                 time_travel=time_travel,
                                 write_mode=write_mode)
    raw = read_changelog(spark, log_path)
    decoded = decode_payload(raw)
    if not lineage:
        # source/source_offset exist ONLY to feed lineage offset stats
        # (target._NON_DATA excludes them from the table) — with
        # lineage off they are dead weight through BOTH collapse
        # shuffles and the merge join (~15 of ~70 payload bytes per
        # record at transcript widths).  Trim before the collapse.
        decoded = decoded.drop("source", "source_offset")
    if collapse == "window":
        # lineage off => nobody reads n_events/n_unique: skip the
        # counting window pass (operators.cdc.lww_collapse_window).
        def do_collapse(df, n_salts):
            return lww_collapse_window(df, n_salts=n_salts, counters=lineage)
    else:
        do_collapse = {"slim": lww_collapse_slim,
                       "dictkey": lww_collapse_dictkey}.get(collapse, lww_collapse)
    delay = parse_delay(watermark_delay)
    max_ts = None

    ranges: list[tuple[int | None, int | None]]
    if chunk_lsn:
        # range starts at the ACTUAL min lsn: real changelogs may be
        # 0-based or arbitrary; starting at 1 silently drops lsn <= 0
        bounds = raw.agg(F.min("lsn").alias("lo"), F.max("lsn").alias("hi")).first()
        lo0, hi = bounds["lo"], bounds["hi"]
        if lo0 is None:
            ranges = [(None, None)]
        else:
            ranges = [(lo, min(lo + chunk_lsn - 1, hi)) for lo in range(lo0, hi + 1, chunk_lsn)]
    else:
        ranges = [(None, None)]

    stats_all: list[MergeStats] = []
    for bid, (lo, hi) in enumerate(ranges):
        raw_part = raw if lo is None else raw.filter((F.col("lsn") >= lo) & (F.col("lsn") <= hi))
        dec_part = decoded if lo is None else decoded.filter((F.col("lsn") >= lo) & (F.col("lsn") <= hi))
        thr = max_ts - delay if max_ts is not None else None
        ok, bad, obs = split_valid_observed(dec_part, f"c4r_{bid}_{_uuid.uuid4().hex[:6]}", thr)
        # Evolution probe: one substring scan over raw payloads (no JSON
        # parse), and only while a candidate column is missing from the
        # target; then one single-pass collapse -> normalize -> merge.
        existing = {f.name for f in (table.schema() or [])}
        absent = absent_payload_columns(raw_part, existing)
        collapsed = normalize_winner_text(do_collapse(ok.drop(*absent) if absent else ok, n_salts=n_salts))
        st = table.merge(collapsed, batch_id=bid, scope=f"replay:{log_path}")
        if not st.skipped:
            m = obs.get
            if m["max_ts"] is not None and (max_ts is None or m["max_ts"] > max_ts):
                max_ts = m["max_ts"]
            rows_bad = int(m["rows_bad"] or 0)
            if dead_letter and rows_bad:
                write_dead_letter(table_root, bad, bid)
            if lineage:
                emit_lineage(table_root, st, rows_bad=rows_bad,
                             late_events=int(m["late_events"] or 0))
        stats_all.append(st)
    return table, stats_all
