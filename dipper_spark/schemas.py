"""Canonical schemas for the CDC engine (SURVEY.md §1).

All schemas are declared explicitly — never inferred in the hot path
(file-stream sources require an explicit schema, and inference would
be a full extra pass at 10^10-event scale).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- §1.1 the transcript table (target / canonical state) -----------------
# Spec columns, BASELINE.json input_hint:
#   (conv_id:string, turn_idx:int32, role:string, text:string,
#    tool:string, ts:timestamp)
SPEC_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Engine-managed system columns on the target (SURVEY.md §1.1):
#   _op_ts/_lsn — the (ts, lsn) ordering tuple of the last applied event,
#                 used as the idempotence guard in MERGE (op C10);
#   _deleted    — tombstone flag. Deletes keep a tombstone row so that a
#                 late-arriving event with a smaller (ts, lsn) cannot
#                 resurrect a deleted key; this is what makes the merge
#                 independent of micro-batch boundaries (replay equality
#                 under arbitrary splits). Snapshot reads filter it out.
SYSTEM_COLUMNS = ["_op_ts", "_lsn", "_deleted"]

KEY_COLUMNS = ["conv_id", "turn_idx"]

# --- §1.2 the change-event stream (binlog/WAL tail envelope) ---------------
CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # 'I' | 'U' | 'D'
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("payload", T.StringType(), True),  # JSON envelope
        T.StructField("source", T.StringType(), True),
        T.StructField("source_offset", T.LongType(), True),
    ]
)

# Decoded payload struct used by from_json (op C3).  `tool` and `meta`
# may be absent in early (v1) payloads — from_json null-fills, and the
# schema-evolution path (op C9) decides what lands in the target.
PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType([T.StructField("tokens", T.LongType(), True)]),
            True,
        ),
    ]
)

# --- §1.4 the lineage table -------------------------------------------------
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("offset_min", T.LongType(), True),
        T.StructField("offset_max", T.LongType(), True),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_bad", T.LongType(), True),
        T.StructField("rows_deduped", T.LongType(), True),
        T.StructField("rows_applied", T.LongType(), True),
        T.StructField("inserts", T.LongType(), True),
        T.StructField("updates", T.LongType(), True),
        T.StructField("deletes", T.LongType(), True),
        T.StructField("conflicts", T.LongType(), True),
        T.StructField("late_events", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
    ]
)

# Widening-allowed type promotions for schema evolution (op C9) —
# matches Iceberg's safe promotions (int->long, float->double).
WIDENINGS = {
    ("integer", "long"): True,
    ("float", "double"): True,
    ("integer", "double"): True,
}
