"""Envelope decode + payload normalization — vectorized only (op C3/C4).

Spec mandate (BASELINE.json input_hint): "all parsing/normalization of
transcript payloads runs through vectorized Arrow/pandas UDFs — no
per-row Python".  Structure parsing uses `from_json` (JVM-side,
whole-stage-codegen'd); label columns (role/tool, machine vocab) are
canonicalized with JVM `btrim`; free text goes through the Arrow-
batched pandas UDF below (pd.Series-vectorized, NFC fast path).

Hot-path placement (perf-measured): the text UDF is applied AFTER the
LWW collapse, on winners only (operators.cdc.normalize_winner_text) —
normalization cannot change which event wins (ordering is (ts, lsn)),
so normalizing losers is wasted Python.  At 10^10 events with ~2.3x
collapse this saves >half the Python-boundary traffic.

The text normalization must agree EXACTLY with
dipper_spark.testkit.gen.normalize_text (NFC + strip); the oracle
applies the same function row-wise and replay-equality tests enforce
the agreement.  Labels use space-trim on both sides.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..schemas import PAYLOAD_SCHEMA

VALID_OPS = ("I", "U", "D")


@pandas_udf(StringType())
def nfc_strip(s: pd.Series) -> pd.Series:
    """Vectorized text normalization: Unicode NFC + strip edges.

    `unicodedata.is_normalized` is a C-level constant-time check for
    already-NFC (incl. all-ASCII) strings, so the common case skips the
    full normalization pass."""

    def _n(x):
        if x is None:
            return None
        if not unicodedata.is_normalized("NFC", x):
            x = unicodedata.normalize("NFC", x)
        return x.strip()

    return s.map(_n, na_action="ignore")


def decode_payload(df: DataFrame, payload_schema=PAYLOAD_SCHEMA) -> DataFrame:
    """Parse the JSON `payload` envelope column into typed columns.

    Emits all envelope columns minus `payload`, plus role/tool
    (btrim-canonicalized), raw `text` (normalized later, post-collapse),
    and meta_tokens (long).  Malformed JSON yields a null struct ->
    routed to `bad` by split_valid.  Deletes legitimately carry a null
    payload.  This projection is UDF-free, so probes/filters over it
    never cross the Python boundary.
    """
    # PERMISSIVE from_json yields an all-null struct (not a null) for
    # malformed input, so corruption is detected via the dedicated
    # corrupt-record field — `_p` null-checks alone would miss garbage
    # payloads on deletes (text may legitimately be null there).
    from pyspark.sql.types import StructField, StructType

    schema_c = StructType(list(payload_schema.fields) + [StructField("_corrupt", StringType(), True)])
    p = F.from_json(F.col("payload"), schema_c, {"columnNameOfCorruptRecord": "_corrupt"}).alias("_p")
    return df.withColumn("_p", p).select(
        "lsn",
        "op",
        "ts",
        "conv_id",
        # turn_idx is int32 on the wire (input_hint) but canonically
        # LONG from here on: the target's key-hash bucket assignment
        # must be stable if a producer widens the envelope to int64
        # later (Iceberg's bucket transform hashes int and long
        # identically for exactly this reason — here both the bucket fn
        # and every shuffle hash the same 8-byte value).
        F.col("turn_idx").cast("long").alias("turn_idx"),
        "source",
        "source_offset",
        F.btrim(F.col("_p.role")).alias("role"),
        F.col("_p.text").alias("text"),
        F.btrim(F.col("_p.tool")).alias("tool"),
        F.col("_p.meta.tokens").alias("meta_tokens"),
        (
            F.col("payload").isNotNull()
            & (F.col("_p").isNull() | F.col("_p._corrupt").isNotNull())
        ).alias("_malformed"),
    )


def valid_condition() -> Column:
    """The op-C4 validity predicate over a decoded frame: key, lsn, ts
    present, op one of I/U/D, payload parsed, text present for
    non-deletes.  Deterministic so full-log replay is exactly
    reproducible (BASELINE.json north_star)."""
    return (
        F.col("conv_id").isNotNull()
        & F.col("turn_idx").isNotNull()
        & F.col("lsn").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("op").isin(*VALID_OPS)
        & (~F.col("_malformed"))
        & ((F.col("op") == "D") | F.col("text").isNotNull())
    )


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Validity filter / bad-record routing (op C4).

    Returns (ok, bad); `bad` keeps its columns for the dead-letter
    sink (plans.lineage.write_dead_letter) and is counted into lineage
    `rows_bad` via an Observation piggybacked on the merge job.
    """
    is_valid = valid_condition()
    ok = df.filter(is_valid).drop("_malformed")
    bad = df.filter(~is_valid).drop("_malformed")
    return ok, bad


def split_valid_observed(df: DataFrame, name: str, late_threshold=None):
    """split_valid + a single-pass Observation counting C4/C12 lineage
    metrics — rows_bad, late_events (valid events older than the
    caller's watermark threshold), and the batch's max event time (the
    next batch's watermark input).  The metrics ride the merge job that
    executes this subtree: no second pass over the batch.

    Returns (ok, bad, observation); read `observation.get` only after
    an action ran the plan (a ledger-skipped batch never fires it).
    """
    from pyspark.sql import Observation

    flagged = df.withColumn("_valid", valid_condition())
    obs = Observation(name)
    late = (
        (F.col("_valid") & (F.col("ts") < F.lit(late_threshold))).cast("long")
        if late_threshold is not None
        else F.lit(0)
    )
    flagged = flagged.observe(
        obs,
        F.sum((~F.col("_valid")).cast("long")).alias("rows_bad"),
        F.sum(late).alias("late_events"),
        F.max(F.when(F.col("_valid"), F.col("ts"))).alias("max_ts"),
    )
    ok = flagged.filter(F.col("_valid")).drop("_valid", "_malformed")
    # bad branches off the UN-observed frame: the dead-letter write is
    # its own action, and an Observation must fire exactly once
    bad = df.filter(~valid_condition())
    return ok, bad, obs
