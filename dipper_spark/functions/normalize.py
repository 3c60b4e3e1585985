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
    p = F.from_json(F.col("payload"), payload_schema).alias("_p")
    return df.withColumn("_p", p).select(
        "lsn",
        "op",
        "ts",
        "conv_id",
        "turn_idx",
        "source",
        "source_offset",
        F.btrim(F.col("_p.role")).alias("role"),
        F.col("_p.text").alias("text"),
        F.btrim(F.col("_p.tool")).alias("tool"),
        F.col("_p.meta.tokens").alias("meta_tokens"),
        (F.col("payload").isNotNull() & F.col("_p").isNull()).alias("_malformed"),
    )


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Validity filter / bad-record routing (op C4).

    A row is valid iff the key, lsn, ts are present, op is one of
    I/U/D, and (for non-deletes) the payload parsed with a text.
    Returns (ok, bad); `bad` keeps its columns for a dead-letter sink.
    Determinism requirement: garbage handling must be deterministic so
    full-log replay is exactly reproducible (BASELINE.json north_star).
    """
    is_valid: Column = (
        F.col("conv_id").isNotNull()
        & F.col("turn_idx").isNotNull()
        & F.col("lsn").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("op").isin(*VALID_OPS)
        & (~F.col("_malformed"))
        & ((F.col("op") == "D") | F.col("text").isNotNull())
    )
    ok = df.filter(is_valid).drop("_malformed")
    bad = df.filter(~is_valid).drop("_malformed")
    return ok, bad
