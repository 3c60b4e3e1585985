"""Envelope decode + payload normalization — vectorized only (op C3/C4).

Spec mandate (BASELINE.json input_hint): "all parsing/normalization of
transcript payloads runs through vectorized Arrow/pandas UDFs — no
per-row Python".  Structure parsing uses `from_json` (JVM-side,
whole-stage-codegen'd); the only Python in the data plane is the
Arrow-batched pandas UDF below, and it is pd.Series-vectorized.

The normalization (Unicode NFC + strip) must agree EXACTLY with
dipper_spark.testkit.gen.normalize_text — the oracle applies the same
function row-wise; replay-equality tests enforce the agreement.
"""

from __future__ import annotations

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

    pd.Series.str ops are the vectorized path; Arrow moves batches.
    """
    return s.str.normalize("NFC").str.strip()


def decode_payload(df: DataFrame, payload_schema=PAYLOAD_SCHEMA) -> DataFrame:
    """Parse the JSON `payload` envelope column into typed columns and
    normalize the text-bearing ones.

    Emits: all envelope columns minus `payload`, plus
    role/text/tool (normalized strings) and meta_tokens (long).
    Malformed JSON yields a null struct -> routed to `bad` by
    split_valid.  Delete events legitimately carry a null payload.
    """
    p = F.from_json(F.col("payload"), payload_schema).alias("_p")
    out = df.withColumn("_p", p).select(
        "lsn",
        "op",
        "ts",
        "conv_id",
        "turn_idx",
        "source",
        "source_offset",
        nfc_strip(F.col("_p.role")).alias("role"),
        nfc_strip(F.col("_p.text")).alias("text"),
        nfc_strip(F.col("_p.tool")).alias("tool"),
        F.col("_p.meta.tokens").alias("meta_tokens"),
        (F.col("payload").isNotNull() & F.col("_p").isNull()).alias("_malformed"),
    )
    return out


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Validity filter / bad-record routing (op C4).

    A row is valid iff the key, lsn, ts are present, op is one of
    I/U/D, and (for non-deletes) the payload parsed.  Returns
    (ok, bad); `bad` keeps the raw columns for a dead-letter sink.
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
