"""Schema evolution (SURVEY.md §5.4, op C9; BASELINE.json: "added
tool/metadata columns, type widening ... handled by schema merge on
write").

v1 payloads ({role, text}) create a target WITHOUT tool/meta columns;
the first v2 batch ADDs them (old rows null-filled); a widened
envelope (turn_idx int64) promotes the column type; narrowing /
incompatible changes are rejected with a clear error.
"""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import LocalCowTable, SchemaEvolutionError
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog, gen_logical_log, to_envelope
from dipper_spark.testkit.oracle import apply_log_pandas

from tests.test_replay_equality import _assert_equal


def test_v1_then_v2_adds_columns(spark, tmp_path):
    spec = ChangelogSpec(seed=31, n_conv=60, extra_rate=1.0, evolution_lsn_frac=0.5,
                         shuffle_window=5)
    log_dir, tbl = str(tmp_path / "log"), str(tmp_path / "tbl")
    logical, man = gen_changelog(log_dir, spec)
    n = man["n_events"]

    # chunked by lsn: the first chunk is v1-only -> no tool/meta columns
    table, stats = replay(spark, log_dir, tbl, chunk_lsn=n // 4 + 1)
    schema_names = [f.name for f in table.schema().fields]
    assert "tool" in schema_names and "meta_tokens" in schema_names
    _assert_equal(table.snapshot().toPandas(), apply_log_pandas(logical))


def test_v1_only_has_no_tool_column(spark, tmp_path):
    spec = ChangelogSpec(seed=32, n_conv=30, extra_rate=0.5, evolution_lsn_frac=1.1)
    log_dir, tbl = str(tmp_path / "log"), str(tmp_path / "tbl")
    logical, _ = gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, tbl)
    names = [f.name for f in table.schema().fields]
    assert "tool" not in names and "meta_tokens" not in names
    snap = table.snapshot().toPandas()
    oracle = apply_log_pandas(logical)
    # spec columns minus the never-seen ones
    assert list(snap.columns) == ["conv_id", "turn_idx", "role", "text", "ts"]
    for c in ["conv_id", "turn_idx", "role", "text"]:
        assert snap[c].tolist() == oracle[c].tolist()


def test_type_widening_and_wide_key_envelope(spark, tmp_path):
    """int->long widening of a DATA column (meta_tokens: a v1 producer
    declared the field int32; a later producer widens it), plus a
    WIDER-KEY envelope (turn_idx int64 on the wire): the key is
    canonically long in the engine, so a widened key envelope merges
    into the same buckets — assignment is type-stable by construction
    (target._bucket_expr hashes the long form, like Iceberg's bucket
    transform)."""
    import pyspark.sql.types as T

    from dipper_spark.functions.normalize import decode_payload, split_valid
    from dipper_spark.operators.cdc import lww_collapse, normalize_winner_text
    from dipper_spark.schemas import CHANGELOG_SCHEMA, PAYLOAD_SCHEMA

    spec = ChangelogSpec(seed=33, n_conv=40, extra_rate=0.8)
    log_dir, tbl = str(tmp_path / "log"), str(tmp_path / "tbl")
    logical, _ = gen_changelog(log_dir, spec)

    # batch 1: decode with a NARROW payload schema -> meta_tokens int32
    narrow = T.StructType([
        f if f.name != "meta"
        else T.StructField("meta", T.StructType([T.StructField("tokens", T.IntegerType(), True)]), True)
        for f in PAYLOAD_SCHEMA.fields
    ])
    table = LocalCowTable.create(spark, tbl)
    raw1 = spark.read.schema(CHANGELOG_SCHEMA).parquet(log_dir)
    ok1, _ = split_valid(decode_payload(raw1, payload_schema=narrow))
    table.merge(normalize_winner_text(lww_collapse(ok1)), batch_id=0, scope="widen")
    assert table.schema()["meta_tokens"].dataType.typeName() == "integer"
    assert table.schema()["turn_idx"].dataType.typeName() == "long"  # canonical key

    # batch 2: standard (long) payload schema AND a turn_idx-int64
    # envelope — a producer that widened the key column on the wire
    spec2 = ChangelogSpec(seed=34, n_conv=40, extra_rate=0.8)
    logical2 = gen_logical_log(spec2)
    logical2["lsn"] = logical2["lsn"] + 1_000_000  # disjoint, later LSN range
    logical2["ts"] = logical2["ts"] + pd.Timedelta(days=365)
    env = to_envelope(logical2)
    wide_dir = str(tmp_path / "log_wide")
    import os
    os.makedirs(wide_dir, exist_ok=True)
    from dipper_spark.testkit.gen import ENVELOPE_ARROW_SCHEMA
    wide_arrow = pa.schema(
        [f if f.name != "turn_idx" else pa.field("turn_idx", pa.int64())
         for f in ENVELOPE_ARROW_SCHEMA]
    )
    tbl2 = pa.Table.from_pandas(env, schema=wide_arrow, preserve_index=False)
    pq.write_table(tbl2, wide_dir + "/chunk_00000.parquet")

    wide_schema = T.StructType([
        f if f.name != "turn_idx" else T.StructField("turn_idx", T.LongType(), False)
        for f in CHANGELOG_SCHEMA.fields
    ])
    raw = spark.read.schema(wide_schema).parquet(wide_dir)
    ok, _ = split_valid(decode_payload(raw))
    st = table.merge(normalize_winner_text(lww_collapse(ok)), batch_id=99, scope="widen")
    assert st.rows_applied > 0
    assert table.schema()["meta_tokens"].dataType.typeName() == "long"  # widened

    # combined final state still equals the oracle over both logs
    both = pd.concat([logical.assign(pv=2), logical2.assign(pv=2)], ignore_index=True)
    oracle = apply_log_pandas(both)
    snap = table.snapshot().toPandas()
    assert len(snap) == len(oracle)
    assert snap["text"].tolist() == oracle["text"].tolist()


def test_incompatible_change_rejected(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    table = LocalCowTable.create(spark, tbl)
    from datetime import datetime
    base = spark.createDataFrame(
        [("c1", 0, "user", "hello", None, None, 1, datetime(2026, 1, 1), 1, 1, False)],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "meta_tokens long, lsn long, ts timestamp, n_events long, n_unique long, is_delete boolean",
    )
    table.merge(base, batch_id=0, scope="t")
    bad = base.withColumn("meta_tokens", F.lit("not-a-number"))
    with pytest.raises(SchemaEvolutionError, match="meta_tokens"):
        table.merge(bad, batch_id=1, scope="t")


def test_streaming_evolution_v1_then_v2(spark, tmp_path):
    """Schema evolution through the STREAMING path: v1-era chunks (no
    tool/meta) arrive first (maxFilesPerTrigger=1 keeps them in their
    own micro-batches), v2 chunks later; the target ADDs the columns
    mid-stream and the final state equals the oracle."""
    from dipper_spark.streaming.ingest import ingest

    spec = ChangelogSpec(seed=35, n_conv=50, extra_rate=1.0, evolution_lsn_frac=0.5,
                         shuffle_window=5, n_chunks=4)
    log_dir, tbl = str(tmp_path / "log"), str(tmp_path / "tbl")
    logical, _ = gen_changelog(log_dir, spec)

    table, query, stats = ingest(spark, log_dir, tbl, str(tmp_path / "ckpt"),
                                 max_files_per_trigger=1)
    names = [f.name for f in table.schema().fields]
    assert "tool" in names and "meta_tokens" in names
    _assert_equal(table.snapshot().toPandas(), apply_log_pandas(logical))
