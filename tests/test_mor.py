"""Merge-on-read write mode (round 5).

MoR merges APPEND per-bucket delta files instead of rewriting touched
buckets; reads resolve base ∪ deltas with the same LWW (ts, lsn) rule
the CoW join applies at write time (ties prefer the earlier commit —
CoW's strict "target wins ties" guard).  compact() folds deltas back
into base.  The invariant under test everywhere: a chunked MoR replay
of a corrupted delivery equals the pandas oracle AND the CoW replay of
the same log, before and after compaction.
"""

import threading

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import (
    ConstraintViolation,
    LocalCowTable,
)
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import SPEC_COLUMNS, apply_log_pandas, state_hash


def _assert_equal(engine_df: pd.DataFrame, oracle_df: pd.DataFrame):
    e = engine_df.reset_index(drop=True).copy()
    o = oracle_df.reset_index(drop=True)
    for c in SPEC_COLUMNS:
        if c not in e.columns:
            e[c] = None
    assert len(e) == len(o), f"row count {len(e)} != oracle {len(o)}"
    for c in SPEC_COLUMNS:
        le, lo = e[c].tolist(), o[c].tolist()
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(le, lo))
               if (a != b and not (pd.isna(a) and pd.isna(b)))]
        assert not bad, f"column {c}: first mismatches {bad[:5]}"


def test_mor_chunked_replay_matches_oracle_and_cow(spark, tmp_path):
    """The headline invariant: chunked MoR replay == pandas oracle ==
    CoW replay; deltas exist before compact, none after, snapshot
    unchanged by compaction."""
    spec = ChangelogSpec(seed=3, n_conv=60, extra_rate=1.5, max_disorder_s=86400)
    log_dir = str(tmp_path / "log")
    logical, _ = gen_changelog(log_dir, spec)
    oracle = apply_log_pandas(logical)

    mor, stats = replay(spark, log_dir, str(tmp_path / "mor"),
                        chunk_lsn=150, write_mode="mor")
    cow, _ = replay(spark, log_dir, str(tmp_path / "cow"), chunk_lsn=150)
    assert len(stats) > 2
    # first chunk hit the fresh single-pass backfill (base files);
    # later chunks appended deltas
    assert mor.delta_file_count() > 0
    snap = mor.snapshot().toPandas()
    _assert_equal(snap, oracle)
    assert state_hash(snap) == state_hash(cow.snapshot().toPandas())

    mor.compact()
    assert mor.delta_file_count() == 0
    _assert_equal(mor.snapshot().toPandas(), oracle)


def test_mor_merge_appends_without_rewriting_base(spark, tmp_path):
    """The point of MoR: a merge must not touch existing base files."""
    spec = ChangelogSpec(seed=9, n_conv=40, extra_rate=1.0)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "t"),
                      chunk_lsn=10_000_000, write_mode="mor")
    man_before = table._load()
    base_before = dict(man_before["buckets"])

    df = spark.createDataFrame(
        [("convX", 0, "user", "hello", None)],
        "conv_id string, turn_idx long, role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    table.upsert(df)
    man_after = table._load()
    assert man_after["buckets"] == base_before  # base untouched
    assert table.delta_file_count() == 1
    got = table.lookup("convX", 0).toPandas()
    assert len(got) == 1 and got["text"][0] == "hello"


def test_mor_idempotent_rerun_and_tombstones(spark, tmp_path):
    """Re-running the replay (same scope+batch ids) is a ledger no-op;
    deletes tombstone and a staler event can never resurrect them."""
    spec = ChangelogSpec(seed=5, n_conv=40, extra_rate=1.0)
    log_dir = str(tmp_path / "log")
    logical, _ = gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "t"),
                      chunk_lsn=200, write_mode="mor")
    n1 = table.delta_file_count()
    table2, s2 = replay(spark, log_dir, str(tmp_path / "t"),
                        chunk_lsn=200, write_mode="mor")
    assert all(s.skipped for s in s2)
    assert table2.delta_file_count() == n1  # nothing re-appended
    _assert_equal(table2.snapshot().toPandas(), apply_log_pandas(logical))


def test_mor_stale_append_never_wins(spark, tmp_path):
    """A re-delivered STALE event (older ts/lsn, different payload)
    appended after the fact must lose read-time resolution — parity
    with the CoW (ts, lsn) strict guard."""
    t = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=4,
                             write_mode="mor")

    def frame(text, ts, lsn):
        return (spark.createDataFrame(
            [("c1", 0, "user", text, None)],
            "conv_id string, turn_idx long, role string, text string, tool string")
            .withColumn("ts", F.to_timestamp(F.lit(ts)))
            .withColumn("lsn", F.lit(lsn).cast("long"))
            .withColumn("is_delete", F.lit(False))
            .withColumn("n_events", F.lit(1).cast("long"))
            .withColumn("n_unique", F.lit(1).cast("long")))

    t.merge(frame("new", "2026-01-02 00:00:00", 20), batch_id=0, scope="s")
    t.merge(frame("stale", "2026-01-01 00:00:00", 10), batch_id=1, scope="s")
    got = t.lookup("c1", 0).toPandas()
    assert got["text"].tolist() == ["new"]
    # equal (ts, lsn) tie: the EARLIER commit keeps winning
    t.merge(frame("tied-later", "2026-01-02 00:00:00", 20), batch_id=2, scope="s")
    assert t.lookup("c1", 0).toPandas()["text"].tolist() == ["new"]


def test_mor_schema_evolution_add_column(spark, tmp_path):
    """A delta batch ADDing a column: old base/delta files read as
    null, new winner carries the value (same C9 rule as CoW)."""
    t = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=4,
                             write_mode="mor")
    base = spark.createDataFrame(
        [("c1", 0, "user", "hi", None)],
        "conv_id string, turn_idx long, role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    t.upsert(base)
    widened = (spark.createDataFrame(
        [("c1", 1, "assistant", "yo", None, "meta1")],
        "conv_id string, turn_idx long, role string, text string, tool string, extra string")
        .withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:01:00"))))
    t.upsert(widened)
    snap = t.read(include_system=False).orderBy("turn_idx").toPandas()
    assert snap["extra"].tolist() == [None, "meta1"]
    t.compact()
    snap2 = t.read(include_system=False).orderBy("turn_idx").toPandas()
    assert snap2["extra"].tolist() == [None, "meta1"]


def test_mor_concurrent_writers_both_land(spark, tmp_path):
    """Append-only commits commute: two concurrent MoR upserts on
    DIFFERENT keys must both land with no CommitConflict and no lost
    update (CoW writers to the same buckets would conflict+retry)."""
    t = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=4,
                             write_mode="mor")
    seed = spark.createDataFrame(
        [("c0", 0, "user", "seed", None)],
        "conv_id string, turn_idx long, role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    t.upsert(seed)

    errs = []

    def write(i):
        try:
            df = spark.createDataFrame(
                [(f"w{i}", 0, "user", f"text{i}", None)],
                "conv_id string, turn_idx long, role string, text string, tool string",
            ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 01:00:00")))
            t.upsert(df)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [threading.Thread(target=write, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    snap = t.snapshot().toPandas()
    assert set(snap["conv_id"]) == {"c0", "w0", "w1", "w2", "w3"}
    # batch ids allocated under the lock: unique per scope
    ids = [e["batch_id"] for e in t.ledger() if e["scope"] == "api"]
    assert len(ids) == len(set(ids)) == 5


def test_mor_constraints_enforce_and_quarantine(spark, tmp_path):
    t = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=4,
                             write_mode="mor")
    seed = spark.createDataFrame(
        [("c0", 0, "user", "seed", None)],
        "conv_id string, turn_idx long, role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    t.upsert(seed)
    t.add_check_constraint("turn_nonneg", "turn_idx >= 0")
    bad = spark.createDataFrame(
        [("c1", -1, "user", "bad", None)],
        "conv_id string, turn_idx long, role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:01:00")))
    with pytest.raises(ConstraintViolation):
        t.upsert(bad)
    assert t.delta_file_count() == 0  # nothing committed
    t.drop_check_constraint("turn_nonneg")
    t.add_check_constraint("turn_nonneg", "turn_idx >= 0", mode="quarantine")
    mixed = spark.createDataFrame(
        [("c1", -1, "user", "bad", None), ("c2", 2, "user", "good", None)],
        "conv_id string, turn_idx long, role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:02:00")))
    st = t.upsert(mixed)
    assert st.rows_quarantined == 1
    snap = t.snapshot().toPandas()
    assert set(snap["conv_id"]) == {"c0", "c2"}
    assert t.quarantined().count() == 1


def test_mode_switch_cow_merge_folds_deltas(spark, tmp_path):
    """mor -> cow switch: the next CoW merge reads touched buckets
    RESOLVED and clears their delta entries atomically."""
    spec = ChangelogSpec(seed=17, n_conv=30, extra_rate=1.0)
    log_dir = str(tmp_path / "log")
    logical, _ = gen_changelog(log_dir, spec)
    t, _ = replay(spark, log_dir, str(tmp_path / "t"),
                  chunk_lsn=120, write_mode="mor")
    assert t.delta_file_count() > 0
    t.set_write_mode("cow")
    # full-table CoW pass: upsert a fresh row per bucket via compact-free
    # route — delete_where(False) touches nothing, so use an upsert that
    # lands in SOME bucket and check only those buckets' deltas cleared
    df = spark.createDataFrame(
        [("zz", 0, "user", "after-switch", None)],
        "conv_id string, turn_idx long, role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-06-01 00:00:00")))
    t.upsert(df)
    man = t._load()
    b = (spark.createDataFrame([("zz", 0)], "conv_id string, turn_idx long")
         .select(t._bucket_expr(man["n_buckets"], t._fmt(man)).alias("b"))
         .first()["b"])
    assert man.get("deltas", {}).get(str(b), []) == []
    # resolved rows from that bucket survived the fold
    expected = apply_log_pandas(logical)
    got = t.snapshot().toPandas()
    assert len(got) == len(expected) + 1
    assert t.lookup("zz", 0).toPandas()["text"].tolist() == ["after-switch"]


def test_mor_resolution_plans_agree(spark, tmp_path, monkeypatch):
    """The two resolution plans — broadcast equality-apply (small
    deltas, map-only over base) and the groupBy shuffle fallback
    (large delta debt) — must produce the identical resolved state."""
    spec = ChangelogSpec(seed=23, n_conv=50, extra_rate=1.5, dup_rate=0.2)
    log_dir = str(tmp_path / "log")
    logical, _ = gen_changelog(log_dir, spec)
    t, _ = replay(spark, log_dir, str(tmp_path / "t"),
                  chunk_lsn=100, write_mode="mor")
    assert t.delta_file_count() > 0
    oracle = apply_log_pandas(logical)

    monkeypatch.setenv("DIPPER_MOR_BROADCAST_BYTES", str(1 << 30))
    monkeypatch.setenv("DIPPER_MOR_BROADCAST_MIN_BASE", "0")
    broadcast_snap = t.snapshot().toPandas()
    monkeypatch.setenv("DIPPER_MOR_BROADCAST_BYTES", "0")
    shuffle_snap = t.snapshot().toPandas()
    _assert_equal(broadcast_snap, oracle)
    _assert_equal(shuffle_snap, oracle)
    assert state_hash(broadcast_snap) == state_hash(shuffle_snap)


def test_mor_time_travel_as_of(spark, tmp_path):
    t = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=4,
                             write_mode="mor", time_travel=True)
    for i, txt in enumerate(["v1", "v2", "v3"]):
        df = spark.createDataFrame(
            [("c1", 0, "user", txt, None)],
            "conv_id string, turn_idx long, role string, text string, tool string",
        ).withColumn("ts", F.to_timestamp(F.lit(f"2026-01-01 00:0{i}:00")))
        t.upsert(df)
    vs = t.versions()
    texts = [t.snapshot(as_of=v).toPandas()["text"].tolist() for v in vs[-3:]]
    assert texts == [["v1"], ["v2"], ["v3"]]


def test_mor_changefeed_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="changefeed requires"):
        LocalCowTable.create(spark, str(tmp_path / "t"),
                             write_mode="mor", changefeed=True)
    t = LocalCowTable.create(spark, str(tmp_path / "t2"), changefeed=True)
    with pytest.raises(ValueError, match="changefeed tables"):
        t.set_write_mode("mor")


def test_mor_streaming_ingest_matches_batch(spark, tmp_path):
    """Structured-Streaming ingest with write_mode='mor' (foreachBatch
    -> _merge_mor_inner per micro-batch): final state equals the
    chunked-MoR batch replay and the pandas oracle, deltas accumulate
    per micro-batch (write-optimized path exercised, not the fresh
    single-pass backfill), and a checkpointed RESTART over the same
    log is a ledger-skip no-op."""
    from dipper_spark.streaming.ingest import ingest

    spec = ChangelogSpec(seed=105, n_conv=40, extra_rate=1.5, dup_rate=0.1)
    log_dir = str(tmp_path / "log")
    logical, _ = gen_changelog(log_dir, spec)
    oracle = state_hash(apply_log_pandas(logical))

    table, _q, stats = ingest(spark, log_dir, str(tmp_path / "tbl"),
                              str(tmp_path / "ckpt"),
                              max_files_per_trigger=3, write_mode="mor")
    assert len(stats) >= 2                      # multiple micro-batches
    assert table.delta_file_count() > 0         # MoR path, not backfill
    assert state_hash(table.snapshot().toPandas()) == oracle
    # restart on the same checkpoint: nothing new, nothing re-applied
    table2, _q2, stats2 = ingest(spark, log_dir, str(tmp_path / "tbl"),
                                 str(tmp_path / "ckpt"),
                                 max_files_per_trigger=3, write_mode="mor")
    assert all(s.skipped or s.rows_applied == 0 for s in stats2)
    assert state_hash(table2.snapshot().toPandas()) == oracle
