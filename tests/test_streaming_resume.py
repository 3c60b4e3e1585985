"""Streaming ingest + crash/resume exactly-once (SURVEY.md §5.3).

- availableNow ingest over chunked files == oracle final state;
- kill after k batches, restart from checkpoint -> identical state;
- out-of-band redelivery of an already-applied chunk is a no-op.
"""

import shutil

import pytest

from dipper_spark.streaming.ingest import ingest
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import apply_log_pandas, state_hash

from tests.test_replay_equality import _assert_equal


def test_stream_ingest_matches_oracle(spark, tmp_path):
    spec = ChangelogSpec(seed=21, n_conv=80, extra_rate=1.5, n_chunks=6)
    logical, man = gen_changelog(str(tmp_path / "log"), spec)
    table, query, stats = ingest(
        spark, str(tmp_path / "log"), str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
    )
    applied = [s for s in stats if not s.skipped]
    assert len(applied) >= 3  # 6 files / 2 per trigger
    _assert_equal(table.snapshot().toPandas(), apply_log_pandas(logical))
    # lineage reconciliation: every delivered event accounted for
    assert sum(s.rows_in for s in applied) == man["n_delivered"]


def test_stream_dedup_within_watermark(spark, tmp_path):
    spec = ChangelogSpec(seed=22, n_conv=50, extra_rate=1.0, dup_rate=0.2, n_chunks=4)
    logical, _ = gen_changelog(str(tmp_path / "log"), spec)
    table, *_ = ingest(
        spark, str(tmp_path / "log"), str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1, stream_dedup=True, watermark_delay="2 hours",
    )
    _assert_equal(table.snapshot().toPandas(), apply_log_pandas(logical))


def test_crash_resume_and_redelivery(spark, tmp_path):
    spec = ChangelogSpec(seed=23, n_conv=70, extra_rate=1.5, n_chunks=8)
    log_dir = str(tmp_path / "log")
    logical, man = gen_changelog(log_dir, spec)
    oracle = apply_log_pandas(logical)

    # run 1: crash after 3 applied batches
    with pytest.raises(Exception):
        table, query, stats = ingest(
            spark, log_dir, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
            max_files_per_trigger=1, fail_after=3,
        )
    # run 2: resume from the same checkpoint — finishes the log
    table, query, stats = ingest(
        spark, log_dir, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    eng = table.snapshot().toPandas()
    _assert_equal(eng, oracle)
    h1 = state_hash(eng)

    # out-of-band redelivery: re-append an already-applied chunk file and
    # a fresh checkpoint (simulating upstream re-send) — state unchanged.
    shutil.copy(man["chunks"][0], log_dir + "/chunk_redelivered.parquet")
    table, query, stats = ingest(
        spark, log_dir, str(tmp_path / "tbl"), str(tmp_path / "ckpt2"),
        max_files_per_trigger=None,
    )
    eng2 = table.snapshot().toPandas()
    assert state_hash(eng2) == h1
    _assert_equal(eng2, oracle)
    # the redelivered events must show up as stale conflicts, not applies
    last = [s for s in stats if not s.skipped][-1]
    assert last.rows_applied == 0 or last.conflicts > 0


def _paced_binlog_runs(spark, tmp_path, seed: int, pacing_dir: str | None):
    """Two paced runs over one checkpoint: run 1 sees only the FIRST
    HALF of the chunk files (deterministic mid-backlog stop — a
    time-based stop overshoots under suite load), drains them, stops;
    the rest of the backlog then appears and run 2 resumes from the
    checkpoint with a fresh reader instance.  Returns (manifest,
    run1 lsn-lists, run2 lsn-lists)."""
    import os

    import pyarrow.parquet as pq

    from dipper_spark.streaming.binlog_source import BinlogDataSource

    stage_dir = str(tmp_path / "stage")
    log_dir = str(tmp_path / "log")
    logical, man = gen_changelog(
        stage_dir, ChangelogSpec(seed=seed, n_conv=40, extra_rate=0.8, n_chunks=8))
    chunk_files = sorted(f for f in os.listdir(stage_dir)
                         if f.endswith(".parquet") and not f.startswith("_"))
    os.makedirs(log_dir)
    half = len(chunk_files) // 2
    for f in chunk_files[:half]:
        os.link(os.path.join(stage_dir, f), os.path.join(log_dir, f))
    n_half = sum(pq.read_metadata(os.path.join(stage_dir, f)).num_rows
                 for f in chunk_files[:half])
    man["n_run1"] = n_half

    def reveal_rest():
        for f in chunk_files[half:]:
            os.link(os.path.join(stage_dir, f), os.path.join(log_dir, f))

    try:
        spark.dataSource.register(BinlogDataSource)
    except Exception:
        pass

    def run() -> list[list]:
        # lsn LISTS, not sets: the log itself carries redelivered
        # duplicate lsns, which must count toward n_delivered
        batches: list[list] = []
        reader = (
            spark.readStream.format("dipper_binlog")
            .option("path", log_dir)
            .option("maxChunksPerTrigger", "2")
        )
        if pacing_dir:
            reader = reader.option("pacingDir", pacing_dir)
        q = (
            reader.load()
            .writeStream.foreachBatch(
                lambda df, bid: batches.append([r["lsn"] for r in df.select("lsn").collect()]))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="200 milliseconds").start()
        )
        # blocks until everything currently in the log is processed AND
        # committed — a bare stop() can interrupt the final batch's
        # commit and turn the next run into a (legal) batch replay,
        # which would make the exactly-once count nondeterministic
        q.processAllAvailable()
        q.stop()
        return batches

    b1 = run()
    got1 = sum(len(s) for s in b1)
    assert got1 == man["n_run1"], "run 1 should drain exactly the visible half"
    reveal_rest()
    b2 = run()
    return man, b1, b2


def test_binlog_restart_pacing_dir_exactly_once(spark, tmp_path):
    """RESTART under maxChunksPerTrigger WITH pacingDir (round 4 fix
    for ADVICE r3): the persisted pacing counter survives the restart,
    so the fresh reader's first paced offset never sits below the
    checkpointed start and every chunk is delivered exactly once at
    the raw source level — no rewind, no re-reads."""
    man, b1, b2 = _paced_binlog_runs(spark, tmp_path, seed=63,
                                     pacing_dir=str(tmp_path / "ckpt" / "binlog_pacing"))
    n1 = sum(len(s) for s in b1)
    n2 = sum(len(s) for s in b2)
    assert n1 + n2 == man["n_delivered"], (
        f"paced restart lost/duplicated events: {n1}+{n2} != {man['n_delivered']}")
    all_lsns = set().union(*(set(s) for s in (*b1, *b2)))
    assert len(all_lsns) == man["n_delivered"] - man["n_dups"]


def test_binlog_restart_pacing_no_dir_at_least_once(spark, tmp_path):
    """RESTART under maxChunksPerTrigger WITHOUT pacingDir pins the
    measured runner behavior (ADVICE r3): the reset pacing counter may
    rewind the stream position — already-committed chunks re-deliver —
    but NOTHING is lost, and the engine's ledger + (ts, lsn) merge
    guard make the re-delivery a downstream no-op.  If a Spark upgrade
    changes how the runner treats end < start, this breaks loudly."""
    man, b1, b2 = _paced_binlog_runs(spark, tmp_path, seed=64, pacing_dir=None)
    all_lsns = set().union(*(set(s) for s in (*b1, *b2)))
    assert len(all_lsns) == man["n_delivered"] - man["n_dups"], "events lost across restart"
    n_total = sum(len(s) for s in b1) + sum(len(s) for s in b2)
    assert n_total >= man["n_delivered"]  # duplicates allowed, loss not


def test_binlog_source_ingest_end_to_end(spark, tmp_path):
    """The literal north-rule path: binlog/WAL tail (custom DataSource,
    op C2) -> decode -> salted LWW collapse -> guarded MERGE upsert.
    Final state must equal the pandas oracle AND the file-source
    ingest of the same log, and the lineage totals must reconcile."""
    spec = ChangelogSpec(seed=25, n_conv=70, extra_rate=1.5, dup_rate=0.1, n_chunks=6)
    log_dir = str(tmp_path / "log")
    logical, man = gen_changelog(log_dir, spec)
    oracle = apply_log_pandas(logical)

    tb, _, stats_b = ingest(
        spark, log_dir, str(tmp_path / "tbl_binlog"), str(tmp_path / "ckpt_b"),
        source="binlog",
    )
    _assert_equal(tb.snapshot().toPandas(), oracle)
    applied = [s for s in stats_b if not s.skipped]
    assert sum(s.rows_in for s in applied) == man["n_delivered"]

    tf, _, _ = ingest(
        spark, log_dir, str(tmp_path / "tbl_file"), str(tmp_path / "ckpt_f"),
    )
    assert state_hash(tb.snapshot().toPandas()) == state_hash(tf.snapshot().toPandas())
