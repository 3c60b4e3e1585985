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
