"""Golden final-state replay — the core invariant (SURVEY.md §5.1).

Engine replay of a corrupted delivery (dups, bounded reorder, skew,
deletes, re-inserts) must equal the single-threaded pandas oracle
applied to the logical log: exact row equality on the six spec
columns, ordered by (conv_id, turn_idx) — "per-turn text equality
under stable turn ordering" (BASELINE.json input_hint).
"""

import pandas as pd
import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import SPEC_COLUMNS, apply_log_pandas, state_hash


def _assert_equal(engine_df: pd.DataFrame, oracle_df: pd.DataFrame):
    e = engine_df.reset_index(drop=True).copy()
    o = oracle_df.reset_index(drop=True)
    for c in SPEC_COLUMNS:
        if c not in e.columns:  # evolution column legitimately absent
            e[c] = None
    assert len(e) == len(o), f"row count {len(e)} != oracle {len(o)}"
    for c in SPEC_COLUMNS:
        le, lo = e[c].tolist(), o[c].tolist()
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(le, lo)) if (a != b and not (pd.isna(a) and pd.isna(b)))]
        assert not bad, f"column {c}: first mismatches {bad[:5]}"


def _run(spark, tmp_path, spec: ChangelogSpec, **replay_kw):
    log_dir = str(tmp_path / "log")
    tbl_dir = str(tmp_path / "table")
    logical, manifest = gen_changelog(log_dir, spec)
    table, stats = replay(spark, log_dir, tbl_dir, **replay_kw)
    engine = table.snapshot().toPandas()
    oracle = apply_log_pandas(logical)
    _assert_equal(engine, oracle)
    return engine, oracle, manifest, stats


def test_replay_defaults(spark, tmp_path):
    eng, ora, man, stats = _run(spark, tmp_path, ChangelogSpec(n_conv=120, extra_rate=1.2))
    assert man["n_dups"] > 0
    assert state_hash(eng) == state_hash(ora)
    st = stats[0]
    assert st.rows_in == man["n_delivered"]
    assert st.rows_in - (st.rows_unique) == man["n_dups"]


def test_replay_heavy_dups_disorder(spark, tmp_path):
    spec = ChangelogSpec(seed=7, n_conv=80, extra_rate=2.0, dup_rate=0.3,
                         max_disorder_s=3600, shuffle_window=200)
    _run(spark, tmp_path, spec)


def test_replay_hot_skew(spark, tmp_path):
    spec = ChangelogSpec(seed=11, n_conv=60, extra_rate=3.0, hot_frac=0.5)
    _run(spark, tmp_path, spec, n_salts=16)


def test_replay_chunked_matches_single(spark, tmp_path):
    """Batch-boundary independence: applying the log in LSN chunks must
    give the identical final state (tombstones + (ts,lsn) guard)."""
    spec = ChangelogSpec(seed=3, n_conv=60, extra_rate=1.5, max_disorder_s=86400)
    eng, ora, _, stats = _run(spark, tmp_path, spec, chunk_lsn=150)
    assert len(stats) > 2


def test_replay_idempotent_rerun(spark, tmp_path):
    """Re-running the same replay (same batch ids) must be a no-op."""
    spec = ChangelogSpec(seed=5, n_conv=40, extra_rate=1.0)
    log_dir, tbl_dir = str(tmp_path / "log"), str(tmp_path / "table")
    logical, _ = gen_changelog(log_dir, spec)
    table, s1 = replay(spark, log_dir, tbl_dir)
    table2, s2 = replay(spark, log_dir, tbl_dir)
    assert all(s.skipped for s in s2)
    _assert_equal(table2.snapshot().toPandas(), apply_log_pandas(logical))


@pytest.mark.parametrize("n_salts", [1, 4, 32])
def test_salting_invariance(spark, tmp_path, n_salts):
    """The salt count must never change the result, only the shuffle shape."""
    spec = ChangelogSpec(seed=13, n_conv=50, extra_rate=1.0, hot_frac=0.6)
    _run(spark, tmp_path / str(n_salts), spec, n_salts=n_salts)


def test_replay_no_lineage_trims_and_matches(spark, tmp_path):
    """lineage=False replay (the pure-throughput path bench/scaling
    use): the r4 shuffle-bytes trim drops source/source_offset before
    the collapse — the final state must still equal the oracle, and
    the trimmed columns must genuinely be gone from the merge input
    (they are lineage-only; the table never stores them)."""
    spec = ChangelogSpec(seed=31, n_conv=100, extra_rate=1.5, dup_rate=0.1, hot_frac=0.3)
    log_dir = str(tmp_path / "log")
    logical, man = gen_changelog(log_dir, spec)
    table, stats = replay(spark, log_dir, str(tmp_path / "table"), lineage=False)
    _assert_equal(table.snapshot().toPandas(), apply_log_pandas(logical))
    snap_cols = set(table.read().columns)
    assert "source" not in snap_cols and "source_offset" not in snap_cols


def test_replay_dictkey_matches(spark, tmp_path):
    """collapse='dictkey' (128-bit hashed phase-1 key) is semantics-
    identical to carry: same final state vs the oracle under dups,
    disorder and hot-key skew."""
    spec = ChangelogSpec(seed=32, n_conv=90, extra_rate=2.0, dup_rate=0.25,
                         hot_frac=0.5, max_disorder_s=1800)
    log_dir = str(tmp_path / "log")
    logical, man = gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "table"), collapse="dictkey", n_salts=16)
    _assert_equal(table.snapshot().toPandas(), apply_log_pandas(logical))
