"""Row-level changefeed OUT (round 4 — CDC in both directions): a
changefeed-enabled table emits its applied changes per merge under
_changes/scope=<tag>/batch=<id>, exactly-once like the table itself.

The defining property: replaying the feed in (batch, change_lsn)
order against an empty dict reproduces the table snapshot exactly —
so a downstream consumer (e.g. an incremental training-data pipeline)
that tails `changefeed(since_batch=k)` converges to the same state as
re-reading the whole table.
"""

import pandas as pd

from dipper_spark.plans.replay import replay
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import SPEC_COLUMNS, apply_log_pandas


def _apply_feed(feed: pd.DataFrame) -> dict:
    state: dict = {}
    for _, r in feed.sort_values(["batch", "change_lsn"]).iterrows():
        k = (r["conv_id"], int(r["turn_idx"]))
        if r["change_op"] == "D":
            state.pop(k, None)
        else:
            state[k] = (r["role"], r["text"], r.get("tool"))
    return state


def test_changefeed_reconstructs_snapshot(spark, tmp_path):
    spec = ChangelogSpec(seed=41, n_conv=80, extra_rate=1.8, dup_rate=0.15, hot_frac=0.3)
    log_dir = str(tmp_path / "log")
    logical, man = gen_changelog(log_dir, spec)
    # chunk_lsn splits the replay into several batches -> several
    # changefeed partitions, exercising the incremental shape
    table, stats = replay(spark, log_dir, str(tmp_path / "tbl"),
                          chunk_lsn=400, changefeed=True)
    n_batches = len([s for s in stats if not s.skipped])
    assert n_batches >= 3

    feed = table.changefeed().toPandas()
    # partition columns present for pruning-based incremental reads
    assert {"scope", "batch", "change_op", "change_ts", "change_lsn"} <= set(feed.columns)
    assert feed["batch"].nunique() == n_batches

    # feed counts reconcile with per-merge stats
    by_op = feed["change_op"].value_counts().to_dict()
    assert by_op.get("I", 0) == sum(s.inserts for s in stats)
    assert by_op.get("U", 0) == sum(s.updates for s in stats)
    assert by_op.get("D", 0) == sum(s.deletes for s in stats)

    # replaying the feed == oracle final state
    oracle = apply_log_pandas(logical)
    want = {(r["conv_id"], int(r["turn_idx"])): (r["role"], r["text"], r["tool"])
            for _, r in oracle.iterrows()}
    got = _apply_feed(feed)
    assert got == want

    # incremental read: since_batch prunes whole batches
    later = table.changefeed(since_batch=0).toPandas()
    assert set(later["batch"].unique()) == set(feed["batch"].unique()) - {0}


def test_changefeed_idempotent_replay_no_duplicates(spark, tmp_path):
    spec = ChangelogSpec(seed=43, n_conv=40, extra_rate=1.0)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "tbl"), changefeed=True)
    n1 = table.changefeed().count()
    # replayed batch: ledger-skipped, feed must NOT grow or rewrite
    table2, stats2 = replay(spark, log_dir, str(tmp_path / "tbl"), changefeed=True)
    assert all(s.skipped for s in stats2)
    assert table2.changefeed().count() == n1


def test_changefeed_disabled_by_default(spark, tmp_path):
    import pytest

    spec = ChangelogSpec(seed=44, n_conv=20, extra_rate=0.5)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "tbl"))
    with pytest.raises(FileNotFoundError):
        table.changefeed()
