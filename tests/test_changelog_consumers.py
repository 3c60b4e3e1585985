"""Changelog-sourced consumers (round 5): IncrementalView and
MirrorTable with source='changelog' consume the snapshot-diff
changelog instead of the write-time feed — the consumer stack for MoR
tables (whose merges never read the target and so cannot emit a
feed).  The delta rule is linear, so net version diffs maintain the
same SUM/COUNT/AVG/extrema; the mirror applies net changes through
the same collapse + LWW merge.

Retention is held by snapshot TAGS instead of feed consumer groups: a
consumer_name pins the last-synced version (moved per refresh/sync),
and expire_snapshots honors tags.
"""

import datetime as dt

import pandas as pd
import pytest

from dipper_spark.plans.ivm import IncrementalView
from dipper_spark.plans.mirror import MirrorTable
from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import ChangefeedExpiredError, LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _mor_table(spark, tmp_path, seed=71):
    spec = ChangelogSpec(seed=seed, n_conv=50, extra_rate=1.6, dup_rate=0.15)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, stats = replay(spark, log_dir, str(tmp_path / "tbl"),
                          chunk_lsn=300, time_travel=True, write_mode="mor")
    assert len(stats) >= 2
    return table


def _pdf(df) -> pd.DataFrame:
    p = df.toPandas()
    return p.sort_values(list(p.columns), ignore_index=True)


def _view(spark, table, root, **kw):
    return IncrementalView(
        spark, table, str(root), group_cols=["role"],
        aggs={"turns": "1", "chars": "length(text)"},
        avgs={"avg_chars": "length(text)"},
        extrema={"max_turn": ("max", "turn_idx"), "min_turn": ("min", "turn_idx")},
        source="changelog", **kw)


def test_changelog_view_tracks_mor_table(spark, tmp_path):
    table = _mor_table(spark, tmp_path)
    view = _view(spark, table, tmp_path / "view")
    r = view.refresh()
    assert not r["noop"] and r["from_version"] == 0
    pd.testing.assert_frame_equal(_pdf(view.read()), _pdf(view.full_recompute()),
                                  check_dtype=False)
    # incremental updates, group-moving update, deletes, retraction of
    # the max — all through MoR delta appends
    table.upsert(spark.createDataFrame(
        [("c-new", 99, "user", "x" * 50, dt.datetime(2027, 5, 1)),
         ("conv00000001", 0, "assistant", "moved", dt.datetime(2027, 5, 1))],
        ROWS))
    table.delete_where("conv_id = 'c-new'")  # retracts the max_turn witness
    r2 = view.refresh()
    assert not r2["noop"] and r2["from_version"] == r["to_version"]
    pd.testing.assert_frame_equal(_pdf(view.read()), _pdf(view.full_recompute()),
                                  check_dtype=False)
    # idempotent: nothing new
    assert view.refresh()["noop"]


def test_changelog_view_pin_survives_expiry_and_bootstrap_recovers(spark, tmp_path):
    table = _mor_table(spark, tmp_path)
    view = _view(spark, table, tmp_path / "view", consumer_name="v1")
    view.refresh()
    synced = view._meta()["version"]
    table.upsert(spark.createDataFrame(
        [("k", 0, "user", "one", dt.datetime(2027, 5, 1))], ROWS))
    table.upsert(spark.createDataFrame(
        [("k", 0, "user", "two", dt.datetime(2027, 5, 2))], ROWS))
    # aggressive expiry: the pinned synced version must survive
    table.expire_snapshots(keep_last=1)
    assert synced in table.versions()
    view.refresh()
    pd.testing.assert_frame_equal(_pdf(view.read()), _pdf(view.full_recompute()),
                                  check_dtype=False)

    # a view created after history already expired seeds via bootstrap
    # (its first refresh would need the expired v0)...
    v2 = _view(spark, table, tmp_path / "view2")
    with pytest.raises(ChangefeedExpiredError, match="bootstrap"):
        v2.refresh()
    v2.bootstrap()
    pd.testing.assert_frame_equal(_pdf(v2.read()), _pdf(v2.full_recompute()),
                                  check_dtype=False)
    # ...and an UNPINNED view falls behind a later expiry and raises
    table.upsert(spark.createDataFrame(
        [("k", 0, "user", "three", dt.datetime(2027, 5, 3))], ROWS))
    table.drop_tag("consumer/v1")
    table.expire_snapshots(keep_last=1)
    with pytest.raises(ChangefeedExpiredError, match="bootstrap"):
        v2.refresh()
    v2.bootstrap()
    pd.testing.assert_frame_equal(_pdf(v2.read()), _pdf(v2.full_recompute()),
                                  check_dtype=False)
    assert v2.refresh()["noop"]  # watermark fast-forwarded


def test_changelog_mirror_tracks_mor_upstream(spark, tmp_path):
    table = _mor_table(spark, tmp_path)
    m = MirrorTable.create(spark, table.root, str(tmp_path / "replica"),
                           n_buckets=8, source="changelog")
    r = m.sync()
    assert not r["noop"]
    assert state_hash(m.snapshot().toPandas()) == state_hash(table.snapshot().toPandas())
    # incremental: updates + deletes land through the next sync
    table.upsert(spark.createDataFrame(
        [("conv00000001", 0, "user", "rewritten", dt.datetime(2027, 6, 1))], ROWS))
    table.delete_where("turn_idx = 3")
    r2 = m.sync()
    assert r2["merges"] == 1
    assert state_hash(m.snapshot().toPandas()) == state_hash(table.snapshot().toPandas())
    assert m.sync()["noop"]


def test_changelog_mirror_crash_between_merge_and_meta(spark, tmp_path):
    table = _mor_table(spark, tmp_path)
    m = MirrorTable.create(spark, table.root, str(tmp_path / "replica"),
                           n_buckets=8, source="changelog")
    m.sync()
    table.upsert(spark.createDataFrame(
        [("k", 0, "user", "v1", dt.datetime(2027, 6, 1))], ROWS))
    meta_before = m._meta()
    m.sync()
    m._write_meta(meta_before)  # simulate crash before the meta write
    r = m.sync()                # ledger-skips the replayed merge
    assert not r["noop"]
    assert state_hash(m.snapshot().toPandas()) == state_hash(table.snapshot().toPandas())


def test_changelog_mirror_refuses_identityless_deletes_then_bootstraps(spark, tmp_path):
    table = _mor_table(spark, tmp_path)
    m = MirrorTable.create(spark, table.root, str(tmp_path / "replica"),
                           n_buckets=8, source="changelog")
    m.sync()
    table.delete_where("turn_idx = 0")
    table.compact(drop_tombstones=True)  # erases the deletes' (ts, lsn)
    with pytest.raises(ChangefeedExpiredError, match="bootstrap"):
        m.sync()
    m.bootstrap()
    assert state_hash(m.snapshot().toPandas()) == state_hash(table.snapshot().toPandas())
    assert m.sync()["noop"]


def test_changelog_mirror_pin_holds_upstream_retention(spark, tmp_path):
    table = _mor_table(spark, tmp_path)
    m = MirrorTable.create(spark, table.root, str(tmp_path / "replica"),
                           n_buckets=8, source="changelog", consumer_name="m1")
    m.sync()
    synced = m._meta()["version"]
    table.upsert(spark.createDataFrame(
        [("k", 0, "user", "one", dt.datetime(2027, 6, 1))], ROWS))
    table.expire_snapshots(keep_last=1)
    assert synced in table.versions()  # the pin held
    m.sync()
    assert state_hash(m.snapshot().toPandas()) == state_hash(table.snapshot().toPandas())


def test_create_validation(spark, tmp_path):
    # changelog mirrors need a time_travel upstream
    t = LocalCowTable.create(spark, str(tmp_path / "plain"), n_buckets=4)
    with pytest.raises(ValueError, match="time_travel"):
        MirrorTable.create(spark, t.root, str(tmp_path / "r"), source="changelog")
    with pytest.raises(ValueError, match="source"):
        MirrorTable.create(spark, t.root, str(tmp_path / "r"), source="wal")
    with pytest.raises(ValueError, match="source"):
        IncrementalView(spark, t, str(tmp_path / "v"), group_cols=["role"],
                        aggs={"n": "1"}, source="wal")
    # bootstrap() is a changelog-view concept
    v = IncrementalView(spark, t, str(tmp_path / "v2"), group_cols=["role"],
                        aggs={"n": "1"})
    with pytest.raises(ValueError, match="changelog"):
        v.bootstrap()
