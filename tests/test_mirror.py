"""Changefeed-driven replication (round 5 — beyond-survey, cascading
CDC): a MirrorTable downstream replica maintained purely from the
upstream's row-level changefeed must reproduce the upstream snapshot
exactly — after a full sync, incrementally, across crash-replay,
under a different bucket layout, chained (mirror of a mirror), via
the streaming consumer, and across the retention boundary
(bootstrap-from-snapshot when the feed expired).
"""

import datetime as dt

import pytest

from dipper_spark.plans.mirror import MirrorTable
from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import ChangefeedExpiredError, LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _upstream(spark, tmp_path, seed=71, chunk_lsn=None, **kw):
    gen_changelog(str(tmp_path / "log"),
                  ChangelogSpec(seed=seed, n_conv=100, extra_rate=1.5,
                                dup_rate=0.1))
    table, stats = replay(spark, str(tmp_path / "log"), str(tmp_path / "up"),
                          changefeed=True, chunk_lsn=chunk_lsn, **kw)
    return table, stats


def _hash(t) -> str:
    return state_hash(t.snapshot().toPandas())


def test_full_sync_equals_upstream(spark, tmp_path):
    up, _ = _upstream(spark, tmp_path)
    m = MirrorTable.create(spark, up.root, str(tmp_path / "down"))
    out = m.sync()
    assert not out["noop"] and out["merges"] >= 1
    assert _hash(m.down) == _hash(up)
    # re-sync is a no-op (watermark)
    assert m.sync()["noop"]


def test_incremental_sync_and_deletes(spark, tmp_path):
    up, _ = _upstream(spark, tmp_path)
    m = MirrorTable.create(spark, up.root, str(tmp_path / "down"))
    m.sync()
    ts = dt.datetime(2027, 7, 1)
    up.upsert(spark.createDataFrame(
        [("mirror-k", 0, "user", "v1", ts),
         ("mirror-k", 1, "user", "gone-soon", ts)], ROWS))
    up.delete_where("conv_id = 'mirror-k' AND turn_idx = 1")
    up.upsert(spark.createDataFrame(
        [("mirror-k", 0, "user", "v2", dt.datetime(2027, 7, 2))], ROWS))
    out = m.sync()
    assert not out["noop"]
    assert _hash(m.down) == _hash(up)
    row = m.down.snapshot().filter("conv_id = 'mirror-k'").collect()
    assert len(row) == 1 and row[0]["text"] == "v2"


def test_crash_between_merge_and_meta_is_idempotent(spark, tmp_path):
    up, _ = _upstream(spark, tmp_path)
    m = MirrorTable.create(spark, up.root, str(tmp_path / "down"))

    # crash injection: the first meta write after a merge fails
    orig = m._write_meta
    boom = {"armed": True}

    def failing(meta):
        if boom["armed"]:
            boom["armed"] = False
            raise OSError("simulated crash before watermark write")
        orig(meta)

    m._write_meta = failing
    with pytest.raises(OSError):
        m.sync()
    m._write_meta = orig
    # the merge committed but the watermark did not advance: the
    # re-sync re-reads the same batches — ledger-skipped, then marked
    before = _hash(up)
    out = m.sync()
    assert not out["noop"]
    assert _hash(m.down) == before
    assert m.sync()["noop"]


def test_relayout_replica_different_buckets(spark, tmp_path):
    up, _ = _upstream(spark, tmp_path)  # default 32 buckets
    m = MirrorTable.create(spark, up.root, str(tmp_path / "down"), n_buckets=5)
    m.sync()
    assert m.down._load()["n_buckets"] == 5
    assert _hash(m.down) == _hash(up)


def test_chained_mirror(spark, tmp_path):
    up, _ = _upstream(spark, tmp_path, chunk_lsn=600)
    m1 = MirrorTable.create(spark, up.root, str(tmp_path / "d1"),
                            changefeed=True)
    m1.sync()
    m2 = MirrorTable.create(spark, str(tmp_path / "d1"), str(tmp_path / "d2"))
    m2.sync()
    assert _hash(m2.down) == _hash(up)
    # incremental through the chain
    up.upsert(spark.createDataFrame(
        [("chain-k", 0, "user", "deep", dt.datetime(2027, 8, 1))], ROWS))
    m1.sync()
    m2.sync()
    assert _hash(m2.down) == _hash(m1.down) == _hash(up)


def test_expired_feed_requires_bootstrap(spark, tmp_path):
    up, stats = _upstream(spark, tmp_path, chunk_lsn=400)
    assert len(stats) >= 3
    up.expire_changefeed(keep_last_batches=1)
    m = MirrorTable.create(spark, up.root, str(tmp_path / "down"))
    with pytest.raises(ChangefeedExpiredError):
        m.sync()
    m.bootstrap()
    out = m.sync()  # no unexpired unconsumed batches remain
    assert out["noop"]
    assert _hash(m.down) == _hash(up)
    # and the mirror keeps following new commits incrementally
    up.upsert(spark.createDataFrame(
        [("post-boot", 0, "user", "x", dt.datetime(2027, 9, 1))], ROWS))
    assert not m.sync()["noop"]
    assert _hash(m.down) == _hash(up)


def test_double_bootstrap_after_falling_behind_twice(spark, tmp_path):
    """A mirror that falls behind retention TWICE must reconverge on
    the second bootstrap.  Regression: a fixed bootstrap ledger
    identity would ledger-skip the second snapshot merge while the
    watermark still fast-forwarded — silently losing the expired
    range."""
    up, stats = _upstream(spark, tmp_path, chunk_lsn=400)
    assert len(stats) >= 3
    up.expire_changefeed(keep_last_batches=1)
    m = MirrorTable.create(spark, up.root, str(tmp_path / "down"))
    m.bootstrap()
    m.sync()
    assert _hash(m.down) == _hash(up)
    # fall behind again: two new commits, both expired before syncing
    ts = dt.datetime(2027, 9, 1)
    up.upsert(spark.createDataFrame([("bb-1", 0, "user", "one", ts)], ROWS))
    up.upsert(spark.createDataFrame([("bb-2", 0, "user", "two", ts)], ROWS))
    up.expire_changefeed(keep_last_batches=0, scope="api")
    with pytest.raises(ChangefeedExpiredError):
        m.sync()
    m.bootstrap()  # second bootstrap MUST apply the new snapshot
    m.sync()
    assert _hash(m.down) == _hash(up)
    assert m.down.snapshot().filter(
        "conv_id in ('bb-1','bb-2')").count() == 2


def test_streaming_mirror(spark, tmp_path):
    up, _ = _upstream(spark, tmp_path, chunk_lsn=600)
    m = MirrorTable.create(spark, up.root, str(tmp_path / "down"))
    q = m.sync_stream(str(tmp_path / "ckpt"), max_files_per_trigger=8)
    q.awaitTermination(120)
    assert _hash(m.down) == _hash(up)
    # new upstream commits: a fresh availableNow pass drains the delta
    up.upsert(spark.createDataFrame(
        [("stream-k", 0, "user", "tailed", dt.datetime(2027, 10, 1))], ROWS))
    q2 = m.sync_stream(str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert _hash(m.down) == _hash(up)


def test_schema_evolution_flows_through(spark, tmp_path):
    up, _ = _upstream(spark, tmp_path)
    m = MirrorTable.create(spark, up.root, str(tmp_path / "down"))
    m.sync()
    # ADD a column upstream; the feed batches before/after differ in
    # schema — mergeSchema + downstream evolution must carry it
    up.upsert(spark.createDataFrame(
        [("evo-k", 0, "user", "x", "extra-val", dt.datetime(2027, 11, 1))],
        "conv_id string, turn_idx long, role string, text string, "
        "extra string, ts timestamp"))
    m.sync()
    assert _hash(m.down) == _hash(up)
    assert "extra" in m.down.snapshot().columns or \
        "extra" in m.down.read().columns
