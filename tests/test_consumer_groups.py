"""Changefeed consumer groups (round 5): registered consumers ack
their consumed watermarks into the upstream manifest, and
expire_changefeed(keep_consumed=True) expires only batches EVERY
registered consumer has passed — a lagging consumer HOLDS retention
(Kafka consumer-group offset-retention shape) instead of being forced
into a re-bootstrap.
"""

import datetime as dt
import os

import pytest

from dipper_spark.plans.ivm import IncrementalView
from dipper_spark.plans.mirror import MirrorTable
from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import ChangefeedExpiredError, LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _upstream(spark, tmp_path, seed=81, chunk_lsn=400):
    gen_changelog(str(tmp_path / "log"),
                  ChangelogSpec(seed=seed, n_conv=80, extra_rate=1.5,
                                dup_rate=0.1))
    table, stats = replay(spark, str(tmp_path / "log"), str(tmp_path / "up"),
                          changefeed=True, chunk_lsn=chunk_lsn)
    assert len([s for s in stats if not s.skipped]) >= 3
    return table


def _feed_batches(table):
    base = os.path.join(table.root, "_changes")
    out = {}
    for d in sorted(os.listdir(base)):
        if d.startswith("scope="):
            out[d.split("=", 1)[1]] = sorted(
                int(b.split("=", 1)[1])
                for b in os.listdir(os.path.join(base, d))
                if b.startswith("batch="))
    return out


def test_ack_monotonic_and_visible(spark, tmp_path):
    up = _upstream(spark, tmp_path)
    tag = next(iter(_feed_batches(up)))
    up.register_consumer("a")
    assert up.consumers() == {"a": {}}
    up.ack_consumer("a", {tag: 1})
    up.ack_consumer("a", {tag: 0})  # backwards ack is a no-op
    assert up.consumers()["a"][tag] == 1
    up.unregister_consumer("a")
    assert up.consumers() == {}


def test_keep_consumed_needs_a_consumer(spark, tmp_path):
    up = _upstream(spark, tmp_path)
    with pytest.raises(ValueError, match="registered consumer"):
        up.expire_changefeed(keep_consumed=True)
    with pytest.raises(ValueError, match="exactly one"):
        up.expire_changefeed(keep_last_batches=1, keep_consumed=True)


def test_slow_consumer_holds_retention(spark, tmp_path):
    up = _upstream(spark, tmp_path)
    batches = _feed_batches(up)
    tag = next(iter(batches))
    up.ack_consumer("fast", {tag: max(batches[tag])})
    up.ack_consumer("slow", {tag: 0})
    out = up.expire_changefeed(keep_consumed=True)
    # only batch 0 expired (slow consumer passed it; holds the rest)
    assert out["dropped"].get(tag) == [0]
    assert _feed_batches(up)[tag] == batches[tag][1:]
    # unregistering the straggler releases the rest: fast consumed
    # everything, so every remaining batch expires
    up.unregister_consumer("slow")
    out = up.expire_changefeed(keep_consumed=True)
    assert out["dropped"].get(tag) == batches[tag][1:]
    assert _feed_batches(up).get(tag, []) == []


def test_preregistered_consumer_holds_everything(spark, tmp_path):
    up = _upstream(spark, tmp_path)
    batches = _feed_batches(up)
    up.register_consumer("not-started")
    out = up.expire_changefeed(keep_consumed=True)
    assert out["dropped"] == {}
    assert _feed_batches(up) == batches


def test_view_and_mirror_ack_automatically(spark, tmp_path):
    up = _upstream(spark, tmp_path)
    view = IncrementalView(spark, up, str(tmp_path / "view"), ["conv_id"],
                           {"n_turns": "1"}, consumer_name="view-1")
    m = MirrorTable.create(spark, up.root, str(tmp_path / "down"),
                           consumer_name="mirror-1")
    assert set(up.consumers()) == {"view-1", "mirror-1"}
    view.refresh()
    m.sync()
    batches = _feed_batches(up)
    cons = up.consumers()
    for tag, ids in batches.items():
        assert cons["view-1"].get(tag) == max(ids)
        assert cons["mirror-1"].get(tag) == max(ids)
    # both fully consumed -> keep_consumed expires everything, and
    # BOTH consumers keep working (they already consumed the range)
    out = up.expire_changefeed(keep_consumed=True)
    assert out["dropped"]
    up.upsert(spark.createDataFrame(
        [("cg-k", 0, "user", "new", dt.datetime(2027, 10, 1))], ROWS))
    view.refresh()
    m.sync()
    assert state_hash(m.down.snapshot().toPandas()) == \
        state_hash(up.snapshot().toPandas())
    got = view.read().filter("conv_id = 'cg-k'").first()
    assert got is not None and got["n_turns"] == 1


def test_lagging_mirror_never_expires_into_a_hole(spark, tmp_path):
    """The end-to-end point of consumer groups: with keep_consumed
    retention a lagging mirror can ALWAYS catch up incrementally —
    ChangefeedExpiredError becomes unreachable for registered
    consumers."""
    up = _upstream(spark, tmp_path)
    m = MirrorTable.create(spark, up.root, str(tmp_path / "down"),
                           consumer_name="lagger")
    # mirror never synced; aggressive maintenance passes expire nothing
    out = up.expire_changefeed(keep_consumed=True)
    assert out["dropped"] == {}
    m.sync()  # catches up fine — no hole
    up.upsert(spark.createDataFrame(
        [("lag-k", 0, "user", "x", dt.datetime(2027, 11, 1))], ROWS))
    up.expire_changefeed(keep_consumed=True)  # mirror acked pre-upsert state
    m.sync()
    assert state_hash(m.down.snapshot().toPandas()) == \
        state_hash(up.snapshot().toPandas())
