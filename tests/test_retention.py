"""Changefeed + snapshot retention (round 5, VERDICT r4 #2).

_changes/ must not grow without bound: expire_changefeed() removes old
batch dirs, records per-scope retention floors in the manifest, and
every read surface fails CRISPLY (ChangefeedExpiredError — Kafka's
OffsetOutOfRange shape) when asked for an expired range, instead of
silently returning a feed that no longer replays to the snapshot.
Consumers that already consumed the expired range are unaffected.
"""

import os

import pytest

from dipper_spark.plans.ivm import IncrementalView
from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import ChangefeedExpiredError, LocalCowTable
from dipper_spark.streaming.ingest import ingest
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog


def _feed_table(spark, tmp_path, seed=81, **kw):
    spec = ChangelogSpec(seed=seed, n_conv=40, extra_rate=1.5, dup_rate=0.1)
    gen_changelog(str(tmp_path / "log"), spec)
    table, stats = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"),
                          chunk_lsn=150, changefeed=True, **kw)
    return table, stats


def _scope_dirs(table, tag):
    p = os.path.join(table.root, "_changes", f"scope={tag}")
    return sorted(int(d.split("=")[1]) for d in os.listdir(p) if d.startswith("batch="))


def test_expire_keep_last_sets_floor_and_raises_on_expired_range(spark, tmp_path):
    table, stats = _feed_table(spark, tmp_path)
    n_batches = len([s for s in stats if not s.skipped])
    assert n_batches >= 3
    tag = next(iter(table._load()["scope_seq"]))  # replay scope
    tag = LocalCowTable._scope_tag(tag)

    out = table.expire_changefeed(keep_last_batches=2)
    assert out["dropped"][tag] == list(range(n_batches - 2))
    floor = out["floors"][tag]
    assert floor == n_batches - 2
    assert _scope_dirs(table, tag) == [n_batches - 2, n_batches - 1]

    # full read and too-early incremental reads: expired, loud
    with pytest.raises(ChangefeedExpiredError):
        table.changefeed()
    with pytest.raises(ChangefeedExpiredError):
        table.changefeed(since_batch=floor - 2)
    # exactly-at-floor read: every requested batch retained
    ok = table.changefeed(since_batch=floor - 1)
    assert sorted(r["batch"] for r in ok.select("batch").distinct().collect()) \
        == [n_batches - 2, n_batches - 1]
    # idempotent re-expire: nothing more to drop
    again = table.expire_changefeed(keep_last_batches=2)
    assert again["dropped"] == {}


def test_expire_through_batch_scoped(spark, tmp_path):
    table, stats = _feed_table(spark, tmp_path, seed=82)
    scope = next(iter(table._load()["scope_seq"]))
    out = table.expire_changefeed(through_batch=0, scope=scope)
    tag = LocalCowTable._scope_tag(scope)
    assert out["dropped"][tag] == [0] and out["floors"][tag] == 1
    with pytest.raises(ValueError):
        table.expire_changefeed(through_batch=1)  # needs a scope
    with pytest.raises(ValueError):
        table.expire_changefeed()  # exactly one policy


def test_stream_consumer_survives_expiry_of_consumed_batches(spark, tmp_path):
    """A consumer that drained the feed BEFORE retention keeps working
    (its checkpoint covers the expired range); a FRESH consumer fails
    loudly unless it opts in."""
    table, _ = _feed_table(spark, tmp_path, seed=83)
    rows: list = []

    def drain(fail_on_data_loss=True):
        got: list = []
        q = (table.changefeed_stream(fail_on_data_loss=fail_on_data_loss)
             .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
             .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt_consumer"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        rows.extend(got)
        return len(got)

    n1 = drain()
    assert n1 > 0
    table.expire_changefeed(keep_last_batches=1)
    # fresh consumers: loud failure / explicit opt-in
    with pytest.raises(ChangefeedExpiredError):
        table.changefeed_stream()
    # resuming consumer (checkpoint covers the gap): opts in, sees only new data
    import datetime as dt
    table.upsert(spark.createDataFrame(
        [("ret-new", 0, "user", "post-expiry", dt.datetime(2027, 1, 1))],
        "conv_id string, turn_idx long, role string, text string, ts timestamp"))
    n2 = drain(fail_on_data_loss=False)
    assert n2 == 1
    # replaying everything this consumer EVER received reproduces the snapshot
    state: dict = {}
    for r in sorted(rows, key=lambda r: (r["batch"], r["change_lsn"])):
        k = (r["conv_id"], r["turn_idx"])
        if r["change_op"] == "D":
            state.pop(k, None)
        else:
            state[k] = r["text"]
    assert len(state) == table.snapshot().count()


def test_ivm_ok_after_expiring_consumed_batches_raises_on_hole(spark, tmp_path):
    table, _ = _feed_table(spark, tmp_path, seed=84)
    view = IncrementalView(spark, table, str(tmp_path / "view"), ["conv_id"],
                           {"n_turns": "1"})
    view.refresh()
    # consumed batches may expire freely: next refresh is a clean no-op
    table.expire_changefeed(keep_last_batches=0)
    assert view.refresh()["noop"]
    # new producer pass + refresh still equals recompute
    ingest(spark, os.path.join(str(tmp_path), "log"), table.root,
           os.path.join(str(tmp_path), "ckpt2"), changefeed=True)
    view.refresh()
    got = view.read().orderBy("conv_id").toPandas()
    want = view.full_recompute().orderBy("conv_id").toPandas()
    assert got.equals(want)

    # a view that NEVER consumed the expired range: loud failure
    fresh = IncrementalView(spark, table, str(tmp_path / "view2"), ["conv_id"],
                            {"n_turns": "1"})
    table.expire_changefeed(keep_last_batches=0)
    # one more producer batch so there IS something pending above the hole
    table.upsert(spark.createDataFrame(
        [("ret-x", 0, "user", "t", __import__("datetime").datetime(2027, 1, 1))],
        "conv_id string, turn_idx long, role string, text string, ts timestamp"))
    with pytest.raises(ChangefeedExpiredError):
        fresh.refresh()


def test_expire_snapshots_wires_changefeed_retention(spark, tmp_path):
    spec = ChangelogSpec(seed=85, n_conv=40, extra_rate=1.5, dup_rate=0.1)
    gen_changelog(str(tmp_path / "log"), spec)
    table, stats = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"),
                          chunk_lsn=300, changefeed=True, time_travel=True)
    out = table.expire_snapshots(keep_last=1, changefeed_keep_batches=1)
    assert out["dropped_versions"] > 0
    assert out["changefeed"]["dropped"], "changefeed retention did not run"
    floor = max(out["changefeed"]["floors"].values())
    assert table.changefeed(since_batch=floor - 1).count() > 0


def test_consumer_state_consistent_across_compact_and_expire(spark, tmp_path):
    """VERDICT r4 #6: a consumer tailing the changefeed while the table
    compacts and expires mid-stream — compact rewrites data/, expire
    drops versions + old feed batches the consumer already has; the
    consumer's replayed state must still equal the live snapshot."""
    spec = ChangelogSpec(seed=86, n_conv=40, extra_rate=1.5, dup_rate=0.1)
    gen_changelog(str(tmp_path / "log"), spec)
    table, _ = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"),
                      chunk_lsn=300, changefeed=True, time_travel=True)
    rows: list = []

    def drain(**kw):
        got: list = []
        q = (table.changefeed_stream(**kw)
             .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
             .option("checkpointLocation", os.path.join(str(tmp_path), "cons_ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        rows.extend(got)

    drain()
    table.compact()                      # mid-stream maintenance
    table.expire_snapshots(keep_last=1, changefeed_keep_batches=0)
    import datetime as dt
    table.upsert(spark.createDataFrame(
        [("mid-new", 0, "user", "post-compact", dt.datetime(2027, 2, 1))],
        "conv_id string, turn_idx long, role string, text string, ts timestamp"))
    drain(fail_on_data_loss=False)       # checkpoint covers the expired range

    state: dict = {}
    for r in sorted(rows, key=lambda r: (r["batch"], r["change_lsn"])):
        k = (r["conv_id"], r["turn_idx"])
        if r["change_op"] == "D":
            state.pop(k, None)
        else:
            state[k] = r["text"]
    snap = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in table.snapshot().collect()}
    assert state == snap


def test_vacuum_sweeps_only_stale_crash_debris(spark, tmp_path):
    """vacuum(): _tmp_b*/_stage_b* at the root and .stage_* under
    _changes/ and _deadletter/constraints/ older than the TTL go;
    young dirs (an in-flight writer) and all live state stay."""
    import os
    import time

    from dipper_spark.plans.target import LocalCowTable
    from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
    from dipper_spark.plans.replay import replay
    from dipper_spark.testkit.oracle import state_hash

    gen_changelog(str(tmp_path / "log"),
                  ChangelogSpec(seed=91, n_conv=30, extra_rate=1.2))
    table, _ = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"),
                      changefeed=True)
    before = state_hash(table.snapshot().toPandas())
    old = time.time() - 7200
    stale = [os.path.join(table.root, "_tmp_b9_deadbeef"),
             os.path.join(table.root, "_stage_b9_deadbeef"),
             os.path.join(table.root, "_changes", ".stage_deadbeef"),
             os.path.join(table.root, "_deadletter", "constraints",
                          ".stage_deadbeef")]
    young = os.path.join(table.root, "_tmp_b10_cafebabe")
    for d in stale + [young]:
        os.makedirs(d)
        open(os.path.join(d, "x.parquet"), "w").write("junk")
    for d in stale:
        os.utime(d, (old, old))
    out = table.vacuum(ttl_seconds=3600)
    assert len(out["swept"]) == 4
    assert not any(os.path.exists(d) for d in stale)
    assert os.path.exists(young)  # under TTL: an in-flight writer
    # live state untouched
    assert state_hash(table.snapshot().toPandas()) == before
    assert table.changefeed().count() > 0
