"""Table clone (round 5 — Delta CLONE / Iceberg snapshot-export
shape): LocalCowTable.clone() forks the current state into a new
independent root.  Shallow clones hardlink live data files (zero-copy;
copy-on-write falls out of immutable uuid-named files — each side's
commits write new files and GC only unlinks its own directory entry),
deep clones copy bytes.  Ledger + scope_seq carry (idempotent replay
skip, no feed batch-id collisions); history/tags/consumers/feed
history do not (feed floor set so consumers fail crisply and
bootstrap).
"""

import datetime as dt
import os

import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import ChangefeedExpiredError, LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"
TS = dt.datetime(2027, 6, 1)


def _mk(spark, tmp_path, seed=71, **kw):
    log = str(tmp_path / f"log{seed}")
    gen_changelog(log, ChangelogSpec(seed=seed, n_conv=40, extra_rate=1.2,
                                     dup_rate=0.1))
    table, stats = replay(spark, log, str(tmp_path / f"tbl{seed}"), **kw)
    return table, stats


def _h(table, **kw):
    return state_hash(table.snapshot(**kw).toPandas())


def _live_rels(man):
    rels = [e[0] for es in man["buckets"].values() for e in es]
    rels += [e[0] for es in man.get("deltas", {}).values() for e in es]
    return rels


def test_shallow_clone_state_inodes_and_two_way_isolation(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    h0 = _h(t)
    c = t.clone(str(tmp_path / "clone"))

    # exact state, zero-copy (same inode), stats/pruning metadata carried
    assert _h(c) == h0
    man = c._load()
    rels = _live_rels(man)
    assert rels and all(
        os.stat(os.path.join(c.root, r)).st_nlink >= 2
        and os.path.samefile(os.path.join(c.root, r), os.path.join(t.root, r))
        for r in rels)
    assert man["cloned_from"]["version"] == t._load()["version"]
    assert man.get("file_stats") == t._load().get("file_stats")

    # diverge both ways: immutable files make the fork copy-on-write
    c.upsert(spark.createDataFrame([("cl-a", 0, "user", "clone", TS)], ROWS))
    assert _h(t) == h0
    hc = _h(c)
    t.upsert(spark.createDataFrame([("cl-b", 0, "user", "src", TS)], ROWS))
    assert _h(c) == hc
    assert t.snapshot().filter("conv_id = 'cl-a'").count() == 0
    assert c.snapshot().filter("conv_id = 'cl-b'").count() == 0


def test_source_and_clone_gc_cannot_break_each_other(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, seed=72)
    c = t.clone(str(tmp_path / "clone"))
    hc = _h(c)
    h0 = _h(t)

    # non-TT source: two commits after the fork supersede then DELETE
    # pre-clone bucket files from the source root (one-commit-deferred
    # GC) — the clone reads through surviving hardlinked inodes
    pre = set(_live_rels(t._load()))
    t.upsert(spark.createDataFrame([("gc-a", 0, "user", "one", TS)], ROWS))
    t.upsert(spark.createDataFrame([("gc-a", 1, "user", "two", TS)], ROWS))
    gone = [r for r in pre if not os.path.exists(os.path.join(t.root, r))]
    assert gone, "expected source GC to delete at least one superseded file"
    assert _h(c) == hc

    # and the mirror direction: clone compacts (rewrites every bucket,
    # unlinking ALL its pre-clone links after the grace commit) plus a
    # follow-up commit to flush the grace window — the source must keep
    # reading its exact (post-upsert) state through its own links
    h_src = _h(t)
    c.compact()
    c.upsert(spark.createDataFrame([("gc-b", 0, "user", "post", TS)], ROWS))
    assert _h(t) == h_src and h_src != h0  # changed by its OWN upserts only
    assert t.snapshot().filter("conv_id = 'gc-a'").count() == 2
    assert t.snapshot().filter("conv_id = 'gc-b'").count() == 0


def test_deep_clone_copies_bytes(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, seed=73)
    c = t.clone(str(tmp_path / "deep"), deep=True)
    assert _h(c) == _h(t)
    rels = _live_rels(c._load())
    assert rels and all(
        os.stat(os.path.join(c.root, r)).st_nlink == 1 for r in rels)
    assert c._load()["cloned_from"]["deep"] is True


def test_mor_clone_carries_deltas_and_resolves(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, seed=74, chunk_lsn=200, write_mode="mor")
    # ensure outstanding deltas at clone time
    t.upsert(spark.createDataFrame([("mor-x", 0, "user", "delta", TS)], ROWS))
    assert t.delta_file_count() > 0
    c = t.clone(str(tmp_path / "morclone"))
    assert _h(c) == _h(t)
    assert c.delta_file_count() == t.delta_file_count()
    # clone keeps working as MoR: next upsert appends, compact folds
    c.upsert(spark.createDataFrame(
        [("mor-x", 0, "user", "delta2", TS + dt.timedelta(hours=1))], ROWS))
    assert c.snapshot().filter("conv_id = 'mor-x'").first()["text"] == "delta2"
    c.compact()
    assert c.delta_file_count() == 0


def test_ledger_and_scope_seq_carry(spark, tmp_path):
    t, stats = _mk(spark, tmp_path, seed=75)
    t.upsert(spark.createDataFrame([("sq-a", 0, "user", "api", TS)], ROWS))
    c = t.clone(str(tmp_path / "ledclone"))
    # re-replaying the SAME log into the clone skips every batch via
    # the carried ledger (migration use case: clone, repoint the
    # stream, re-delivered batches are no-ops)
    h = _h(c)
    log = str(tmp_path / "log75")
    _, stats2 = replay(spark, log, c.root)
    assert all(s.skipped for s in stats2) and _h(c) == h
    # API batch-id sequence continues (no restart at 0)
    assert c._load()["scope_seq"] == t._load()["scope_seq"]


def test_time_travel_clone_starts_history_fresh(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, seed=76, time_travel=True)
    t.upsert(spark.createDataFrame([("tt-a", 0, "user", "v+1", TS)], ROWS))
    t.tag_snapshot("pin")
    v = t._load()["version"]
    c = t.clone(str(tmp_path / "ttclone"))
    # only the clone point is retained; older as_of raises; tags dropped
    assert c.versions() == [v]
    assert _h(c, as_of=v) == _h(t)
    with pytest.raises(FileNotFoundError):
        c.snapshot(as_of=v - 1).count()
    assert c.tags() == {}
    # source expire after the fork cannot break the clone
    t.upsert(spark.createDataFrame([("tt-b", 0, "user", "post", TS)], ROWS))
    t.drop_tag("pin")
    t.expire_snapshots(keep_last=1)
    assert c.snapshot().filter("conv_id = 'tt-a'").count() == 1


def test_changefeed_clone_floor_and_fresh_feed(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, seed=77, changefeed=True)
    t.upsert(spark.createDataFrame([("cf-a", 0, "user", "feed", TS)], ROWS))
    assert t.changefeed().count() > 0
    c = t.clone(str(tmp_path / "cfclone"))
    # pre-clone feed history is NOT copied; a full read fails crisply
    assert not os.path.isdir(os.path.join(c.root, "_changes"))
    c.upsert(spark.createDataFrame([("cf-b", 0, "user", "new", TS)], ROWS))
    with pytest.raises(ChangefeedExpiredError):
        c.changefeed().count()
    # tailing from the floor works and sees only post-clone changes
    floors = c._load()["changefeed_floor"]
    tag = c._scope_tag("api")
    tail = c.changefeed(since_batch=floors[tag] - 1, scope="api")
    assert tail.count() == 1 and tail.first()["conv_id"] == "cf-b"
    # batch ids never collide with the (dropped) pre-clone history
    assert tail.first()["batch"] >= floors[tag]


def test_clone_refusals(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, seed=78, time_travel=True)
    # non-empty destination
    dest = tmp_path / "busy"
    dest.mkdir()
    (dest / "x").write_text("occupied")
    with pytest.raises(ValueError, match="not empty"):
        t.clone(str(dest))
    # nesting either way, and self
    with pytest.raises(ValueError, match="nest"):
        t.clone(os.path.join(t.root, "sub"))
    with pytest.raises(ValueError, match="source itself"):
        t.clone(t.root)
    # branch handles refuse
    t.create_branch("wip")
    b = LocalCowTable(spark, t.root, branch="wip")
    with pytest.raises(ValueError, match="main handle"):
        b.clone(str(tmp_path / "frombranch"))


def test_clone_under_concurrent_writer_is_consistent_snapshot(spark, tmp_path):
    """clone() links files under the SOURCE commit lock, so a clone
    taken while a writer hammers the source must be an exact,
    CONSISTENT snapshot of the version it records in cloned_from —
    never a torn mix of two commits and never a FileNotFound from a
    concurrent commit's GC.  Time-travel source pins the expectation:
    clone hash == source.snapshot(as_of=cloned_from.version) hash."""
    import threading

    t, _ = _mk(spark, tmp_path, seed=79, time_travel=True)
    stop = threading.Event()
    errors: list = []

    def writer():
        try:
            h = LocalCowTable(spark, t.root)
            b = 0
            while not stop.is_set() and b < 40:
                h.upsert(spark.createDataFrame(
                    [(f"cc-{b % 5}", 0, "user", f"b{b}",
                      TS + dt.timedelta(minutes=b))], ROWS))
                b += 1
        except Exception as e:
            errors.append(e)

    th = threading.Thread(target=writer)
    th.start()
    try:
        clones = []
        for i in range(4):
            c = t.clone(str(tmp_path / f"cc_clone{i}"))
            clones.append((c, c._load()["cloned_from"]["version"]))
    finally:
        stop.set()
        th.join()
    assert not errors, errors
    for c, v in clones:
        assert _h(c) == state_hash(t.snapshot(as_of=v).toPandas()), \
            f"clone of version {v} is not that version's snapshot"


def test_clone_as_of_forks_a_retained_version(spark, tmp_path):
    """clone(as_of=) — Delta 'CLONE ... VERSION AS OF': fork a retained
    version's full manifest state (files, schema history, ledger)."""
    t, _ = _mk(spark, tmp_path, seed=80, time_travel=True)
    v1 = t._load()["version"]
    h1 = _h(t)
    t.tag_snapshot("golden")
    t.upsert(spark.createDataFrame([("ao-a", 0, "user", "later", TS)], ROWS))
    assert _h(t) != h1

    c = t.clone(str(tmp_path / "ao_clone"), as_of=v1)
    assert _h(c) == h1
    assert c._load()["cloned_from"]["version"] == v1
    assert c.versions() == [v1]
    # tag names resolve against the SOURCE's tags
    c2 = t.clone(str(tmp_path / "ao_tag"), as_of="golden")
    assert _h(c2) == h1
    # the fork is independent: writes to it never reach the source
    c.upsert(spark.createDataFrame([("ao-b", 0, "user", "fork", TS)], ROWS))
    assert t.snapshot().filter("conv_id = 'ao-b'").count() == 0

    # non-retained version and non-TT source refuse crisply
    with pytest.raises(FileNotFoundError, match="not retained"):
        t.clone(str(tmp_path / "ao_bad"), as_of=v1 + 100)
    t2, _ = _mk(spark, tmp_path, seed=81)
    with pytest.raises(FileNotFoundError):
        t2.clone(str(tmp_path / "ao_nontt"), as_of=0)
