"""Write-audit-publish branches (round 5): a branch is a full manifest
copy under _branches/<name>.json; a LocalCowTable(root, branch=name)
handle writes it with the same merge/constraint/compaction machinery,
data files share the uuid-named data/ dir, branch commits never GC,
and fast_forward() publishes onto main only when main has not moved
since the fork (Iceberg's condition).  expire_snapshots refcounts
branch manifests too, so live branches keep their files and abandoned
branches are reclaimed.
"""

import datetime as dt

import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import (
    CommitConflict,
    ConstraintViolation,
    LocalCowTable,
)
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _table(spark, tmp_path, **kw):
    spec = ChangelogSpec(seed=91, n_conv=40, extra_rate=1.4, dup_rate=0.1)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "tbl"),
                      n_buckets=8, time_travel=True, **kw)
    return table


def _h(t):
    return state_hash(t.snapshot().toPandas())


def test_branch_writes_invisible_until_publish(spark, tmp_path):
    table = _table(spark, tmp_path)
    main_before = _h(table)
    br = table.create_branch("audit")
    br.upsert(spark.createDataFrame(
        [("b-k", 0, "user", "staged", dt.datetime(2027, 9, 1))], ROWS))
    br.delete_where("turn_idx = 2")
    assert _h(table) == main_before            # main untouched
    assert br.lookup("b-k", 0).first()["text"] == "staged"
    staged = _h(br)
    v = table.fast_forward("audit")
    assert _h(table) == staged                 # published atomically
    assert table._load()["version"] == v
    assert "audit" not in table.branches()
    assert "branch_name" not in table._load()


def test_fast_forward_refuses_diverged_main(spark, tmp_path):
    table = _table(spark, tmp_path)
    br = table.create_branch("wap")
    br.upsert(spark.createDataFrame(
        [("b-k", 0, "user", "staged", dt.datetime(2027, 9, 1))], ROWS))
    # main moves after the fork
    table.upsert(spark.createDataFrame(
        [("m-k", 0, "user", "mainline", dt.datetime(2027, 9, 1))], ROWS))
    with pytest.raises(CommitConflict, match="fast-forward impossible"):
        table.fast_forward("wap")
    # re-fork + re-apply is the documented recovery
    table.drop_branch("wap")
    br2 = table.create_branch("wap")
    br2.upsert(spark.createDataFrame(
        [("b-k", 0, "user", "staged", dt.datetime(2027, 9, 1))], ROWS))
    table.fast_forward("wap")
    assert table.lookup("b-k", 0).first()["text"] == "staged"
    assert table.lookup("m-k", 0).first()["text"] == "mainline"


def test_audit_gate_constraints_on_branch(spark, tmp_path):
    """The WAP audit step: constraints added on the BRANCH gate the
    staged writes; main never sees the constraint or the bad rows."""
    table = _table(spark, tmp_path)
    br = table.create_branch("gated")
    br.add_check_constraint("text_nonempty", "length(text) > 0")
    with pytest.raises(ConstraintViolation):
        br.upsert(spark.createDataFrame(
            [("bad", 0, "user", "", dt.datetime(2027, 9, 1))], ROWS))
    br.upsert(spark.createDataFrame(
        [("good", 0, "user", "ok", dt.datetime(2027, 9, 1))], ROWS))
    assert "text_nonempty" not in table.check_constraints()
    table.fast_forward("gated")
    assert "text_nonempty" in table.check_constraints()  # travels with publish
    assert table.lookup("good", 0).count() == 1


def test_branch_compact_never_breaks_main_and_expire_keeps_branch_files(spark, tmp_path):
    table = _table(spark, tmp_path)
    main_before = _h(table)
    br = table.create_branch("maint")
    br.upsert(spark.createDataFrame(
        [("b-k", 0, "user", "x", dt.datetime(2027, 9, 1))], ROWS))
    br.compact()                                  # rewrites EVERY branch bucket
    assert _h(table) == main_before              # shared files survived
    staged = _h(br)
    # expire on main with a live branch: branch files must be kept
    table.upsert(spark.createDataFrame(
        [("m-k", 0, "user", "y", dt.datetime(2027, 9, 1))], ROWS))
    table.expire_snapshots(keep_last=1)
    assert _h(br) == staged
    # abandoned branch -> its private files become reclaimable
    n_files = lambda: len([f for f in __import__("os").listdir(  # noqa: E731
        f"{table.root}/data") if f.endswith(".parquet")])
    before = n_files()
    table.drop_branch("maint")
    table.expire_snapshots(keep_last=1)
    assert n_files() < before


def test_branch_mor_and_changelog_compose(spark, tmp_path):
    table = _table(spark, tmp_path, write_mode="mor")
    v0 = table._load()["version"]
    br = table.create_branch("stage")
    br.upsert(spark.createDataFrame(
        [("b-k", 0, "user", "one", dt.datetime(2027, 9, 1))], ROWS))
    assert br.delta_file_count() > table.delta_file_count()
    table.fast_forward("stage")
    ch = table.changelog_between(v0).toPandas()
    assert ("b-k" in set(ch["conv_id"])
            and ch[ch["conv_id"] == "b-k"].iloc[0]["change_op"] == "I")


def test_validation(spark, tmp_path):
    table = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="bad branch name"):
        table.create_branch("a/b")
    br = table.create_branch("x")
    with pytest.raises(ValueError, match="already exists"):
        table.create_branch("x")
    with pytest.raises(ValueError, match="main handle"):
        br.create_branch("nested")
    with pytest.raises(ValueError, match="main handle"):
        br.expire_snapshots()
    with pytest.raises(ValueError, match="no such branch"):
        table.drop_branch("nope")
    # changefeed and non-TT tables refuse branches
    cf = LocalCowTable.create(spark, str(tmp_path / "cf"), n_buckets=4,
                              changefeed=True, time_travel=True)
    with pytest.raises(ValueError, match="changefeed"):
        cf.create_branch("y")
    plain = LocalCowTable.create(spark, str(tmp_path / "plain"), n_buckets=4)
    with pytest.raises(ValueError, match="time_travel"):
        plain.create_branch("y")
    # publishing an untouched branch is a clean no-op
    v = table._load()["version"]
    assert table.fast_forward("x") == v