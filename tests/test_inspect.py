"""Metadata inspection tables (round 5 — Iceberg metadata-table shape):
LocalCowTable.inspect('files'|'history'|'snapshots'|'refs'|'consumers'|
'constraints') renders the manifest as queryable DataFrames.  Ground
truth is the manifest JSON itself — every row must reconcile against
it, and the tables must stay consistent across writes, MoR deltas,
tags/branches and rollback.
"""

import datetime as dt
import os

import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _table(spark, tmp_path, **kw):
    spec = ChangelogSpec(seed=77, n_conv=40, extra_rate=1.2, dup_rate=0.1)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, stats = replay(spark, log_dir, str(tmp_path / "tbl"),
                          chunk_lsn=150, **kw)
    return table, stats


def test_files_history_reconcile_manifest(spark, tmp_path):
    table, stats = _table(spark, tmp_path, time_travel=True)
    man = table._load()
    files = table.inspect("files").toPandas()
    n_base = sum(len(e) for e in man["buckets"].values())
    assert len(files) == n_base
    assert set(files["kind"]) == {"base"}
    # every row has a real on-disk size and a recorded stats range
    assert (files["bytes"] > 0).all()
    assert files["conv_min"].notna().all() and (files["turn_min"] >= 0).all()
    assert set(files["path"]) == {rel for es in man["buckets"].values()
                                  for rel, _sid in es}
    hist = table.inspect("history").toPandas()
    assert len(hist) == len(man["ledger"])
    applied = [s for s in stats if not s.skipped]
    assert sorted(hist["batch_id"]) == sorted(e["batch_id"] for e in man["ledger"])
    assert hist["rows_applied"].sum() == sum(s.rows_applied for s in applied)


def test_snapshots_refs_consumers_constraints(spark, tmp_path):
    table, _ = _table(spark, tmp_path, time_travel=True)
    vs = table.versions()
    snaps = table.inspect("snapshots").toPandas()
    assert sorted(snaps["version"]) == vs
    assert snaps[snaps["is_current"]]["version"].tolist() == [vs[-1]]
    # tags + branches in refs
    table.tag_snapshot("rel1", vs[-1])
    table.create_branch("wip")
    refs = table.inspect("refs").toPandas()
    assert {(r["name"], r["type"]) for _, r in refs.iterrows()} == {
        ("rel1", "tag"), ("wip", "branch")}
    table.drop_branch("wip")
    # constraints
    table.add_check_constraint("turn_nonneg", "turn_idx >= 0")
    cons = table.inspect("constraints").toPandas()
    assert cons.iloc[0]["name"] == "turn_nonneg"
    assert cons.iloc[0]["mode"] == "enforce"
    # rollback breadcrumb appears on the new current snapshot row
    v_mid = vs[-2]
    table.rollback(v_mid)
    snaps2 = table.inspect("snapshots").toPandas()
    cur = snaps2[snaps2["is_current"]].iloc[0]
    assert cur["rolled_back_to"] == v_mid


def test_files_shows_mor_deltas_and_consumers(spark, tmp_path):
    table, _ = _table(spark, tmp_path)
    table.set_write_mode("mor")
    table.upsert(spark.createDataFrame(
        [("ins-k", 0, "user", "delta row", dt.datetime(2027, 3, 1))], ROWS))
    files = table.inspect("files").toPandas()
    deltas = files[files["kind"] == "delta"]
    assert len(deltas) == table.delta_file_count() > 0
    assert deltas["commit_version"].notna().all()
    # consumer watermarks render (changefeed table)
    t2 = LocalCowTable.create(spark, str(tmp_path / "cf"), changefeed=True)
    t2.upsert(spark.createDataFrame(
        [("c", 0, "user", "x", dt.datetime(2027, 3, 1))], ROWS))
    t2.register_consumer("viewer")
    t2.ack_consumer("viewer", {"api": 0})
    cons = t2.inspect("consumers").toPandas()
    assert cons.iloc[0].tolist() == ["viewer", "api", 0]
    with pytest.raises(ValueError, match="unknown metadata table"):
        table.inspect("nope")
