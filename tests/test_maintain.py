"""maintain() (round 5): the advisor's recommendations executed — the
advise() -> verb loop closed.  Pinned here:

  * planted delta debt + crash debris + stale blooms all resolve in
    ONE maintain() call (the re-advise loop: compacting fresh files
    un-blooms them, so analyze must run in a later pass);
  * data is untouched (state hash invariant across maintenance);
  * policy items are skipped loudly, never auto-run (rescale without
    allow_rescale; an unconsumed-changefeed floor), and dry_run
    executes nothing;
  * after maintain() the advisor is clean (modulo skipped policy).
"""

import datetime as dt
import os

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _table(spark, tmp_path, **kw):
    spec = ChangelogSpec(seed=73, n_conv=30, extra_rate=1.2, dup_rate=0.1)
    log = str(tmp_path / "log")
    gen_changelog(log, spec)
    t, _ = replay(spark, log, str(tmp_path / "tbl"), **kw)
    return t


def test_maintain_resolves_debt_debris_and_blooms(spark, tmp_path):
    # 2 buckets so the one delta-debt bucket's rewrite un-blooms half
    # the base files — at or past the advisor's stale-coverage line
    t = _table(spark, tmp_path, write_mode="mor", n_buckets=2)
    t.compute_stats()  # opt into stats -> stale coverage will be flagged
    t.upsert(spark.createDataFrame(
        [("mnt-k", 0, "user", "delta debt", dt.datetime(2027, 9, 1))], ROWS))
    os.makedirs(os.path.join(t.root, "_tmp_compact_deadbeef"), exist_ok=True)
    before = state_hash(t.snapshot().toPandas())

    log = t.maintain(vacuum_ttl=0)
    done = {e["action"] for e in log if e["status"] == "done"}
    assert {"compact --minor", "vacuum", "analyze"} <= done
    # analyze ran AFTER the compact that invalidated the blooms
    acts = [e["action"] for e in log if e["status"] == "done"]
    assert acts.index("analyze") > acts.index("compact --minor")
    assert state_hash(t.snapshot().toPandas()) == before
    assert not any(t._load().get("deltas", {}).values())
    assert not os.path.exists(os.path.join(t.root, "_tmp_compact_deadbeef"))
    assert t.advise().count() == 0
    # second sweep: nothing to do
    assert t.maintain() == []


def test_maintain_dry_run_changes_nothing(spark, tmp_path):
    t = _table(spark, tmp_path, write_mode="mor", n_buckets=8)
    t.upsert(spark.createDataFrame(
        [("mnt-d", 0, "user", "delta", dt.datetime(2027, 9, 1))], ROWS))
    v = t._load()["version"]
    log = t.maintain(dry_run=True)
    assert log and all(e["status"] == "dry_run" for e in log)
    assert t._load()["version"] == v
    assert any(t._load().get("deltas", {}).values())  # debt still there


def test_maintain_skips_policy_items(spark, tmp_path, monkeypatch):
    t = _table(spark, tmp_path, n_buckets=2)
    # force the rescale recommendation with a REACHABLE target (the
    # advisor doubles n_buckets until bytes/bucket <= target, so a
    # pathological tiny target would recommend ~10^5 buckets)
    monkeypatch.setenv("DIPPER_TARGET_BUCKET_BYTES", "4096")
    log = t.maintain()
    resc = [e for e in log if e["action"] == "rescale --n-buckets"]
    assert resc and resc[0]["status"] == "skipped"
    assert "allow_rescale" in resc[0]["reason"]
    assert t._load()["n_buckets"] == 2
    # skipped items are reported once, not once per pass
    assert len(resc) == 1
    # opted in, the rescale actually runs
    log2 = t.maintain(allow_rescale=True)
    resc2 = [e for e in log2 if e["action"] == "rescale --n-buckets"]
    assert resc2 and resc2[0]["status"] == "done"
    assert t._load()["n_buckets"] > 2


def test_maintain_expires_snapshot_pileup(spark, tmp_path, monkeypatch):
    t = _table(spark, tmp_path, n_buckets=2, time_travel=True)
    for i in range(4):
        t.upsert(spark.createDataFrame(
            [("mnt-v", i, "user", f"v{i}", dt.datetime(2027, 9, 1, i))], ROWS))
    monkeypatch.setenv("DIPPER_ADVISE_KEEP_VERSIONS", "2")
    log = t.maintain()
    exp = [e for e in log if e["action"] == "expire --keep-last"]
    assert exp and exp[0]["status"] == "done"
    assert len(t.versions()) <= 3  # keep + current
