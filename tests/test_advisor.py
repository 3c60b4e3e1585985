"""Maintenance advisor (round 5, plans/advisor.py): metadata-only
recommendation rows whose actions name the verbs that resolve them.
Each planted condition must surface, and resolving it must clear the
advice — a healthy table advises nothing.
"""

import datetime as dt
import os

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _table(spark, tmp_path, **kw):
    spec = ChangelogSpec(seed=71, n_conv=30, extra_rate=1.2, dup_rate=0.1)
    log = str(tmp_path / "log")
    gen_changelog(log, spec)
    t, _ = replay(spark, log, str(tmp_path / "tbl"), **kw)
    return t


def _actions(t):
    return {r["action"] for r in t.advise().collect()}


def test_healthy_table_advises_nothing(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.compact()
    assert t.advise().count() == 0


def test_delta_debt_surfaces_and_clears(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.compact()
    t.set_write_mode("mor")
    t.upsert(spark.createDataFrame(
        [("adv-k", 0, "user", "delta", dt.datetime(2027, 8, 1))], ROWS))
    adv = t.advise().collect()
    debt = [r for r in adv if r["action"] == "compact --minor"]
    assert debt and "delta file" in debt[0]["reason"]
    assert debt[0]["severity"] == "low"  # tiny debt: broadcast still fine
    # past the broadcast budget the severity escalates
    os.environ["DIPPER_MOR_BROADCAST_BYTES"] = "1"
    try:
        esc = [r for r in t.advise().collect()
               if r["action"] == "compact --minor"]
        assert esc[0]["severity"] == "high"
        assert "broadcast-resolve budget" in esc[0]["reason"]
    finally:
        del os.environ["DIPPER_MOR_BROADCAST_BYTES"]
    t.compact(minor=True)
    assert "compact --minor" not in _actions(t)


def test_retention_and_layout_pressure(spark, tmp_path):
    t = _table(spark, tmp_path / "a", time_travel=True, chunk_lsn=120)
    os.environ["DIPPER_ADVISE_KEEP_VERSIONS"] = "2"
    try:
        adv = [r for r in t.advise().collect()
               if r["action"] == "expire --keep-last"]
        assert adv and adv[0]["metric"] > 2
        t.expire_snapshots(keep_last=2)
        assert "expire --keep-last" not in _actions(t)
    finally:
        del os.environ["DIPPER_ADVISE_KEEP_VERSIONS"]
    # layout: force a tiny per-bucket target so the table reads oversized
    os.environ["DIPPER_TARGET_BUCKET_BYTES"] = "1"
    try:
        adv = [r for r in t.advise().collect()
               if r["action"] == "rescale --n-buckets"]
        assert adv and int(adv[0]["target"]) > t._load()["n_buckets"]
        assert adv[0]["severity"] == "high"
    finally:
        del os.environ["DIPPER_TARGET_BUCKET_BYTES"]
    assert "rescale --n-buckets" not in _actions(t)


def test_changefeed_backlog_and_debris(spark, tmp_path):
    t = _table(spark, tmp_path, changefeed=True, chunk_lsn=120)
    os.environ["DIPPER_ADVISE_KEEP_BATCHES"] = "1"
    try:
        adv = [r for r in t.advise().collect() if r["action"].startswith("expire --changefeed")]
        assert adv and "no consumer group" in adv[0]["reason"]
        t.register_consumer("tailer")
        adv2 = [r for r in t.advise().collect() if r["action"].startswith("expire --changefeed")]
        assert "keep-consumed" in adv2[0]["action"]
    finally:
        del os.environ["DIPPER_ADVISE_KEEP_BATCHES"]
    # crash debris
    os.makedirs(os.path.join(t.root, "_tmp_compact_deadbeef"), exist_ok=True)
    adv = [r for r in t.advise().collect() if r["action"] == "vacuum"]
    assert adv and "debris" in adv[0]["reason"]
    t.vacuum(ttl_seconds=0)
    assert "vacuum" not in _actions(t)
