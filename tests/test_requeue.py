"""requeue_quarantined (round 5): the dead-letter sink's exit door —
constraint-quarantined rows re-applied with their ORIGINAL (ts, lsn)
after the cause is fixed.  Pinned here:

  * drop the constraint -> requeue applies the rows, purges the
    drained dirs, and a second requeue is an empty no-op;
  * the strict LWW guard protects data that moved on: a key updated
    with a NEWER version since quarantine is untouched by requeue;
  * with the quarantine constraint still active, requeued rows route
    straight back (table unchanged, dirs repopulated);
  * keep=... leaves the dirs in place and the run stays idempotent.
"""

import datetime as dt

from dipper_spark.plans.target import LocalCowTable

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"
TS = dt.datetime(2027, 3, 1)


def _row(conv, turn, text, ts=TS, role="user"):
    return (conv, turn, role, text, ts)


def _mk(spark, tmp_path, **kw):
    return LocalCowTable.create(spark, str(tmp_path / "tbl"), n_buckets=8, **kw)


def _quarantine_two(spark, t):
    t.add_check_constraint("text_present",
                           "text IS NOT NULL AND length(text) > 0",
                           mode="quarantine")
    t.upsert(spark.createDataFrame(
        [_row("a", 0, "ok"), _row("b", 0, ""), _row("c", 0, "")], ROWS))
    assert t.quarantined().count() == 2
    return t


def test_requeue_after_drop_applies_and_purges(spark, tmp_path):
    t = _quarantine_two(spark, _mk(spark, tmp_path))
    t.drop_check_constraint("text_present")
    out = t.requeue_quarantined()
    assert out["rows_requeued"] == 2
    assert out["rows_applied"] == 2
    assert out["batches_purged"] >= 1
    snap = t.snapshot().toPandas()
    assert set(snap["conv_id"]) == {"a", "b", "c"}
    assert t.quarantined().count() == 0
    # drained: second requeue is the empty no-op
    assert t.requeue_quarantined() == {"rows_requeued": 0,
                                       "batches_purged": 0}


def test_requeue_respects_lww_guard(spark, tmp_path):
    t = _quarantine_two(spark, _mk(spark, tmp_path))
    # key 'b' moves on with a NEWER version while its old row sits
    # quarantined; the fixed-up requeue must not clobber it
    t.drop_check_constraint("text_present")
    newer = dt.datetime(2027, 3, 2)
    t.upsert(spark.createDataFrame([_row("b", 0, "newer", ts=newer)], ROWS))
    out = t.requeue_quarantined()
    assert out["rows_requeued"] == 2
    assert out["conflicts_lww_lost"] >= 1
    snap = {r["conv_id"]: r["text"]
            for _, r in t.snapshot().toPandas().iterrows()}
    assert snap["b"] == "newer"  # requeued stale row lost the race
    assert snap["c"] == ""       # the other one landed


def test_requeue_still_violating_goes_back(spark, tmp_path):
    t = _quarantine_two(spark, _mk(spark, tmp_path))
    before = t.snapshot().count()
    out = t.requeue_quarantined()  # constraint still active
    assert out["rows_requeued"] == 2
    assert out["rows_requarantined"] == 2
    assert out["rows_applied"] == 0
    assert t.snapshot().count() == before
    assert t.quarantined().count() == 2  # routed right back


def test_requeue_keep_leaves_dirs_and_stays_idempotent(spark, tmp_path):
    t = _quarantine_two(spark, _mk(spark, tmp_path))
    t.drop_check_constraint("text_present")
    out = t.requeue_quarantined(purge=False)
    assert out["rows_requeued"] == 2 and out["batches_purged"] == 0
    assert t.quarantined().count() == 2  # dirs kept
    h = t.snapshot().toPandas()
    # replaying the kept dirs is a no-op (same (ts,lsn) loses ties)
    out2 = t.requeue_quarantined(purge=False)
    assert out2["rows_applied"] == 0
    assert t.snapshot().toPandas().equals(h)
