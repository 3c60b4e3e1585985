"""CHECK constraints (round 5, beyond-survey — plans/target.py
add_check_constraint): Delta-style table invariants enforced on every
write path.  enforce = violating batch raises BEFORE anything is
written; quarantine = violating rows go to the dead-letter sink and
the rest applies.  ANSI null semantics (NULL passes); deletes exempt.
"""

import datetime as dt

import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import (CommitConflict, ConstraintViolation,
                                       LocalCowTable)
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"
TS = dt.datetime(2027, 3, 1)


def _row(conv, turn, text, ts=TS, role="user"):
    return (conv, turn, role, text, ts)


def _mk(spark, tmp_path, **kw):
    return LocalCowTable.create(spark, str(tmp_path / "tbl"), n_buckets=8, **kw)


def test_enforce_rejects_batch_and_writes_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.upsert(spark.createDataFrame([_row("a", 0, "ok")], ROWS))
    t.add_check_constraint("text_present", "text IS NOT NULL AND length(text) > 0")
    before = state_hash(t.snapshot().toPandas())
    v0 = t._load()["version"]
    with pytest.raises(ConstraintViolation, match="text_present=1"):
        t.upsert(spark.createDataFrame(
            [_row("a", 1, "fine"), _row("a", 2, "")], ROWS))
    # NOTHING applied — not even the passing row; version unchanged
    assert state_hash(t.snapshot().toPandas()) == before
    assert t._load()["version"] == v0


def test_quarantine_applies_rest_and_routes_bad_rows(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_check_constraint("turn_nonneg", "turn_idx < 100", mode="quarantine")
    st = t.upsert(spark.createDataFrame(
        [_row("q", 0, "good"), _row("q", 500, "bad"), _row("q", 1, "good2")],
        ROWS))
    assert st.rows_quarantined == 1
    snap = t.snapshot()
    assert snap.count() == 2
    assert snap.filter("turn_idx = 500").count() == 0
    quar = t.quarantined()
    assert quar.count() == 1
    r = quar.first()
    assert r["turn_idx"] == 500 and r["text"] == "bad"
    # published under the committed batch id (stage-then-publish)
    assert r["batch"] == st.batch_id


def test_null_passes_and_deletes_exempt(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.upsert(spark.createDataFrame([_row("d", 0, "x")], ROWS))
    t.add_check_constraint("role_user", "role IN ('user','assistant')")
    # NULL role passes (ANSI CHECK), and a delete (null payload by
    # construction) is exempt from every constraint
    t.upsert(spark.createDataFrame([("d", 1, None, "y", TS)], ROWS))
    t.delete_where("conv_id = 'd' AND turn_idx = 0")
    assert t.snapshot().count() == 1


def test_add_validates_existing_rows(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.upsert(spark.createDataFrame([_row("v", 0, "")], ROWS))
    with pytest.raises(ConstraintViolation, match="nonempty=1"):
        t.add_check_constraint("nonempty", "length(text) > 0")
    # bad expressions fail at add time, not at the next merge
    with pytest.raises(Exception, match="no_such_col|UNRESOLVED|cannot be resolved"):
        t.add_check_constraint("bogus", "no_such_col > 0", validate=False)
    with pytest.raises(ValueError, match="already exists"):
        t.add_check_constraint("ok", "1=1")
        t.add_check_constraint("ok", "1=1")
    t.drop_check_constraint("ok")
    with pytest.raises(ValueError, match="no such"):
        t.drop_check_constraint("ok")


def test_replay_pipeline_respects_constraints(spark, tmp_path):
    """The CDC ingest path goes through the same gate: a quarantine
    constraint on a replayed changelog routes matching NET-CHANGE rows
    and the rest of the backfill equals the oracle minus those keys."""
    gen_changelog(str(tmp_path / "log"),
                  ChangelogSpec(seed=77, n_conv=40, extra_rate=1.2,
                                dup_rate=0.1))
    t = LocalCowTable.create(spark, str(tmp_path / "tbl"), n_buckets=8)
    t.add_check_constraint("short_text", "length(text) < 3", mode="quarantine")
    _, stats = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"))
    n_q = sum(s.rows_quarantined for s in stats if not s.skipped)
    assert n_q > 0
    assert t.quarantined().count() == n_q
    # no quarantined key leaked into the table
    assert t.snapshot().filter("length(text) >= 3").count() == 0


def test_constraints_compose_with_changefeed_and_ivm_consumers(spark, tmp_path):
    """Quarantined rows never enter the feed, so downstream consumers
    (changefeed replay) agree with the snapshot."""
    t = _mk(spark, tmp_path, changefeed=True)
    t.add_check_constraint("no_marker", "text NOT LIKE '%POISON%'",
                           mode="quarantine")
    t.upsert(spark.createDataFrame(
        [_row("c", 0, "clean"), _row("c", 1, "has POISON inside")], ROWS))
    feed = t.changefeed()
    assert feed.count() == 1
    assert feed.filter("text LIKE '%POISON%'").count() == 0


def test_concurrent_add_constraint_retries_or_conflicts(spark, tmp_path):
    """Version-CAS on add: if the table commits between validation and
    the manifest write, add re-validates (bounded) — here the second
    state still satisfies the constraint, so the add lands."""
    t = _mk(spark, tmp_path)
    t.upsert(spark.createDataFrame([_row("z", 0, "aa")], ROWS))
    orig = t._load

    calls = {"n": 0}

    def load_with_interleaved_commit():
        man = orig()
        if calls["n"] == 0:
            calls["n"] += 1
            other = LocalCowTable(t.spark, t.root)
            other.upsert(t.spark.createDataFrame([_row("z", 1, "bb")], ROWS))
        return man

    t._load = load_with_interleaved_commit
    t.add_check_constraint("len2", "length(text) = 2")
    t._load = orig
    assert "len2" in t.check_constraints()


def test_quarantined_empty_when_nothing_routed(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert t.quarantined().count() == 0  # no dir yet -> empty frame
    t.upsert(spark.createDataFrame([_row("e", 0, "x")], ROWS))
    q = t.quarantined()
    assert q.count() == 0 and {"scope", "batch", "_op_ts", "_lsn"} <= set(q.columns)
