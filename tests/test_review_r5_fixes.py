"""Round-5 self-review regression tests (post-VERDICT r4 code review
over the 3c56dcf..HEAD diff).  One test per confirmed finding:

  1. concurrent add/drop of a CHECK constraint between a writer's read
     and its commit must CONFLICT (the staged rows were never validated
     against the new set) — and the self-rederiving API writers must
     re-validate on retry, not silently commit;
  2. legacy (round-4) plain-list consumed watermarks must compact to a
     true hwm, or the retention-hole probe spuriously expires views;
  3. AVG views over fractional values must expose the true mean (the
     per-row long cast belongs to SUM aggs only);
  4. fast_forward must carry main's CURRENT tags (move_tag does not
     bump the version, so the publish CAS cannot see a moved pin);
  5. expire_snapshots on a non-time-travel table must not reclaim the
     one-commit-grace (pending_gc) files;
  6. quarantined() must mergeSchema across ADD-column evolution;
  7. pre-round-5 changefeed scope dirs (8-hex tags) must be adopted
     onto the current 's'+7-hex tag — history, floors and acks intact.
"""

import datetime as dt
import json
import os

import pytest

from dipper_spark.plans.ivm import IncrementalView, consumed_parts
from dipper_spark.plans.target import (CommitConflict, ConstraintViolation,
                                       LocalCowTable)

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"
TS = dt.datetime(2027, 4, 1)


def _df(spark, rows, schema=ROWS):
    return spark.createDataFrame(rows, schema)


def _inject_before_commit(table, action):
    orig = table._commit_merge
    fired = {"done": False}

    def wrapper(*args, **kwargs):
        if not fired["done"]:
            fired["done"] = True
            action()
        return orig(*args, **kwargs)

    table._commit_merge = wrapper


# ---------- 1. constraint-set change is a commit conflict ----------

def test_concurrent_constraint_add_conflicts_explicit_writer(spark, tmp_path):
    t = LocalCowTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    t.upsert(_df(spark, [("c", 0, "user", "seed", TS)]))
    other = LocalCowTable(spark, t.root)
    _inject_before_commit(
        t, lambda: other.add_check_constraint(
            "text_nonnull", "text IS NOT NULL", validate=False))
    with pytest.raises(CommitConflict, match="CHECK constraints changed"):
        # explicit-batch-id writers (the CDC path) never retry
        t.upsert(_df(spark, [("c", 1, "user", "unvalidated", TS)]),
                 batch_id=99, scope="explicit")
    # nothing leaked past the unvalidated commit
    assert t.snapshot().count() == 1


def test_concurrent_constraint_add_revalidates_on_retry(spark, tmp_path):
    """The API upsert retries CommitConflict by re-planning against
    fresh state — which now includes the new constraint, so a
    violating row raises ConstraintViolation instead of silently
    committing unvalidated."""
    t = LocalCowTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    t.upsert(_df(spark, [("c", 0, "user", "seed", TS)]))
    other = LocalCowTable(spark, t.root)
    _inject_before_commit(
        t, lambda: other.add_check_constraint(
            "no_bad", "text != 'bad'", validate=False))
    with pytest.raises(ConstraintViolation, match="no_bad=1"):
        t.upsert(_df(spark, [("c", 1, "user", "bad", TS)]))
    assert t.snapshot().count() == 1  # the violating row never landed


# ---------- 2. legacy list-form consumed watermark ----------

def test_consumed_parts_compacts_legacy_list():
    assert consumed_parts([0, 1, 2]) == (2, set())
    assert consumed_parts([0, 1, 3]) == (1, {3})
    assert consumed_parts([]) == (-1, set())
    assert consumed_parts(None) == (-1, set())
    assert consumed_parts({"hwm": 4, "extra": [7]}) == (4, {7})


def test_legacy_list_meta_survives_retention(spark, tmp_path):
    t = LocalCowTable.create(spark, str(tmp_path / "tbl"), n_buckets=4,
                             changefeed=True)
    for i in range(3):
        t.upsert(_df(spark, [("c", i, "user", f"v{i}", TS)]), scope="s1")
    view = IncrementalView(spark, t, str(tmp_path / "view"),
                           ["conv_id"], {"n": "1"})
    view.refresh()
    # rewrite the meta's consumed entry into the round-4 plain-list form
    meta = view._meta()
    tag = t._scope_tag("s1")
    hwm = consumed_parts(meta["consumed"][tag])[0]
    meta["consumed"][tag] = list(range(hwm + 1))  # legacy form
    view._write_meta(meta)
    # retention up to the consumed watermark must NOT look like a hole
    t.expire_changefeed(keep_last_batches=1, scope="s1")
    out = view.refresh()
    assert out["noop"]
    # and new batches still fold
    t.upsert(_df(spark, [("c", 99, "user", "new", TS)]), scope="s1")
    assert not view.refresh()["noop"]
    assert view.read().filter("conv_id = 'c'").first()["n"] == 4


# ---------- 3. AVG over fractional values ----------

def test_avg_view_fractional_values_exact(spark, tmp_path):
    t = LocalCowTable.create(spark, str(tmp_path / "tbl"), n_buckets=4,
                             changefeed=True)
    rows = "conv_id string, turn_idx long, score double, ts timestamp"
    t.upsert(_df(spark, [("c", 0, 0.25, TS), ("c", 1, 0.5, TS),
                         ("c", 2, 1.75, TS)], rows))
    view = IncrementalView(spark, t, str(tmp_path / "view"),
                           ["conv_id"], {}, avgs={"avg_score": "score"})
    view.refresh()
    got = view.read().first()
    assert got["avg_score"] == pytest.approx((0.25 + 0.5 + 1.75) / 3)
    # and it keeps agreeing with the full recompute across an update
    t.upsert(_df(spark, [("c", 1, 0.75, dt.datetime(2027, 4, 2))], rows))
    view.refresh()
    got = view.read().first()["avg_score"]
    want = view.full_recompute().first()["avg_score"]
    assert got == pytest.approx(want) == pytest.approx((0.25 + 0.75 + 1.75) / 3)


# ---------- 4. fast_forward keeps moved tags ----------

def test_fast_forward_preserves_moved_tags(spark, tmp_path):
    t = LocalCowTable.create(spark, str(tmp_path / "tbl"), n_buckets=4,
                             time_travel=True)
    t.upsert(_df(spark, [("c", 0, "user", "v1", TS)]))
    t.upsert(_df(spark, [("c", 1, "user", "v2", TS)]))
    vs = t.versions()
    t.move_tag("consumer/m", vs[0])
    br = t.create_branch("wap")
    br.upsert(_df(spark, [("c", 2, "user", "branch-row", TS)]))
    # consumer pin moves on main AFTER the fork — move_tag does not
    # bump the version, so the publish CAS still passes
    t.move_tag("consumer/m", vs[-1])
    t.move_tag("post-fork-tag", vs[-1])
    t.fast_forward("wap")
    tags = t.tags()
    assert tags["consumer/m"] == vs[-1], "moved pin reverted by publish"
    assert tags["post-fork-tag"] == vs[-1], "post-fork tag lost by publish"
    assert t.snapshot().count() == 3  # branch data did publish


# ---------- 5. expire_snapshots keeps the one-commit grace ----------

def test_expire_snapshots_non_tt_keeps_grace_files(spark, tmp_path):
    t = LocalCowTable.create(spark, str(tmp_path / "tbl"), n_buckets=2)
    t.upsert(_df(spark, [("c", 0, "user", "v1", TS)]))
    t.upsert(_df(spark, [("c", 0, "user", "v2", dt.datetime(2027, 4, 2))]))
    pending = t._load().get("pending_gc", [])
    assert pending, "second commit should have deferred the first's file"
    t.expire_snapshots(keep_last=1)
    for rel in pending:
        assert os.path.exists(os.path.join(t.root, rel)), (
            "expire collapsed the one-commit grace window")
    assert t.snapshot().count() == 1


# ---------- 6. quarantined() across schema evolution ----------

def test_quarantined_merges_schema_across_evolution(spark, tmp_path):
    t = LocalCowTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    t.add_check_constraint("short_text", "length(text) < 6", mode="quarantine")
    t.upsert(_df(spark, [("c", 0, "user", "toolong1", TS)]))
    rows2 = ("conv_id string, turn_idx long, role string, text string, "
             "tool string, ts timestamp")
    t.upsert(_df(spark, [("c", 1, "user", "toolong2", "grep", TS),
                         ("c", 2, "user", "ok", "sed", TS)], rows2))
    q = t.quarantined()
    assert "tool" in q.columns, "pre-evolution file won the schema inference"
    by_turn = {r["turn_idx"]: r["tool"] for r in q.collect()}
    assert by_turn[1] == "grep" and by_turn[0] is None


# ---------- 7. legacy scope-dir adoption ----------

def test_legacy_scope_dir_adopted(spark, tmp_path):
    t = LocalCowTable.create(spark, str(tmp_path / "tbl"), n_buckets=4,
                             changefeed=True)
    for i in range(2):
        t.upsert(_df(spark, [("c", i, "user", f"v{i}", TS)]), scope="s1")
    t.register_consumer("m")
    t.ack_consumer("m", {t._scope_tag("s1"): 0})
    t.expire_changefeed(keep_last_batches=1, scope="s1")

    # simulate a pre-round-5 table: dir + floor + ack keyed by the
    # legacy 8-hex tag
    new_tag, old_tag = t._scope_tag("s1"), t._legacy_scope_tag("s1")
    base = os.path.join(t.root, "_changes")
    os.rename(os.path.join(base, f"scope={new_tag}"),
              os.path.join(base, f"scope={old_tag}"))
    man = t._load()
    man["changefeed_floor"] = {old_tag: man["changefeed_floor"].pop(new_tag)}
    man["changefeed_consumers"]["m"] = {old_tag: 0}
    t._write_manifest(man)

    # scoped read adopts: rows visible, dir/floors/acks re-keyed
    feed = t.changefeed(since_batch=0, scope="s1")
    assert feed.count() == 1
    assert os.path.isdir(os.path.join(base, f"scope={new_tag}"))
    assert not os.path.isdir(os.path.join(base, f"scope={old_tag}"))
    man = t._load()
    assert man["changefeed_floor"] == {new_tag: 1}
    assert man["changefeed_consumers"]["m"] == {new_tag: 0}

    # subsequent merges append to the adopted dir (one history)
    t.upsert(_df(spark, [("c", 9, "user", "post", TS)]), scope="s1")
    assert t.changefeed(since_batch=0, scope="s1").count() == 2
