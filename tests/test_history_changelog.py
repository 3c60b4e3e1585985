"""SCD2 history from the snapshot-diff changelog (round 5 —
plans/history.py source='changelog'): tables WITHOUT a write-time
changefeed (MoR especially) get row-version history at per-retained-
commit resolution, seeded from the earliest retained snapshot.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dipper_spark.plans.history import state_at
from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import LocalCowTable
from dipper_spark.schemas import SPEC_COLUMNS
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _table(spark, tmp_path, **kw):
    spec = ChangelogSpec(seed=83, n_conv=30, extra_rate=1.2, dup_rate=0.1)
    log = str(tmp_path / "log")
    gen_changelog(log, spec)
    t, _ = replay(spark, log, str(tmp_path / "tbl"), chunk_lsn=150,
                  time_travel=True, **kw)
    return t


def test_mor_current_slice_and_intervals(spark, tmp_path):
    t = _table(spark, tmp_path, write_mode="mor")
    hist = t.history(source="changelog").cache()
    cur = hist.filter("is_current").select(*SPEC_COLUMNS)
    assert state_hash(cur.toPandas()) == state_hash(t.snapshot().toPandas())
    # per key: intervals disjoint, U-closed intervals contiguous
    pdf = hist.orderBy("conv_id", "turn_idx", "effective_from_ts",
                       "effective_from_lsn").toPandas()
    for (_c, _t), grp in pdf.groupby(["conv_id", "turn_idx"]):
        rows = grp.to_dict("records")
        for a, b in zip(rows, rows[1:]):
            assert (a["effective_to_ts"], a["effective_to_lsn"]) <= (
                b["effective_from_ts"], b["effective_from_lsn"])
            if a["end_op"] == "U":
                assert (a["effective_to_ts"], a["effective_to_lsn"]) == (
                    b["effective_from_ts"], b["effective_from_lsn"])
        assert sum(1 for r in rows if r["is_current"]) <= 1
    hist.unpersist()


def test_state_at_reproduces_every_version_mor(spark, tmp_path):
    # NB state_at == as_of requires commit order to agree with the
    # (ts, lsn) version clock at the probed frontiers; with the
    # disordered generator that is seed-dependent (a later commit can
    # apply a smaller-(ts,lsn) event on another key).  seed=83 with
    # chunk_lsn=150 satisfies it — deterministic, pinned here; the
    # general in-order guarantee is pinned by the controlled-clock
    # sequence in the cdc_history_changelog contract.
    t = _table(spark, tmp_path, write_mode="mor")
    hist = t.history(source="changelog").cache()
    for v in t.versions()[1:]:
        snap = t.read(as_of=v).filter(~F.coalesce("_deleted", F.lit(False)))
        frontier = snap.agg(
            F.max(F.struct(F.col("_op_ts"), F.col("_lsn"))).alias("m")).first()["m"]
        got = state_at(hist, frontier["_op_ts"], frontier["_lsn"]) \
            .select(*SPEC_COLUMNS)
        want = t.snapshot(as_of=v).select(*SPEC_COLUMNS)
        assert state_hash(got.toPandas()) == state_hash(want.toPandas()), \
            f"state_at != as_of for v{v}"
    hist.unpersist()


def test_seeded_from_floor_after_expire(spark, tmp_path):
    # plain CoW + time travel, no feed; small chunks -> many commits
    spec = ChangelogSpec(seed=84, n_conv=30, extra_rate=1.2, dup_rate=0.1)
    log = str(tmp_path / "log")
    gen_changelog(log, spec)
    t, _ = replay(spark, log, str(tmp_path / "tbl"), chunk_lsn=40,
                  time_travel=True)
    assert len(t.versions()) > 4  # the expire below must drop some
    t.expire_snapshots(keep_last=3)
    vs = t.versions()
    assert vs[0] > 0  # a non-empty floor: the seed path is exercised
    hist = t.history(source="changelog").cache()
    # current slice still exact
    assert state_hash(hist.filter("is_current").select(*SPEC_COLUMNS)
                      .toPandas()) == state_hash(t.snapshot().toPandas())
    # seed rows carry the floor version as their batch
    assert hist.filter(F.col("batch") == vs[0]).count() > 0
    # explicit from_version (newer floor) also works, via tag name too
    t.tag_snapshot("floor", vs[-2])
    h2 = t.history(source="changelog", from_version="floor")
    assert state_hash(h2.filter("is_current").select(*SPEC_COLUMNS)
                      .toPandas()) == state_hash(t.snapshot().toPandas())
    hist.unpersist()


def test_matches_feed_history_on_same_commits(spark, tmp_path):
    """On a changefeed CoW table where each commit is one feed batch,
    the changelog-derived history equals the feed-derived history
    row-for-row on the shared columns."""
    t = _table(spark, tmp_path, changefeed=True)
    cols = [*SPEC_COLUMNS, "version_op", "effective_from_ts",
            "effective_from_lsn", "effective_to_ts", "effective_to_lsn",
            "end_op", "is_current"]
    a = t.history().select(*cols)
    b = t.history(source="changelog").select(*cols)
    assert state_hash(a.toPandas()) == state_hash(b.toPandas())


def test_delete_resurrection_and_purge_refusal(spark, tmp_path):
    t = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=4,
                             time_travel=True, write_mode="mor")
    t.upsert(spark.createDataFrame(
        [("k", 0, "user", "v1", dt.datetime(2027, 1, 1))], ROWS))
    t.delete_where("conv_id = 'k'")
    t.upsert(spark.createDataFrame(
        [("k", 0, "user", "v2", dt.datetime(2027, 1, 3))], ROWS))
    hist = t.history(source="changelog").orderBy("effective_from_ts") \
        .collect()
    assert [r["text"] for r in hist] == ["v1", "v2"]
    assert hist[0]["end_op"] == "D" and hist[1]["is_current"]
    # the D gap is real: between delete and resurrection nothing exists
    gap = state_at(t.history(source="changelog"),
                   dt.datetime(2027, 1, 2), 2 ** 61)
    assert gap.filter("conv_id = 'k'").count() == 0
    # unplaceable delete: a retained step must span live -> gone with
    # the tombstone's identity purged in between.  Pin the live
    # version with a tag, delete, purge the tombstone, expire the
    # intermediate: the (tag -> current) step emits D with null stamps.
    t2 = LocalCowTable.create(spark, str(tmp_path / "t2"), n_buckets=4,
                              time_travel=True)
    t2.upsert(spark.createDataFrame(
        [("k3", 0, "user", "doomed", dt.datetime(2027, 2, 1))], ROWS))
    t2.tag_snapshot("live")
    t2.delete_where("conv_id = 'k3'")
    t2.compact(drop_tombstones=True)
    t2.expire_snapshots(keep_last=1)  # retained: tagged live + current
    with pytest.raises(ValueError, match="lost its \\(ts, lsn\\) identity"):
        t2.history(source="changelog")
    # from_version after the purge works again (k3 never appears)
    h = t2.history(source="changelog",
                   from_version=t2.versions()[-1])
    assert h.filter("conv_id = 'k3'").count() == 0


def test_refusals(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="scope filtering"):
        t.history(source="changelog", scope="x")
    with pytest.raises(ValueError, match="source must be"):
        t.history(source="nope")
    t2, _ = replay(spark, str(tmp_path / "log"), str(tmp_path / "ntt"))
    with pytest.raises(ValueError, match="time_travel"):
        t2.history(source="changelog")
