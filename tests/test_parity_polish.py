"""Round-5 Iceberg-parity polish: explicit ADD COLUMN DDL, age-based
snapshot expiry, and the metadata-only COUNT(*) fast path.

  * add_column: metadata-only commit, existing rows read NULL, fresh
    field id (a re-add after drop never resurrects old bytes), write
    path accepts the column afterwards;
  * expire_snapshots(older_than_s): age can only RETAIN MORE than the
    count policy (Iceberg `older_than` + `retain_last` composition);
  * count_rows(): answered from the manifest when every base file has
    a live_rows stat and no MoR deltas are outstanding — free for
    tombstone-free files (footer boolean stats decisive), backfilled
    by analyze for mixed files, falls back to one Spark job otherwise.
"""

import datetime as dt
import json
import os
import time

import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _table(spark, tmp_path, **kw):
    spec = ChangelogSpec(seed=77, n_conv=30, extra_rate=1.2, dup_rate=0.1)
    log = str(tmp_path / "log")
    gen_changelog(log, spec)
    t, _ = replay(spark, log, str(tmp_path / "tbl"), n_buckets=8, **kw)
    return t


# ---------------- add_column ----------------

def test_add_column_metadata_only_reads_null_then_writable(spark, tmp_path):
    t = _table(spark, tmp_path)
    files_before = sorted(r for r, _ in LocalCowTable._entries(t._load()))
    v = t.add_column("sentiment", "double")
    man = t._load()
    assert man["version"] == v
    # metadata-only: same files on disk
    assert sorted(r for r, _ in LocalCowTable._entries(man)) == files_before
    # snapshot() stays spec-shaped by design; the evolved column is
    # visible through read()/lookup() like every merge-time ADD
    full = t.read(include_system=False)
    assert "sentiment" in full.columns
    assert full.filter("sentiment IS NOT NULL").count() == 0
    # the new column is writable through the normal merge path
    t.upsert(spark.createDataFrame(
        [("pp-k", 0, "user", "x", dt.datetime(2028, 2, 1), 0.75)],
        ROWS + ", sentiment double"))
    assert t.lookup("pp-k", 0).first()["sentiment"] == 0.75


def test_add_column_rejects_dup_reserved_invalid(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("text", "string")
    with pytest.raises(ValueError, match="reserved"):
        t.add_column("_lsn", "long")
    with pytest.raises(ValueError, match="invalid column name"):
        t.add_column("bad name", "string")


def test_add_column_after_drop_gets_fresh_id_reads_null(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.upsert(spark.createDataFrame(
        [("pp-d", 0, "user", "x", dt.datetime(2028, 2, 1), "hammer")],
        ROWS + ", tool2 string"))
    old_id = t._load()["field_ids"]["tool2"]
    t.drop_column("tool2")
    t.add_column("tool2", "string")
    man = t._load()
    assert man["field_ids"]["tool2"] != old_id  # fresh id
    # pre-drop bytes never resurrect
    assert t.lookup("pp-d", 0).first()["tool2"] is None


# ---------------- age-based expiry ----------------

def test_expire_older_than_composes_with_keep_last(spark, tmp_path):
    t = _table(spark, tmp_path, time_travel=True)
    for i in range(4):
        t.upsert(spark.createDataFrame(
            [("pp-v", i, "user", f"v{i}", dt.datetime(2028, 3, 1, i))], ROWS))
    vs = t.versions()
    assert len(vs) >= 5
    # everything is seconds old: a 1-hour age floor retains ALL versions
    # even though keep_last=1 alone would drop most
    out = t.expire_snapshots(keep_last=1, older_than_s=3600)
    assert out["dropped_versions"] == 0
    assert t.versions() == vs
    # age the retained manifests artificially, then the same call drops
    vd = os.path.join(t.root, "_versions")
    for fn in os.listdir(vd):
        p = os.path.join(vd, fn)
        with open(p) as f:
            m = json.load(f)
        m["committed_at"] = "2020-01-01T00:00:00Z"
        with open(p, "w") as f:
            json.dump(m, f)
    out2 = t.expire_snapshots(keep_last=2, older_than_s=3600)
    assert out2["dropped_versions"] > 0
    assert len(t.versions()) <= 3  # keep_last=2 + current


def test_expire_older_than_legacy_mtime_fallback(spark, tmp_path):
    t = _table(spark, tmp_path, time_travel=True)
    t.upsert(spark.createDataFrame(
        [("pp-m", 0, "user", "x", dt.datetime(2028, 3, 2))], ROWS))
    vd = os.path.join(t.root, "_versions")
    for fn in os.listdir(vd):
        p = os.path.join(vd, fn)
        with open(p) as f:
            m = json.load(f)
        m.pop("committed_at", None)  # legacy manifest: no stamp
        with open(p, "w") as f:
            json.dump(m, f)
        os.utime(p, (time.time() - 7200, time.time() - 7200))
    out = t.expire_snapshots(keep_last=1, older_than_s=3600)
    assert out["dropped_versions"] > 0  # mtime fallback aged them out


# ---------------- metadata COUNT(*) ----------------

def test_count_rows_metadata_for_tombstone_free_table(spark, tmp_path):
    t = _table(spark, tmp_path)
    want = t.snapshot().count()
    # the generator plants deletes -> some backfilled files are MIXED
    # (footer boolean stats indecisive), so metadata can't answer yet
    assert LocalCowTable._metadata_live_count(t._load()) is None
    assert t.count_rows() == want  # fallback job
    # a tombstone-purging rewrite makes every file decisively live-only
    # -> live_rows free from the write-time footer read, no analyze
    t.compact(drop_tombstones=True)
    man = t._load()
    stats = man["file_stats"]
    assert all("live_rows" in stats[r]
               for r, _ in LocalCowTable._entries(man))
    assert LocalCowTable._metadata_live_count(man) == want
    assert t.count_rows() == want


def test_count_rows_tombstones_need_analyze(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where("turn_idx >= 4")
    man = t._load()
    # mixed files: footer stats indecisive -> metadata can't answer
    assert LocalCowTable._metadata_live_count(man) is None
    want = t.snapshot().count()
    assert t.count_rows() == want  # fallback job, still exact
    t.compute_stats()
    man2 = t._load()
    assert LocalCowTable._metadata_live_count(man2) == want
    assert t.count_rows() == want


def test_count_rows_mor_deltas_block_metadata_then_compact(spark, tmp_path):
    t = _table(spark, tmp_path, write_mode="mor")
    t.upsert(spark.createDataFrame(
        [("pp-c", 0, "user", "new", dt.datetime(2028, 4, 1))], ROWS))
    man = t._load()
    assert LocalCowTable._delta_entries(man)
    assert LocalCowTable._metadata_live_count(man) is None  # overlap unknowable
    want = t.snapshot().count()
    assert t.count_rows() == want
    t.compact()  # folds deltas; files may still hold tombstones
    t.compute_stats()  # analyze fills exact live_rows for mixed files
    assert LocalCowTable._metadata_live_count(t._load()) == want
    assert t.count_rows() == want


def test_count_rows_as_of_uses_that_versions_stats(spark, tmp_path):
    t = _table(spark, tmp_path, time_travel=True)
    n0 = t.snapshot().count()
    v0 = t._load()["version"]
    t.upsert(spark.createDataFrame(
        [("pp-t", 99, "user", "extra", dt.datetime(2028, 5, 1))], ROWS))
    assert t.count_rows(as_of=v0) == n0
    assert t.count_rows() == n0 + 1
