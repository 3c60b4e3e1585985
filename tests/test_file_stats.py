"""Manifest file statistics + planning-time pruning (round 5):
commits record per-file (conv_id, turn_idx) min/max from the parquet
footers (Iceberg manifest-stats shape), and conv-only lookups prune
BEFORE any task is scheduled — candidate buckets from the global turn
range ({bucket(conv, t) | t in [lo, hi]}), plus per-file conv-range
drops.  Hash bucketing mixes convs, so the bucket-set prune is the
honest lever; conv ranges mostly pay on small MoR delta files.
"""

import datetime as dt

import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _table(spark, tmp_path, **kw):
    spec = ChangelogSpec(seed=81, n_conv=60, extra_rate=1.5, dup_rate=0.1)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "tbl"),
                      chunk_lsn=400, n_buckets=32, **kw)
    return table


def _all_rels(man):
    rels = [rel for rel, _sid in LocalCowTable._entries(man)]
    rels += [rel for rel, _sid, _seq in LocalCowTable._delta_entries(man)]
    return rels


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_stats_recorded_for_every_file(spark, tmp_path, mode):
    table = _table(spark, tmp_path, write_mode=mode)
    man = table._load()
    rels = _all_rels(man)
    stats = man.get("file_stats", {})
    assert rels and all(r in stats for r in rels)
    for s in stats.values():
        assert s["conv"][0] <= s["conv"][1]
        assert int(s["turn"][0]) <= int(s["turn"][1])
    # stats keys never reference dropped files
    table.compact()
    man2 = table._load()
    assert set(man2["file_stats"]) == set(_all_rels(man2))


def test_conv_lookup_prunes_buckets_and_matches_full_read(spark, tmp_path):
    table = _table(spark, tmp_path, write_mode="mor")
    man = table._load()
    conv = "conv00000007"
    cands = table._candidate_buckets(man, conv)
    # turns are 0..~8 at this gen spec: far fewer candidate buckets
    # than the 32-bucket layout
    assert cands is not None and 0 < len(cands) < man["n_buckets"]
    got = table.lookup(conv).orderBy("turn_idx").toPandas()
    want = (table.snapshot().filter(f"conv_id = '{conv}'")
            .orderBy("turn_idx").toPandas())
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    # every key of the conv hashes into the candidate set (completeness)
    from pyspark.sql import functions as F
    all_b = (table.read().filter(F.col("conv_id") == conv)
             .select(table._bucket_expr(man["n_buckets"]).alias("b"))
             .distinct().collect())
    assert {int(r["b"]) for r in all_b} <= set(cands)


def test_unstatted_files_disable_bucket_prune_but_stay_correct(spark, tmp_path):
    table = _table(spark, tmp_path)
    man = table._load()
    # simulate a pre-stats-era manifest (upgrade path)
    with table._commit_lock():
        cur = table._load()
        cur.pop("file_stats", None)
        table._write_manifest(cur)
    man = table._load()
    assert table._candidate_buckets(man, "conv00000001") is None
    assert table.lookup("conv00000001").count() > 0


def test_delta_files_conv_range_prunes(spark, tmp_path):
    table = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=8,
                                 write_mode="mor")
    base = [(f"conv{i:04d}", t, "user", f"b-{i}-{t}", dt.datetime(2027, 1, 1))
            for i in range(50) for t in range(3)]
    table.upsert(spark.createDataFrame(base, ROWS))
    # one tiny delta touching a single conv: its files' conv range is a
    # point, so lookups for OTHER convs drop every delta file
    table.upsert(spark.createDataFrame(
        [("conv0001", 0, "user", "updated", dt.datetime(2027, 2, 1))], ROWS))
    man = table._load()
    pruned = table._prune_man_by_conv(man, "conv0049")
    assert sum(len(v) for v in pruned["deltas"].values()) == 0
    kept = table._prune_man_by_conv(man, "conv0001")
    assert sum(len(v) for v in kept["deltas"].values()) > 0
    assert table.lookup("conv0001").filter("turn_idx = 0").first()["text"] == "updated"
    assert table.lookup("conv0049").count() == 3


def test_v1_layout_conv_lookup_hits_single_bucket(spark, tmp_path):
    table = _table(spark, tmp_path)
    # force a legacy v1 manifest view of the bucket fn
    with table._commit_lock():
        cur = table._load()
        cur["format_version"] = 1
        table._write_manifest(cur)
    man = table._load()
    cands = table._candidate_buckets(man, "conv00000001")
    assert cands is not None and len(cands) == 1