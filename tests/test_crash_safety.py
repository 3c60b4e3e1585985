"""Torn-commit crash safety: the manifest swap is the commit point.

Simulates a crash between data-file writes and the manifest commit:
orphan data files must be invisible to readers, and a re-run of the
same merge must converge to the correct state.
"""

import json
import os

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import apply_log_pandas, state_hash

from tests.test_replay_equality import _assert_equal


def test_orphan_files_invisible_and_rerun_converges(spark, tmp_path):
    spec = ChangelogSpec(seed=81, n_conv=40, extra_rate=1.0)
    logical, _ = gen_changelog(str(tmp_path / "log"), spec)
    table, _ = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"))
    good_hash = state_hash(table.snapshot().toPandas())
    man_before = table._load()

    # simulate a torn merge: data files appear, manifest never swapped
    data_dir = os.path.join(str(tmp_path / "tbl"), "data")
    orphan = os.path.join(data_dir, "b00001_v999_0.parquet")
    existing = [f for f in os.listdir(data_dir) if f.endswith(".parquet")]
    import shutil

    shutil.copy(os.path.join(data_dir, existing[0]), orphan)

    # reader: snapshot unchanged (manifest doesn't reference the orphan)
    assert state_hash(table.snapshot().toPandas()) == good_hash
    assert table._load() == man_before

    # recovery: replaying the same log (fresh scope) is a no-op on state
    t2 = LocalCowTable(spark, str(tmp_path / "tbl"))
    table2, stats = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"))
    assert all(s.skipped for s in stats)  # same scope -> ledger skip
    _assert_equal(t2.snapshot().toPandas(), apply_log_pandas(logical))


def test_join_bucketed_colocated_no_exchange(spark):
    from dipper_spark.operators.relational_ext4 import join_bucketed_colocated

    df = join_bucketed_colocated(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
    # no shuffle exchange below the join: bucketed tables are co-located
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan


def test_bucket_aligned_write_one_file_per_bucket(spark, tmp_path):
    """The shuffle-alignment claim as a regression guard: with the
    session's shuffle partitioning equal to n_buckets, a merge writes
    EXACTLY one file per touched bucket (the join output is already
    bucket-partitioned; partitionBy splits without moving data).  A
    misaligned bucket fn would fan every task into every bucket dir."""
    from dipper_spark.plans.replay import replay

    spec = ChangelogSpec(seed=71, n_conv=300, extra_rate=1.0)
    gen_changelog(str(tmp_path / "log"), spec)
    nb = int(spark.conf.get("spark.sql.shuffle.partitions"))
    table, _ = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"), n_buckets=nb)
    man = table._load()
    files_per_bucket = {b: len(fs) for b, fs in man["buckets"].items() if fs}
    assert files_per_bucket, "no buckets written"
    assert all(n == 1 for n in files_per_bucket.values()), files_per_bucket


def test_lookup_bucket_pruned(spark, tmp_path):
    """Point lookup reads one bucket and matches the snapshot filter."""
    from dipper_spark.plans.replay import replay

    spec = ChangelogSpec(seed=72, n_conv=100, extra_rate=1.0)
    gen_changelog(str(tmp_path / "log"), spec)
    table, _ = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"))
    snap = table.snapshot().toPandas()
    key = snap.iloc[17][["conv_id", "turn_idx"]]
    got = table.lookup(key["conv_id"], int(key["turn_idx"])).toPandas()
    assert len(got) == 1
    assert got.iloc[0]["text"] == snap[(snap.conv_id == key["conv_id"]) &
                                       (snap.turn_idx == key["turn_idx"])].iloc[0]["text"]
    # conv-wide fallback
    conv = table.lookup(key["conv_id"]).toPandas()
    assert len(conv) == len(snap[snap.conv_id == key["conv_id"]])
    # deleted keys don't resolve
    from pyspark.sql import functions as F
    tomb = table.read().filter(F.coalesce(F.col("_deleted"), F.lit(False))).limit(1).toPandas()
    if len(tomb):
        assert table.lookup(tomb.iloc[0]["conv_id"], int(tomb.iloc[0]["turn_idx"])).count() == 0
