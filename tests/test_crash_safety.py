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
