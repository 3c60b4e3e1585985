"""Compaction (op C17) + CLI packaging smoke."""

import json
import os
import subprocess
import sys

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import apply_log_pandas, state_hash

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_compact_preserves_state(spark, tmp_path):
    spec = ChangelogSpec(seed=71, n_conv=50, extra_rate=1.5)
    logical, _ = gen_changelog(str(tmp_path / "log"), spec)
    # chunked replay churns files (several versions per bucket)
    table, _ = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"), chunk_lsn=200)
    before = state_hash(table.snapshot().toPandas())
    man_before = table._load()
    n = table.compact()
    assert n > 0
    after = state_hash(table.snapshot().toPandas())
    assert after == before == state_hash(apply_log_pandas(logical))
    # old files GC'd: every referenced file exists, version bumped
    man = table._load()
    assert man["version"] == man_before["version"] + 1
    for fs in man["buckets"].values():
        for rel, sid in fs:  # [rel path, schema id] entries (format v2, r3)
            assert os.path.exists(os.path.join(str(tmp_path / "tbl"), rel))
            assert man["schemas"][sid] == man["schema"]


def test_compact_drop_tombstones(spark, tmp_path):
    spec = ChangelogSpec(seed=72, n_conv=40, extra_rate=2.0)
    logical, _ = gen_changelog(str(tmp_path / "log"), spec)
    table, _ = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"))
    from pyspark.sql import functions as F

    n_tomb = table.read().filter(F.col("_deleted")).count()
    assert n_tomb > 0
    before = state_hash(table.snapshot().toPandas())
    table.compact(drop_tombstones=True)
    assert table.read().filter(F.col("_deleted")).count() == 0
    assert state_hash(table.snapshot().toPandas()) == before


def test_cli_zip_and_gen(tmp_path):
    out = subprocess.run(
        [sys.executable, "main.py", "zip"], cwd=REPO, capture_output=True, text=True, check=True
    )
    assert os.path.exists(os.path.join(REPO, "dipper_spark.zip"))
    out = subprocess.run(
        [sys.executable, "main.py", "gen", "--out", str(tmp_path / "log"), "--n-conv", "50"],
        cwd=REPO, capture_output=True, text=True, check=True,
    )
    man = json.loads(out.stdout.strip().splitlines()[-1])
    assert man["n_events"] > 0
    assert os.path.exists(str(tmp_path / "log" / "chunk_00000.parquet"))


def test_ledger_capped_and_old_batches_still_noop(spark, tmp_path, monkeypatch):
    """Long streams: the manifest ledger retains only the last
    LEDGER_CAP entries (bounding manifest size), and replaying a batch
    that fell OUT of the window is still a no-op via the (ts, lsn)
    guard — zero rows applied, final state unchanged."""
    from datetime import datetime

    monkeypatch.setattr(LocalCowTable, "LEDGER_CAP", 5)
    tbl = str(tmp_path / "tbl")
    table = LocalCowTable.create(spark, tbl, n_buckets=4)

    def batch(i):
        return spark.createDataFrame(
            [(f"c{i}", 0, "user", f"text{i}", None, None, i + 1, datetime(2026, 1, 1, i), 1, 1, False)],
            "conv_id string, turn_idx int, role string, text string, tool string, "
            "meta_tokens long, lsn long, ts timestamp, n_events long, n_unique long, is_delete boolean",
        )

    for i in range(12):
        table.merge(batch(i), batch_id=i, scope="long")
    assert len(table.ledger()) == 5
    assert [e["batch_id"] for e in table.ledger()] == list(range(7, 12))

    before = state_hash(table.snapshot().toPandas())
    st = table.merge(batch(0), batch_id=0, scope="long")  # outside the window
    assert not st.skipped  # ledger no longer remembers it...
    assert st.rows_applied == 0 and st.conflicts == 1  # ...but the guard rejects it
    assert state_hash(table.snapshot().toPandas()) == before
