"""Online bucket rescaling (round 5 — beyond-survey): change a live
table's hash-bucket count in one commit (Iceberg partition-evolution
analog).  The invariants:

  * the row set is IDENTICAL across the rescale (snapshot hash);
  * the manifest's n_buckets and layout swap atomically;
  * merges and point lookups after the rescale use the new layout
    (no silent duplicates — the merge probe finds existing keys);
  * a writer that planned against the OLD layout is rejected at
    commit time (the empty-bucket hazard: without the layout guard a
    bucket empty under both counts would pass file-list validation
    and commit rows into a bucket id the new hash never probes).
"""

import datetime as dt

import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import CommitConflict, LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _table(spark, tmp_path, n_buckets=8, **kw):
    gen_changelog(str(tmp_path / "log"),
                  ChangelogSpec(seed=61, n_conv=120, extra_rate=1.5, dup_rate=0.1))
    table, stats = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"),
                          n_buckets=n_buckets, **kw)
    return table, stats


@pytest.mark.parametrize("new_n", [32, 3])
def test_rescale_preserves_rows_and_swaps_layout(spark, tmp_path, new_n):
    table, _ = _table(spark, tmp_path, n_buckets=8)
    before = state_hash(table.snapshot().toPandas())
    nonempty = table.rescale_buckets(new_n)
    man = table._load()
    assert man["n_buckets"] == new_n
    assert 0 < nonempty <= new_n
    assert all(0 <= int(b) < new_n for b in man["buckets"])
    assert state_hash(table.snapshot().toPandas()) == before


def test_merge_and_lookup_after_rescale(spark, tmp_path):
    table, _ = _table(spark, tmp_path, n_buckets=8)
    table.rescale_buckets(32)
    # update an existing key and add a new one through the API writer:
    # the merge must FIND the existing row under the new layout (a
    # wrong-bucket probe would silently duplicate the key)
    key = table.snapshot().select("conv_id", "turn_idx").first()
    ts = dt.datetime(2027, 5, 1)
    table.upsert(spark.createDataFrame(
        [(key["conv_id"], key["turn_idx"], "user", "post-rescale", ts),
         ("rescale-new", 0, "user", "fresh", ts)], ROWS))
    snap = table.snapshot()
    hit = snap.filter(
        (snap.conv_id == key["conv_id"]) & (snap.turn_idx == key["turn_idx"]))
    assert hit.count() == 1  # updated in place, not duplicated
    assert hit.first()["text"] == "post-rescale"
    # bucket-pruned point lookup works against the new layout
    row = table.lookup("rescale-new", 0).first()
    assert row is not None and row["text"] == "fresh"


def test_stale_writer_conflicts_on_layout_change(spark, tmp_path):
    table, _ = _table(spark, tmp_path, n_buckets=8)
    other = LocalCowTable(spark, table.root)

    # inject a rescale exactly between the victim's manifest read and
    # its commit (same pattern as tests/test_concurrency.py)
    orig = table._commit_merge
    fired = {"done": False}

    def wrapper(*a, **kw):
        if not fired["done"]:
            fired["done"] = True
            other.rescale_buckets(16)
        return orig(*a, **kw)

    table._commit_merge = wrapper
    ts = dt.datetime(2027, 6, 1)
    with pytest.raises(CommitConflict, match="layout"):
        # explicit batch id = the non-retrying CDC path
        table.upsert(spark.createDataFrame(
            [("layout-race", 0, "user", "x", ts)], ROWS),
            batch_id=4242, scope="explicit")
    assert table._load()["n_buckets"] == 16
    assert table.snapshot().filter("conv_id = 'layout-race'").count() == 0

    # the self-rederiving API writer retries and lands on the new layout
    fired["done"] = False
    table._commit_merge = wrapper  # re-arm with a second rescale
    other2 = LocalCowTable(spark, table.root)

    def wrapper2(*a, **kw):
        if not fired["done"]:
            fired["done"] = True
            other2.rescale_buckets(8)
        return orig(*a, **kw)

    table._commit_merge = wrapper2
    table.upsert(spark.createDataFrame(
        [("layout-retry", 0, "user", "landed", ts)], ROWS))
    assert table.snapshot().filter("conv_id = 'layout-retry'").first()["text"] == "landed"
    assert table._load()["n_buckets"] == 8


def test_rescale_empty_table_is_metadata_only(spark, tmp_path):
    table = LocalCowTable.create(spark, str(tmp_path / "empty"), n_buckets=4)
    assert table.rescale_buckets(16) == 0
    assert table._load()["n_buckets"] == 16


def test_rescale_with_time_travel_preserves_asof(spark, tmp_path):
    table, stats = _table(spark, tmp_path, n_buckets=8, time_travel=True,
                          chunk_lsn=500)
    v_mid = 1
    before_mid = state_hash(table.snapshot(as_of=v_mid).toPandas())
    before_cur = state_hash(table.snapshot().toPandas())
    table.rescale_buckets(32)
    # as-of reads use the RETAINED manifest's own n_buckets
    assert state_hash(table.snapshot(as_of=v_mid).toPandas()) == before_mid
    assert state_hash(table.snapshot().toPandas()) == before_cur
