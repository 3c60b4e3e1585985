"""Sort-ordered compaction (round 5): compact(sort=True) is Iceberg's
rewrite_data_files-with-sort-order — it GUARANTEES each rewritten
bucket's rows are ordered by (conv_id, turn_idx).  Today the engine's
rewrites come out key-sorted incidentally (max_by-over-struct lowers to
SortAggregate; the write's repartition elides into the agg's exchange),
so the guarantee is literally free — EliminateSorts drops the contract
sort against today's plans — but it stops being an accident the moment
Catalyst picks a different physical strategy.  Pinned here:

  * data is bit-identical to an unsorted compact (pure layout change);
  * every rewritten file IS sorted (major, minor/MoR-fold, purge);
  * the contract adds no Exchange and, today, not even a Sort — while
    the optimizer demonstrably DOES insert one where order is absent.
"""

import os
import datetime as dt

import pyarrow.parquet as pq
import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _table(spark, tmp_path, **kw):
    spec = ChangelogSpec(seed=87, n_conv=80, extra_rate=1.5, dup_rate=0.1)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "tbl"),
                      chunk_lsn=500, n_buckets=8, **kw)
    return table


def _file_keys(table, rel):
    t = pq.read_table(f"{table.root}/{rel}", columns=["conv_id", "turn_idx"])
    return list(zip(t.column("conv_id").to_pylist(),
                    t.column("turn_idx").to_pylist()))


def _all_rels(man):
    return [rel for rel, _sid in LocalCowTable._entries(man)]


def test_sorted_compact_same_data_sorted_files(spark, tmp_path):
    table = _table(spark, tmp_path)
    before = state_hash(table.snapshot().toPandas())
    n = table.compact(sort=True)
    assert n > 0
    assert state_hash(table.snapshot().toPandas()) == before
    man = table._load()
    rels = _all_rels(man)
    assert rels
    for rel in rels:
        keys = _file_keys(table, rel)
        assert keys == sorted(keys), f"{rel} not sorted"
    # stats refreshed for the new files
    assert set(man["file_stats"]) == set(rels)


def test_sort_plan_has_explicit_sort_no_extra_shuffle(spark, tmp_path):
    """The engine's rewrites come out key-sorted TODAY only because
    max_by(struct) lowers to a SortAggregate whose exchange the write's
    repartition elides — an incidental Catalyst choice (see the compact
    docstring).  sort=True must therefore (a) put an EXPLICIT Sort on
    the key into the write plan — the contract survives a future
    hash-capable max_by — while (b) adding no extra Exchange."""
    table = _table(spark, tmp_path, write_mode="mor")
    table.upsert(table.spark.createDataFrame(
        [("conv00000099", 0, "user", "mix", dt.datetime(2028, 1, 1))], ROWS))
    import pyspark.sql.types as T
    from pyspark.sql import functions as F
    from dipper_spark.schemas import KEY_COLUMNS
    man = table._load()
    schema = T.StructType.fromJson(man["schema"])
    df = (table._read_resolved(man, schema)
          .withColumn("_bucket", table._bucket_expr(man["n_buckets"]))
          .repartition(man["n_buckets"], *KEY_COLUMNS))
    base = df._jdf.queryExecution().executedPlan().toString()
    sortd = (df.sortWithinPartitions(*KEY_COLUMNS)
             ._jdf.queryExecution().executedPlan().toString())
    # never an extra Exchange; the contract Sort is either ELIMINATED
    # (SortAggregate resolve already guarantees the order — the shuffle
    # plan) or genuinely inserted (+1 — e.g. the broadcast-resolve MoR
    # plan, whose join preserves no useful order).  Which plan Catalyst
    # picks depends on delta sizes/session state; both are correct.
    assert sortd.count("Exchange") == base.count("Exchange")
    assert sortd.count("Sort [") - base.count("Sort [") in (0, 1)
    # control: on a frame with NO incidental order (a bare scan — the
    # MoR resolve above is itself a SortAggregate, so table.read() won't
    # do) the same request DOES insert a Sort — the optimizer is
    # reasoning about order, not ignoring the request
    plain = spark.read.parquet(
        os.path.join(table.root, _all_rels(man)[0]))
    p0 = plain._jdf.queryExecution().executedPlan().toString()
    p1 = (plain.sortWithinPartitions(*KEY_COLUMNS)
          ._jdf.queryExecution().executedPlan().toString())
    assert p1.count("Sort [") == p0.count("Sort [") + 1


def test_sorted_minor_compact_folds_deltas(spark, tmp_path):
    table = _table(spark, tmp_path, write_mode="mor")
    table.upsert(table.spark.createDataFrame(
        [("conv00000005", 0, "user", "late winner", dt.datetime(2028, 1, 1))],
        ROWS))
    before = state_hash(table.snapshot().toPandas())
    n = table.compact(minor=True, sort=True)
    assert n > 0
    man = table._load()
    assert not any(man.get("deltas", {}).values())
    assert state_hash(table.snapshot().toPandas()) == before
    for rel in _all_rels(man):
        keys = _file_keys(table, rel)
        assert keys == sorted(keys)
    assert table.lookup("conv00000005", 0).first()["text"] == "late winner"


def test_sorted_compact_after_rescale_and_tombstone_purge(spark, tmp_path):
    # sort composes with the other rewrite options in one commit path:
    # tombstone purge keeps only live rows, files stay sorted, and the
    # follow-up analyze sees only the fresh sorted files
    table = _table(spark, tmp_path)
    table.delete_where("turn_idx >= 3")
    table.compact(drop_tombstones=True, sort=True)
    man = table._load()
    for rel in _all_rels(man):
        keys = _file_keys(table, rel)
        assert keys == sorted(keys)
    assert table.snapshot().filter("turn_idx >= 3").count() == 0
    res = table.compute_stats()
    assert res["computed"] == len(_all_rels(table._load()))
