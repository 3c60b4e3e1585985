"""Minor / targeted compaction (round 5 — Iceberg
rewrite_data_files-with-filter shape): compact(minor=True) rewrites
ONLY delta-debt / fragmented buckets at O(selected bytes), commits
with merge-style touched-bucket validation (rebases over concurrent
writers on other buckets, conflicts + retries on selected ones), and
never changes the layout.
"""

import datetime as dt
from contextlib import contextmanager

import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _mor_table(spark, tmp_path, seed=61):
    spec = ChangelogSpec(seed=seed, n_conv=40, extra_rate=1.2, dup_rate=0.1)
    log = str(tmp_path / "log")
    gen_changelog(log, spec)
    table, _ = replay(spark, log, str(tmp_path / "tbl"), chunk_lsn=200,
                      write_mode="mor")
    return table


def _base_files(man):
    return {b: [e[0] for e in es] for b, es in man["buckets"].items()}


def _buckets_of(spark, table, keys, nb):
    """key -> v2 bucket id, computed with the table's own bucket expr."""
    df = spark.createDataFrame([(k, 0) for k in keys],
                               "conv_id string, turn_idx long")
    rows = df.select("conv_id", table._bucket_expr(nb).alias("b")).collect()
    return {r["conv_id"]: r["b"] for r in rows}


def test_minor_folds_only_delta_buckets(spark, tmp_path):
    t = _mor_table(spark, tmp_path)
    man = t._load()
    delta_buckets = {b for b, es in man.get("deltas", {}).items() if es}
    assert delta_buckets, "MoR chunked replay should leave delta debt"
    clean = set(man["buckets"]) - delta_buckets
    h0 = state_hash(t.snapshot().toPandas())
    before = _base_files(man)

    n = t.compact(minor=True)
    assert n == len(delta_buckets)
    man2 = t._load()
    assert t.delta_file_count() == 0
    # unselected buckets' base files are byte-identical (not rewritten)
    after = _base_files(man2)
    for b in clean:
        assert after[b] == before[b]
    for b in delta_buckets:
        assert after[b] != before.get(b)
    assert state_hash(t.snapshot().toPandas()) == h0
    # nothing left to do: second minor pass is a no-commit no-op
    v = man2["version"]
    assert t.compact(minor=True) == 0
    assert t._load()["version"] == v


def test_minor_explicit_buckets_and_tombstone_purge(spark, tmp_path):
    t = _mor_table(spark, tmp_path)
    first = t.snapshot().first()
    t.delete_where(f"conv_id = '{first['conv_id']}'")
    man = t._load()
    # find a bucket holding a tombstone delta
    tomb_buckets = sorted(int(b) for b, es in man.get("deltas", {}).items() if es)
    pick = tomb_buckets[:1]
    h_live = state_hash(t.snapshot().toPandas())
    n = t.compact(buckets=pick, drop_tombstones=True)
    assert n == 1
    man2 = t._load()
    assert not man2.get("deltas", {}).get(str(pick[0]))
    # live rows unchanged; the picked bucket carries no tombstones now
    assert state_hash(t.snapshot().toPandas()) == h_live
    sel_rows = t._read_resolved(man2, t.schema(), pick)
    from pyspark.sql import functions as F
    assert sel_rows.filter(F.coalesce("_deleted", F.lit(False))).count() == 0
    # out-of-range bucket ids refuse
    with pytest.raises(ValueError, match="out of range"):
        t.compact(buckets=[99999])


def test_minor_rebases_over_writer_on_other_bucket(spark, tmp_path):
    """A commit landing between the minor compact's read and its own
    commit is FINE when it touched no selected bucket: the compaction
    rebases and both commits survive."""
    t = _mor_table(spark, tmp_path)
    t.compact()  # zero debt; then plant sparse deltas in ONE bucket
    man = t._load()
    nb = man["n_buckets"]
    cands = [f"interleave-{i}" for i in range(200)]
    bmap = _buckets_of(spark, t, cands, nb)
    seed_key = cands[0]
    t.upsert(spark.createDataFrame(
        [(seed_key, 0, "user", "delta-debt", dt.datetime(2027, 5, 30))], ROWS))
    delta_buckets = {int(b) for b, es in t._load().get("deltas", {}).items() if es}
    assert delta_buckets == {bmap[seed_key]}
    # an upsert key that hashes OUTSIDE the selected (delta) bucket
    t2 = LocalCowTable(spark, t.root)
    probe = next(((k, b) for k, b in bmap.items() if b not in delta_buckets),
                 None)
    assert probe is not None
    man = t._load()
    orig = t._commit_lock
    fired = {"n": 0}

    @contextmanager
    def hooked():
        if fired["n"] == 0:
            fired["n"] = 1
            t2.upsert(spark.createDataFrame(
                [(probe[0], 0, "user", "landed-mid-compact",
                  dt.datetime(2027, 6, 1))], ROWS))
        with orig():
            yield

    t._commit_lock = hooked
    try:
        n = t.compact(minor=True)
    finally:
        t._commit_lock = orig
    assert n == len(delta_buckets)
    assert t.delta_file_count() == 0 or all(
        int(b) not in delta_buckets
        for b, es in t._load().get("deltas", {}).items() if es)
    assert t.lookup(probe[0], 0).first()["text"] == "landed-mid-compact"


def test_minor_conflicts_and_retries_on_selected_bucket(spark, tmp_path):
    """A concurrent write INTO a selected bucket invalidates the
    compaction; the bounded retry re-selects and converges with the
    write's data intact."""
    t = _mor_table(spark, tmp_path)
    t.compact()  # zero debt; plant a delta in ONE known bucket
    man = t._load()
    cands = [f"conflict-{i}" for i in range(400)]
    bmap = _buckets_of(spark, t, cands, man["n_buckets"])
    seed_key = cands[0]
    t.upsert(spark.createDataFrame(
        [(seed_key, 0, "user", "delta-debt", dt.datetime(2027, 5, 31))], ROWS))
    target_b = bmap[seed_key]
    t2 = LocalCowTable(spark, t.root)
    probe = next((k for k, b in bmap.items()
                  if b == target_b and k != seed_key), None)
    assert probe is not None
    man = t._load()
    orig = t._commit_lock
    fired = {"n": 0}

    @contextmanager
    def hooked():
        if fired["n"] == 0:
            fired["n"] = 1
            t2.upsert(spark.createDataFrame(
                [(probe, 0, "user", "wrote-into-selected",
                  dt.datetime(2027, 6, 2))], ROWS))
        with orig():
            yield

    t._commit_lock = hooked
    try:
        t.compact(minor=True)
    finally:
        t._commit_lock = orig
    assert t.delta_file_count() == 0
    assert t.lookup(probe, 0).first()["text"] == "wrote-into-selected"


def test_minor_refuses_v1_layouts(spark, tmp_path):
    spec = ChangelogSpec(seed=63, n_conv=15, extra_rate=1.0, dup_rate=0.0)
    log = str(tmp_path / "log")
    gen_changelog(log, spec)
    t, _ = replay(spark, log, str(tmp_path / "tbl"))
    # rewrite the manifest the way a pre-r2 build would have left it
    man = t._load()
    man["format_version"] = 1
    man.pop("schemas", None)
    man.pop("schema_field_ids", None)
    man["buckets"] = {b: [e if isinstance(e, str) else e[0] for e in fs]
                      for b, fs in man["buckets"].items()}
    t._write_manifest(man)
    with pytest.raises(ValueError, match="format-v2"):
        t.compact(minor=True)
    # the full compact migrates, after which minor is available
    t.compact()
    assert t._load()["format_version"] == 2
    assert t.compact(minor=True) == 0  # single-file buckets: no work
