"""Field-id schema evolution (round 5): rename_column / drop_column on
LocalCowTable — Iceberg field-id semantics reduced to the manifest
model.  Rename is a metadata-only commit (old physical files resolve
through stable field ids); a dropped-then-re-added column gets a FRESH
id and never resurrects pre-drop values; the field-id allocator is
monotonic across rollback, like scope_seq.
"""

import datetime as dt

import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"
ROWS_B = "conv_id string, turn_idx long, role string, body string, ts timestamp"


def _files(table):
    return {rel for es in table._load()["buckets"].values() for rel, _sid in es}


def _seed(spark, table, n=2):
    rows = [(f"c{i}", 0, "user", f"text-{i}", dt.datetime(2027, 1, 1))
            for i in range(n)]
    table.upsert(spark.createDataFrame(rows, ROWS))


def test_rename_is_metadata_only_and_resolves_by_field_id(spark, tmp_path):
    t = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=4,
                             time_travel=True)
    _seed(spark, t, n=3)
    v1 = t._load()["version"]
    before = _files(t)
    t.rename_column("text", "body")
    assert _files(t) == before  # no file rewritten
    df = t.read(include_system=False).toPandas().sort_values("conv_id")
    assert df["body"].tolist() == ["text-0", "text-1", "text-2"]
    assert "text" not in df.columns
    # as-of a pre-rename version keeps the OLD name (its own manifest)
    old = t.read(as_of=v1, include_system=False).toPandas()
    assert "text" in old.columns and "body" not in old.columns
    # CoW rewrite-on-touch materializes the new name; untouched buckets
    # still resolve through the id
    t.upsert(spark.createDataFrame(
        [("c0", 0, "user", "updated", dt.datetime(2027, 1, 2))], ROWS_B))
    df2 = t.read(include_system=False).toPandas().sort_values("conv_id")
    assert df2["body"].tolist() == ["updated", "text-1", "text-2"]
    # compact materializes everywhere and values stay put
    t.compact()
    df3 = t.read(include_system=False).toPandas().sort_values("conv_id")
    assert df3["body"].tolist() == ["updated", "text-1", "text-2"]


def test_drop_then_readd_never_resurrects(spark, tmp_path):
    t = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    t.upsert(spark.createDataFrame(
        [("a", 0, "u", "ta", dt.datetime(2027, 1, 1), "hammer"),
         ("b", 0, "u", "tb", dt.datetime(2027, 1, 1), "saw")],
        ROWS + ", tool string"))
    fid_old = t._load()["field_ids"]["tool"]
    t.drop_column("tool")
    assert "tool" not in t.read().columns
    # re-add the same name via evolution: fresh field id, old bytes dark
    t.upsert(spark.createDataFrame(
        [("c", 0, "u", "tc", dt.datetime(2027, 1, 2), "calc")],
        ROWS + ", tool string"))
    man = t._load()
    assert man["field_ids"]["tool"] != fid_old
    df = t.read(include_system=False).toPandas().sort_values("conv_id")
    assert df[df.conv_id != "c"]["tool"].isna().all()
    assert df[df.conv_id == "c"]["tool"].tolist() == ["calc"]
    # re-add may even change the type (the old column is gone)
    t.drop_column("tool")
    t.upsert(spark.createDataFrame(
        [("d", 0, "u", "td", dt.datetime(2027, 1, 3), 7)],
        ROWS + ", tool long"))
    df2 = t.read(include_system=False).toPandas().sort_values("conv_id")
    assert df2[df2.conv_id == "d"]["tool"].tolist() == [7]
    assert df2[df2.conv_id != "d"]["tool"].isna().all()


def test_rename_with_outstanding_mor_deltas(spark, tmp_path):
    t = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=4,
                             write_mode="mor")
    _seed(spark, t, n=2)
    t.upsert(spark.createDataFrame(
        [("c0", 0, "user", "delta-v2", dt.datetime(2027, 2, 1))], ROWS))
    assert t.delta_file_count() > 0
    t.rename_column("text", "body")
    df = t.read(include_system=False).toPandas().sort_values("conv_id")
    assert df["body"].tolist() == ["delta-v2", "text-1"]
    # a post-rename delta under the new name resolves against pre-rename
    # base/delta files in the same buckets
    t.upsert(spark.createDataFrame(
        [("c1", 0, "user", "delta-v3", dt.datetime(2027, 2, 2))], ROWS_B))
    df2 = t.read(include_system=False).toPandas().sort_values("conv_id")
    assert df2["body"].tolist() == ["delta-v2", "delta-v3"]
    t.compact()
    df3 = t.read(include_system=False).toPandas().sort_values("conv_id")
    assert df3["body"].tolist() == ["delta-v2", "delta-v3"]


def test_changelog_across_rename_no_spurious_changes(spark, tmp_path):
    """A pure rename emits NO changelog rows (both endpoints conform to
    the `to` schema through field ids), and real changes in a range
    containing a rename line up under the new name."""
    t = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=4,
                             time_travel=True)
    _seed(spark, t, n=3)
    v1 = t._load()["version"]
    t.rename_column("text", "body")
    v2 = t._load()["version"]
    assert t.changelog_between(v1, v2).count() == 0
    t.upsert(spark.createDataFrame(
        [("c1", 0, "user", "changed", dt.datetime(2027, 3, 1))], ROWS_B))
    v3 = t._load()["version"]
    rows = t.changelog_between(v1, v3).collect()
    assert len(rows) == 1 and rows[0]["change_op"] == "U"
    assert rows[0]["body"] == "changed"
    assert rows[0]["before"]["body"] == "text-1"  # old value, new name


def test_rollback_keeps_field_id_allocator_monotonic(spark, tmp_path):
    t = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=4,
                             time_travel=True)
    _seed(spark, t, n=2)
    v_clean = t._load()["version"]
    h_clean = state_hash(t.snapshot().toPandas())
    t.upsert(spark.createDataFrame(
        [("a", 0, "u", "ta", dt.datetime(2027, 1, 2), "hammer")],
        ROWS + ", tool string"))
    nxt = t._load()["next_field_id"]
    t.rollback(v_clean)
    man = t._load()
    assert state_hash(t.snapshot().toPandas()) == h_clean
    assert "tool" not in [f["name"] for f in man["schema"]["fields"]]
    assert man["next_field_id"] >= nxt  # allocator never rewinds
    # re-adding tool after the rollback allocates a FRESH id, so the
    # retained pre-rollback manifest's tool values never alias onto it
    t.upsert(spark.createDataFrame(
        [("z", 0, "u", "tz", dt.datetime(2027, 1, 3), "ztool")],
        ROWS + ", tool string"))
    df = t.read(include_system=False).toPandas().sort_values("conv_id")
    assert df[df.conv_id == "z"]["tool"].tolist() == ["ztool"]
    assert df[df.conv_id != "z"]["tool"].isna().all()


def test_refusals(spark, tmp_path):
    t = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    with pytest.raises(ValueError, match="empty table"):
        t.rename_column("text", "body")
    _seed(spark, t, n=1)
    for col in ("conv_id", "turn_idx", "_lsn"):
        with pytest.raises(ValueError, match="key/system"):
            t.rename_column(col, "x")
        with pytest.raises(ValueError, match="key/system"):
            t.drop_column(col)
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("text", "role")
    with pytest.raises(ValueError, match="already exists|reserved"):
        t.rename_column("text", "_deleted")
    with pytest.raises(ValueError, match="invalid column name"):
        t.rename_column("text", "bad name")
    with pytest.raises(ValueError, match="no such column"):
        t.drop_column("nope")
    t.add_check_constraint("text_nonempty", "length(text) > 0")
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("text", "body")
    with pytest.raises(ValueError, match="constraint"):
        t.drop_column("text")
    t.drop_check_constraint("text_nonempty")
    t.rename_column("text", "body")  # now fine
    # changefeed tables refuse (feed files are immutable under their
    # write-time names; changelog_between is the rename-safe CDC surface)
    spec = ChangelogSpec(seed=91, n_conv=10, extra_rate=1.0, dup_rate=0.0)
    log = str(tmp_path / "log")
    gen_changelog(log, spec)
    cf, _ = replay(spark, log, str(tmp_path / "cf"), changefeed=True)
    with pytest.raises(ValueError, match="changefeed"):
        cf.rename_column("text", "body")
    with pytest.raises(ValueError, match="changefeed"):
        cf.drop_column("tool")


def test_cdc_replay_onto_renamed_table_adds_fresh_column(spark, tmp_path):
    """Iceberg writer behavior: source-side matching is by NAME, so a
    CDC batch still emitting the old name ADDs it back as a fresh
    column next to the renamed one — documented, deterministic."""
    spec = ChangelogSpec(seed=92, n_conv=15, extra_rate=1.0, dup_rate=0.0)
    log = str(tmp_path / "log")
    gen_changelog(log, spec)
    t, _ = replay(spark, log, str(tmp_path / "t"))
    t.rename_column("text", "body")
    spec2 = ChangelogSpec(seed=93, n_conv=5, extra_rate=1.0, dup_rate=0.0)
    log2 = str(tmp_path / "log2")
    gen_changelog(log2, spec2)
    replay(spark, log2, str(tmp_path / "t"))
    cols = [f["name"] for f in t._load()["schema"]["fields"]]
    assert "body" in cols and "text" in cols
    man = t._load()
    assert man["field_ids"]["text"] != man["field_ids"]["body"]
    df = t.read(include_system=False).toPandas()
    # seed-92 rows live under body (renamed), seed-93 rows under text
    assert df["body"].notna().sum() > 0 and df["text"].notna().sum() > 0
    assert not (df["body"].notna() & df["text"].notna()).any()
