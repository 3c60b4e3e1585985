"""Public MERGE surface (round 4): upsert() / delete_where() on
LocalCowTable — Delta-style arbitrary-DataFrame merges with the same
LWW (ts, lsn) conflict rule as the CDC path, so API writes and
changelog replays compose on one table without breaking the
exactly-once / no-resurrection invariants.
"""

import datetime as dt

import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

TS0 = dt.datetime(2026, 1, 1, 12, 0, 0)
LATER = dt.datetime(2027, 1, 1)
EARLIER = dt.datetime(2020, 1, 1)


def _table(spark, tmp_path):
    spec = ChangelogSpec(seed=55, n_conv=30, extra_rate=1.2, dup_rate=0.1)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "tbl"))
    return table


def _row(table, conv, turn):
    rows = table.snapshot().filter(
        f"conv_id = '{conv}' and turn_idx = {turn}").collect()
    return rows[0] if rows else None


def test_upsert_insert_update_and_lww_reject(spark, tmp_path):
    table = _table(spark, tmp_path)
    first = table.snapshot().first()
    conv, turn = first["conv_id"], first["turn_idx"]
    n0 = table.snapshot().count()

    src = spark.createDataFrame(
        [(conv, turn, "assistant", "api-updated", LATER),
         ("conv-api-new", 0, "user", "api-inserted", LATER)],
        "conv_id string, turn_idx long, role string, text string, ts timestamp")
    st = table.upsert(src)
    assert not st.skipped and st.rows_applied == 2
    assert st.inserts == 1 and st.updates == 1
    assert table.snapshot().count() == n0 + 1
    assert _row(table, conv, turn)["text"] == "api-updated"
    assert _row(table, "conv-api-new", 0)["text"] == "api-inserted"

    # stale upsert (older ts) is REJECTED, not clobbered
    stale = spark.createDataFrame(
        [(conv, turn, "assistant", "stale", EARLIER)],
        "conv_id string, turn_idx long, role string, text string, ts timestamp")
    st2 = table.upsert(stale)
    assert st2.rows_applied == 0 and st2.conflicts == 1
    assert _row(table, conv, turn)["text"] == "api-updated"


def test_upsert_collapses_multirow_source_and_evolves_schema(spark, tmp_path):
    table = _table(spark, tmp_path)
    # two rows, same key: the LWW winner (later ts) must land; the new
    # column `rating` schema-evolves, nulls elsewhere
    src = spark.createDataFrame(
        [("conv-x", 1, "user", "first", TS0, 3),
         ("conv-x", 1, "user", "second", LATER, 9)],
        "conv_id string, turn_idx long, role string, text string, "
        "ts timestamp, rating int")
    st = table.upsert(src)
    assert st.rows_applied == 1 and st.inserts == 1
    got = _row(table, "conv-x", 1)
    assert got["text"] == "second"
    # evolved columns surface on read() (snapshot() is spec-columns-only)
    live = table.read().filter("not coalesce(_deleted, false)")
    assert live.filter("conv_id = 'conv-x' and turn_idx = 1").first()["rating"] == 9
    assert live.filter("rating is null").count() > 0


def test_delete_where_idempotent_and_no_resurrection(spark, tmp_path):
    table = _table(spark, tmp_path)
    n0 = table.snapshot().count()
    n_match = table.snapshot().filter("turn_idx >= 4").count()
    assert n_match > 0
    st = table.delete_where("turn_idx >= 4")
    assert st.deletes == n_match
    assert table.snapshot().count() == n0 - n_match
    assert table.snapshot().filter("turn_idx >= 4").count() == 0
    # idempotent: nothing live matches anymore
    st2 = table.delete_where("turn_idx >= 4")
    assert st2.deletes == 0
    assert table.snapshot().count() == n0 - n_match
    # no resurrection: a stale upsert on a deleted key stays dead
    victim = table.read().filter(
        "turn_idx >= 4 and _deleted").select("conv_id", "turn_idx").first()
    stale = spark.createDataFrame(
        [(victim["conv_id"], victim["turn_idx"], "user", "zombie", EARLIER)],
        "conv_id string, turn_idx long, role string, text string, ts timestamp")
    st3 = table.upsert(stale)
    assert st3.rows_applied == 0 and st3.conflicts == 1
    assert _row(table, victim["conv_id"], victim["turn_idx"]) is None


def test_upsert_requires_ts(spark, tmp_path):
    table = _table(spark, tmp_path)
    src = spark.createDataFrame([("c", 0, "hi")],
                                "conv_id string, turn_idx long, text string")
    with pytest.raises(ValueError, match="ts"):
        table.upsert(src)
