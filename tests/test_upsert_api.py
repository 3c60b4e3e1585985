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


# ---------------- property: random API-call interleavings ----------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def api_scripts(draw):
    """A random script of upsert/delete_where calls over a small key
    space, with ts values drawn so LWW conflicts actually occur."""
    n_ops = draw(st.integers(min_value=2, max_value=6))
    ops = []
    for _ in range(n_ops):
        if draw(st.booleans()):
            n_rows = draw(st.integers(min_value=1, max_value=5))
            rows = []
            for _ in range(n_rows):
                conv = f"c{draw(st.integers(min_value=0, max_value=2))}"
                turn = draw(st.integers(min_value=0, max_value=2))
                day = draw(st.integers(min_value=1, max_value=9))
                rows.append((conv, turn, f"t{day}", dt.datetime(2026, 1, day)))
            ops.append(("upsert", rows))
        else:
            cut = draw(st.integers(min_value=0, max_value=2))
            ops.append(("delete", f"turn_idx >= {cut}"))
    return ops


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(script=api_scripts())
def test_api_interleaving_matches_dict_oracle(spark, tmp_path_factory, script):
    """Any interleaving of upsert/delete_where equals a sequential
    dict applier that follows the same LWW + tombstone rules."""
    root = str(tmp_path_factory.mktemp("api_tbl"))
    table = LocalCowTable.create(spark, root, n_buckets=8)
    # oracle state: key -> (text, ts, lsn, deleted)
    state: dict = {}

    def lsn_of(conv, turn, ts):
        import pyspark.sql.functions as F
        return (spark.createDataFrame([(conv, turn)], "conv_id string, turn_idx long")
                .select(F.xxhash64("conv_id", "turn_idx",
                                   F.lit(ts.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")
                                   .cast("string")).alias("l")).first()["l"])

    for kind, arg in script:
        if kind == "upsert":
            df = spark.createDataFrame(
                [(c, t, txt, ts) for c, t, txt, ts in arg],
                "conv_id string, turn_idx long, text string, ts timestamp")
            table.upsert(df)
            # oracle: collapse the frame per key by (ts, lsn), then LWW-apply
            per_key: dict = {}
            for c, t, txt, ts in arg:
                l = lsn_of(c, t, ts)
                k = (c, t)
                if k not in per_key or (ts, l) > (per_key[k][1], per_key[k][2]):
                    per_key[k] = (txt, ts, l)
            for k, (txt, ts, l) in per_key.items():
                cur = state.get(k)
                if cur is None or (ts, l) > (cur[1], cur[2]):
                    state[k] = (txt, ts, l, False)
        else:
            cut = int(arg.split(">= ")[1])
            for k, (txt, ts, l, dead) in list(state.items()):
                if not dead and k[1] >= cut:
                    state[k] = (txt, ts, l + 1, True)
            table.delete_where(arg)

    got = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in table.snapshot().collect())
    want = sorted((k[0], k[1], v[0]) for k, v in state.items() if not v[3])
    assert got == want
