"""Snapshot-diff changelog (round 5): changelog_between(a, b) derives
net row-level CDC between two retained table versions from manifests +
data files alone — the Iceberg create_changelog_view shape.  It is the
CDC-OUT path for tables WITHOUT a write-time changefeed, in particular
MoR tables (whose merges never read the target and so cannot classify
I/U or capture before-images at write time).

The master invariant everywhere: applying the changelog rows to the
`from` snapshot reproduces the `to` snapshot exactly (I/U set the key's
values, D drops the key), and before-images equal the `from` values.
"""

import datetime as dt

import pandas as pd
import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"
DATA_COLS = ["role", "text", "tool", "ts"]


def _chunked(spark, tmp_path, **create_kw):
    spec = ChangelogSpec(seed=61, n_conv=60, extra_rate=1.6, dup_rate=0.15)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, stats = replay(spark, log_dir, str(tmp_path / "tbl"),
                          chunk_lsn=300, time_travel=True, **create_kw)
    assert len(stats) >= 3
    return table


def _snap(table, as_of=None) -> pd.DataFrame:
    return table.snapshot(as_of=as_of).toPandas()


def _apply(a: pd.DataFrame, ch: pd.DataFrame, data_cols) -> pd.DataFrame:
    """Replay a net changelog onto the `from` snapshot, pandas-side."""
    cols = [c for c in data_cols
            if c in a.columns or c in ch.columns]  # v0 snapshots are bare
    state = {(r["conv_id"], r["turn_idx"]): {c: r[c] for c in cols}
             for r in a.to_dict("records")}
    keys = list(zip(ch["conv_id"], ch["turn_idx"]))
    assert len(keys) == len(set(keys)), "net changelog must be <=1 row per key"
    for r in ch.to_dict("records"):
        k = (r["conv_id"], r["turn_idx"])
        if r["change_op"] == "D":
            state.pop(k, None)
        else:
            state[k] = {c: r.get(c) for c in cols}
    out = pd.DataFrame(
        [{"conv_id": k[0], "turn_idx": k[1], **v} for k, v in state.items()],
        columns=["conv_id", "turn_idx", *cols])
    return out.sort_values(["conv_id", "turn_idx"], ignore_index=True)


def _assert_replays(table, v_from, v_to=None, granularity="net"):
    a = _snap(table, as_of=v_from)
    b = _snap(table, as_of=v_to)
    ch = table.changelog_between(v_from, v_to, granularity=granularity).toPandas()
    if granularity == "commit":
        # apply in commit order; each step is net within itself
        for v in sorted(ch["commit_version"].dropna().unique()):
            a = _apply(a, ch[ch["commit_version"] == v], DATA_COLS)
        replayed = a.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    else:
        replayed = _apply(a, ch, DATA_COLS)
    want = b.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert state_hash(replayed) == state_hash(want)
    return ch


def test_net_changelog_replays_mor_table(spark, tmp_path):
    table = _chunked(spark, tmp_path, write_mode="mor")
    versions = table.versions()
    v_mid = versions[len(versions) // 2]
    ch = _assert_replays(table, v_mid)
    assert set(ch["change_op"]) <= {"I", "U", "D"}
    # before-images equal the `from` values for U (and live-D) rows
    a = _snap(table, as_of=v_mid).set_index(["conv_id", "turn_idx"])
    upd = ch[ch["change_op"] == "U"]
    assert len(upd) > 0 or len(ch) > 0
    for r in upd.to_dict("records"):
        prior = a.loc[(r["conv_id"], r["turn_idx"])]
        assert r["before"]["text"] == prior["text"]
    # from v0: everything is an insert, and it replays to `to`
    ch0 = _assert_replays(table, 0)
    assert set(ch0["change_op"]) == {"I"}


def test_net_changelog_on_cow_without_changefeed(spark, tmp_path):
    table = _chunked(spark, tmp_path)  # plain CoW, NO changefeed
    versions = table.versions()
    _assert_replays(table, versions[1])
    # empty range emits nothing
    assert table.changelog_between(versions[-1]).count() == 0


def test_fast_path_emits_only_touched_keys(spark, tmp_path):
    table = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=8,
                                 time_travel=True, write_mode="mor")
    base = [(f"c{i}", 0, "user", f"orig-{i}", dt.datetime(2027, 1, 1))
            for i in range(200)]
    table.upsert(spark.createDataFrame(base, ROWS))
    v_a = table.versions()[-1]
    table.upsert(spark.createDataFrame(
        [("c7", 0, "user", "new7", dt.datetime(2027, 2, 1)),
         ("cX", 0, "user", "fresh", dt.datetime(2027, 2, 1))], ROWS))
    table.delete_where("conv_id = 'c9'")
    ch = table.changelog_between(v_a).toPandas()
    ops = {(r["conv_id"]): r["change_op"] for r in ch.to_dict("records")}
    assert ops == {"c7": "U", "cX": "I", "c9": "D"}
    # D rows: null data columns, before carries the erased values
    d = ch[ch["change_op"] == "D"].iloc[0]
    assert d["text"] is None and d["before"]["text"] == "orig-9"


def test_stale_and_tied_appends_emit_nothing(spark, tmp_path):
    table = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=4,
                                 time_travel=True, write_mode="mor")
    ts = dt.datetime(2027, 3, 1)
    table.upsert(spark.createDataFrame([("k", 0, "user", "winner", ts)], ROWS))
    v_a = table.versions()[-1]
    # older ts loses; identical (ts, lsn) re-append ties to the earlier
    # commit — neither changes the resolved state, so the changelog
    # between the two versions must be EMPTY
    table.upsert(spark.createDataFrame(
        [("k", 0, "user", "stale", dt.datetime(2027, 2, 1))], ROWS))
    table.upsert(spark.createDataFrame([("k", 0, "user", "winner", ts)], ROWS))
    assert table.changelog_between(v_a).count() == 0


def test_commit_granularity_steps_match_versions(spark, tmp_path):
    table = _chunked(spark, tmp_path, write_mode="mor")
    versions = table.versions()
    v_from = versions[1]
    ch = _assert_replays(table, v_from, granularity="commit")
    # each per-commit slice replays its own (v-1 -> v) step exactly
    steps = sorted(ch["commit_version"].dropna().unique())
    assert steps == [v for v in versions if v > v_from]
    for prev, v in zip([v_from] + steps, steps):
        got = _apply(_snap(table, as_of=prev),
                     ch[ch["commit_version"] == v], DATA_COLS)
        want = _snap(table, as_of=v).sort_values(
            ["conv_id", "turn_idx"], ignore_index=True)
        assert state_hash(got) == state_hash(want)


def test_changelog_across_compact_and_rescale(spark, tmp_path):
    table = _chunked(spark, tmp_path, write_mode="mor")
    v_a = table.versions()[1]
    table.delete_where("turn_idx = 0")
    table.compact(drop_tombstones=True)   # erases the tombstones' identity
    table.rescale_buckets(5)              # layout change: full-diff fallback
    ch = _assert_replays(table, v_a)
    # compact(drop_tombstones) deleted rows surface as D with null
    # change_ts/lsn (the deleting event's identity is gone by design)
    dels = ch[ch["change_op"] == "D"]
    assert len(dels) > 0 and dels["change_lsn"].isna().all()


def test_net_matches_write_time_changefeed_for_one_commit(spark, tmp_path):
    """On a range of live-key-only changes, the after-the-fact diff and
    the write-time feed agree row for row.  (They intentionally differ
    on dead-key edges: the feed logs APPLIED writes — a resurrection is
    U-with-null-before, a delete of a dead key is a D — while the net
    diff classifies by endpoint LIVENESS: resurrection = I, dead->dead
    = nothing.  Both shapes exist upstream: Debezium logs applied ops,
    Iceberg's changelog view diffs snapshots.)"""
    table = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=4,
                                 time_travel=True, changefeed=True)
    ts0, ts1 = dt.datetime(2027, 1, 1), dt.datetime(2027, 1, 2)
    table.upsert(spark.createDataFrame(
        [("a", 0, "user", "a0", ts0), ("b", 0, "user", "b0", ts0)], ROWS))
    v_prev = table.versions()[-1]
    table.upsert(spark.createDataFrame(
        [("a", 0, "user", "a1", ts1), ("c", 0, "user", "c0", ts1)], ROWS))
    table.delete_where("conv_id = 'b'")
    last2 = sorted(r["batch"] for r in
                   table.changefeed().select("batch").distinct().collect())[-2:]
    feed = (table.changefeed(since_batch=last2[0] - 1).toPandas()
            .sort_values(["conv_id", "turn_idx"], ignore_index=True))
    ch = (table.changelog_between(v_prev).toPandas()
          .sort_values(["conv_id", "turn_idx"], ignore_index=True))
    assert len(feed) == len(ch) == 3
    for c in ("conv_id", "turn_idx", "change_op", "text", "change_lsn"):
        assert feed[c].tolist() == ch[c].tolist(), c
    fb = [None if x is None else x["text"] for x in feed["before"]]
    cb = [None if x is None else x["text"] for x in ch["before"]]
    assert fb == cb


def test_changelog_across_schema_evolution(spark, tmp_path):
    table = LocalCowTable.create(spark, str(tmp_path / "t"), n_buckets=4,
                                 time_travel=True, write_mode="mor")
    table.upsert(spark.createDataFrame(
        [("a", 0, "user", "one", dt.datetime(2027, 1, 1))], ROWS))
    v_a = table.versions()[-1]
    table.upsert(spark.createDataFrame(
        [("a", 0, "user", "two", "tool-x", dt.datetime(2027, 1, 2))],
        "conv_id string, turn_idx long, role string, text string, "
        "tool string, ts timestamp"))
    ch = table.changelog_between(v_a).toPandas()
    assert len(ch) == 1 and ch.iloc[0]["change_op"] == "U"
    assert ch.iloc[0]["tool"] == "tool-x"
    # the pre-evolution before-image surfaces the added column as null
    assert ch.iloc[0]["before"]["tool"] is None


def test_errors(spark, tmp_path):
    table = _chunked(spark, tmp_path, write_mode="mor")
    with pytest.raises(ValueError, match="granularity"):
        table.changelog_between(0, granularity="rows")
    with pytest.raises(ValueError, match="newer than"):
        table.changelog_between(table.versions()[-1], 1)
    table.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError, match="not retained"):
        table.changelog_between(1)
