"""SCD2 row-version history (round 5, beyond-survey — plans/history.py):
the changefeed folded into one row per key VERSION with effective
(ts, lsn) ranges.  Ground truth: time-travel snapshots per commit
(state_at must reproduce each one) and snapshot() (the is_current
slice must equal it exactly).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dipper_spark.plans.history import state_at
from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import ChangefeedExpiredError, LocalCowTable
from dipper_spark.schemas import SPEC_COLUMNS
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import state_hash

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _table(spark, tmp_path, **kw):
    gen_changelog(str(tmp_path / "log"),
                  ChangelogSpec(seed=63, n_conv=60, extra_rate=1.5,
                                dup_rate=0.15))
    table, stats = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"),
                          changefeed=True, chunk_lsn=400, **kw)
    assert len([s for s in stats if not s.skipped]) >= 2
    return table


def _hist_pd(table):
    return table.history().toPandas()


def test_current_slice_equals_snapshot(spark, tmp_path):
    table = _table(spark, tmp_path)
    cur = (table.history().filter("is_current")
           .select(*[c for c in table.snapshot().columns]))
    assert state_hash(cur.toPandas()) == \
        state_hash(table.snapshot().toPandas())


def test_intervals_disjoint_and_contiguous(spark, tmp_path):
    table = _table(spark, tmp_path)
    h = _hist_pd(table)
    _check_interval_discipline(h)
    # versions beyond the current ones exist (updates happened)
    assert len(h) > h["is_current"].sum()


def test_state_at_reproduces_every_time_travel_version(spark, tmp_path):
    """The strongest check: for each commit, reconstructing the state
    at that commit's max applied (ts, lsn) from the HISTORY frame
    equals the TIME-TRAVEL snapshot of that version byte-for-byte."""
    table = _table(spark, tmp_path, time_travel=True)
    hist = table.history().cache()
    feed = table.changefeed()
    # per feed batch, the max applied (ts, lsn) — the commit frontier
    frontiers = (feed.groupBy("batch")
                 .agg(F.max(F.struct("change_ts", "change_lsn")).alias("m"))
                 .orderBy("batch").collect())
    versions = table.versions()[1:]  # v0 = empty
    assert len(frontiers) == len(versions)
    for row, v in zip(frontiers, versions):
        got = (state_at(hist, row["m"]["change_ts"], row["m"]["change_lsn"])
               .select(*SPEC_COLUMNS))
        want = table.snapshot(as_of=v).select(*SPEC_COLUMNS)
        assert state_hash(got.toPandas()) == state_hash(want.toPandas()), \
            f"state_at != as_of for version {v}"
    hist.unpersist()


def test_delete_and_resurrection_versions(spark, tmp_path):
    table = _table(spark, tmp_path)
    ts = dt.datetime(2027, 6, 1)
    table.upsert(spark.createDataFrame(
        [("hist-k", 0, "user", "v1", ts)], ROWS))
    table.delete_where("conv_id = 'hist-k'")
    table.upsert(spark.createDataFrame(
        [("hist-k", 0, "user", "v2", ts + dt.timedelta(hours=1))], ROWS))
    g = (table.history().filter("conv_id = 'hist-k'")
         .orderBy("effective_from_ts", "effective_from_lsn").collect())
    # the resurrection is emitted as 'U' (matched a tombstone; null
    # `before` — the documented feed shape), not a fresh 'I'
    assert [r["version_op"] for r in g] == ["I", "U"]
    assert [r["end_op"] for r in g] == ["D", None]
    assert [r["is_current"] for r in g] == [False, True]
    assert g[0]["text"] == "v1" and g[1]["text"] == "v2"
    # between delete and resurrection the key is absent
    mid = state_at(table.history(), ts + dt.timedelta(minutes=30)) \
        .filter("conv_id = 'hist-k'")
    assert mid.count() == 0


def _check_interval_discipline(h):
    """Shared invariant checker over a history pandas frame: per key —
    strictly increasing clock, exactly-the-last version open iff live,
    'U' contiguous, 'D' leaves a gap."""
    h = h.sort_values(
        ["conv_id", "turn_idx", "effective_from_ts", "effective_from_lsn"],
        ignore_index=True)
    for (_, _), g in h.groupby(["conv_id", "turn_idx"], sort=False):
        g = g.reset_index(drop=True)
        assert list(g["effective_to_lsn"].isna()) == \
            [False] * (len(g) - 1) + [bool(g["is_current"].iloc[-1])]
        for i in range(len(g) - 1):
            assert (g["effective_from_ts"][i], g["effective_from_lsn"][i]) \
                < (g["effective_from_ts"][i + 1], g["effective_from_lsn"][i + 1])
            if g["end_op"][i] == "U":
                assert g["effective_to_ts"][i] == g["effective_from_ts"][i + 1]
                assert g["effective_to_lsn"][i] == g["effective_from_lsn"][i + 1]
            else:
                assert g["end_op"][i] == "D"
                assert (g["effective_to_ts"][i], g["effective_to_lsn"][i]) \
                    <= (g["effective_from_ts"][i + 1],
                        g["effective_from_lsn"][i + 1])


# ---------------- property: history under random API interleavings --------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _scripts(draw):
    n_ops = draw(st.integers(min_value=2, max_value=5))
    ops = []
    for _ in range(n_ops):
        if draw(st.booleans()):
            rows = [(f"c{draw(st.integers(min_value=0, max_value=2))}",
                     draw(st.integers(min_value=0, max_value=2)),
                     f"t{draw(st.integers(min_value=1, max_value=9))}",
                     dt.datetime(2026, 1, draw(st.integers(min_value=1, max_value=9))))
                    for _ in range(draw(st.integers(min_value=1, max_value=4)))]
            ops.append(("upsert", rows))
        else:
            ops.append(("delete",
                        f"turn_idx >= {draw(st.integers(min_value=0, max_value=2))}"))
    return ops


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(script=_scripts())
def test_history_invariants_under_random_interleavings(
        spark, tmp_path_factory, script):
    """Any upsert/delete_where interleaving (stale rows, multi-row
    frames, deletes, resurrections): the current history slice equals
    the snapshot and every key's intervals keep the SCD2 discipline."""
    root = str(tmp_path_factory.mktemp("hist_tbl"))
    table = LocalCowTable.create(spark, root, n_buckets=8, changefeed=True)
    for kind, arg in script:
        if kind == "upsert":
            table.upsert(spark.createDataFrame(
                [(c, t, txt, ts) for c, t, txt, ts in arg],
                "conv_id string, turn_idx long, text string, ts timestamp"))
        else:
            table.delete_where(arg)
    try:
        hist = table.history().toPandas()
    except FileNotFoundError:
        # every op was a no-op (e.g. delete on an empty table): no
        # merge ever committed, so there is no feed — and no table
        assert table.snapshot().count() == 0
        return
    snap_cols = table.snapshot().columns
    cur = hist[hist["is_current"]]
    got = sorted(map(tuple, cur[snap_cols].itertuples(index=False)))
    want = sorted(map(tuple, table.snapshot().toPandas()[snap_cols]
                      .itertuples(index=False)))
    assert got == want
    _check_interval_discipline(hist)


def test_history_respects_retention_contract(spark, tmp_path):
    table = _table(spark, tmp_path)
    table.expire_changefeed(keep_last_batches=1)
    with pytest.raises(ChangefeedExpiredError):
        table.history().count()
