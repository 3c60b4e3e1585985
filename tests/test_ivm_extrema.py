"""IVM MIN/MAX + AVG (round 5, VERDICT r4 #3).

MIN/MAX are not delta-maintainable; the view maintains them by
plus-side folding with rescan-on-retraction — only groups whose
retracted pre-image value ties-or-beats the folded candidate are
re-derived from the base table.  AVG is a maintained (sum, count)
pair exposed as a ratio.  Every scenario is verified against
full_recompute() — the same view computed by a full scan.
"""

import datetime as dt

import pandas as pd

from dipper_spark.plans.ivm import IncrementalView
from dipper_spark.plans.replay import replay
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _setup(spark, tmp_path, seed=91):
    spec = ChangelogSpec(seed=seed, n_conv=40, extra_rate=1.5, dup_rate=0.1)
    gen_changelog(str(tmp_path / "log"), spec)
    table, _ = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"),
                      chunk_lsn=300, changefeed=True)
    view = IncrementalView(
        spark, table, str(tmp_path / "view"), ["conv_id"],
        aggs={"n_turns": "1"},
        avgs={"avg_chars": "length(coalesce(text, ''))"},
        extrema={"min_turn": ("min", "turn_idx"),
                 "max_turn": ("max", "turn_idx"),
                 "min_chars": ("min", "length(coalesce(text, '')) ")})
    return table, view


def _assert_equals_recompute(view):
    got = view.read().orderBy("conv_id").toPandas().reset_index(drop=True)
    want = view.full_recompute().orderBy("conv_id").toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-9)


def test_bootstrap_minmax_avg_equal_recompute(spark, tmp_path):
    _table, view = _setup(spark, tmp_path)
    out = view.refresh()
    assert not out["noop"]
    _assert_equals_recompute(view)


def test_clean_inserts_fold_without_rescan(spark, tmp_path):
    table, view = _setup(spark, tmp_path, seed=92)
    view.refresh()
    conv = table.snapshot().first()["conv_id"]
    # pure inserts: brand-new group + new higher turn in an existing
    # group — extrema fold from (old, plus), no retraction, no rescan
    table.upsert(spark.createDataFrame(
        [("ext-new-conv", 0, "user", "xx", dt.datetime(2027, 1, 1)),
         (conv, 999, "user", "tail turn", dt.datetime(2027, 1, 1))], ROWS))
    out = view.refresh()
    assert out["rescanned_groups"] == 0, "inserts must not trigger a rescan"
    _assert_equals_recompute(view)
    row = (view.read().filter(f"conv_id = '{conv}'").first())
    assert row["max_turn"] == 999


def test_retraction_storm_rescans_and_matches(spark, tmp_path):
    table, view = _setup(spark, tmp_path, seed=93)
    view.refresh()
    # storm 1: delete every group's min-turn row (turn 0 exists for all)
    table.delete_where("turn_idx = 0")
    out = view.refresh()
    assert out["rescanned_groups"] > 0, "deleting group minima must rescan"
    _assert_equals_recompute(view)
    # storm 2: update rows to LONGER text — retracts min_chars witnesses
    conv = view.read().first()["conv_id"]
    victims = table.snapshot().filter(f"conv_id = '{conv}'").collect()
    table.upsert(spark.createDataFrame(
        [(r["conv_id"], r["turn_idx"], r["role"],
          "much much longer replacement text than before", dt.datetime(2027, 3, 1))
         for r in victims], ROWS))
    view.refresh()
    _assert_equals_recompute(view)
    # storm 3: delete a whole group — it must vanish from the view
    table.delete_where(f"conv_id = '{conv}'")
    view.refresh()
    assert view.read().filter(f"conv_id = '{conv}'").count() == 0
    _assert_equals_recompute(view)


def test_orphan_view_dirs_swept_and_consumed_compacted(spark, tmp_path):
    """ADVICE r4: uuid-named view dirs orphaned by a crash between data
    write and meta swap are swept at the next refresh; the consumed
    bookkeeping stays a compact high-watermark, not an ever-growing
    list."""
    import os

    table, view = _setup(spark, tmp_path, seed=94)
    view.refresh()
    orphan = os.path.join(view.root, "view_deadbeef.parquet")
    os.makedirs(orphan)
    table.upsert(spark.createDataFrame(
        [("sweep-x", 0, "user", "t", dt.datetime(2027, 1, 1))], ROWS))
    view.refresh()
    assert not os.path.exists(orphan)
    dirs = [d for d in os.listdir(view.root)
            if d.startswith("view_") and d.endswith(".parquet")]
    assert dirs == [view._meta()["current"]]
    for entry in view._meta()["consumed"].values():
        assert isinstance(entry, dict) and set(entry) == {"hwm", "extra"}
        assert entry["extra"] == []  # dense ids fold fully into the hwm
