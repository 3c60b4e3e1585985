"""Incremental view maintenance (round 4 — beyond-survey): a grouped
SUM/COUNT view maintained purely from changefeed deltas must equal
the same view recomputed from a full base-table scan, across multiple
commits, updates that move rows between groups, and deletes that
empty a group — and a refresh with no new batches must be a no-op.
"""

import pandas as pd
import pytest

from dipper_spark.plans.ivm import IncrementalView
from dipper_spark.plans.replay import replay
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog


def _pdf(df) -> pd.DataFrame:
    p = df.toPandas()
    return p.sort_values(list(p.columns)).reset_index(drop=True)


def _assert_view_equals_recompute(view):
    got, want = _pdf(view.read()), _pdf(view.full_recompute())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_view_equals_full_recompute_after_chunked_replay(spark, tmp_path):
    spec = ChangelogSpec(seed=51, n_conv=70, extra_rate=1.8, dup_rate=0.15)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, stats = replay(spark, log_dir, str(tmp_path / "tbl"),
                          chunk_lsn=400, changefeed=True)
    assert len([s for s in stats if not s.skipped]) >= 2
    view = IncrementalView(
        spark, table, str(tmp_path / "view"), ["conv_id"],
        {"n_turns": "1", "chars": "length(coalesce(text, ''))"})
    out = view.refresh()
    assert not out["noop"] and out["consumed"]
    _assert_view_equals_recompute(view)
    # no group survives with zero live rows
    assert view.read().filter("_n_live <= 0").count() == 0


def test_group_by_data_column_with_moves_and_deletes(spark, tmp_path):
    """Grouping by a DATA column (role): an update that changes role
    moves the row between groups — the delta must decrement the OLD
    group from the pre-image and increment the new one."""
    spec = ChangelogSpec(seed=52, n_conv=60, extra_rate=2.2, dup_rate=0.2)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "tbl"),
                      chunk_lsn=300, changefeed=True)
    view = IncrementalView(spark, table, str(tmp_path / "view"), ["role"],
                           {"chars": "length(coalesce(text, ''))"})
    view.refresh()
    _assert_view_equals_recompute(view)


def test_incremental_consumes_only_new_batches(spark, tmp_path):
    spec = ChangelogSpec(seed=53, n_conv=60, extra_rate=1.5, dup_rate=0.1)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "tbl"),
                      chunk_lsn=400, changefeed=True)
    view = IncrementalView(spark, table, str(tmp_path / "view"), ["conv_id"],
                           {"n_turns": "1"})
    first = view.refresh()
    n_first = sum(len(b) for b in first["consumed"].values())
    assert n_first >= 2
    # second producer pass under a new scope (streaming ingest)
    from dipper_spark.streaming.ingest import ingest
    ingest(spark, log_dir, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
           changefeed=True)
    second = view.refresh()
    # only the NEW scope's batches were consumed, never the old ones
    assert second["consumed"] and all(
        tag not in first["consumed"] for tag in second["consumed"])
    _assert_view_equals_recompute(view)
    # idempotent: nothing new -> no-op, view bytes unchanged
    before = _pdf(view.read())
    third = view.refresh()
    assert third["noop"]
    pd.testing.assert_frame_equal(before, _pdf(view.read()), check_dtype=False)


def test_rejects_colliding_agg_names(spark, tmp_path):
    spec = ChangelogSpec(seed=54, n_conv=10)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "tbl"), changefeed=True)
    with pytest.raises(ValueError):
        IncrementalView(spark, table, str(tmp_path / "v"), ["conv_id"],
                        {"conv_id": "1"})
