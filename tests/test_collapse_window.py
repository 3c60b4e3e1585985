"""Round-6 optimization guard: the one-exchange window collapse
(operators.cdc.lww_collapse_window) must be output-IDENTICAL to the
salted two-phase groupBy collapse (lww_collapse) — winners, lineage
counters (n_events / exact n_unique) and is_delete — on a log with
duplicates, disorder and hot-key skew.  The plan, not the answer, is
what changed (3 Exchanges + 6 SortAggregates -> 1 Exchange + 1 Sort +
2 Window passes); this test pins the answer.
"""

import pandas as pd

from dipper_spark.functions.normalize import decode_payload, split_valid
from dipper_spark.operators.cdc import lww_collapse, lww_collapse_window
from dipper_spark.plans.replay import read_changelog
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog


def _collapsed(fn, spark, log_dir):
    raw = read_changelog(spark, log_dir)
    ok, _bad = split_valid(decode_payload(raw))
    out = fn(ok, n_salts=8).toPandas()
    return out.sort_values(["conv_id", "turn_idx"], ignore_index=True)


def test_window_collapse_equals_salted(spark, tmp_path):
    spec = ChangelogSpec(seed=23, n_conv=90, extra_rate=2.0, hot_frac=0.5,
                         dup_rate=0.25, max_disorder_s=1800, shuffle_window=150)
    gen_changelog(str(tmp_path / "log"), spec)
    a = _collapsed(lww_collapse, spark, str(tmp_path / "log"))
    b = _collapsed(lww_collapse_window, spark, str(tmp_path / "log"))
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b)


def test_window_collapse_degenerate_hot_key(spark, tmp_path):
    """Single-key skew: every extra event hammers one conversation.
    Both variants (and the counter-free fast path) must agree — the
    skew-envelope documentation in lww_collapse_window is about SPEED
    in this regime, never about correctness."""
    spec = ChangelogSpec(seed=9, n_conv=3, max_turns=1, extra_rate=800,
                         hot_frac=1.0, dup_rate=0.2)
    gen_changelog(str(tmp_path / "log"), spec)
    a = _collapsed(lww_collapse, spark, str(tmp_path / "log"))
    b = _collapsed(lww_collapse_window, spark, str(tmp_path / "log"))
    pd.testing.assert_frame_equal(a, b)
    nc = _collapsed(lambda df, n_salts: lww_collapse_window(df, counters=False),
                    spark, str(tmp_path / "log"))
    winners = [c for c in a.columns if c not in ("n_events", "n_unique")]
    pd.testing.assert_frame_equal(a[winners], nc[winners])
    assert nc["n_events"].isna().all() and nc["n_unique"].isna().all()


def test_window_collapse_plan_single_exchange(spark, tmp_path):
    """The point of the variant: exactly one Exchange, no aggregate."""
    gen_changelog(str(tmp_path / "log"),
                  ChangelogSpec(seed=5, n_conv=20, extra_rate=1.0))
    raw = read_changelog(spark, str(tmp_path / "log"))
    ok, _bad = split_valid(decode_payload(raw))
    plan = lww_collapse_window(ok)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "SortAggregate" not in plan, plan
