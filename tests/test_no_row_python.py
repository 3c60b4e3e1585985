"""Vectorization guard (SURVEY.md §5.6; BASELINE.json input_hint:
"vectorized pandas/Arrow UDFs (no per-row Python) throughout").

1. Static: no `functions.udf(`/`@udf` row-at-a-time UDFs and no
   RDD map/collect loops anywhere in the engine source.
2. Plan-level: the replay pipeline's physical plan uses
   ArrowEvalPython (vectorized exchange), never BatchEvalPython
   (pickled row-at-a-time).
"""

import os
import re

from dipper_spark.functions.normalize import decode_payload, split_valid
from dipper_spark.operators.cdc import lww_collapse, normalize_winner_text
from dipper_spark.plans.replay import read_changelog
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "dipper_spark")

FORBIDDEN = [
    re.compile(r"\bF\.udf\s*\("),
    re.compile(r"^\s*@udf\b", re.M),
    re.compile(r"functions\s+import\s+udf\b"),
    re.compile(r"\.rdd\.map\b"),
    re.compile(r"\.foreach\s*\(\s*lambda"),
]


def test_no_row_at_a_time_python_in_source():
    offenders = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            src = open(os.path.join(root, fn)).read()
            for pat in FORBIDDEN:
                if pat.search(src):
                    offenders.append((os.path.join(root, fn), pat.pattern))
    assert not offenders, f"row-at-a-time Python found: {offenders}"


def test_replay_plan_is_arrow_vectorized(spark, tmp_path):
    gen_changelog(str(tmp_path / "log"), ChangelogSpec(seed=51, n_conv=20, extra_rate=0.5))
    raw = read_changelog(spark, str(tmp_path / "log"))
    ok, _ = split_valid(decode_payload(raw))
    c = normalize_winner_text(lww_collapse(ok))
    plan = c._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF in the hot path"
    assert "ArrowEvalPython" in plan, "expected the Arrow-vectorized UDF node"
    # partial/final aggregation split (map-side combine). max_by over a
    # struct value legally compiles to SortAggregate (struct buffers are
    # not hash-mutable); measured faster than hash+join alternatives.
    assert "SortAggregate" in plan or "HashAggregate" in plan


def test_scan_pushdown_reaches_parquet(spark):
    """Predicate + projection pushdown sanity on the relational surface."""
    from dipper_spark.operators.relational import scan_parquet_pushdown

    df = scan_parquet_pushdown(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "l_returnflag" in plan.split("PushedFilters:")[1][:200]
    rs = plan.split("ReadSchema:")[1][:300]
    assert "l_comment" not in rs  # projection pruned


def test_join_strategies_materialize(spark):
    from dipper_spark.operators.relational import (
        join_broadcast_dim,
        join_shuffle_hash,
        join_sort_merge,
    )

    d = "/root/testdata/sf0.001"
    p1 = join_broadcast_dim(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p1
    p2 = join_shuffle_hash(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in p2
    p3 = join_sort_merge(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in p3
