"""Round-6 optimization measurement harness (guide §1).

NOT the graded bench (bench.py is frozen); this file exists to
(a) isolate each stage of the cdc_replay pipeline with the noop sink
    so the computation is timed without the sink (guide §1.4),
(b) time individual relational queries exactly the way bench.py does
    (best-of-2 .count()),
(c) dump .explain("formatted") plans to plans/r06/.

Usage:
  python bench_extra.py stages [n_conv]          # cdc stage breakdown
  python bench_extra.py query <name> [reps]      # one relational query
  python bench_extra.py plans                    # dump explain files
  python bench_extra.py replay [n_conv]          # full replay wall, split
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session():
    from dipper_spark.session import build_session
    return build_session("dipper-bench-extra", cores=CPUS)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(label, fn, reps=2):
    wall = None
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        w = time.monotonic() - t0
        wall = w if wall is None else min(wall, w)
    print(f"{label:38s} {wall:8.3f}s")
    return wall


def _gen_log(n_conv):
    from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
    work = tempfile.mkdtemp(prefix="dipper_bx_")
    spec = ChangelogSpec(seed=42, n_conv=n_conv, extra_rate=1.2, hot_frac=0.3,
                         dup_rate=0.05, n_chunks=8)
    _, man = gen_changelog(os.path.join(work, "log"), spec)
    return work, man


def cmd_stages(n_conv=1_200_000):
    from pyspark.sql import functions as F

    from dipper_spark.functions.normalize import decode_payload, split_valid
    from dipper_spark.operators.cdc import lww_collapse, normalize_winner_text
    from dipper_spark.plans.replay import read_changelog

    spark = _session()
    sc = spark.sparkContext
    t0 = time.monotonic()
    work, man = _gen_log(n_conv)
    print(f"gen: {time.monotonic()-t0:.1f}s  events={man['n_delivered']}")
    log = os.path.join(work, "log")
    spark.conf.set("spark.sql.shuffle.partitions", str(2 * CPUS))

    raw = read_changelog(spark, log)
    sc.setJobDescription("stage: raw scan")
    _timed("raw scan (noop)", lambda: _noop(raw))
    sc.setJobDescription("stage: decode")
    dec = decode_payload(raw).drop("source", "source_offset")
    _timed("scan+decode (noop)", lambda: _noop(dec))
    ok, _bad = split_valid(dec)
    sc.setJobDescription("stage: decode+filter")
    _timed("scan+decode+filter (noop)", lambda: _noop(ok))
    sc.setJobDescription("stage: collapse")
    col = lww_collapse(ok, n_salts=16)
    _timed("...+collapse (noop)", lambda: _noop(col))
    sc.setJobDescription("stage: collapse+norm")
    nrm = normalize_winner_text(col)
    _timed("...+normalize (noop)", lambda: _noop(nrm))

    # absent-columns probe cost (runs on fresh tables inside replay)
    from dipper_spark.operators.cdc import absent_payload_columns
    sc.setJobDescription("stage: absent probe")
    _timed("absent_payload_columns probe", lambda: absent_payload_columns(raw, set()))
    sc.setJobDescription(None)
    spark.stop()


def cmd_replay(n_conv=1_200_000, reps=2):
    from dipper_spark.plans.replay import replay

    spark = _session()
    work, man = _gen_log(n_conv)
    log = os.path.join(work, "log")
    # warm-up like bench.py
    from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
    warm = ChangelogSpec(seed=1, n_conv=200, extra_rate=1.0)
    gen_changelog(os.path.join(work, "warm"), warm)
    replay(spark, os.path.join(work, "warm"), os.path.join(work, "warmtbl"), lineage=False)

    wall = None
    for attempt in range(reps):
        t0 = time.monotonic()
        table, _st = replay(spark, log, os.path.join(work, f"t{attempt}"),
                            n_salts=16, n_buckets=2 * CPUS, lineage=False)
        t1 = time.monotonic()
        n = table.snapshot().count()
        t2 = time.monotonic()
        print(f"attempt {attempt}: replay={t1-t0:.3f}s snapshot.count={t2-t1:.3f}s"
              f" total={t2-t0:.3f}s rows={n}")
        w = t2 - t0
        wall = w if wall is None else min(wall, w)
    print(json.dumps({"cdc_replay": round(wall, 3),
                      "events_per_sec": round(man["n_delivered"] / wall, 1)}))
    spark.stop()


def cmd_query(name, reps=3):
    from dipper_spark.operators import relational, relational_ext  # noqa: F401
    from dipper_spark.operators.relational import QUERIES

    spark = _session()
    fn = QUERIES[name]
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        n = fn(spark, SF_DIR).count()
        walls.append(round(time.monotonic() - t0, 3))
    print(json.dumps({"query": name, "rows": n, "walls": walls,
                      "min": min(walls), "sf_dir": SF_DIR}))
    spark.stop()


BENCH_QUERIES = [
    "agg_hash_group_q1", "join_broadcast_dim", "join_sort_merge",
    "join_range_interval", "agg_maxby_lww", "agg_salted_skew",
    "win_topk_per_group", "sort_limit_topk", "udf_pandas_scalar_norm",
    "embedding_cosine_topk", "dedup_exact_keep_first",
]


def cmd_suite(reps=2):
    """The bench.py relational loop, without the cdc replay."""
    from dipper_spark.operators import relational, relational_ext  # noqa: F401
    from dipper_spark.operators.relational import QUERIES

    spark = _session()
    out = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        wall = None
        for _ in range(reps):
            t0 = time.monotonic()
            fn(spark, SF_DIR).count()
            w = time.monotonic() - t0
            wall = w if wall is None else min(wall, w)
        out[name] = round(wall, 3)
    out["_total"] = round(sum(out.values()), 3)
    print(json.dumps(out))
    spark.stop()


def cmd_plans(which=None):
    from dipper_spark.operators import relational, relational_ext  # noqa: F401
    from dipper_spark.operators.relational import QUERIES

    spark = _session()
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    names = [which] if which else BENCH_QUERIES
    suffix = os.environ.get("DIPPER_PLAN_SUFFIX", "before")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "stages"
    if cmd == "stages":
        cmd_stages(int(sys.argv[2]) if len(sys.argv) > 2 else 1_200_000)
    elif cmd == "replay":
        cmd_replay(int(sys.argv[2]) if len(sys.argv) > 2 else 1_200_000)
    elif cmd == "query":
        cmd_query(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    elif cmd == "suite":
        cmd_suite()
    elif cmd == "plans":
        cmd_plans(sys.argv[2] if len(sys.argv) > 2 else None)
    else:
        raise SystemExit(f"unknown command {cmd}")
