"""Merge-on-read vs copy-on-write ingest A/B at bench scale.

The question a 10^10-event user asks: once the table is big, what does
each incremental micro-batch COST under each write mode?  CoW pays
O(touched-bucket bytes) per merge (read + join + rewrite); MoR pays
O(batch bytes) (pure bucket-aligned append) and defers the join to
read/compact.  This tool backfills a large base table once per arm,
then applies K small incremental batches, and reports:

  - incremental merge wall (sum + per-batch) per arm  <- the headline
  - snapshot (read) wall after the K batches          <- MoR's cost
  - compact wall + post-compact snapshot wall         <- the fold-back

Interference-hardened like tools/scaling_bench.py: CPU canary gates
each timed run, arms interleaved per round, best-of-N.  Appends one
JSON line; run on a quiet host.

Usage: python tools/mor_bench.py [--n-conv 200000] [--batches 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canary(max_s: float = 0.45, tries: int = 40) -> float:
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.random((800, 800))
    for _ in range(tries):
        t0 = time.monotonic()
        for _ in range(10):
            a @ a
        dt = time.monotonic() - t0
        if dt <= max_s:
            return dt
        print(f"# canary slow ({dt:.2f}s), waiting…", file=sys.stderr)
        time.sleep(20)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-conv", type=int, default=200_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch-conv", type=int, default=2_000,
                    help="conversations touched per incremental batch")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    import datetime as dt

    from pyspark.sql import functions as F

    from dipper_spark.plans.replay import replay
    from dipper_spark.session import build_session
    from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

    work = tempfile.mkdtemp(prefix="dipper_morbench_")
    log_dir = os.path.join(work, "log")
    spec = ChangelogSpec(seed=42, n_conv=args.n_conv, extra_rate=1.2,
                         hot_frac=0.3, dup_rate=0.05, n_chunks=64)
    _, man = gen_changelog(log_dir, spec)
    n_events = man["n_delivered"]
    print(f"# base input: {n_events} delivered events", file=sys.stderr)

    spark = build_session("mor-bench", cores=args.cores,
                          shuffle_partitions=args.cores * 2)

    def inc_frame(i: int):
        # args.batch_conv single-turn updates spread over existing convs
        return (spark.range(args.batch_conv)
                .select(
                    F.format_string(
                        "conv%08d",
                        ((F.col("id") * 7919 + i * 104729)
                         % args.n_conv).cast("long")).alias("conv_id"),
                    F.lit(0).cast("long").alias("turn_idx"),
                    F.lit("user").alias("role"),
                    F.concat(F.lit(f"update-{i}-"),
                             F.col("id").cast("string")).alias("text"),
                    F.lit(None).cast("string").alias("tool"),
                    F.lit(dt.datetime(2027, 1, 1) + dt.timedelta(hours=i))
                     .cast("timestamp").alias("ts")))

    arms = ["cow", "mor"]
    inc_walls = {a: [] for a in arms}      # sum of K incremental merges
    snap_walls = {a: [] for a in arms}     # resolved read after K batches
    compact_walls = {a: [] for a in arms}
    post_snap_walls = {a: [] for a in arms}
    final_rows = {}

    for r in range(args.rounds):
        for arm in arms:  # interleaved: arms share interference windows
            tbl = os.path.join(work, f"tbl_{arm}_{r}")
            table, _ = replay(spark, log_dir, tbl, write_mode=arm)
            canary()
            t0 = time.monotonic()
            for i in range(args.batches):
                table.upsert(inc_frame(i), scope="bench")
            inc_walls[arm].append(time.monotonic() - t0)
            canary()
            t0 = time.monotonic()
            final_rows[arm] = table.snapshot().count()
            snap_walls[arm].append(time.monotonic() - t0)
            canary()
            t0 = time.monotonic()
            table.compact()
            compact_walls[arm].append(time.monotonic() - t0)
            t0 = time.monotonic()
            table.snapshot().count()
            post_snap_walls[arm].append(time.monotonic() - t0)
            print(f"# round {r} {arm}: inc {inc_walls[arm][-1]:.2f}s "
                  f"snap {snap_walls[arm][-1]:.2f}s "
                  f"compact {compact_walls[arm][-1]:.2f}s "
                  f"post-snap {post_snap_walls[arm][-1]:.2f}s",
                  file=sys.stderr)
            shutil.rmtree(tbl, ignore_errors=True)

    assert final_rows["cow"] == final_rows["mor"], final_rows
    best = lambda d: {a: round(min(w), 2) for a, w in d.items()}  # noqa: E731
    out = {
        "metric": "incremental micro-batch ingest: MoR vs CoW (best-of-rounds)",
        "n_base_events": n_events,
        "batches": args.batches,
        "batch_rows": args.batch_conv,
        "cores": args.cores,
        "incremental_wall_s": best(inc_walls),
        "mor_ingest_speedup": round(min(inc_walls["cow"]) / min(inc_walls["mor"]), 2),
        "snapshot_wall_s": best(snap_walls),
        "mor_read_amplification": round(min(snap_walls["mor"]) / min(snap_walls["cow"]), 2),
        "compact_wall_s": best(compact_walls),
        "post_compact_snapshot_wall_s": best(post_snap_walls),
        "final_rows": final_rows["cow"],
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
