"""Measured cost of the round-4 CDC-out surfaces at bench scale.

Three questions a user at 100 TB asks before enabling them:
  1. What does changefeed emission add to a backfill replay?
     (it is one extra action over the persisted net-change plan)
  2. What does time-travel retention add? (deferred GC + a manifest
     copy per commit — expected ~0)
  3. What does an IVM refresh cost vs recomputing the view from the
     base table? (refresh reads only the feed; recompute scans the
     table)

Interference-hardened like tools/scaling_bench.py: a CPU canary gates
each timed run, arms are interleaved per round, best-of-N reported.
Appends one JSON line; run with a quiet host.

Usage: python tools/changefeed_bench.py [--n-conv 100000] [--rounds 2]
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
    ap.add_argument("--n-conv", type=int, default=100_000)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from dipper_spark.plans.ivm import IncrementalView
    from dipper_spark.plans.replay import replay
    from dipper_spark.session import build_session
    from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

    work = tempfile.mkdtemp(prefix="dipper_cfbench_")
    log_dir = os.path.join(work, "log")
    spec = ChangelogSpec(seed=42, n_conv=args.n_conv, extra_rate=1.2,
                         hot_frac=0.3, dup_rate=0.05, n_chunks=64)
    _, man = gen_changelog(log_dir, spec)
    n_events = man["n_delivered"]
    print(f"# input: {n_events} delivered events", file=sys.stderr)

    spark = build_session("cf-bench", cores=args.cores,
                          shuffle_partitions=args.cores * 2)
    arms = {
        "plain": dict(),
        "changefeed": dict(changefeed=True),
        "changefeed+tt": dict(changefeed=True, time_travel=True),
    }
    walls: dict[str, list[float]] = {a: [] for a in arms}
    ivm_refresh, ivm_recompute = [], []
    for r in range(args.rounds):
        for arm, kw in arms.items():  # interleaved: arms share windows
            canary()
            tbl = os.path.join(work, f"tbl_{arm}_{r}")
            t0 = time.monotonic()
            table, _ = replay(spark, log_dir, tbl, **kw)
            n_rows = table.snapshot().count()
            walls[arm].append(time.monotonic() - t0)
            print(f"# round {r} {arm}: {walls[arm][-1]:.2f}s "
                  f"({n_rows} rows)", file=sys.stderr)
            if arm == "changefeed":
                view = IncrementalView(spark, table, os.path.join(work, f"v_{r}"),
                                       ["conv_id"], {"n_turns": "1",
                                                     "chars": "length(coalesce(text,''))"})
                canary()
                t0 = time.monotonic()
                view.refresh()
                ivm_refresh.append(time.monotonic() - t0)
                canary()
                t0 = time.monotonic()
                view.full_recompute().count()
                ivm_recompute.append(time.monotonic() - t0)
                print(f"# round {r} ivm: refresh {ivm_refresh[-1]:.2f}s, "
                      f"recompute {ivm_recompute[-1]:.2f}s", file=sys.stderr)
            shutil.rmtree(tbl, ignore_errors=True)

    best = {a: min(w) for a, w in walls.items()}
    out = {
        "metric": "round-4 surface cost at bench scale (best-of-rounds walls)",
        "n_events": n_events,
        "cores": args.cores,
        "replay_wall_s": {a: round(b, 2) for a, b in best.items()},
        "changefeed_overhead": round(best["changefeed"] / best["plain"], 3),
        "time_travel_extra": round(best["changefeed+tt"] / best["changefeed"], 3),
        "ivm_refresh_s": round(min(ivm_refresh), 2),
        "ivm_full_recompute_s": round(min(ivm_recompute), 2),
        "walls": {a: [round(x, 2) for x in w] for a, w in walls.items()},
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
