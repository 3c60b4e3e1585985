"""Scaling-efficiency benchmark (BASELINE.md protocol; SURVEY.md §6).

The north rule's two-cluster-size criterion (throughput scaling
efficiency >= 0.8 from N to 4N executors) cannot use a real cluster in
this sandbox; per driver instruction it is evidenced by running the
SAME replay job on the SAME generated input at local[8] and local[32]
on this 32-core box.

Protocol:
  * one deterministic changelog (seeded; hot-conversation skew on),
    identical files for both parallelism levels;
  * per level: fresh JVM (subprocess), one warm-up replay (JIT), then
    R timed replays into fresh tables; median wall reported;
  * each level verifies the final-state hash against the pandas
    oracle, proving the benchmark ran the real workload;
  * efficiency = (rate_32 / rate_8) / 4.

Writes BENCH/BASELINE.md and prints one JSON line.

Usage:  python tools/scaling_bench.py [--n-conv 250000] [--runs 3]
Inner:  python tools/scaling_bench.py --inner --cores N --log DIR --runs R
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def inner(cores: int, log_dir: str, runs: int) -> None:
    from dipper_spark.plans.replay import replay
    from dipper_spark.session import build_session
    from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

    spark = build_session(f"scaling-{cores}", cores=cores)
    work = tempfile.mkdtemp(prefix=f"dipper_scale_{cores}_")

    # JIT/codegen warm-up (excluded, like session startup)
    warm = ChangelogSpec(seed=1, n_conv=200, extra_rate=1.0)
    gen_changelog(os.path.join(work, "warm"), warm)
    replay(spark, os.path.join(work, "warm"), os.path.join(work, "warmtbl"), lineage=False)

    walls = []
    final_hash = None
    for i in range(runs):
        t0 = time.monotonic()
        table, _ = replay(spark, log_dir, os.path.join(work, f"table{i}"),
                          n_salts=16, n_buckets=2 * cores, lineage=False)
        table.snapshot().count()
        walls.append(time.monotonic() - t0)
        if i == 0:
            from dipper_spark.testkit.oracle import state_hash
            final_hash = state_hash(table.snapshot().toPandas())
    print(json.dumps({"cores": cores, "walls": walls,
                      "median_wall": statistics.median(walls),
                      "final_hash": final_hash}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", action="store_true")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--log", type=str, default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--n-conv", type=int, default=250_000)
    args = ap.parse_args()

    if args.inner:
        inner(args.cores, args.log, args.runs)
        return

    from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
    from dipper_spark.testkit.oracle import apply_log_pandas, state_hash

    work = tempfile.mkdtemp(prefix="dipper_scaling_")
    log_dir = os.path.join(work, "log")
    spec = ChangelogSpec(seed=42, n_conv=args.n_conv, extra_rate=1.2, hot_frac=0.3,
                         dup_rate=0.05, n_chunks=16)
    logical, man = gen_changelog(log_dir, spec)
    oracle_hash = state_hash(apply_log_pandas(logical))
    n_events = man["n_delivered"]
    print(f"# input: {n_events} delivered events, oracle hash {oracle_hash[:16]}…", file=sys.stderr)

    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner", "--cores", str(cores),
             "--log", log_dir, "--runs", str(args.runs)],
            capture_output=True, text=True, cwd=REPO, check=True,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        r = results[cores]
        r["events_per_sec"] = n_events / r["median_wall"]
        r["hash_ok"] = r["final_hash"] == oracle_hash
        print(f"# local[{cores}]: median {r['median_wall']:.2f}s, "
              f"{r['events_per_sec']:,.0f} ev/s, hash_ok={r['hash_ok']}", file=sys.stderr)

    eff = (results[32]["events_per_sec"] / results[8]["events_per_sec"]) / 4.0
    summary = {
        "metric": "replay throughput scaling efficiency local[8]->local[32]",
        "n_events": n_events,
        "runs_per_level": args.runs,
        "local8": {"median_wall_s": round(results[8]["median_wall"], 2),
                    "events_per_sec": round(results[8]["events_per_sec"], 1),
                    "hash_ok": results[8]["hash_ok"]},
        "local32": {"median_wall_s": round(results[32]["median_wall"], 2),
                     "events_per_sec": round(results[32]["events_per_sec"], 1),
                     "hash_ok": results[32]["hash_ok"]},
        "scaling_efficiency": round(eff, 3),
        "threshold": 0.8,
        "pass": eff >= 0.8 and results[8]["hash_ok"] and results[32]["hash_ok"],
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE.md — measured results

Protocol: BASELINE.md "sandbox proxy" — same seeded changelog
({n_events:,} delivered events, hot_frac=0.3, dup_rate=0.05), same
files, fresh JVM per parallelism level, 1 warm-up + {args.runs} timed
replays per level (median), final-state hash checked against the
single-threaded pandas oracle.

| run | parallelism | events | wall (s, median of {args.runs}) | events/s | final-state hash ok | scaling efficiency |
|---|---|---|---|---|---|---|
| replay | local[8] | {n_events:,} | {results[8]['median_wall']:.2f} | {results[8]['events_per_sec']:,.0f} | {results[8]['hash_ok']} | — |
| replay | local[32] | {n_events:,} | {results[32]['median_wall']:.2f} | {results[32]['events_per_sec']:,.0f} | {results[32]['hash_ok']} | **{eff:.3f}** ({'PASS' if summary['pass'] else 'FAIL'}, threshold 0.8) |

All walls per run:
- local[8]:  {', '.join(f'{w:.2f}s' for w in results[8]['walls'])}
- local[32]: {', '.join(f'{w:.2f}s' for w in results[32]['walls'])}

efficiency = (rate_32 / rate_8) / 4 = ({results[32]['events_per_sec']:,.0f} / {results[8]['events_per_sec']:,.0f}) / 4 = {eff:.3f}
""")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
