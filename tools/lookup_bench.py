"""Point-lookup pruning A/B: manifest stats + conv_id Blooms vs none.

The question a 10^10-event user asks: what does `lookup(conv_id)` cost
on a big table?  Without planning-time pruning every candidate file is
scheduled; with the manifest turn-range bucket prune plus per-file conv
Blooms (compute_stats / CLI `analyze`) the scan set collapses to the
files that can actually hold the conv.  This tool backfills one table,
then times a batch of conv-only lookups under three planning regimes
on the SAME data:

  - none:   stats stripped from the manifest copy (what a stats-less
            engine would plan) — every file scheduled
  - range:  footer min/max stats only (what every commit records)
  - bloom:  range + per-file conv Blooms (after one analyze pass)

Reports wall per lookup AND files planned per lookup (the scale story:
files-planned is what turns into scheduled tasks on a real cluster —
at 100 TB the wall gap IS the task-count gap).  Interference-hardened:
canary-gated, regimes interleaved per round, best-of-N per regime.

Appends a summary to BENCH/LOOKUP.md.  Usage:
  python tools/lookup_bench.py [--n-conv 50000] [--buckets 128]
        [--lookups 12] [--rounds 3]
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
    ap.add_argument("--n-conv", type=int, default=50000)
    ap.add_argument("--buckets", type=int, default=128)
    ap.add_argument("--lookups", type=int, default=12)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--no-md", action="store_true")
    args = ap.parse_args()

    from dipper_spark.plans.replay import replay
    from dipper_spark.plans.target import LocalCowTable
    from dipper_spark.session import build_session
    from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

    spark = build_session("lookup_bench", cores=args.cores,
                          shuffle_partitions=args.cores * 2)
    work = tempfile.mkdtemp(prefix="dipper_lkb_")
    try:
        gen_changelog(os.path.join(work, "log"),
                      ChangelogSpec(seed=5, n_conv=args.n_conv,
                                    extra_rate=1.2, dup_rate=0.05))
        table, st = replay(spark, os.path.join(work, "log"),
                           os.path.join(work, "tbl"),
                           n_buckets=args.buckets)
        ana = table.compute_stats()
        man = table._load()

        def rels(m):
            out = [r for r, _s in LocalCowTable._entries(m)]
            out += [r for r, _s, _v in LocalCowTable._delta_entries(m)]
            return out

        n_files = len(rels(man))
        convs = [f"conv{(7919 * i) % args.n_conv:08d}"
                 for i in range(args.lookups)]

        # manifest variants — SAME files, different planning metadata
        man_bloom = man
        man_range = json.loads(json.dumps(man))
        for s in man_range.get("file_stats", {}).values():
            s.pop("bloom", None)
        man_none = json.loads(json.dumps(man))
        man_none["file_stats"] = {}

        import pyspark.sql.types as T
        from pyspark.sql import functions as F
        schema = T.StructType.fromJson(man["schema"])

        def run_lookup(m, conv):
            t0 = time.monotonic()
            pruned = table._prune_man_by_conv(m, conv)
            cands = table._candidate_buckets(m, conv)
            bs = [str(b) for b in (cands if cands is not None
                                   else range(m["n_buckets"]))]
            planned = sum(len(pruned["buckets"].get(b, [])) for b in bs)
            planned += sum(len(pruned.get("deltas", {}).get(b, []))
                           for b in bs)
            df = (table._read_resolved(pruned, schema, cands)
                  .filter(F.col("conv_id") == conv)
                  .filter(~F.coalesce(F.col("_deleted"), F.lit(False))))
            n = df.count()  # timed end-to-end: planning + the Spark job
            return time.monotonic() - t0, planned, n

        regimes = {"none": man_none, "range": man_range, "bloom": man_bloom}
        best: dict[str, dict] = {k: {"wall": float("inf")} for k in regimes}
        for rnd in range(args.rounds):
            for name, m in regimes.items():  # interleaved per round
                canary()
                wall = files = rows = 0
                for conv in convs:
                    w, p, n = run_lookup(m, conv)
                    wall += w
                    files += p
                    rows += n
                if wall < best[name]["wall"]:
                    best[name] = {"wall": wall, "files": files, "rows": rows}
                print(f"# round {rnd} {name}: {wall:.2f}s "
                      f"{files} files planned, {rows} rows", file=sys.stderr)

        out = {
            "n_conv": args.n_conv, "buckets": args.buckets,
            "table_files": n_files, "lookups": args.lookups,
            "analyze": ana,
            "backfill_rows": sum(s.rows_applied for s in st),
            "regimes": {
                k: {"wall_s": round(v["wall"], 3),
                    "files_planned": v["files"],
                    "wall_per_lookup_ms": round(
                        1000 * v["wall"] / args.lookups, 1)}
                for k, v in best.items()},
        }
        # the three regimes must agree on the rows — else the prune lied
        assert len({v["rows"] for v in best.values()}) == 1, best
        out["speedup_bloom_vs_none"] = round(
            best["none"]["wall"] / best["bloom"]["wall"], 2)
        out["speedup_bloom_vs_range"] = round(
            best["range"]["wall"] / best["bloom"]["wall"], 2)
        print(json.dumps(out))

        if not args.no_md:
            md = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH", "LOOKUP.md")
            with open(md, "a") as f:
                f.write(f"\n```json\n{json.dumps(out, indent=1)}\n```\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
