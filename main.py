"""dipper_spark CLI — the spark-submit entry point (SURVEY.md §3).

    spark-submit --py-files dipper_spark.zip main.py <command> ...

Commands:
  gen      --out DIR [--n-conv N] [--seed S] [...]      generate a changelog
  replay   --log DIR --table DIR [--chunk-lsn N]        batch backfill (op C15)
  ingest   --log DIR --table DIR --checkpoint DIR       streaming ingest (C1..C14)
  snapshot --table DIR [--limit N] [--as-of V]          stable-order snapshot (C16)
  history  --table DIR [--at-ts T | --current-only]     SCD2 row-version history
  tag      add|drop|list --table DIR [--name N]         pin time-travel versions
  branch   create|drop|list|publish --table DIR          write-audit-publish
  constraint add|drop|list|quarantined --table DIR      CHECK constraints
  vacuum   --table DIR [--ttl-seconds S]                sweep crash debris
  compact  --table DIR [--drop-tombstones] [--minor]    file compaction (C17)
  advise   --table DIR                                  maintenance recommendations
  inspect  --table DIR --what files|history|snapshots|refs|consumers|constraints|schema
  rollback --table DIR --to V|TAG                       reset data state (new commit)
  rename-column --table DIR --column OLD --to NEW       field-id rename (metadata-only)
  drop-column   --table DIR --column NAME               field-id drop (no resurrection)
  rescale  --table DIR --n-buckets N                    online bucket-count change
  mirror   --upstream DIR --table DIR [--n-buckets N]   sync a changefeed replica
  lineage  --table DIR                                  show lineage records
  changelog --table DIR --from V [--to V]               snapshot-diff changelog
  versions --table DIR                                  retained time-travel versions
  expire   --table DIR [--keep-last K]                  reclaim time-travel space
  consumers --table DIR                                 changefeed consumer group
  upsert   --table DIR --parquet PATH                   Delta-style MERGE of a file
  delete   --table DIR --where PRED                     predicate tombstones
  view-refresh --table DIR --view DIR --group-by COLS [--agg n=expr ...]
                                                        incremental aggregate view

Packaging: `python main.py zip` writes dipper_spark.zip for --py-files.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark(cores=None):
    from dipper_spark.session import build_session

    return build_session("dipper-cli", cores=cores)


def main() -> None:
    ap = argparse.ArgumentParser(prog="dipper_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen")
    g.add_argument("--out", required=True)
    g.add_argument("--n-conv", type=int, default=1000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--extra-rate", type=float, default=1.2)
    g.add_argument("--hot-frac", type=float, default=0.3)
    g.add_argument("--dup-rate", type=float, default=0.05)
    g.add_argument("--n-chunks", type=int, default=8)

    r = sub.add_parser("replay")
    r.add_argument("--log", required=True)
    r.add_argument("--table", required=True)
    r.add_argument("--chunk-lsn", type=int, default=None)
    r.add_argument("--n-salts", type=int, default=16)
    r.add_argument("--n-buckets", type=int, default=64)
    r.add_argument("--cores", type=int, default=None)
    r.add_argument("--collapse", choices=["window", "carry", "slim", "dictkey"],
                   default="window",
                   help="window (default since r6): one-exchange window "
                        "collapse — fastest for batch replays; carry: salted "
                        "two-phase groupBy (use for a single degenerate hot "
                        "key); slim: winner-lsn-only collapse + payload "
                        "semi-join (fewer shuffle bytes for wide payloads)")
    r.add_argument("--dead-letter", action="store_true",
                   help="persist op-C4 rejected rows under <table>/_deadletter")
    r.add_argument("--changefeed", action="store_true",
                   help="emit row-level changes under <table>/_changes (CDC out)")
    r.add_argument("--time-travel", action="store_true",
                   help="retain per-commit manifests for snapshot --as-of")
    r.add_argument("--write-mode", choices=["cow", "mor"], default="cow",
                   help="cow: rewrite touched buckets per merge; mor: append "
                        "delta files, resolve at read, fold via compact")

    i = sub.add_parser("ingest")
    i.add_argument("--log", required=True)
    i.add_argument("--table", required=True)
    i.add_argument("--checkpoint", required=True)
    i.add_argument("--max-files-per-trigger", type=int, default=None)
    i.add_argument("--stream-dedup", action="store_true")
    i.add_argument("--continuous", action="store_true",
                   help="keep tailing instead of availableNow")
    i.add_argument("--dead-letter", action="store_true",
                   help="persist op-C4 rejected rows under <table>/_deadletter")
    i.add_argument("--source", choices=["file", "binlog"], default="file",
                   help="file: Spark file source (C1); binlog: custom "
                        "DataSource with own offsets (C2)")
    i.add_argument("--max-chunks-per-trigger", type=int, default=None,
                   help="binlog-source pacing (persisted via pacingDir in "
                        "the checkpoint; processingTime triggers only)")
    i.add_argument("--changefeed", action="store_true",
                   help="emit row-level changes under <table>/_changes (CDC out)")
    i.add_argument("--time-travel", action="store_true",
                   help="retain per-commit manifests for snapshot --as-of")
    i.add_argument("--write-mode", choices=["cow", "mor"], default="cow",
                   help="cow: rewrite touched buckets per merge; mor: append "
                        "delta files, resolve at read, fold via compact")

    s = sub.add_parser("snapshot")
    s.add_argument("--table", required=True)
    s.add_argument("--branch", default=None,
                   help="operate on a branch instead of main")
    s.add_argument("--limit", type=int, default=20)
    s.add_argument("--as-of", type=lambda v: int(v) if v.lstrip("-").isdigit() else v,
                   default=None,
                   help="time-travel to a retained table version (int) "
                        "or a snapshot tag name")

    tg = sub.add_parser("tag", help="named pins on time-travel versions")
    tg.add_argument("action", choices=["add", "drop", "list"])
    tg.add_argument("--table", required=True)
    tg.add_argument("--name", default=None)
    tg.add_argument("--version", type=int, default=None,
                    help="version to pin (default: current)")

    hi = sub.add_parser("history", help="SCD2 row-version history derived "
                                        "from the changefeed (needs the full "
                                        "feed retained)")
    hi.add_argument("--table", required=True)
    hi.add_argument("--limit", type=int, default=20)
    hi.add_argument("--at-ts", default=None,
                    help="ISO timestamp: show the reconstructed state at "
                         "that point instead of the version rows")
    hi.add_argument("--current-only", action="store_true",
                    help="only open, live versions (== snapshot)")
    hi.add_argument("--source", default="feed",
                    choices=["feed", "changelog"],
                    help="feed = write-time changefeed; changelog = "
                         "per-commit snapshot diffs (MoR / no-feed "
                         "tables, needs --time-travel)")
    hi.add_argument("--from-version", default=None,
                    help="changelog source: seed from this retained "
                         "version/tag instead of the earliest")

    cn = sub.add_parser("constraint", help="CHECK constraints (data-quality "
                                           "gate on every write path)")
    cn.add_argument("action", choices=["add", "drop", "list", "quarantined"])
    cn.add_argument("--table", required=True)
    cn.add_argument("--name", default=None)
    cn.add_argument("--expr", default=None,
                    help="SQL boolean over data/key columns, e.g. "
                         "\"text IS NOT NULL AND turn_idx >= 0\"")
    cn.add_argument("--mode", choices=["enforce", "quarantine"],
                    default="enforce")
    cn.add_argument("--no-validate", action="store_true",
                    help="skip validating existing rows on add")
    cn.add_argument("--limit", type=int, default=20)

    va = sub.add_parser("vacuum", help="sweep crash debris (_tmp_b*/_stage_b*/"
                                       ".stage_* older than the TTL)")
    va.add_argument("--table", required=True)
    va.add_argument("--ttl-seconds", type=int, default=3600)

    c = sub.add_parser("compact")
    c.add_argument("--table", required=True)
    c.add_argument("--drop-tombstones", action="store_true")
    c.add_argument("--minor", action="store_true",
                   help="rewrite only delta-debt / fragmented buckets "
                        "(O(selected bytes), composes with concurrent "
                        "writers on other buckets)")
    c.add_argument("--buckets", default=None,
                   help="explicit comma-separated bucket ids to rewrite")
    c.add_argument("--min-files", type=int, default=2,
                   help="minor selection: buckets with >= this many "
                        "base files (delta-debt buckets always select)")
    c.add_argument("--sort", action="store_true",
                   help="sort rewritten buckets by (conv_id, turn_idx) "
                        "for tight row-group stats / scan locality "
                        "(Iceberg sort-order rewrite)")

    rs = sub.add_parser("rescale", help="online bucket-count change (one commit)")
    rs.add_argument("--table", required=True)
    rs.add_argument("--n-buckets", type=int, required=True)
    rs.add_argument("--drop-tombstones", action="store_true")

    ln = sub.add_parser("lineage")
    ln.add_argument("--table", required=True)

    ch = sub.add_parser("changes", help="print the row-level changefeed (CDC out)")
    ch.add_argument("--table", required=True)
    ch.add_argument("--since-batch", type=int, default=None)
    ch.add_argument("--limit", type=int, default=20)

    cl = sub.add_parser("changelog", help="snapshot-diff changelog between two "
                                          "retained versions (CDC out without a "
                                          "write-time changefeed — works on MoR)")
    cl.add_argument("--table", required=True)
    cl.add_argument("--from", dest="from_v", required=True,
                    type=lambda v: int(v) if v.lstrip("-").isdigit() else v,
                    help="from version int or tag name")
    cl.add_argument("--to", dest="to_v", default=None,
                    type=lambda v: int(v) if v.lstrip("-").isdigit() else v,
                    help="to version int or tag (default: current)")
    cl.add_argument("--granularity", choices=["net", "commit"], default="net")
    cl.add_argument("--limit", type=int, default=20)

    br = sub.add_parser("branch", help="write-audit-publish branches "
                                       "(Iceberg branch shape)")
    br.add_argument("action", choices=["create", "drop", "list", "publish"])
    br.add_argument("--table", required=True)
    br.add_argument("--name", default=None)
    br.add_argument("--from-version", type=int, default=None,
                    help="fork from a retained version (default: current)")

    ins = sub.add_parser("inspect", help="metadata tables (Iceberg shape): "
                                         "files/history/snapshots/refs/"
                                         "consumers/constraints")
    ins.add_argument("--table", required=True)
    ins.add_argument("--what", required=True,
                     choices=["files", "history", "snapshots", "refs",
                              "consumers", "constraints", "schema"])
    ins.add_argument("--branch", default=None,
                     help="inspect a branch manifest instead of main")
    ins.add_argument("--limit", type=int, default=50)

    ad = sub.add_parser("advise", help="maintenance recommendations "
                                       "(metadata-only): compaction, "
                                       "retention, layout, vacuum")
    ad.add_argument("--table", required=True)

    an = sub.add_parser("analyze", help="compute per-file conv_id Bloom "
                                        "filters for planning-time lookup "
                                        "pruning (Iceberg compute_table_stats"
                                        " / Puffin shape)")
    an.add_argument("--table", required=True)

    rq = sub.add_parser("requeue", help="re-apply constraint-quarantined "
                                        "rows with their ORIGINAL (ts,lsn) "
                                        "after the cause is fixed; LWW guard "
                                        "protects newer data")
    rq.add_argument("--table", required=True)
    rq.add_argument("--scope", default=None)
    rq.add_argument("--keep", action="store_true",
                    help="keep the drained quarantine dirs (default purges)")

    fs = sub.add_parser("fsck", help="table integrity check: manifest "
                                     "invariants (metadata-only), --data "
                                     "adds one key-scan proving bucket "
                                     "placement + live-key uniqueness")
    fs.add_argument("--table", required=True)
    fs.add_argument("--data", action="store_true")
    fs.add_argument("--buckets", default=None,
                    help="comma-separated bucket ids: sample the data "
                         "tier (metadata tier is always whole-table)")

    ct = sub.add_parser("count", help="exact live-row count — metadata-only "
                                      "when possible (Iceberg COUNT(*) "
                                      "pushdown), else one pruned Spark job")
    ct.add_argument("--table", required=True)
    ct.add_argument("--as-of", default=None,
                    help="retained version int or tag name")

    mt = sub.add_parser("maintain", help="execute the advisor's "
                                         "recommendations (compact/expire/"
                                         "vacuum/analyze); policy items are "
                                         "skipped with a reason")
    mt.add_argument("--table", required=True)
    mt.add_argument("--dry-run", action="store_true")
    mt.add_argument("--allow-rescale", action="store_true",
                    help="opt into O(table) bucket rescales")
    mt.add_argument("--vacuum-ttl", type=int, default=3600)

    ac = sub.add_parser("add-column", help="ALTER TABLE ADD COLUMN "
                                           "(metadata-only; existing rows "
                                           "read NULL, fresh field id)")
    ac.add_argument("--table", required=True)
    ac.add_argument("--column", required=True)
    ac.add_argument("--type", required=True,
                    help="Spark DDL type, e.g. string / double / array<float>")

    rc = sub.add_parser("rename-column", help="rename a data column "
                                              "(metadata-only; Iceberg "
                                              "field-id semantics)")
    rc.add_argument("--table", required=True)
    rc.add_argument("--column", required=True)
    rc.add_argument("--to", required=True)

    dc = sub.add_parser("drop-column", help="drop a data column "
                                            "(metadata-only; re-adding the "
                                            "name never resurrects old data)")
    dc.add_argument("--table", required=True)
    dc.add_argument("--column", required=True)

    rb = sub.add_parser("rollback", help="reset data state to a retained "
                                         "version as a NEW commit (Iceberg "
                                         "rollback_to_snapshot)")
    rb.add_argument("--table", required=True)
    rb.add_argument("--to", required=True,
                    type=lambda v: int(v) if v.lstrip("-").isdigit() else v,
                    help="retained version int or snapshot tag name")

    cp = sub.add_parser("clone", help="fork the table's current state into a "
                                      "new independent root (Delta CLONE): "
                                      "shallow = zero-copy hardlinks, "
                                      "--deep copies bytes")
    cp.add_argument("--table", required=True, help="source table root")
    cp.add_argument("--dest", required=True, help="destination root "
                                                  "(must not exist / be empty)")
    cp.add_argument("--deep", action="store_true",
                    help="copy bytes instead of hardlinking")
    cp.add_argument("--as-of", default=None,
                    type=lambda v: int(v) if v.lstrip("-").isdigit() else v,
                    help="fork a retained time-travel version (int) or "
                         "snapshot tag instead of the current state")

    v = sub.add_parser("versions", help="retained time-travel versions")
    v.add_argument("--table", required=True)

    e = sub.add_parser("expire", help="expire time-travel snapshots (+ optional "
                                      "changefeed retention)")
    e.add_argument("--table", required=True)
    e.add_argument("--keep-last", type=int, default=1)
    e.add_argument("--older-than-s", type=float, default=None,
                   help="age policy composed with --keep-last: only "
                        "versions BOTH beyond keep-last AND older than "
                        "this many seconds are dropped")
    e.add_argument("--changefeed-keep-batches", type=int, default=None,
                   help="per scope, keep only the newest N changefeed batches")
    e.add_argument("--changefeed-keep-consumed", action="store_true",
                   help="expire only feed batches every registered consumer "
                        "has passed (consumer-group retention)")

    co = sub.add_parser("consumers", help="registered changefeed consumers "
                                          "and their consumed watermarks")
    co.add_argument("--table", required=True)

    mi = sub.add_parser("mirror", help="sync a changefeed-driven replica "
                                       "(creates it on first run)")
    mi.add_argument("--upstream", required=True)
    mi.add_argument("--table", required=True)
    mi.add_argument("--n-buckets", type=int, default=32)
    mi.add_argument("--bootstrap", action="store_true",
                    help="seed from the upstream snapshot (required when "
                         "feed retention already expired history)")
    mi.add_argument("--consumer-name", default=None,
                    help="register in the upstream consumer group (holds "
                         "keep-consumed retention while this mirror lags)")
    mi.add_argument("--source", choices=["changefeed", "changelog"],
                    default="changefeed",
                    help="changelog: diff retained upstream versions instead "
                         "of tailing the write-time feed (MoR upstreams)")

    u = sub.add_parser("upsert", help="Delta-style MERGE of a parquet file")
    u.add_argument("--table", required=True)
    u.add_argument("--branch", default=None,
                   help="operate on a branch instead of main")
    u.add_argument("--parquet", required=True,
                   help="parquet with key columns, data columns, event-time ts")

    dl = sub.add_parser("delete", help="tombstone live rows matching a predicate")
    dl.add_argument("--table", required=True)
    dl.add_argument("--branch", default=None,
                   help="operate on a branch instead of main")
    dl.add_argument("--where", required=True)

    vr = sub.add_parser("view-refresh", help="maintain an incremental aggregate view")
    vr.add_argument("--table", required=True)
    vr.add_argument("--view", required=True)
    vr.add_argument("--group-by", required=True, help="comma-separated group columns")
    vr.add_argument("--agg", action="append", default=[],
                    help="name=row_expr (view value = SUM(row_expr) over live "
                         "rows); repeatable; default n_turns=1")
    vr.add_argument("--avg", action="append", default=[],
                    help="name=row_expr maintained as a (sum, count) pair, "
                         "read back as the double ratio; repeatable")
    vr.add_argument("--min", action="append", default=[], dest="min_",
                    help="name=row_expr MIN extremum (rescan-on-retraction); "
                         "repeatable")
    vr.add_argument("--max", action="append", default=[], dest="max_",
                    help="name=row_expr MAX extremum (rescan-on-retraction); "
                         "repeatable")
    vr.add_argument("--limit", type=int, default=20)
    vr.add_argument("--consumer-name", default=None,
                    help="register in the table's consumer group (holds "
                         "keep-consumed retention while this view lags)")
    vr.add_argument("--source", choices=["changefeed", "changelog"],
                    default="changefeed",
                    help="changelog: consume the snapshot-diff changelog "
                         "instead of the write-time feed (MoR tables)")
    vr.add_argument("--bootstrap", action="store_true",
                    help="(changelog views) seed from the current table "
                         "state when retention expired the diff history")

    sub.add_parser("zip")

    args = ap.parse_args()

    if args.cmd == "zip":
        root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "dipper_spark")
        out = "dipper_spark.zip"
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
            for base, _dirs, files in os.walk(root):
                for fn in files:
                    if fn.endswith(".py"):
                        p = os.path.join(base, fn)
                        z.write(p, os.path.relpath(p, os.path.dirname(root)))
        print(f"wrote {out}")
        return

    if args.cmd == "gen":
        from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

        _, man = gen_changelog(
            args.out,
            ChangelogSpec(seed=args.seed, n_conv=args.n_conv, extra_rate=args.extra_rate,
                          hot_frac=args.hot_frac, dup_rate=args.dup_rate, n_chunks=args.n_chunks),
        )
        print(json.dumps({k: v for k, v in man.items() if k != "chunks"}))
        return

    spark = _spark(getattr(args, "cores", None))
    if args.cmd == "replay":
        from dipper_spark.plans.replay import replay

        table, stats = replay(spark, args.log, args.table, n_salts=args.n_salts,
                              n_buckets=args.n_buckets, chunk_lsn=args.chunk_lsn,
                              collapse=args.collapse, dead_letter=args.dead_letter,
                              changefeed=args.changefeed,
                              time_travel=args.time_travel,
                              write_mode=args.write_mode)
        for st in stats:
            print(json.dumps(st.__dict__))
        print(json.dumps({"final_rows": table.snapshot().count()}))
    elif args.cmd == "ingest":
        from dipper_spark.streaming.ingest import ingest

        table, query, stats = ingest(
            spark, args.log, args.table, args.checkpoint,
            max_files_per_trigger=args.max_files_per_trigger,
            stream_dedup=args.stream_dedup,
            available_now=not args.continuous,
            dead_letter=args.dead_letter,
            source=args.source,
            max_chunks_per_trigger=args.max_chunks_per_trigger,
            changefeed=args.changefeed,
            time_travel=args.time_travel,
            write_mode=args.write_mode,
        )
        if args.continuous:
            query.awaitTermination()
        for st in stats:
            print(json.dumps(st.__dict__))
    elif args.cmd == "snapshot":
        from dipper_spark.plans.target import LocalCowTable

        t = LocalCowTable(spark, args.table, branch=args.branch)
        t.snapshot(as_of=args.as_of).show(args.limit, truncate=40)
    elif args.cmd == "changelog":
        from dipper_spark.plans.target import LocalCowTable

        t = LocalCowTable(spark, args.table)
        df = t.changelog_between(args.from_v, args.to_v,
                                 granularity=args.granularity)
        df.orderBy("conv_id", "turn_idx").show(args.limit, truncate=40)
    elif args.cmd == "tag":
        from dipper_spark.plans.target import LocalCowTable

        t = LocalCowTable(spark, args.table)
        if args.action == "add":
            if not args.name:
                raise SystemExit("tag add needs --name")
            v = t.tag_snapshot(args.name, version=args.version)
            print(json.dumps({"tagged": args.name, "version": v}))
        elif args.action == "drop":
            if not args.name:
                raise SystemExit("tag drop needs --name")
            t.drop_tag(args.name)
            print(json.dumps({"dropped": args.name}))
        else:
            print(json.dumps(t.tags()))
    elif args.cmd == "history":
        from dipper_spark.plans.history import state_at
        from dipper_spark.plans.target import LocalCowTable

        fv = args.from_version
        if fv is not None and fv.lstrip("-").isdigit():
            fv = int(fv)
        h = LocalCowTable(spark, args.table).history(
            source=args.source, from_version=fv)
        if args.at_ts is not None:
            h = state_at(h, args.at_ts)
        elif args.current_only:
            h = h.filter("is_current")
        h.orderBy("conv_id", "turn_idx", "effective_from_ts",
                  "effective_from_lsn").show(args.limit, truncate=40)
    elif args.cmd == "constraint":
        from dipper_spark.plans.target import LocalCowTable

        t = LocalCowTable(spark, args.table)
        if args.action == "add":
            if not (args.name and args.expr):
                raise SystemExit("constraint add needs --name and --expr")
            t.add_check_constraint(args.name, args.expr, mode=args.mode,
                                   validate=not args.no_validate)
            print(json.dumps({"added": args.name, "mode": args.mode}))
        elif args.action == "drop":
            if not args.name:
                raise SystemExit("constraint drop needs --name")
            t.drop_check_constraint(args.name)
            print(json.dumps({"dropped": args.name}))
        elif args.action == "list":
            print(json.dumps(t.check_constraints()))
        else:
            t.quarantined().orderBy("scope", "batch").show(
                args.limit, truncate=40)
    elif args.cmd == "vacuum":
        from dipper_spark.plans.target import LocalCowTable

        print(json.dumps(LocalCowTable(spark, args.table).vacuum(
            ttl_seconds=args.ttl_seconds)))
    elif args.cmd == "compact":
        from dipper_spark.plans.target import LocalCowTable

        bks = ([int(x) for x in args.buckets.split(",")]
               if args.buckets else None)
        n = LocalCowTable(spark, args.table).compact(
            drop_tombstones=args.drop_tombstones, buckets=bks,
            minor=args.minor, min_files=args.min_files, sort=args.sort)
        print(json.dumps({"buckets_rewritten": n}))
    elif args.cmd == "rescale":
        from dipper_spark.plans.target import LocalCowTable

        n = LocalCowTable(spark, args.table).rescale_buckets(
            args.n_buckets, drop_tombstones=args.drop_tombstones)
        print(json.dumps({"n_buckets": args.n_buckets, "nonempty_buckets": n}))
    elif args.cmd == "lineage":
        from dipper_spark.plans.lineage import read_lineage

        read_lineage(spark, args.table).orderBy("batch_id").show(100, truncate=False)
    elif args.cmd == "changes":
        from dipper_spark.plans.target import LocalCowTable

        (LocalCowTable(spark, args.table).changefeed(since_batch=args.since_batch)
         .orderBy("batch", "change_lsn").show(args.limit, truncate=False))
    elif args.cmd == "branch":
        from dipper_spark.plans.target import LocalCowTable

        t = LocalCowTable(spark, args.table)
        if args.action == "create":
            if not args.name:
                raise SystemExit("branch create needs --name")
            t.create_branch(args.name, from_version=args.from_version)
            print(json.dumps({"created": args.name,
                              "base": t.branches()[args.name]}))
        elif args.action == "drop":
            if not args.name:
                raise SystemExit("branch drop needs --name")
            t.drop_branch(args.name)
            print(json.dumps({"dropped": args.name}))
        elif args.action == "publish":
            if not args.name:
                raise SystemExit("branch publish needs --name")
            v = t.fast_forward(args.name)
            print(json.dumps({"published": args.name, "version": v}))
        else:
            print(json.dumps(t.branches()))
    elif args.cmd == "inspect":
        from dipper_spark.plans.target import LocalCowTable

        t = LocalCowTable(spark, args.table, branch=args.branch)
        t.inspect(args.what).show(args.limit, truncate=False)
    elif args.cmd == "advise":
        from dipper_spark.plans.target import LocalCowTable

        LocalCowTable(spark, args.table).advise().show(50, truncate=False)
    elif args.cmd == "analyze":
        from dipper_spark.plans.target import LocalCowTable

        print(json.dumps(LocalCowTable(spark, args.table).compute_stats()))
    elif args.cmd == "requeue":
        from dipper_spark.plans.target import LocalCowTable

        out = LocalCowTable(spark, args.table).requeue_quarantined(
            scope=args.scope, purge=not args.keep)
        print(json.dumps(out))
    elif args.cmd == "fsck":
        from dipper_spark.plans.target import LocalCowTable

        t = LocalCowTable(spark, args.table)
        bks = ([int(x) for x in args.buckets.split(",")]
               if args.buckets else None)
        findings = t.fsck(data=args.data, buckets=bks).collect()
        print(json.dumps({"healthy": not findings,
                          "findings": [dict(r.asDict()) for r in findings]}))
    elif args.cmd == "count":
        from dipper_spark.plans.target import LocalCowTable

        t = LocalCowTable(spark, args.table)
        as_of = None
        if args.as_of is not None:
            as_of = int(args.as_of) if args.as_of.isdigit() else args.as_of
        man = t._load() if as_of is None else t._load_as_of(
            t._resolve_as_of(as_of))
        meta = t._metadata_live_count(man)
        print(json.dumps({"rows": t.count_rows(as_of=as_of),
                          "from_metadata": meta is not None}))
    elif args.cmd == "maintain":
        from dipper_spark.plans.target import LocalCowTable

        log = LocalCowTable(spark, args.table).maintain(
            dry_run=args.dry_run, allow_rescale=args.allow_rescale,
            vacuum_ttl=args.vacuum_ttl)
        print(json.dumps(log))
    elif args.cmd == "add-column":
        from dipper_spark.plans.target import LocalCowTable

        t = LocalCowTable(spark, args.table)
        v = t.add_column(args.column, args.type)
        print(json.dumps({"added": [args.column, args.type], "version": v}))
    elif args.cmd == "rename-column":
        from dipper_spark.plans.target import LocalCowTable

        t = LocalCowTable(spark, args.table)
        v = t.rename_column(args.column, args.to)
        print(json.dumps({"renamed": [args.column, args.to], "version": v}))
    elif args.cmd == "drop-column":
        from dipper_spark.plans.target import LocalCowTable

        t = LocalCowTable(spark, args.table)
        v = t.drop_column(args.column)
        print(json.dumps({"dropped": args.column, "version": v}))
    elif args.cmd == "rollback":
        from dipper_spark.plans.target import LocalCowTable

        t = LocalCowTable(spark, args.table)
        new_v = t.rollback(args.to)
        print(json.dumps({"rolled_back_to": t._load().get("rolled_back_to"),
                          "new_version": new_v}))
    elif args.cmd == "clone":
        from dipper_spark.plans.target import LocalCowTable

        src = LocalCowTable(spark, args.table)
        out = src.clone(args.dest, deep=args.deep, as_of=args.as_of)
        print(json.dumps({"cloned_from": out._load()["cloned_from"],
                          "dest": out.root,
                          "rows": out.snapshot().count()}))
    elif args.cmd == "versions":
        from dipper_spark.plans.target import LocalCowTable

        print(json.dumps({"versions": LocalCowTable(spark, args.table).versions()}))
    elif args.cmd == "expire":
        from dipper_spark.plans.target import LocalCowTable

        if (args.changefeed_keep_batches is not None
                and args.changefeed_keep_consumed):
            raise SystemExit(
                "pass at most one of --changefeed-keep-batches / "
                "--changefeed-keep-consumed (keep-batches could expire "
                "batches a lagging registered consumer still needs, "
                "defeating the keep-consumed safety you also asked for)")
        t = LocalCowTable(spark, args.table)
        out = t.expire_snapshots(
            keep_last=args.keep_last,
            changefeed_keep_batches=args.changefeed_keep_batches,
            older_than_s=args.older_than_s)
        if args.changefeed_keep_consumed:
            out["changefeed"] = t.expire_changefeed(keep_consumed=True)
        print(json.dumps(out))
    elif args.cmd == "consumers":
        from dipper_spark.plans.target import LocalCowTable

        print(json.dumps(LocalCowTable(spark, args.table).consumers()))
    elif args.cmd == "mirror":
        from dipper_spark.plans.mirror import MirrorTable
        from dipper_spark.plans.target import LocalCowTable

        if os.path.exists(os.path.join(args.table, LocalCowTable.MANIFEST)):
            m = MirrorTable(spark, args.upstream, args.table,
                            consumer_name=args.consumer_name,
                            source=args.source)
        else:
            m = MirrorTable.create(spark, args.upstream, args.table,
                                   n_buckets=args.n_buckets,
                                   consumer_name=args.consumer_name,
                                   source=args.source)
        out = {}
        if args.bootstrap:
            out["bootstrap"] = m.bootstrap()
        out["sync"] = m.sync()
        print(json.dumps(out))
    elif args.cmd == "upsert":
        from dipper_spark.plans.target import LocalCowTable

        st = LocalCowTable(spark, args.table, branch=args.branch).upsert(
            spark.read.parquet(args.parquet))
        print(json.dumps(st.__dict__))
    elif args.cmd == "delete":
        from dipper_spark.plans.target import LocalCowTable

        st = LocalCowTable(spark, args.table, branch=args.branch).delete_where(args.where)
        print(json.dumps(st.__dict__))
    elif args.cmd == "view-refresh":
        from dipper_spark.plans.ivm import IncrementalView
        from dipper_spark.plans.target import LocalCowTable

        aggs = dict(a.split("=", 1) for a in args.agg) or {"n_turns": "1"}
        extrema = {}
        for kind, specs in (("min", args.min_), ("max", args.max_)):
            for a in specs:
                name, expr = a.split("=", 1)
                extrema[name] = (kind, expr)
        view = IncrementalView(spark, LocalCowTable(spark, args.table), args.view,
                               args.group_by.split(","), aggs,
                               avgs=dict(a.split("=", 1) for a in args.avg),
                               extrema=extrema,
                               consumer_name=args.consumer_name,
                               source=args.source)
        out = view.bootstrap() if args.bootstrap else view.refresh()
        print(json.dumps(out))
        view.read().orderBy(*args.group_by.split(",")).show(args.limit, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
