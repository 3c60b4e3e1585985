"""Maintenance advisor (round 5): render the manifest's health as a
queryable recommendation DataFrame — which buckets carry MoR delta
debt and whether read amplification is past the broadcast-resolve
budget, whether snapshot/changefeed retention is piling up, whether
the bucket layout is under- or over-sized for the data, and whether
crash debris needs a vacuum.

Everything here is DRIVER-SIDE METADATA ONLY: the manifest dict plus
os.stat of the files it lists (the same cost class as the metadata
inspection tables — at 10^10-event scale a production catalog carries
these sizes in the manifest itself, exactly like Iceberg, making this
a pure dict scan).  The advisor never reads data, never starts a
Spark job, and never writes: every row is a recommendation whose
`action` names the CLI/API verb that resolves it.

Thresholds are deliberately env-tunable, with defaults matched to the
engine's own measured crossovers:
  * DIPPER_MOR_BROADCAST_BYTES (32 MB) — the MoR read path falls off
    the broadcast-resolve plan past this delta debt: that boundary IS
    the "minor compaction overdue" signal.
  * DIPPER_TARGET_BUCKET_BYTES (512 MB) — buckets bound both the merge
    shuffle width and the one-file-per-bucket layout; past this
    per-bucket size a rescale keeps file sizes in the scan sweet spot.
  * DIPPER_ADVISE_KEEP_VERSIONS (64) / DIPPER_ADVISE_KEEP_BATCHES
    (256) — retention nags for time-travel manifests and changefeed
    history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

ADVICE_SCHEMA = ("action string, target string, severity string, "
                 "metric double, reason string")


def _sizes(root: str, rels: list[str]) -> int:
    total = 0
    for rel in rels:
        try:
            total += os.path.getsize(os.path.join(root, rel))
        except OSError:
            pass
    return total


def advise(table) -> DataFrame:
    """Recommendation rows for a LocalCowTable, most severe first.
    Empty result == nothing to do."""
    man = table._load()
    root = table.root
    rows: list[tuple] = []

    # ---- MoR delta debt -> minor compaction --------------------------
    deltas = man.get("deltas", {})
    debt = {b: es for b, es in deltas.items() if es}
    if debt:
        broadcast_limit = int(os.environ.get("DIPPER_MOR_BROADCAST_BYTES",
                                             str(32 << 20)))
        debt_bytes = _sizes(root, [e[0] for es in debt.values() for e in es])
        n_files = sum(len(es) for es in debt.values())
        over = debt_bytes > broadcast_limit
        rows.append((
            "compact --minor",
            f"buckets {','.join(sorted(debt, key=int))}",
            "high" if over else "low",
            float(debt_bytes),
            f"{n_files} outstanding delta file(s), {debt_bytes} bytes"
            + (" — past the broadcast-resolve budget: reads now shuffle "
               "the touched buckets' full base" if over else
               " — reads still resolve via the broadcast plan"),
        ))

    # ---- fragmented buckets (multi-file base) -> minor compaction ----
    frag = {b: es for b, es in man.get("buckets", {}).items() if len(es) > 1}
    if frag:
        rows.append((
            "compact --minor",
            f"buckets {','.join(sorted(frag, key=int))}",
            "low",
            float(sum(len(es) for es in frag.values())),
            f"{len(frag)} bucket(s) hold multiple base files — one "
            "rewrite restores the one-file-per-bucket scan shape",
        ))

    # ---- retained snapshot pile-up -> expire_snapshots ----------------
    if man.get("time_travel"):
        keep = int(os.environ.get("DIPPER_ADVISE_KEEP_VERSIONS", "64"))
        n_versions = len(table.versions())
        if n_versions > keep:
            rows.append((
                "expire --keep-last",
                f"{keep}",
                "medium",
                float(n_versions),
                f"{n_versions} retained versions (> {keep}): superseded "
                "data files cannot be reclaimed until expire runs "
                "(tags keep their pins either way)",
            ))

    # ---- changefeed history pile-up -> expire_changefeed --------------
    if man.get("changefeed"):
        keep_b = int(os.environ.get("DIPPER_ADVISE_KEEP_BATCHES", "256"))
        consumers = man.get("changefeed_consumers", {})
        backlog = 0
        ch_root = os.path.join(root, "_changes")
        try:
            for sd in os.listdir(ch_root):
                if sd.startswith("scope="):
                    backlog += sum(
                        1 for bd in os.listdir(os.path.join(ch_root, sd))
                        if bd.startswith("batch="))
        except OSError:
            pass
        if backlog > keep_b:
            if consumers:
                mode, why = "--changefeed-keep-consumed", (
                    "every registered consumer's ack floor releases them")
            else:
                mode, why = "--changefeed-keep-batches", (
                    "no consumer group registered — pick an explicit floor")
            rows.append((
                f"expire {mode}",
                "changefeed",
                "medium",
                float(backlog),
                f"~{backlog} feed batches retained (> {keep_b}); {why}",
            ))

    # ---- bucket layout sizing -> rescale_buckets -----------------------
    base_rels = [e[0] if not isinstance(e, str) else e
                 for es in man.get("buckets", {}).values() for e in es]
    if base_rels and man.get("n_buckets"):
        target = int(os.environ.get("DIPPER_TARGET_BUCKET_BYTES",
                                    str(512 << 20)))
        total = _sizes(root, base_rels)
        per_bucket = total / man["n_buckets"]
        if per_bucket > target:
            want = man["n_buckets"]
            # cap at 64x current: one rescale step should never explode
            # the layout (a misconfigured tiny target would otherwise
            # recommend ~10^5 buckets, and maintain() would run it)
            while total / want > target and want < man["n_buckets"] * 64:
                want *= 2
            rows.append((
                "rescale --n-buckets",
                str(want),
                "high",
                float(per_bucket),
                f"~{int(per_bucket)} bytes/bucket over {man['n_buckets']} "
                f"buckets (> {target} target): merges rewrite oversized "
                "files and the shuffle width under-uses the cluster",
            ))

    # ---- bloom coverage -> compute_stats (analyze) ----------------------
    from .target import LocalCowTable
    all_rels = [r for r, _s in LocalCowTable._entries(man)]
    all_rels += [r for r, _s, _v in LocalCowTable._delta_entries(man)]
    stats = man.get("file_stats", {})
    unbloomed = [r for r in all_rels if "bloom" not in stats.get(r, {})]
    # only nag tables that opted into stats (compute_stats ran at least
    # once) — a never-analyzed table is healthy without blooms
    if (man.get("analyzed") and all_rels
            and len(unbloomed) * 2 >= len(all_rels)):
        rows.append((
            "analyze",
            f"{len(unbloomed)}/{len(all_rels)} files",
            "low",
            float(len(unbloomed)),
            "half or more of the live files carry no conv_id Bloom "
            "filter — point lookups scan every candidate file; one "
            "compute_stats() pass restores planning-time file pruning",
        ))

    # ---- crash debris -> vacuum ----------------------------------------
    try:
        debris = [d for d in os.listdir(root)
                  if d.startswith(("_tmp_", "_stage_", ".stage_"))]
    except OSError:
        debris = []
    if debris:
        rows.append((
            "vacuum",
            f"{len(debris)} dir(s)",
            "low",
            float(len(debris)),
            "staging/work directories left behind (in-flight writers or "
            "crash debris) — vacuum sweeps those past the TTL",
        ))

    order = {"high": 0, "medium": 1, "low": 2}
    rows.sort(key=lambda r: (order[r[2]], r[0]))
    return table.spark.createDataFrame(rows, ADVICE_SCHEMA)


def maintain(table, *, dry_run: bool = False, allow_rescale: bool = False,
             vacuum_ttl: int = 3600, max_passes: int = 4) -> list[dict]:
    """Execute the advisor's recommendations — the advise() -> verb
    loop closed (Delta's OPTIMIZE-style auto-maintenance, driven by the
    same metadata the advisor reads).  Recommendations run most-severe
    first; after a pass that changed anything the advisor re-runs,
    because resolving one item can surface the next (a minor compact
    writes fresh bloom-less files -> the next pass runs analyze).
    Bounded by `max_passes`.

    Policy decisions are NEVER auto-made:
      * `rescale` rewrites the whole table — skipped unless
        `allow_rescale=True` (and never under dry_run);
      * a changefeed floor with no registered consumer group
        (`--changefeed-keep-batches`) needs a human-chosen number —
        always skipped with a reason.

    Returns one dict per recommendation encountered, in execution
    order: {action, target, severity, status: done|skipped|dry_run,
    result|reason}.  dry_run=True reports the plan without running
    anything."""
    out: list[dict] = []
    skipped_once: set[tuple] = set()  # report each skip once, not per pass
    for _ in range(max_passes):
        recs = advise(table).collect()
        if not recs:
            break
        changed = False
        for r in recs:
            item = {"action": r["action"], "target": r["target"],
                    "severity": r["severity"]}
            key = (r["action"], r["target"])
            if key in skipped_once:
                continue
            if dry_run:
                out.append({**item, "status": "dry_run"})
                continue
            try:
                if r["action"] == "compact --minor":
                    item["result"] = {"buckets_rewritten":
                                      table.compact(minor=True)}
                elif r["action"] == "expire --keep-last":
                    item["result"] = table.expire_snapshots(
                        keep_last=int(r["target"]))
                elif r["action"] == "expire --changefeed-keep-consumed":
                    item["result"] = table.expire_changefeed(
                        keep_consumed=True)
                elif r["action"] == "expire --changefeed-keep-batches":
                    skipped_once.add(key)
                    out.append({**item, "status": "skipped", "reason":
                                "no consumer group registered — the "
                                "retention floor is a policy number a "
                                "human must pick"})
                    continue
                elif r["action"] == "rescale --n-buckets":
                    if not allow_rescale:
                        skipped_once.add(key)
                        out.append({**item, "status": "skipped", "reason":
                                    "rescale rewrites the whole table — "
                                    "pass allow_rescale=True to opt in"})
                        continue
                    item["result"] = {"buckets_nonempty":
                                      table.rescale_buckets(int(r["target"]))}
                elif r["action"] == "vacuum":
                    item["result"] = table.vacuum(ttl_seconds=vacuum_ttl)
                elif r["action"] == "analyze":
                    item["result"] = table.compute_stats()
                else:
                    skipped_once.add(key)
                    out.append({**item, "status": "skipped", "reason":
                                f"unknown action {r['action']!r}"})
                    continue
            except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
                skipped_once.add(key)
                out.append({**item, "status": "failed", "reason": str(e)})
                continue
            out.append({**item, "status": "done"})
            changed = True
        if dry_run or not changed:
            break
    return out
