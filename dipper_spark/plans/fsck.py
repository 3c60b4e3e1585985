"""Table integrity checker (round 5) — the operability surface a
10^10-event table owner reaches for when something looks wrong (the
Delta `FSCK` shape, plus Iceberg's metadata-consistency expectations).

Two tiers, each returning FINDING rows (empty == healthy):

  * metadata tier (default): every invariant the manifest is supposed
    to uphold, checked driver-side with os.stat only — referenced
    files exist and are non-empty, no file is claimed by two buckets,
    bucket ids fit the layout, delta commit versions are sane, ledger
    batch ids are unique per scope and below the scope_seq allocator,
    file_stats reference only live files, the schema parses and every
    data column carries a field id (when the table has id tracking).
  * data tier (`data=True`): ONE column-pruned Spark job proving the
    physical layout — every row lives in the bucket its key hashes to
    (files are read with input_file_name, the claimed bucket parsed
    from the manifest, the true bucket recomputed with the engine's
    own bucket expression), and live keys are globally unique.  Cost
    is a key-columns-only scan; at 100 TB you run it bucket-sampled
    or after an incident, not nightly.  The data tier is suppressed
    (with an explicit `data_tier_skipped` finding) only when ERROR-
    severity metadata findings invalidate the scan; warn-level rows
    never mask it.  The duplicate-live-keys claim covers delta-free
    buckets only — read-time LWW resolution would collapse genuine
    duplicates in delta-laden buckets before counting.

Every finding names (check, severity, target, detail).  fsck never
mutates anything — repairs route through the existing verbs (vacuum,
compact, expire) or a restore from a retained version/clone.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

FINDING_SCHEMA = "check string, severity string, target string, detail string"


def fsck(table, data: bool = False,
         buckets: list[int] | None = None) -> list[tuple]:
    """`buckets` limits the DATA tier to those buckets' files — the
    bucket-sampled mode for very large tables (metadata tier is always
    whole-table: it's O(manifest)).  NB the key-uniqueness check stays
    valid under sampling because keys are bucket-local by layout."""
    from .target import LocalCowTable

    man = table._load()
    out: list[tuple] = []

    def finding(check, severity, target, detail):
        out.append((check, severity, str(target), detail))

    # ---- file existence / duplication / bucket-id sanity ----
    nb = man.get("n_buckets") or 0
    seen: dict[str, str] = {}
    for b, ents in man.get("buckets", {}).items():
        # ADVICE r5: a corrupt non-numeric bucket key must surface as a
        # typed finding, not crash the checker on exactly the
        # corruption class it exists to report.
        try:
            b_ok = 0 <= int(b) < nb
        except (TypeError, ValueError):
            finding("bucket_id_unparseable", "error", f"bucket {b!r}",
                    "non-numeric bucket key in manifest")
            b_ok = True  # already reported as unparseable
        if not b_ok:
            finding("bucket_id_range", "error", f"bucket {b}",
                    f"bucket id outside layout 0..{nb - 1}")
        for e in ents:
            rel = e if isinstance(e, str) else e[0]
            if rel in seen:
                finding("file_double_claimed", "error", rel,
                        f"claimed by buckets {seen[rel]} and {b}")
            seen[rel] = b
    for b, ents in man.get("deltas", {}).items():
        for rel, _sid, seq in ents:
            if rel in seen:
                finding("file_double_claimed", "error", rel,
                        f"claimed as base of bucket {seen[rel]} and delta of {b}")
            seen[rel] = b
            if int(seq) > man["version"]:
                finding("delta_from_future", "error", rel,
                        f"delta commit {seq} > manifest version {man['version']}")
    for rel in seen:
        p = os.path.join(table.root, rel)
        try:
            if os.path.getsize(p) == 0:
                finding("file_empty", "error", rel, "zero-byte data file")
        except OSError:
            finding("file_missing", "error", rel,
                    "referenced by the manifest but absent on disk")

    # ---- ledger / allocator monotonicity ----
    per_scope: dict[str, set] = {}
    for e in man.get("ledger", []):
        s = e.get("scope", "default")
        try:
            bid = int(e["batch_id"])
        except (TypeError, ValueError, KeyError):
            finding("ledger_batch_unparseable", "error", s,
                    f"ledger entry with non-numeric batch_id "
                    f"{e.get('batch_id')!r}")
            continue
        if bid in per_scope.setdefault(s, set()):
            finding("ledger_duplicate_batch", "error", f"{s}/{bid}",
                    "same (scope, batch_id) committed twice")
        per_scope[s].add(bid)
    for s, ids in per_scope.items():
        try:
            alloc = int(man.get("scope_seq", {}).get(s, 0))
        except (TypeError, ValueError):
            finding("scope_seq_unparseable", "error", s,
                    f"non-numeric scope_seq {man.get('scope_seq', {}).get(s)!r}")
            continue
        if alloc and max(ids) >= alloc:
            # warn, not error: explicit-id writers (streaming epoch ids)
            # legally commit ids the allocator never issued; the engine's
            # own allocator accounts for them at next allocation
            finding("scope_seq_behind", "warn", s,
                    f"allocator {alloc} <= max committed batch {max(ids)} "
                    "(an allocated id could collide with an explicit one)")

    # ---- stats hygiene ----
    for rel in man.get("file_stats", {}):
        if rel not in seen:
            finding("stats_dangling", "warn", rel,
                    "file_stats entry for a file no longer referenced")

    # ---- schema / field ids ----
    if man.get("schema") is not None:
        try:
            schema = T.StructType.fromJson(man["schema"])
        except Exception as e:  # noqa: BLE001
            finding("schema_unparseable", "error", "schema", str(e))
            schema = None
        fids = man.get("field_ids")
        if schema is not None and fids is not None:
            from .target import _NO_RENAME
            for f in schema.fields:
                if f.name not in _NO_RENAME and f.name not in fids:
                    finding("field_id_missing", "warn", f.name,
                            "data column without a field id (rename/drop "
                            "would misbehave)")

    # ---- data tier ----
    # ADVICE r5 (medium): gate the scan only on ERROR-severity metadata
    # findings (a scan over missing/double-claimed files would prove
    # nothing); warn-level findings (stats_dangling, scope_seq_behind)
    # must not silently mask a requested corruption scan.  When the
    # tier IS suppressed, say so with an explicit finding instead of
    # returning metadata rows that look like a completed data check.
    if data and man.get("schema") is not None:
        meta_errors = [f for f in out if f[1] == "error"]
        if meta_errors:
            finding("data_tier_skipped", "warn", "table",
                    f"data tier not run: {len(meta_errors)} error-severity "
                    "metadata finding(s) invalidate the scan")
            return out
        if buckets is not None:
            sel = {str(int(b)) for b in buckets}
            seen = {rel: b for rel, b in seen.items() if b in sel}
        schema = T.StructType.fromJson(man["schema"])
        # ADVICE r5: the duplicate-live-keys check reads the RESOLVED
        # table, and LWW resolution collapses to one row per key
        # wherever outstanding MoR deltas exist — genuine duplicates in
        # delta-laden buckets would be collapsed before counting.  So
        # the check's CLAIM is restricted to delta-free buckets (there
        # the resolved read IS the raw base scan, nothing is collapsed);
        # delta debt itself is routine MoR operation already surfaced
        # by the advisor, and `compact --minor` re-arms the check.
        # Bucket-locality of keys keeps the claim valid under any
        # bucket subset.
        delta_bkts = {b for b, ents in man.get("deltas", {}).items() if ents}
        dup_bkts = [int(b) for b in man.get("buckets", {})
                    if b not in delta_bkts
                    and (buckets is None or b in sel)]
        if dup_bkts:
            key_rows = (table._read_resolved(man, schema, sorted(dup_bkts))
                        .select("conv_id", "turn_idx", "_deleted"))
            live = key_rows.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
            total, distinct = live.agg(
                F.count(F.lit(1)), F.count_distinct("conv_id", "turn_idx")
            ).first()
            if total != distinct:
                finding("duplicate_live_keys", "error", "table",
                        f"{total - distinct} duplicate live (conv_id, turn_idx)")
        # physical placement: recompute each row's bucket and compare
        # with the bucket its file is claimed under — ONE key-columns
        # scan of all files plus a broadcast basename->bucket map (data
        # file names are uuid-unique), never a per-file plan
        if not seen:  # sampled buckets hold no files — nothing to scan
            return out
        fmt = LocalCowTable._fmt(man)
        claims = table.spark.createDataFrame(
            [(os.path.basename(rel), int(b)) for rel, b in seen.items()],
            "fname string, claimed int")
        paths = [os.path.join(table.root, rel) for rel in seen]
        bad = (table.spark.read.schema("conv_id string, turn_idx long")
               .parquet(*paths)
               .select(F.element_at(F.split(F.input_file_name(), "/"), -1)
                       .alias("fname"),
                       LocalCowTable._bucket_expr(nb, fmt).alias("actual"))
               .join(F.broadcast(claims), "fname")
               .filter(F.col("actual") != F.col("claimed"))
               .groupBy("claimed", "actual").count().collect())
        for r in bad:
            finding("row_in_wrong_bucket", "error",
                    f"bucket {r['claimed']}",
                    f"{r['count']} rows hash to bucket {r['actual']}")
    return out


def fsck_df(table, data: bool = False, buckets: list[int] | None = None):
    return table.spark.createDataFrame(
        fsck(table, data=data, buckets=buckets), FINDING_SCHEMA)
