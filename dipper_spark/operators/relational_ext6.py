"""Round-5 second-wave driver contracts: online bucket rescaling and
changefeed-driven replication (plans/mirror.py) — the two
beyond-survey surfaces added after the VERDICT-r4 list landed, each as
a deterministic boolean contract value-checked against a literal
oracle (same pattern as relational_ext5.py).
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import uuid

from pyspark.sql import functions as F

from .relational import q

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _mk_table(spark, work, seed, **kw):
    from ..plans.replay import replay
    from ..testkit.gen import ChangelogSpec, gen_changelog

    gen_changelog(os.path.join(work, "log"),
                  ChangelogSpec(seed=seed, n_conv=40, extra_rate=1.5, dup_rate=0.1))
    table, stats = replay(spark, os.path.join(work, "log"),
                          os.path.join(work, "tbl"), **kw)
    return table, stats


def _state_hash_hex(table) -> str:
    from ..testkit.oracle import state_hash

    return state_hash(table.snapshot().toPandas())


@q("cdc_bucket_rescale", """
SELECT CAST(1 AS BOOLEAN) AS rows_invariant_layout_swapped,
       CAST(1 AS BOOLEAN) AS merge_finds_keys_post_rescale,
       CAST(1 AS BOOLEAN) AS stale_layout_writer_conflicts
""")
def cdc_bucket_rescale(spark, d):
    """Online bucket-rescale contract (round 5, beyond-survey —
    plans/target.py LocalCowTable.rescale_buckets): (a) rescaling a
    live table 8 -> 32 buckets preserves the exact row set while the
    manifest layout swaps atomically; (b) a merge after the rescale
    FINDS existing keys under the new layout (no silent duplicates)
    and bucket-pruned lookups work; (c) a writer that planned against
    the old layout is rejected loudly at commit time (the layout guard
    in _commit_merge), and the self-rederiving API writer retries onto
    the new layout."""
    from ..plans.target import CommitConflict, LocalCowTable

    work = tempfile.mkdtemp(prefix=f"dipper_rsq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=102, n_buckets=8)
    before = _state_hash_hex(table)
    nonempty = table.rescale_buckets(32)
    man = table._load()
    a_ok = (man["n_buckets"] == 32 and 0 < nonempty <= 32
            and all(0 <= int(b) < 32 for b in man["buckets"])
            and _state_hash_hex(table) == before)

    key = table.snapshot().select("conv_id", "turn_idx").first()
    ts = dt.datetime(2027, 5, 1)
    table.upsert(spark.createDataFrame(
        [(key["conv_id"], key["turn_idx"], "user", "post-rescale", ts),
         ("rsq-new", 0, "user", "fresh", ts)], ROWS))
    snap = table.snapshot()
    hit = snap.filter((F.col("conv_id") == key["conv_id"])
                      & (F.col("turn_idx") == key["turn_idx"]))
    look = table.lookup("rsq-new", 0).first()
    b_ok = (hit.count() == 1 and hit.first()["text"] == "post-rescale"
            and look is not None and look["text"] == "fresh")

    # stale-layout writer: inject a rescale between read and commit
    other = LocalCowTable(spark, table.root)
    orig = table._commit_merge
    fired = {"done": False}

    def wrapper(*a, **kw):
        if not fired["done"]:
            fired["done"] = True
            other.rescale_buckets(16)
        return orig(*a, **kw)

    table._commit_merge = wrapper
    raised = False
    try:
        table.upsert(spark.createDataFrame(
            [("rsq-race", 0, "user", "x", ts)], ROWS),
            batch_id=991, scope="explicit")
    except CommitConflict:
        raised = True
    c_ok = (raised and table._load()["n_buckets"] == 16
            and table.snapshot().filter("conv_id = 'rsq-race'").count() == 0)

    return spark.createDataFrame(
        [(a_ok, b_ok, c_ok)],
        "rows_invariant_layout_swapped boolean, "
        "merge_finds_keys_post_rescale boolean, "
        "stale_layout_writer_conflicts boolean")


@q("cdc_mirror_replica", """
SELECT CAST(1 AS BOOLEAN) AS full_sync_equals_upstream,
       CAST(1 AS BOOLEAN) AS incremental_and_idempotent,
       CAST(1 AS BOOLEAN) AS expired_feed_bootstrap_reconverges
""")
def cdc_mirror_replica(spark, d):
    """Changefeed replication contract (round 5, beyond-survey —
    plans/mirror.py): a downstream replica maintained purely from the
    upstream's row-level changefeed (a) reproduces the upstream
    snapshot exactly after a full sync — under a DIFFERENT bucket
    layout — and re-sync is a watermark no-op; (b) follows
    upsert/delete deltas incrementally and a crash-replay of the same
    batches is ledger-skipped (no double-apply); (c) when retention
    expires feed history the sync raises ChangefeedExpiredError and
    bootstrap-from-snapshot reconverges, after which incremental sync
    resumes."""
    from ..plans.mirror import MirrorTable
    from ..plans.target import ChangefeedExpiredError

    work = tempfile.mkdtemp(prefix=f"dipper_mrq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=103, chunk_lsn=300, changefeed=True)
    m = MirrorTable.create(spark, table.root, os.path.join(work, "down"),
                           n_buckets=5)
    out = m.sync()
    a_ok = (not out["noop"] and m.down._load()["n_buckets"] == 5
            and _state_hash_hex(m.down) == _state_hash_hex(table)
            and m.sync()["noop"])

    ts = dt.datetime(2027, 7, 1)
    table.upsert(spark.createDataFrame(
        [("mrq-k", 0, "user", "v1", ts), ("mrq-k", 1, "user", "bye", ts)], ROWS))
    table.delete_where("conv_id = 'mrq-k' AND turn_idx = 1")
    m.sync()
    eq_after = _state_hash_hex(m.down) == _state_hash_hex(table)
    # crash-replay: rewind the watermark and re-sync — the downstream
    # ledger skips the replayed (scope, batch) merges
    meta = m._meta()
    rewound = {t: {"hwm": -1, "extra": []} for t in meta["consumed"]}
    m._write_meta({**meta, "consumed": rewound})
    try:
        m.sync()
        replay_ok = _state_hash_hex(m.down) == _state_hash_hex(table)
    except ChangefeedExpiredError:
        replay_ok = False
    b_ok = eq_after and replay_ok

    table.expire_changefeed(keep_last_batches=1)
    m2 = MirrorTable.create(spark, table.root, os.path.join(work, "down2"))
    raised = False
    try:
        m2.sync()
    except ChangefeedExpiredError:
        raised = True
    m2.bootstrap()
    m2.sync()
    table.upsert(spark.createDataFrame(
        [("mrq-post", 0, "user", "after-boot", dt.datetime(2027, 8, 1))], ROWS))
    inc = m2.sync()
    c_ok = (raised and not inc["noop"]
            and _state_hash_hex(m2.down) == _state_hash_hex(table))

    return spark.createDataFrame(
        [(a_ok, b_ok, c_ok)],
        "full_sync_equals_upstream boolean, "
        "incremental_and_idempotent boolean, "
        "expired_feed_bootstrap_reconverges boolean")


@q("cdc_consumer_group_retention", """
SELECT CAST(1 AS BOOLEAN) AS slow_consumer_holds_floor,
       CAST(1 AS BOOLEAN) AS acks_monotonic_and_auto,
       CAST(1 AS BOOLEAN) AS registered_consumers_never_hit_holes
""")
def cdc_consumer_group_retention(spark, d):
    """Consumer-group retention contract (round 5, beyond-survey —
    target.py ack_consumer/register_consumer +
    expire_changefeed(keep_consumed=True)): (a) the safe floor is the
    MIN over registered consumers — a slow consumer holds batches, a
    pre-registered no-progress consumer holds everything, and
    unregistering the straggler releases the rest; (b) acks are
    monotonic and IncrementalView/MirrorTable publish them
    automatically after refresh/sync; (c) end to end, a registered
    lagging mirror can always catch up incrementally — keep_consumed
    maintenance never expires batches it still needs."""
    from ..plans.mirror import MirrorTable

    work = tempfile.mkdtemp(prefix=f"dipper_cgq_{uuid.uuid4().hex[:6]}_")
    table, stats = _mk_table(spark, work, seed=104, chunk_lsn=150,
                             changefeed=True)
    base = os.path.join(table.root, "_changes")

    def feed_batches():
        out = {}
        for sd in sorted(os.listdir(base)):
            if sd.startswith("scope="):
                out[sd.split("=", 1)[1]] = sorted(
                    int(b.split("=", 1)[1])
                    for b in os.listdir(os.path.join(base, sd))
                    if b.startswith("batch="))
        return out

    batches = feed_batches()
    tag = next(iter(batches))
    n0 = len(batches[tag])

    # (a) min-over-consumers floor
    table.ack_consumer("fast", {tag: max(batches[tag])})
    table.ack_consumer("slow", {tag: 0})
    out1 = table.expire_changefeed(keep_consumed=True)
    held = feed_batches()[tag] == batches[tag][1:]
    table.register_consumer("not-started")
    out2 = table.expire_changefeed(keep_consumed=True)
    table.unregister_consumer("not-started")
    table.unregister_consumer("slow")
    out3 = table.expire_changefeed(keep_consumed=True)
    a_ok = (n0 >= 3 and out1["dropped"].get(tag) == [0] and held
            and out2["dropped"] == {} and
            out3["dropped"].get(tag) == batches[tag][1:])

    # (b) monotonic acks + automatic publication from the mirror
    table.ack_consumer("fast", {tag: 0})  # backwards -> no-op
    mono = table.consumers()["fast"][tag] == max(batches[tag])
    m = MirrorTable.create(spark, table.root, os.path.join(work, "down"),
                           consumer_name="m1")
    registered = "m1" in table.consumers()
    m.bootstrap()  # feed fully expired above -> snapshot seed
    m.sync()
    auto = (table.consumers()["m1"] != {}
            and all(table.consumers()["m1"].get(t) == max(ids)
                    for t, ids in feed_batches().items() if ids))
    b_ok = mono and registered and auto

    # (c) lagging registered mirror never hits a hole
    ts = dt.datetime(2027, 12, 1)
    table.upsert(spark.createDataFrame(
        [("cgq-k", 0, "user", "late", ts)], ROWS))
    table.expire_changefeed(keep_consumed=True)  # m1 lags: holds the batch
    m.sync()
    from ..testkit.oracle import state_hash
    c_ok = (state_hash(m.down.snapshot().toPandas())
            == state_hash(table.snapshot().toPandas()))

    return spark.createDataFrame(
        [(a_ok, b_ok, c_ok)],
        "slow_consumer_holds_floor boolean, "
        "acks_monotonic_and_auto boolean, "
        "registered_consumers_never_hit_holes boolean")


@q("cdc_scd2_history", """
SELECT CAST(1 AS BOOLEAN) AS current_slice_equals_snapshot,
       CAST(1 AS BOOLEAN) AS state_at_equals_time_travel,
       CAST(1 AS BOOLEAN) AS intervals_disjoint_contiguous
""")
def cdc_scd2_history(spark, d):
    """SCD2 history contract (round 5, beyond-survey —
    plans/history.py scd2_history/state_at over the changefeed):
    (a) the is_current slice equals snapshot() byte-for-byte;
    (b) reconstructing the state at each commit's max applied
    (ts, lsn) from the history frame equals the TIME-TRAVEL snapshot
    of that version (every version, fingerprint equality);
    (c) per key the version intervals are disjoint, strictly ordered
    by the (ts, lsn) clock, contiguous where end_op='U', and exactly
    the last version per live key is open."""
    from ..plans.history import state_at
    from ..schemas import SPEC_COLUMNS
    from ..testkit.oracle import state_hash

    work = tempfile.mkdtemp(prefix=f"dipper_hsq_{uuid.uuid4().hex[:6]}_")
    table, stats = _mk_table(spark, work, seed=105, chunk_lsn=300,
                             changefeed=True, time_travel=True)
    hist = table.history().cache()

    cur = hist.filter("is_current").select(*table.snapshot().columns)
    a_ok = state_hash(cur.toPandas()) == _state_hash_hex(table)

    frontiers = (table.changefeed().groupBy("batch")
                 .agg(F.max(F.struct("change_ts", "change_lsn")).alias("m"))
                 .orderBy("batch").collect())
    versions = table.versions()[1:]
    b_ok = len(frontiers) == len(versions) >= 2
    for row, v in zip(frontiers, versions):
        got = state_at(hist, row["m"]["change_ts"], row["m"]["change_lsn"])
        b_ok = b_ok and (
            state_hash(got.select(*SPEC_COLUMNS).toPandas())
            == state_hash(table.snapshot(as_of=v)
                          .select(*SPEC_COLUMNS).toPandas()))

    from pyspark.sql import Window
    w = (Window.partitionBy("conv_id", "turn_idx")
         .orderBy("effective_from_ts", "effective_from_lsn"))
    chk = (hist
           .withColumn("_nf_ts", F.lead("effective_from_ts").over(w))
           .withColumn("_nf_lsn", F.lead("effective_from_lsn").over(w))
           .withColumn("_last", F.col("_nf_ts").isNull())
           .withColumn("_bad",
                       # non-last must be closed; last open iff current
                       (~F.col("_last") & F.col("effective_to_ts").isNull())
                       | (F.col("_last")
                          & (F.col("effective_to_ts").isNull()
                             != F.col("is_current")))
                       # strictly increasing clock
                       | (~F.col("_last")
                          & (F.struct("effective_from_ts", "effective_from_lsn")
                             >= F.struct("_nf_ts", "_nf_lsn")))
                       # 'U' closes exactly where the next opens; 'D' at
                       # or before it
                       | (~F.col("_last") & (F.col("end_op") == "U")
                          & ((F.col("effective_to_ts") != F.col("_nf_ts"))
                             | (F.col("effective_to_lsn") != F.col("_nf_lsn"))))
                       | (~F.col("_last") & (F.col("end_op") == "D")
                          & (F.struct("effective_to_ts", "effective_to_lsn")
                             > F.struct("_nf_ts", "_nf_lsn")))))
    agg = chk.agg(F.sum(F.col("_bad").cast("long")).alias("bad"),
                  F.count("*").alias("n"),
                  F.sum(F.col("is_current").cast("long")).alias("ncur")).first()
    c_ok = (agg["bad"] == 0 and agg["n"] > agg["ncur"] > 0)
    hist.unpersist()

    return spark.createDataFrame(
        [(a_ok, bool(b_ok), c_ok)],
        "current_slice_equals_snapshot boolean, "
        "state_at_equals_time_travel boolean, "
        "intervals_disjoint_contiguous boolean")


@q("cdc_check_constraints", """
SELECT CAST(1 AS BOOLEAN) AS enforce_atomic_reject,
       CAST(1 AS BOOLEAN) AS quarantine_routes_and_applies,
       CAST(1 AS BOOLEAN) AS ansi_nulls_deletes_addtime
""")
def cdc_check_constraints(spark, d):
    """CHECK-constraint contract (round 5, beyond-survey — target.py
    add_check_constraint, Delta invariant shape): (a) an enforce-mode
    violation rejects the WHOLE batch before anything is written
    (snapshot fingerprint and manifest version unchanged, passing rows
    included); (b) a quarantine-mode violation routes exactly the
    violating rows to the dead-letter sink under the committed batch
    id, applies the rest, counts rows_quarantined, and keeps the
    changefeed clean; (c) ANSI semantics — NULL passes, deletes are
    exempt — and ADD validates existing rows (violating add raises,
    nothing registered)."""
    from ..plans.target import ConstraintViolation, LocalCowTable
    from ..testkit.oracle import state_hash

    work = tempfile.mkdtemp(prefix=f"dipper_ckq_{uuid.uuid4().hex[:6]}_")
    t = LocalCowTable.create(spark, os.path.join(work, "tbl"), n_buckets=8,
                             changefeed=True)
    ts = dt.datetime(2027, 4, 1)
    t.upsert(spark.createDataFrame(
        [("ck-a", 0, "user", "seed", ts)], ROWS))

    # (a) enforce: atomic reject
    t.add_check_constraint("text_present",
                           "text IS NOT NULL AND length(text) > 0")
    before, v0 = _state_hash_hex(t), t._load()["version"]
    raised = False
    try:
        t.upsert(spark.createDataFrame(
            [("ck-a", 1, "user", "fine", ts), ("ck-a", 2, "user", "", ts)],
            ROWS))
    except ConstraintViolation as e:
        raised = e.counts == {"text_present": 1}
    a_ok = raised and _state_hash_hex(t) == before and t._load()["version"] == v0

    # (b) quarantine: route + apply + stats + clean feed
    t.add_check_constraint("no_poison", "text NOT LIKE '%POISON%'",
                           mode="quarantine")
    st = t.upsert(spark.createDataFrame(
        [("ck-b", 0, "user", "clean", ts),
         ("ck-b", 1, "user", "POISON pill", ts)], ROWS))
    quar = t.quarantined()
    b_ok = (st.rows_quarantined == 1 and quar.count() == 1
            and quar.first()["text"] == "POISON pill"
            and quar.first()["batch"] == st.batch_id
            and t.snapshot().filter("conv_id = 'ck-b'").count() == 1
            and t.changefeed().filter("text LIKE '%POISON%'").count() == 0)

    # (c) NULL passes, deletes exempt, add-time validation
    t.upsert(spark.createDataFrame(
        [("ck-c", 0, None, "null role ok", ts)], ROWS))
    t.delete_where("conv_id = 'ck-a' AND turn_idx = 0")
    add_rejected = False
    try:
        t.add_check_constraint("len_lt_5", "length(text) < 5")
    except ConstraintViolation:
        add_rejected = "len_lt_5" not in t.check_constraints()
    c_ok = (t.snapshot().filter("conv_id = 'ck-c'").count() == 1
            and t.snapshot().filter("conv_id = 'ck-a' AND turn_idx = 0")
                 .count() == 0
            and add_rejected)

    return spark.createDataFrame(
        [(a_ok, b_ok, c_ok)],
        "enforce_atomic_reject boolean, "
        "quarantine_routes_and_applies boolean, "
        "ansi_nulls_deletes_addtime boolean")


@q("cdc_merge_on_read", """
SELECT CAST(1 AS BOOLEAN) AS mor_replay_matches_oracle,
       CAST(1 AS BOOLEAN) AS appends_never_rewrite_base,
       CAST(1 AS BOOLEAN) AS compact_folds_deltas_invariant
""")
def cdc_merge_on_read(spark, d):
    """Merge-on-read write-mode contract (round 5, beyond-survey —
    plans/target.py write_mode='mor'): (a) a chunked MoR replay of a
    corrupted delivery (dups, reorder, deletes) resolves at read to
    EXACTLY the pandas oracle's final state — same LWW (ts, lsn) rule
    as CoW, applied at read instead of write; (b) MoR merges APPEND
    delta files and never rewrite base buckets (the manifest's base
    file lists are byte-identical across an upsert), and a stale
    append (older ts/lsn) or an equal-(ts, lsn) later re-append can
    never flip the resolved winner — CoW strict-guard parity; (c)
    compact() folds all deltas into base (delta count drops to 0)
    with a state-hash-invariant snapshot."""
    import pandas as pd

    from ..testkit.oracle import apply_log_pandas, state_hash

    work = tempfile.mkdtemp(prefix=f"dipper_morq_{uuid.uuid4().hex[:6]}_")
    from ..plans.replay import replay
    from ..testkit.gen import ChangelogSpec, gen_changelog

    logical, _ = gen_changelog(
        os.path.join(work, "log"),
        ChangelogSpec(seed=104, n_conv=40, extra_rate=1.5, dup_rate=0.1,
                      max_disorder_s=3600))
    table, stats = replay(spark, os.path.join(work, "log"),
                          os.path.join(work, "tbl"),
                          chunk_lsn=120, write_mode="mor")
    oracle_hash = state_hash(apply_log_pandas(logical))
    deltas_grew = table.delta_file_count() > 0 and len(stats) > 2
    a_ok = deltas_grew and _state_hash_hex(table) == oracle_hash

    base_before = dict(table._load()["buckets"])
    ts_new = dt.datetime(2027, 9, 2)
    table.upsert(spark.createDataFrame(
        [("morq-k", 0, "user", "new", ts_new)], ROWS))
    base_unchanged = table._load()["buckets"] == base_before
    # stale append (older ts) then an equal-(ts, lsn) re-append: the
    # resolved winner must stay "new" both times
    table.upsert(spark.createDataFrame(
        [("morq-k", 0, "user", "stale", dt.datetime(2027, 9, 1))], ROWS))
    stale_loses = table.lookup("morq-k", 0).first()["text"] == "new"
    table.upsert(spark.createDataFrame(
        [("morq-k", 0, "user", "new", ts_new)], ROWS))  # identical (ts,lsn)
    post_tie = table.lookup("morq-k", 0).toPandas()
    tie_stable = len(post_tie) == 1 and post_tie["text"][0] == "new"
    b_ok = base_unchanged and stale_loses and tie_stable

    pre = _state_hash_hex(table)
    table.compact()
    c_ok = table.delta_file_count() == 0 and _state_hash_hex(table) == pre

    return spark.createDataFrame(
        [(a_ok, b_ok, c_ok)],
        "mor_replay_matches_oracle boolean, "
        "appends_never_rewrite_base boolean, "
        "compact_folds_deltas_invariant boolean")


@q("cdc_changelog_between", """
SELECT CAST(1 AS BOOLEAN) AS net_diff_replays_to_target,
       CAST(1 AS BOOLEAN) AS mor_cdc_without_write_time_feed,
       CAST(1 AS BOOLEAN) AS per_commit_steps_match_versions
""")
def cdc_changelog_between(spark, d):
    """Snapshot-diff changelog contract (round 5, beyond-survey —
    plans/target.py changelog_between, the Iceberg create_changelog_view
    shape): (a) on a multi-commit MoR table (NO write-time changefeed),
    the net changelog between a retained mid version and the current
    version REPLAYS the mid snapshot into the current one exactly
    (I/U set key values, D drops keys — verified by pandas fold +
    state hash); (b) ops are classified by endpoint liveness with
    correct before-images (an update's before.text equals the `from`
    snapshot's text for that key); (c) granularity='commit' emits one
    net step per retained version pair and each step replays its own
    (v-1 -> v) transition."""
    from ..testkit.oracle import state_hash

    work = tempfile.mkdtemp(prefix=f"dipper_clq_{uuid.uuid4().hex[:6]}_")
    table, stats = _mk_table(spark, work, seed=107, chunk_lsn=150,
                             write_mode="mor", time_travel=True)
    versions = table.versions()
    v_mid = versions[len(versions) // 2]

    def fold(a_pdf, ch_pdf):
        cols = ["role", "text", "tool", "ts"]
        state = {(r["conv_id"], r["turn_idx"]): {c: r.get(c) for c in cols}
                 for r in a_pdf.to_dict("records")}
        for r in ch_pdf.to_dict("records"):
            k = (r["conv_id"], r["turn_idx"])
            if r["change_op"] == "D":
                state.pop(k, None)
            else:
                state[k] = {c: r.get(c) for c in cols}
        import pandas as pd

        out = pd.DataFrame(
            [{"conv_id": k[0], "turn_idx": k[1], **v} for k, v in state.items()],
            columns=["conv_id", "turn_idx", *cols])
        return out.sort_values(["conv_id", "turn_idx"], ignore_index=True)

    a_pdf = table.snapshot(as_of=v_mid).toPandas()
    b_pdf = table.snapshot().toPandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True)
    ch = table.changelog_between(v_mid).toPandas()
    keys = list(zip(ch["conv_id"], ch["turn_idx"]))
    a_ok = (len(keys) == len(set(keys))
            and state_hash(fold(a_pdf, ch)) == state_hash(b_pdf))

    prior = a_pdf.set_index(["conv_id", "turn_idx"])
    upd = ch[ch["change_op"] == "U"]
    before_ok = all(
        r["before"]["text"] == prior.loc[(r["conv_id"], r["turn_idx"])]["text"]
        for r in upd.to_dict("records"))
    b_ok = (before_ok and set(ch["change_op"]) <= {"I", "U", "D"}
            and table.delta_file_count() > 0)  # genuinely MoR, no _changes dir
    b_ok = b_ok and not os.path.isdir(os.path.join(table.root, "_changes"))

    chc = table.changelog_between(v_mid, granularity="commit").toPandas()
    steps = sorted(int(v) for v in chc["commit_version"].dropna().unique())
    c_ok = steps == [v for v in versions if v > v_mid]
    prev = v_mid
    for v in steps:
        got = fold(table.snapshot(as_of=prev).toPandas(),
                   chc[chc["commit_version"] == v])
        want = table.snapshot(as_of=v).toPandas().sort_values(
            ["conv_id", "turn_idx"], ignore_index=True)
        c_ok = c_ok and state_hash(got) == state_hash(want)
        prev = v

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "net_diff_replays_to_target boolean, "
        "mor_cdc_without_write_time_feed boolean, "
        "per_commit_steps_match_versions boolean")


@q("cdc_changelog_consumers", """
SELECT CAST(1 AS BOOLEAN) AS view_tracks_mor_table,
       CAST(1 AS BOOLEAN) AS mirror_tracks_mor_upstream,
       CAST(1 AS BOOLEAN) AS retention_pin_and_bootstrap
""")
def cdc_changelog_consumers(spark, d):
    """Changelog-sourced consumer contract (round 5, beyond-survey —
    plans/ivm.py + plans/mirror.py source='changelog'): the incremental
    consumer stack runs against MoR tables (no write-time feed) by
    consuming the snapshot-diff changelog.  (a) an IncrementalView
    refreshed across MoR upserts/deletes equals a full recompute
    (SUM + AVG + MIN/MAX with rescan-on-retraction); (b) a MirrorTable
    synced via version diffs equals the upstream snapshot and re-syncs
    to a no-op; (c) the consumer's snapshot-tag pin holds its synced
    version across expire_snapshots(keep_last=1), and after losing
    history a consumer recovers via bootstrap() (for the mirror: the
    ghost purge makes a post-drop-tombstones bootstrap converge)."""
    import pandas as pd

    from ..plans.ivm import IncrementalView
    from ..plans.mirror import MirrorTable
    from ..plans.target import ChangefeedExpiredError
    from ..testkit.oracle import state_hash

    work = tempfile.mkdtemp(prefix=f"dipper_ccq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=109, chunk_lsn=200,
                         write_mode="mor", time_travel=True)

    def pdf(df):
        p = df.toPandas()
        return p.sort_values(list(p.columns), ignore_index=True)

    view = IncrementalView(
        spark, table, os.path.join(work, "view"), group_cols=["role"],
        aggs={"turns": "1"}, avgs={"avg_chars": "length(text)"},
        extrema={"max_turn": ("max", "turn_idx")},
        source="changelog", consumer_name="q-view")
    view.refresh()
    table.upsert(spark.createDataFrame(
        [("ccq-k", 42, "user", "x" * 30, dt.datetime(2027, 7, 1))], ROWS))
    table.delete_where("conv_id = 'ccq-k'")  # retraction of a max witness
    view.refresh()
    a_ok = pdf(view.read()).equals(pdf(view.full_recompute()))

    m = MirrorTable.create(spark, table.root, os.path.join(work, "replica"),
                           n_buckets=8, source="changelog",
                           consumer_name="q-mirror")
    m.sync()
    table.upsert(spark.createDataFrame(
        [("ccq-k2", 0, "user", "v", dt.datetime(2027, 7, 2))], ROWS))
    r2 = m.sync()
    b_ok = (not r2["noop"] and m.sync()["noop"]
            and state_hash(m.snapshot().toPandas())
            == state_hash(table.snapshot().toPandas()))

    synced = int(m._meta()["version"])
    table.upsert(spark.createDataFrame(
        [("ccq-k3", 0, "user", "w", dt.datetime(2027, 7, 3))], ROWS))
    table.expire_snapshots(keep_last=1)
    pin_held = synced in table.versions()
    table.delete_where("turn_idx = 1")
    table.compact(drop_tombstones=True)
    try:
        m.sync()
        refused = False
    except ChangefeedExpiredError:
        refused = True
    m.bootstrap()
    c_ok = (pin_held and refused
            and state_hash(m.snapshot().toPandas())
            == state_hash(table.snapshot().toPandas()))

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "view_tracks_mor_table boolean, "
        "mirror_tracks_mor_upstream boolean, "
        "retention_pin_and_bootstrap boolean")


@q("cdc_stats_pruned_lookup", """
SELECT CAST(1 AS BOOLEAN) AS stats_cover_every_file,
       CAST(1 AS BOOLEAN) AS bucket_prune_correct_and_partial,
       CAST(1 AS BOOLEAN) AS delta_conv_range_prunes
""")
def cdc_stats_pruned_lookup(spark, d):
    """Manifest file-statistics contract (round 5, beyond-survey —
    plans/target.py _file_key_stats/_refresh_stats/_candidate_buckets/
    _prune_man_by_conv, the Iceberg manifest-stats shape): (a) every
    committed data/delta file has per-file (conv_id, turn_idx) min/max
    recorded in the manifest, kept in sync across compaction; (b) a
    conv-only lookup's candidate bucket set (from the global turn
    range) is a STRICT subset of the layout, contains every bucket the
    conv's keys actually hash to, and the pruned lookup returns
    exactly the snapshot's rows for that conv; (c) a single-conv MoR
    delta batch is dropped from lookups of other convs by its
    conv-range (point range), while the touched conv still reads it."""
    from ..plans.target import LocalCowTable

    work = tempfile.mkdtemp(prefix=f"dipper_fsq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=111, chunk_lsn=200,
                         write_mode="mor", n_buckets=32)
    man = table._load()
    rels = [r for r, _s in LocalCowTable._entries(man)]
    rels += [r for r, _s, _v in LocalCowTable._delta_entries(man)]
    stats = man.get("file_stats", {})
    a_ok = bool(rels) and all(r in stats for r in rels)
    table.compact()
    man = table._load()
    a_ok = a_ok and set(man["file_stats"]) == {
        r for r, _s in LocalCowTable._entries(man)}

    conv = "conv00000003"
    cands = table._candidate_buckets(man, conv)
    got = table.lookup(conv).orderBy("turn_idx").toPandas()
    want = table.snapshot().filter(F.col("conv_id") == conv).orderBy(
        "turn_idx").toPandas()
    actual_b = {int(r["b"]) for r in
                table.read().filter(F.col("conv_id") == conv)
                .select(table._bucket_expr(man["n_buckets"]).alias("b"))
                .distinct().collect()}
    b_ok = (cands is not None and 0 < len(cands) < man["n_buckets"]
            and actual_b <= set(cands)
            and got["text"].tolist() == want["text"].tolist()
            and got["turn_idx"].tolist() == want["turn_idx"].tolist())

    table.upsert(spark.createDataFrame(
        [(conv, 0, "user", "pointed", dt.datetime(2027, 8, 1))], ROWS))
    man = table._load()
    other = table._prune_man_by_conv(man, "conv00000029")
    mine = table._prune_man_by_conv(man, conv)
    c_ok = (sum(len(v) for v in other["deltas"].values()) == 0
            and sum(len(v) for v in mine["deltas"].values()) > 0
            and table.lookup(conv, 0).first()["text"] == "pointed")

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "stats_cover_every_file boolean, "
        "bucket_prune_correct_and_partial boolean, "
        "delta_conv_range_prunes boolean")


@q("cdc_branch_wap", """
SELECT CAST(1 AS BOOLEAN) AS staged_invisible_then_published,
       CAST(1 AS BOOLEAN) AS diverged_main_refuses_fast_forward,
       CAST(1 AS BOOLEAN) AS branch_files_survive_expire
""")
def cdc_branch_wap(spark, d):
    """Write-audit-publish branch contract (round 5, beyond-survey —
    plans/target.py create_branch/fast_forward/drop_branch, the Iceberg
    branch shape): (a) branch writes (upsert + delete through the full
    merge machinery) are invisible on main until fast_forward publishes
    them atomically, after which main equals the audited branch
    snapshot; (b) a main commit after the fork makes fast_forward raise
    CommitConflict (Iceberg's fast-forward condition) — nothing is
    half-published; (c) expire_snapshots refcounts live branch
    manifests (a live branch's files survive keep_last=1), while a
    dropped branch's private files become reclaimable."""
    from ..plans.target import CommitConflict, LocalCowTable

    work = tempfile.mkdtemp(prefix=f"dipper_bwq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=113, n_buckets=8, time_travel=True)

    before = _state_hash_hex(table)
    br = table.create_branch("wap")
    br.upsert(spark.createDataFrame(
        [("wap-k", 0, "user", "staged", dt.datetime(2027, 9, 1))], ROWS))
    br.delete_where("turn_idx = 2")
    invisible = _state_hash_hex(table) == before
    staged = _state_hash_hex(br)
    table.fast_forward("wap")
    a_ok = (invisible and _state_hash_hex(table) == staged
            and "wap" not in table.branches())

    br2 = table.create_branch("wap2")
    br2.upsert(spark.createDataFrame(
        [("wap-k2", 0, "user", "staged2", dt.datetime(2027, 9, 2))], ROWS))
    table.upsert(spark.createDataFrame(
        [("main-k", 0, "user", "mainline", dt.datetime(2027, 9, 2))], ROWS))
    try:
        table.fast_forward("wap2")
        b_ok = False
    except CommitConflict:
        b_ok = (table.lookup("wap-k2").count() == 0
                and table.lookup("main-k", 0).first()["text"] == "mainline")

    staged2 = _state_hash_hex(br2)
    table.expire_snapshots(keep_last=1)
    live_kept = _state_hash_hex(br2) == staged2
    data_dir = os.path.join(table.root, "data")
    n_before = len([f for f in os.listdir(data_dir) if f.endswith(".parquet")])
    table.drop_branch("wap2")
    table.expire_snapshots(keep_last=1)
    n_after = len([f for f in os.listdir(data_dir) if f.endswith(".parquet")])
    c_ok = live_kept and n_after < n_before

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "staged_invisible_then_published boolean, "
        "diverged_main_refuses_fast_forward boolean, "
        "branch_files_survive_expire boolean")


@q("cdc_rollback", """
SELECT CAST(1 AS BOOLEAN) AS current_equals_target_version,
       CAST(1 AS BOOLEAN) AS history_forward_and_reingest_applies,
       CAST(1 AS BOOLEAN) AS files_survive_expire_after_rollback
""")
def cdc_rollback(spark, d):
    """Rollback contract (round 5, beyond-survey —
    plans/target.py LocalCowTable.rollback, Iceberg
    rollback_to_snapshot shape): (a) after rollback(v) the CURRENT
    snapshot is byte-identical (order-insensitive state hash) to the
    as-of read of v, via a metadata-only commit; (b) history moves
    FORWARD — the pre-rollback version stays as-of readable, the
    restored ledger lets an undone batch re-apply, and scope_seq never
    rewinds (the post-rollback upsert allocates a fresh batch id); (c)
    expire_snapshots after the rollback keeps the restored files alive
    through the current manifest even once the source version's
    manifest is dropped."""
    work = tempfile.mkdtemp(prefix=f"dipper_rbq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=117, n_buckets=8,
                         time_travel=True, chunk_lsn=150)
    versions = table.versions()
    v_mid = max(1, versions[-2])  # a non-empty retained mid version
    mid_hash = _state_hash_hex_asof(table, v_mid)
    pre_hash = _state_hash_hex(table)
    pre_v = table._load()["version"]

    new_v = table.rollback(v_mid)
    a_ok = (new_v == pre_v + 1
            and _state_hash_hex(table) == mid_hash
            and mid_hash != pre_hash)

    # forward history + ledger rewind semantics
    hist_ok = _state_hash_hex_asof(table, pre_v) == pre_hash
    seq0 = int(table._load().get("scope_seq", {}).get("api", 0))
    table.upsert(spark.createDataFrame(
        [("rbq-new", 0, "user", "after-rollback", dt.datetime(2027, 10, 1))],
        ROWS))
    reapplied = table.lookup("rbq-new", 0).first()["text"] == "after-rollback"
    b_ok = (hist_ok and reapplied
            and int(table._load()["scope_seq"]["api"]) == seq0 + 1)

    table.expire_snapshots(keep_last=1)
    c_ok = (v_mid not in table.versions()
            and table.lookup("rbq-new", 0).count() == 1
            and table.snapshot().count() > 0)

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "current_equals_target_version boolean, "
        "history_forward_and_reingest_applies boolean, "
        "files_survive_expire_after_rollback boolean")


def _state_hash_hex_asof(table, v: int) -> str:
    from ..testkit.oracle import state_hash

    return state_hash(table.snapshot(as_of=v).toPandas())


@q("cdc_metadata_tables", """
SELECT CAST(1 AS BOOLEAN) AS files_reconcile_manifest,
       CAST(1 AS BOOLEAN) AS history_matches_ledger,
       CAST(1 AS BOOLEAN) AS snapshots_and_refs_consistent
""")
def cdc_metadata_tables(spark, d):
    """Metadata-inspection contract (round 5, beyond-survey —
    plans/target.py LocalCowTable.inspect, Iceberg metadata-table
    shape): (a) inspect('files') lists exactly the manifest's live
    files with positive on-disk sizes and per-file pruning stats; (b)
    inspect('history') reproduces the commit ledger row-for-row; (c)
    inspect('snapshots') covers every retained version with exactly
    one is_current row, and inspect('refs') shows a tag and a branch
    right after they are created.  All driver-side O(manifest) — the
    same cost class as Iceberg's manifest-backed metadata tables."""
    work = tempfile.mkdtemp(prefix=f"dipper_mtq_{uuid.uuid4().hex[:6]}_")
    table, stats = _mk_table(spark, work, seed=119, n_buckets=8,
                             time_travel=True, chunk_lsn=150)
    man = table._load()

    files = table.inspect("files").toPandas()
    live = {rel for es in man["buckets"].values() for rel, _sid in es}
    a_ok = (set(files["path"]) == live and (files["bytes"] > 0).all()
            and set(files["kind"]) == {"base"}
            and files["conv_min"].notna().all())

    hist = table.inspect("history").toPandas()
    b_ok = (sorted(hist["batch_id"]) == sorted(e["batch_id"]
                                               for e in man["ledger"])
            and hist["rows_applied"].sum()
                == sum(s.rows_applied for s in stats if not s.skipped))

    vs = table.versions()
    table.tag_snapshot("audit", vs[-1])
    br = table.create_branch("stage")  # noqa: F841
    snaps = table.inspect("snapshots").toPandas()
    refs = table.inspect("refs").toPandas()
    c_ok = (sorted(snaps["version"]) == table.versions()
            and snaps[snaps["is_current"]]["version"].tolist()
                == [table._load()["version"]]
            and {(r["name"], r["type"]) for _, r in refs.iterrows()}
                == {("audit", "tag"), ("stage", "branch")})

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "files_reconcile_manifest boolean, "
        "history_matches_ledger boolean, "
        "snapshots_and_refs_consistent boolean")


@q("cdc_schema_rename_drop", """
SELECT CAST(1 AS BOOLEAN) AS rename_metadata_only_values_stable,
       CAST(1 AS BOOLEAN) AS drop_readd_never_resurrects,
       CAST(1 AS BOOLEAN) AS changelog_and_compact_consistent
""")
def cdc_schema_rename_drop(spark, d):
    """Field-id schema-evolution contract (round 5, beyond-survey —
    plans/target.py rename_column/drop_column, Iceberg field-id
    semantics): (a) rename is a METADATA-ONLY commit — the live file
    set is unchanged, reads resolve old physical files through stable
    field ids so every value appears under the new name, and an as-of
    read of a pre-rename version keeps the old name; (b) a
    dropped-then-re-added column gets a FRESH field id — pre-drop
    values read NULL, only post-re-add writes are visible; (c) a pure
    rename emits ZERO snapshot-diff changelog rows (both endpoints
    conform through the `to` manifest's ids), and compact() rewrites
    materialize the new name with the exact same values."""
    from ..plans.target import LocalCowTable

    work = tempfile.mkdtemp(prefix=f"dipper_rnq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=127, n_buckets=8,
                         time_travel=True)
    v0 = table._load()["version"]

    def _files(t):
        return {rel for es in t._load()["buckets"].values() for rel, _ in es}

    def _vals(t):
        df = t.read(include_system=False).toPandas()
        col = "body" if "body" in df.columns else "text"
        return sorted(map(tuple, df[["conv_id", "turn_idx", col]]
                          .itertuples(index=False)))

    vals0 = _vals(table)
    before = _files(table)
    table.rename_column("text", "body")
    v1 = table._load()["version"]
    asof = table.read(as_of=v0, include_system=False).columns
    a_ok = (_files(table) == before and _vals(table) == vals0
            and "text" in asof and "body" not in asof
            and "body" in table.read().columns)

    # (b) drop tool, re-add via upsert: old values stay dark
    table.upsert(spark.createDataFrame(
        [("rn-a", 0, "u", "va", dt.datetime(2027, 5, 1), "hammer")],
        "conv_id string, turn_idx long, role string, body string, "
        "ts timestamp, tool string"))
    fid_old = table._load()["field_ids"]["tool"]
    table.drop_column("tool")
    table.upsert(spark.createDataFrame(
        [("rn-b", 0, "u", "vb", dt.datetime(2027, 5, 2), "saw")],
        "conv_id string, turn_idx long, role string, body string, "
        "ts timestamp, tool string"))
    df = table.read(include_system=False).toPandas()
    b_ok = (table._load()["field_ids"]["tool"] != fid_old
            and df[df.conv_id == "rn-b"]["tool"].tolist() == ["saw"]
            and df[df.conv_id != "rn-b"]["tool"].isna().all())

    # (c) pure rename range diffs empty; compact keeps values put
    silent = table.changelog_between(v0, v1).count() == 0
    vals_pre = _vals(table)
    table.compact()
    c_ok = silent and _vals(table) == vals_pre

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "rename_metadata_only_values_stable boolean, "
        "drop_readd_never_resurrects boolean, "
        "changelog_and_compact_consistent boolean")


@q("cdc_minor_compaction", """
SELECT CAST(1 AS BOOLEAN) AS folds_only_selected_buckets,
       CAST(1 AS BOOLEAN) AS rebases_over_concurrent_writer,
       CAST(1 AS BOOLEAN) AS noop_and_purge_consistent
""")
def cdc_minor_compaction(spark, d):
    """Minor/targeted compaction contract (round 5, beyond-survey —
    plans/target.py compact(minor=True), Iceberg
    rewrite_data_files-with-filter shape): (a) with delta debt planted
    in a known bucket subset, minor compaction folds EXACTLY those
    buckets — unselected buckets' base files stay byte-identical and
    the snapshot hash is invariant; (b) a writer committing into an
    UNSELECTED bucket between the compaction's read and commit is
    rebased over (both commits land — merge-style touched-bucket
    validation, not a strict CAS); (c) a second minor pass is a
    no-commit no-op, and an explicit-bucket tombstone purge keeps the
    live row set intact."""
    import datetime as dtm
    from contextlib import contextmanager

    from ..plans.target import LocalCowTable

    work = tempfile.mkdtemp(prefix=f"dipper_mcq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=131, n_buckets=16,
                         chunk_lsn=200, write_mode="mor")
    table.compact()  # zero debt baseline
    man = table._load()
    nb = man["n_buckets"]
    cands = [f"mc-{i}" for i in range(200)]
    bdf = spark.createDataFrame([(k, 0) for k in cands],
                                "conv_id string, turn_idx long")
    bmap = {r["conv_id"]: r["b"] for r in
            bdf.select("conv_id", table._bucket_expr(nb).alias("b")).collect()}
    seed_key = cands[0]
    table.upsert(spark.createDataFrame(
        [(seed_key, 0, "user", "debt", dtm.datetime(2027, 7, 1))],
        ROWS))
    man = table._load()
    delta_buckets = {int(b) for b, es in man.get("deltas", {}).items() if es}
    before = {b: [e[0] for e in es] for b, es in man["buckets"].items()}

    # (b) interleave a writer on a DIFFERENT bucket mid-compaction
    t2 = LocalCowTable(spark, table.root)
    probe = next((k for k, b in bmap.items() if b not in delta_buckets), None)
    orig = table._commit_lock
    fired = {"n": 0}

    @contextmanager
    def hooked():
        if fired["n"] == 0:
            fired["n"] = 1
            t2.upsert(spark.createDataFrame(
                [(probe, 0, "user", "mid-compact", dtm.datetime(2027, 7, 2))],
                ROWS))
        with orig():
            yield

    table._commit_lock = hooked
    try:
        n = table.compact(minor=True)
    finally:
        table._commit_lock = orig
    man2 = table._load()
    after = {b: [e[0] for e in es] for b, es in man2["buckets"].items()}
    # the interleaved probe write is an MoR APPEND — base file lists of
    # unselected buckets must still be byte-identical to `before`
    live = table.snapshot().toPandas()
    a_ok = (n == len(delta_buckets)
            and all(after[b] == before[b] for b in before
                    if int(b) not in delta_buckets)
            and all(after[str(b)] != before.get(str(b))
                    for b in delta_buckets))
    b_ok = (fired["n"] == 1
            and live[live.conv_id == probe]["text"].tolist() == ["mid-compact"]
            and live[live.conv_id == seed_key]["text"].tolist() == ["debt"])

    # (c) second pass: no-op, no version bump; tombstone purge keeps live
    v = man2["version"]
    outstanding = {int(b) for b, es in man2.get("deltas", {}).items() if es}
    n2 = table.compact(minor=True)  # folds the probe's delta, if any
    noop = table.compact(minor=True) == 0 and table._load()["version"] == v + (1 if n2 else 0)
    table.delete_where(f"conv_id = '{seed_key}'")
    h_live = _state_hash_hex(table)
    tomb_b = sorted(int(b) for b, es in table._load().get("deltas", {}).items() if es)
    table.compact(buckets=tomb_b, drop_tombstones=True)
    c_ok = (noop and n2 == len(outstanding)
            and _state_hash_hex(table) == h_live
            and table.delta_file_count() == 0)

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "folds_only_selected_buckets boolean, "
        "rebases_over_concurrent_writer boolean, "
        "noop_and_purge_consistent boolean")


@q("cdc_maintenance_advisor", """
SELECT CAST(1 AS BOOLEAN) AS debt_detected_then_cleared,
       CAST(1 AS BOOLEAN) AS retention_layout_pressure_detected,
       CAST(1 AS BOOLEAN) AS healthy_table_advises_nothing
""")
def cdc_maintenance_advisor(spark, d):
    """Maintenance-advisor contract (round 5, beyond-survey —
    plans/advisor.py, LocalCowTable.advise): (a) planted MoR delta
    debt surfaces as a `compact --minor` row (escalating to HIGH past
    the broadcast-resolve budget) and disappears once minor compaction
    folds it; (b) retained-version pile-up and an oversized bucket
    layout surface under pinned thresholds as `expire --keep-last` /
    `rescale --n-buckets` rows, and expire clears the former; (c) a
    freshly compacted table advises NOTHING, and planted crash debris
    surfaces as a `vacuum` row that vacuum(ttl=0) clears.  All
    driver-side metadata + stat/listdir — the advisor never reads data
    or starts a job."""
    import datetime as dtm

    work = tempfile.mkdtemp(prefix=f"dipper_adq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=137, n_buckets=8,
                         time_travel=True, chunk_lsn=200)

    def acts(t):
        return {r["action"]: r for r in t.advise().collect()}

    # (b) retention + layout pressure under pinned thresholds
    os.environ["DIPPER_ADVISE_KEEP_VERSIONS"] = "2"
    os.environ["DIPPER_TARGET_BUCKET_BYTES"] = "1"
    try:
        a = acts(table)
        pressure = ("expire --keep-last" in a
                    and a["expire --keep-last"]["metric"] > 2
                    and "rescale --n-buckets" in a
                    and a["rescale --n-buckets"]["severity"] == "high")
        table.expire_snapshots(keep_last=2)
        expired_clear = "expire --keep-last" not in acts(table)
    finally:
        del os.environ["DIPPER_ADVISE_KEEP_VERSIONS"]
        del os.environ["DIPPER_TARGET_BUCKET_BYTES"]
    b_ok = pressure and expired_clear

    # (a) MoR delta debt detect -> escalate -> clear
    table.compact()
    table.set_write_mode("mor")
    table.upsert(spark.createDataFrame(
        [("adq-k", 0, "user", "debt", dtm.datetime(2027, 8, 1))], ROWS))
    a = acts(table)
    low = ("compact --minor" in a
           and a["compact --minor"]["severity"] == "low")
    os.environ["DIPPER_MOR_BROADCAST_BYTES"] = "1"
    try:
        high = acts(table)["compact --minor"]["severity"] == "high"
    finally:
        del os.environ["DIPPER_MOR_BROADCAST_BYTES"]
    table.compact(minor=True)
    a_ok = low and high and "compact --minor" not in acts(table)

    # (c) healthy == empty; debris -> vacuum -> empty
    healthy = table.advise().count() == 0
    os.makedirs(os.path.join(table.root, "_tmp_compact_dead0001"),
                exist_ok=True)
    a = acts(table)
    debris = "vacuum" in a and "debris" in a["vacuum"]["reason"]
    table.vacuum(ttl_seconds=0)
    c_ok = healthy and debris and table.advise().count() == 0

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "debt_detected_then_cleared boolean, "
        "retention_layout_pressure_detected boolean, "
        "healthy_table_advises_nothing boolean")


@q("cdc_history_changelog", """
SELECT CAST(1 AS BOOLEAN) AS mor_current_slice_and_state_at,
       CAST(1 AS BOOLEAN) AS equals_feed_history_same_commits,
       CAST(1 AS BOOLEAN) AS seeded_floor_and_purge_refusal
""")
def cdc_history_changelog(spark, d):
    """Changelog-sourced SCD2 contract (round 5, beyond-survey —
    plans/history.py source='changelog'): (a) on a MoR table (no
    write-time feed) the history's is_current slice equals snapshot()
    and state_at a mid version's frontier equals that version's as-of
    read; (b) on a changefeed CoW table whose commits == feed batches,
    the changelog-derived history equals the feed-derived history on
    the shared columns; (c) after expire the history is SEEDED from
    the earliest retained snapshot (current slice still exact), and a
    tombstone-purged delete inside the range refuses loudly while a
    from_version past the purge works."""
    import datetime as dtm

    from ..plans.history import state_at
    from ..plans.target import LocalCowTable
    from ..testkit.oracle import SPEC_COLUMNS, state_hash

    work = tempfile.mkdtemp(prefix=f"dipper_hcq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=139, n_buckets=8,
                         chunk_lsn=150, time_travel=True, write_mode="mor")
    hist = table.history(source="changelog").cache()
    cur_eq = (state_hash(hist.filter("is_current").select(*SPEC_COLUMNS)
                         .toPandas())
              == state_hash(table.snapshot().toPandas()))
    hist.unpersist()
    # state_at == as_of needs commit order to agree with the (ts, lsn)
    # version clock — true for in-order streams, NOT for the disordered
    # generator (a later commit may apply an event below a mid frontier
    # on another key).  Pin it on a controlled-clock MoR table.
    t3 = LocalCowTable.create(spark, os.path.join(work, "clock"),
                              n_buckets=4, time_travel=True,
                              write_mode="mor")
    for i, (text, day) in enumerate([("a1", 1), ("a2", 2), ("a3", 3)]):
        t3.upsert(spark.createDataFrame(
            [("hcq-clock", 0, "user", text, dtm.datetime(2027, 3, day)),
             (f"hcq-other{i}", 0, "user", text, dtm.datetime(2027, 3, day))],
            ROWS))
    h3 = t3.history(source="changelog").cache()
    cols3 = [c for c in SPEC_COLUMNS if c in t3.snapshot().columns]
    at_eq = True
    for v in t3.versions()[1:]:
        snap = t3.read(as_of=v).filter(
            ~F.coalesce(F.col("_deleted"), F.lit(False)))
        fr = snap.agg(F.max(F.struct(F.col("_op_ts"), F.col("_lsn")))
                      .alias("m")).first()["m"]
        at_eq = at_eq and (
            state_hash(state_at(h3, fr["_op_ts"], fr["_lsn"])
                       .select(*cols3).toPandas())
            == state_hash(t3.snapshot(as_of=v).select(*cols3).toPandas()))
    h3.unpersist()
    a_ok = cur_eq and at_eq

    cf, _ = _mk_table(spark, os.path.join(work, "cf"), seed=141,
                      chunk_lsn=200, time_travel=True, changefeed=True)
    cols = [*SPEC_COLUMNS, "version_op", "effective_from_ts",
            "effective_from_lsn", "effective_to_ts", "effective_to_lsn",
            "end_op", "is_current"]
    b_ok = (state_hash(cf.history().select(*cols).toPandas())
            == state_hash(cf.history(source="changelog").select(*cols)
                          .toPandas()))

    table.expire_snapshots(keep_last=3)
    vs = table.versions()
    h2 = table.history(source="changelog")
    seeded = (vs[0] > 0
              and h2.filter(F.col("batch") == vs[0]).count() > 0
              and state_hash(h2.filter("is_current").select(*SPEC_COLUMNS)
                             .toPandas())
              == state_hash(table.snapshot().toPandas()))
    t2 = LocalCowTable.create(spark, os.path.join(work, "purge"),
                              n_buckets=4, time_travel=True)
    t2.upsert(spark.createDataFrame(
        [("hcq-k", 0, "user", "doomed", dtm.datetime(2027, 2, 1))], ROWS))
    t2.tag_snapshot("live")
    t2.delete_where("conv_id = 'hcq-k'")
    t2.compact(drop_tombstones=True)
    t2.expire_snapshots(keep_last=1)
    refused = False
    try:
        t2.history(source="changelog").count()
    except ValueError:
        refused = True
    past = (t2.history(source="changelog",
                       from_version=t2.versions()[-1])
            .filter("conv_id = 'hcq-k'").count() == 0)
    c_ok = seeded and refused and past

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "mor_current_slice_and_state_at boolean, "
        "equals_feed_history_same_commits boolean, "
        "seeded_floor_and_purge_refusal boolean")


@q("cdc_clone_table", """
SELECT CAST(1 AS BOOLEAN) AS clone_equals_source,
       CAST(1 AS BOOLEAN) AS zero_copy_shared_inodes,
       CAST(1 AS BOOLEAN) AS diverge_isolated_both_ways,
       CAST(1 AS BOOLEAN) AS source_gc_cannot_break_clone
""")
def cdc_clone_table(spark, d):
    """Table-clone contract (round 5, beyond-survey — target.py
    LocalCowTable.clone, the Delta CLONE / Iceberg snapshot-export
    shape): (a) a shallow clone's snapshot equals the source exactly;
    (b) it is ZERO-copy — every live data file in the clone is the
    same inode as the source's (hardlink, st_nlink >= 2); (c) writes
    after the fork are isolated in BOTH directions (the engine's
    immutable uuid-named files give copy-on-write for free); (d) the
    source's own commit-time GC (non-time-travel: superseded files are
    deleted one commit later) can never break the clone — the shared
    inode survives until both sides drop their directory entry."""
    import datetime as dtm

    from ..plans.target import LocalCowTable  # noqa: F401 (parity import)

    work = tempfile.mkdtemp(prefix=f"dipper_cpq_{uuid.uuid4().hex[:6]}_")
    t, _ = _mk_table(spark, work, seed=131, n_buckets=8)  # non-TT CoW
    h0 = _state_hash_hex(t)
    c = t.clone(os.path.join(work, "clone"))

    a_ok = _state_hash_hex(c) == h0

    rels = [r for r, _s in c._entries(c._load())]
    b_ok = bool(rels) and all(
        os.stat(os.path.join(c.root, r)).st_nlink >= 2
        and os.path.samefile(os.path.join(c.root, r), os.path.join(t.root, r))
        for r in rels)

    ts = dtm.datetime(2027, 5, 1)
    c.upsert(spark.createDataFrame(
        [("cp-clone", 0, "user", "clone-only", ts)], ROWS))
    src_unchanged = _state_hash_hex(t) == h0
    h_c = _state_hash_hex(c)
    t.upsert(spark.createDataFrame(
        [("cp-src", 0, "user", "src-only", ts)], ROWS))
    c_ok = src_unchanged and _state_hash_hex(c) == h_c

    # two more source commits: the first supersedes pre-clone bucket
    # files (pending_gc), the second actually deletes them from the
    # SOURCE root — the clone still reads its exact state through the
    # surviving hardlinked inodes
    t.upsert(spark.createDataFrame(
        [("cp-src", 1, "user", "gc one", ts)], ROWS))
    t.upsert(spark.createDataFrame(
        [("cp-src", 2, "user", "gc two", ts)], ROWS))
    d_ok = _state_hash_hex(c) == h_c

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok), bool(d_ok))],
        "clone_equals_source boolean, "
        "zero_copy_shared_inodes boolean, "
        "diverge_isolated_both_ways boolean, "
        "source_gc_cannot_break_clone boolean")


@q("cdc_bloom_pruned_lookup", """
SELECT CAST(1 AS BOOLEAN) AS blooms_cover_live_files,
       CAST(1 AS BOOLEAN) AS bloom_prunes_beyond_ranges,
       CAST(1 AS BOOLEAN) AS lookup_exact_under_pruning
""")
def cdc_bloom_pruned_lookup(spark, d):
    """Per-file conv_id Bloom-filter contract (round 5, beyond-survey —
    plans/target.py compute_stats/_bloom_build/_prune_man_by_conv, the
    Iceberg compute_table_stats / Puffin-blob shape): (a) one
    maintenance pass records a bloom for EVERY live data/delta file
    and a second pass is a no-op (idempotent, no version bump); (b) a
    lookup of a conv_id absent from the table but INSIDE the global
    conv range prunes strictly more files than min/max range stats
    alone can; (c) pruned lookups stay exact — a present conv returns
    precisely the snapshot's rows (no false negatives), the absent
    conv returns zero rows, and after a compaction (fresh files, no
    blooms yet) plus re-analyze the same holds."""
    from ..plans.target import LocalCowTable

    work = tempfile.mkdtemp(prefix=f"dipper_blq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=117, chunk_lsn=400, n_buckets=32)

    def rels(man):
        out = [r for r, _s in LocalCowTable._entries(man)]
        out += [r for r, _s, _v in LocalCowTable._delta_entries(man)]
        return out

    def kept(man, conv):
        return len(rels(table._prune_man_by_conv(man, conv)))

    man0 = table._load()
    absent = "conv00000007x"  # inside [min conv, max conv], never written
    range_only = kept(man0, absent)
    res1 = table.compute_stats()
    man1 = table._load()
    res2 = table.compute_stats()
    a_ok = (res1["computed"] == len(rels(man1)) > 0
            and all("bloom" in man1["file_stats"][r] for r in rels(man1))
            and res2["computed"] == 0
            and table._load()["version"] == man1["version"])

    b_ok = kept(man1, absent) < range_only

    def exact(conv):
        got = table.lookup(conv).orderBy("turn_idx").toPandas()
        want = (table.snapshot().filter(F.col("conv_id") == conv)
                .orderBy("turn_idx").toPandas())
        return (len(want) > 0
                and got["turn_idx"].tolist() == want["turn_idx"].tolist()
                and got["text"].tolist() == want["text"].tolist())

    c_ok = exact("conv00000007") and table.lookup(absent).count() == 0
    table.compact()
    table.compute_stats()
    c_ok = c_ok and exact("conv00000007") and table.lookup(absent).count() == 0

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "blooms_cover_live_files boolean, "
        "bloom_prunes_beyond_ranges boolean, "
        "lookup_exact_under_pruning boolean")


@q("cdc_auto_maintain", """
SELECT CAST(1 AS BOOLEAN) AS maintain_resolves_advice,
       CAST(1 AS BOOLEAN) AS data_invariant_and_idempotent,
       CAST(1 AS BOOLEAN) AS policy_items_skipped_loudly
""")
def cdc_auto_maintain(spark, d):
    """Auto-maintenance contract (round 5, beyond-survey —
    plans/advisor.py maintain / LocalCowTable.maintain, the
    Delta-OPTIMIZE-style advise -> verb loop): (a) planted MoR delta
    debt, crash debris and stale bloom coverage all resolve in one
    maintain() sweep (the re-advise loop orders analyze AFTER the
    compact that invalidated the blooms) and the advisor reads clean
    afterwards; (b) table data is hash-identical across maintenance
    and a second sweep is an empty no-op; (c) policy decisions are
    skipped loudly with a reason, never auto-run — a forced rescale
    recommendation stays skipped and the layout untouched."""
    import os as _os

    from ..plans.target import LocalCowTable
    from ..testkit.oracle import state_hash

    work = tempfile.mkdtemp(prefix=f"dipper_mtq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=119, chunk_lsn=400,
                         write_mode="mor", n_buckets=2)
    table.compute_stats()
    table.upsert(spark.createDataFrame(
        [("mq-k", 0, "user", "debt", dt.datetime(2027, 9, 2))], ROWS))
    _os.makedirs(_os.path.join(table.root, "_tmp_compact_feedface"),
                 exist_ok=True)
    before = state_hash(table.snapshot().toPandas())

    log = table.maintain(vacuum_ttl=0)
    done = [e["action"] for e in log if e["status"] == "done"]
    a_ok = ({"compact --minor", "vacuum", "analyze"} <= set(done)
            and done.index("analyze") > done.index("compact --minor")
            and table.advise().count() == 0
            and not any(table._load().get("deltas", {}).values()))

    b_ok = (state_hash(table.snapshot().toPandas()) == before
            and table.maintain() == [])

    prev = os.environ.get("DIPPER_TARGET_BUCKET_BYTES")
    os.environ["DIPPER_TARGET_BUCKET_BYTES"] = "64"
    try:
        log2 = table.maintain()
    finally:
        if prev is None:
            os.environ.pop("DIPPER_TARGET_BUCKET_BYTES", None)
        else:
            os.environ["DIPPER_TARGET_BUCKET_BYTES"] = prev
    resc = [e for e in log2 if e["action"] == "rescale --n-buckets"]
    c_ok = (len(resc) == 1 and resc[0]["status"] == "skipped"
            and "allow_rescale" in resc[0]["reason"]
            and table._load()["n_buckets"] == 2)

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "maintain_resolves_advice boolean, "
        "data_invariant_and_idempotent boolean, "
        "policy_items_skipped_loudly boolean")


@q("cdc_sorted_compaction", """
SELECT CAST(1 AS BOOLEAN) AS sorted_rewrite_same_data,
       CAST(1 AS BOOLEAN) AS every_file_key_ordered,
       CAST(1 AS BOOLEAN) AS zero_extra_exchange
""")
def cdc_sorted_compaction(spark, d):
    """Sort-ordered compaction contract (round 5, beyond-survey —
    plans/target.py compact(sort=True), the Iceberg
    rewrite_data_files-with-sort-order shape): (a) a sorted rewrite of
    a MoR table with outstanding deltas folds them and leaves the data
    hash-identical; (b) every rewritten bucket file is
    (conv_id, turn_idx)-ordered on disk; (c) the sort contract adds no
    Exchange to the rewrite plan, and at most one Sort: zero against
    the SortAggregate LWW resolve (EliminateSorts proves the order is
    already guaranteed), one against the broadcast-resolve plan (where
    it is genuinely needed)."""
    import pyarrow.parquet as _pq
    import pyspark.sql.types as T

    from ..plans.target import LocalCowTable
    from ..schemas import KEY_COLUMNS
    from ..testkit.oracle import state_hash

    work = tempfile.mkdtemp(prefix=f"dipper_scq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=121, chunk_lsn=400,
                         write_mode="mor", n_buckets=8)
    table.upsert(spark.createDataFrame(
        [("conv00000011", 0, "user", "late", dt.datetime(2027, 10, 1))],
        ROWS))
    before = state_hash(table.snapshot().toPandas())

    # plan contract measured on the delta-laden pre-compact manifest —
    # that is the rewrite plan compact(sort=True) actually runs, and
    # the one whose SortAggregate already guarantees the order
    man0 = table._load()
    schema0 = T.StructType.fromJson(man0["schema"])
    df = (table._read_resolved(man0, schema0)
          .withColumn("_bucket", table._bucket_expr(man0["n_buckets"]))
          .repartition(man0["n_buckets"], *KEY_COLUMNS))
    base = df._jdf.queryExecution().executedPlan().toString()
    sortd = (df.sortWithinPartitions(*KEY_COLUMNS)
             ._jdf.queryExecution().executedPlan().toString())
    # never an extra Exchange; the contract Sort is eliminated (0) on
    # the SortAggregate resolve plan or genuinely inserted (+1) on the
    # broadcast-resolve plan — both are correct (see test_sorted_compact)
    c_ok = (sortd.count("Exchange") == base.count("Exchange")
            and sortd.count("Sort [") - base.count("Sort [") in (0, 1))

    n = table.compact(sort=True)
    man = table._load()
    a_ok = (n > 0 and not any(man.get("deltas", {}).values())
            and state_hash(table.snapshot().toPandas()) == before)

    b_ok = True
    for rel, _sid in LocalCowTable._entries(man):
        t = _pq.read_table(os.path.join(table.root, rel),
                           columns=["conv_id", "turn_idx"])
        keys = list(zip(t.column("conv_id").to_pylist(),
                        t.column("turn_idx").to_pylist()))
        b_ok = b_ok and keys == sorted(keys)

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "sorted_rewrite_same_data boolean, "
        "every_file_key_ordered boolean, "
        "zero_extra_exchange boolean")


@q("cdc_ddl_count_expiry", """
SELECT CAST(1 AS BOOLEAN) AS add_column_metadata_only,
       CAST(1 AS BOOLEAN) AS metadata_count_exact,
       CAST(1 AS BOOLEAN) AS age_policy_retains_young
""")
def cdc_ddl_count_expiry(spark, d):
    """Iceberg-parity polish contract (round 5, beyond-survey): (a)
    `add_column` is a metadata-only commit (same files on disk) whose
    column reads NULL then accepts writes with a FRESH field id even
    after a drop (plans/target.py add_column); (b) `count_rows()` is
    answered from manifest metadata once files are decisively
    live-only (tombstone-purging compact) or analyzed, and equals the
    Spark-side count at every step (the Iceberg COUNT(*) pushdown,
    `_metadata_live_count`); (c) `expire_snapshots(older_than_s)`
    composes with keep_last as a pure retention-widener: young
    versions survive a keep_last=1 expire, artificially aged ones are
    dropped (Iceberg older_than + retain_last)."""
    import json as _json
    import os as _os

    from ..plans.target import LocalCowTable

    work = tempfile.mkdtemp(prefix=f"dipper_ddq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=123, chunk_lsn=400,
                         n_buckets=8, time_travel=True)

    files0 = sorted(r for r, _s in LocalCowTable._entries(table._load()))
    table.add_column("sentiment", "double")
    man = table._load()
    a_ok = (sorted(r for r, _s in LocalCowTable._entries(man)) == files0
            and table.read().filter("sentiment IS NOT NULL").count() == 0)
    table.upsert(spark.createDataFrame(
        [("ddq-k", 0, "user", "x", dt.datetime(2028, 6, 1), 0.5)],
        ROWS + ", sentiment double"))
    a_ok = a_ok and table.lookup("ddq-k", 0).first()["sentiment"] == 0.5

    want = table.snapshot().count()
    b_ok = (table.count_rows() == want
            and LocalCowTable._metadata_live_count(table._load()) is None)
    table.compact(drop_tombstones=True)
    man2 = table._load()
    b_ok = (b_ok and LocalCowTable._metadata_live_count(man2) == want
            and table.count_rows() == want)

    vs = table.versions()
    out = table.expire_snapshots(keep_last=1, older_than_s=3600)
    c_ok = out["dropped_versions"] == 0 and table.versions() == vs
    vd = _os.path.join(table.root, "_versions")
    for fn in _os.listdir(vd):
        p = _os.path.join(vd, fn)
        with open(p) as f:
            m = _json.load(f)
        m["committed_at"] = "2020-01-01T00:00:00Z"
        with open(p, "w") as f:
            _json.dump(m, f)
    out2 = table.expire_snapshots(keep_last=1, older_than_s=3600)
    c_ok = c_ok and out2["dropped_versions"] > 0

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "add_column_metadata_only boolean, "
        "metadata_count_exact boolean, "
        "age_policy_retains_young boolean")


@q("cdc_fsck_integrity", """
SELECT CAST(1 AS BOOLEAN) AS healthy_table_clean_both_tiers,
       CAST(1 AS BOOLEAN) AS metadata_tampering_typed_findings,
       CAST(1 AS BOOLEAN) AS data_tier_catches_misplacement
""")
def cdc_fsck_integrity(spark, d):
    """Integrity-checker contract (round 5, beyond-survey —
    plans/fsck.py, the Delta FSCK shape): (a) a healthy MoR table with
    outstanding deltas reports zero findings on both tiers (fsck never
    mutates — the manifest version is unchanged); (b) planted metadata
    corruption (double-claimed file, duplicate ledger batch, rewound
    allocator, dangling stats, future delta commit, missing file)
    surfaces as typed findings; (c) swapping two buckets' file lists is
    invisible to metadata but the data tier's single key-columns scan
    reports row_in_wrong_bucket."""
    import json as _json
    import os as _os

    work = tempfile.mkdtemp(prefix=f"dipper_fkq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=127, chunk_lsn=400,
                         write_mode="mor", n_buckets=8)
    table.upsert(spark.createDataFrame(
        [("fkq-k", 0, "user", "delta", dt.datetime(2028, 8, 1))], ROWS))
    v0 = table._load()["version"]
    a_ok = (table.fsck().count() == 0
            and table.fsck(data=True).count() == 0
            and table._load()["version"] == v0)

    mp = table._manifest_path()
    with open(mp) as f:
        man = _json.load(f)
    pristine = _json.dumps(man)
    first = man["buckets"]["0"][0]
    man["buckets"]["1"].append(first)
    man["ledger"].append(dict(man["ledger"][0]))
    scope = man["ledger"][0].get("scope", "default")
    man["ledger"].append({**man["ledger"][0], "batch_id": 7})
    man["scope_seq"] = {scope: 1}
    man["file_stats"]["data/ghost.parquet"] = {"conv": ["a", "b"],
                                               "turn": [0, 1], "rows": 1}
    with open(mp, "w") as f:
        _json.dump(man, f)
    got = {r["check"] for r in table.fsck().collect()}
    b_ok = {"file_double_claimed", "ledger_duplicate_batch",
            "scope_seq_behind", "stats_dangling"} <= got

    man = _json.loads(pristine)
    bs = [b for b, es in man["buckets"].items() if es]
    man["buckets"][bs[0]], man["buckets"][bs[1]] = (
        man["buckets"][bs[1]], man["buckets"][bs[0]])
    with open(mp, "w") as f:
        _json.dump(man, f)
    c_ok = (table.fsck().count() == 0
            and any(r["check"] == "row_in_wrong_bucket"
                    for r in table.fsck(data=True).collect()))

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "healthy_table_clean_both_tiers boolean, "
        "metadata_tampering_typed_findings boolean, "
        "data_tier_catches_misplacement boolean")


@q("cdc_quarantine_requeue", """
SELECT CAST(1 AS BOOLEAN) AS requeue_applies_and_purges,
       CAST(1 AS BOOLEAN) AS lww_guard_protects_newer,
       CAST(1 AS BOOLEAN) AS still_violating_routes_back
""")
def cdc_quarantine_requeue(spark, d):
    """Dead-letter requeue contract (round 5, beyond-survey —
    plans/target.py requeue_quarantined / CLI `requeue`): (a) after
    the quarantining constraint is dropped, one requeue applies the
    rows under their ORIGINAL (ts, lsn), purges the drained dirs, and
    a second requeue is an empty no-op; (b) a key updated with a NEWER
    version since quarantine is untouched (the requeued row loses the
    LWW race it would have lost live); (c) with the constraint still
    active, requeued rows route straight back to the sink and the
    table is unchanged."""
    from ..plans.target import LocalCowTable

    work = tempfile.mkdtemp(prefix=f"dipper_rqq_{uuid.uuid4().hex[:6]}_")
    ts0 = dt.datetime(2027, 3, 1)

    def mk(name):
        t = LocalCowTable.create(spark, os.path.join(work, name), n_buckets=8)
        t.add_check_constraint("text_present",
                               "text IS NOT NULL AND length(text) > 0",
                               mode="quarantine")
        t.upsert(spark.createDataFrame(
            [("a", 0, "user", "ok", ts0), ("b", 0, "user", "", ts0),
             ("c", 0, "user", "", ts0)], ROWS))
        return t

    t1 = mk("t1")
    t1.drop_check_constraint("text_present")
    out = t1.requeue_quarantined()
    a_ok = (out["rows_requeued"] == 2 and out["rows_applied"] == 2
            and t1.quarantined().count() == 0
            and set(t1.snapshot().toPandas()["conv_id"]) == {"a", "b", "c"}
            and t1.requeue_quarantined() == {"rows_requeued": 0,
                                             "batches_purged": 0})

    t2 = mk("t2")
    t2.drop_check_constraint("text_present")
    t2.upsert(spark.createDataFrame(
        [("b", 0, "user", "newer", dt.datetime(2027, 3, 2))], ROWS))
    out2 = t2.requeue_quarantined()
    snap = {r["conv_id"]: r["text"]
            for _, r in t2.snapshot().toPandas().iterrows()}
    b_ok = (out2["conflicts_lww_lost"] >= 1 and snap["b"] == "newer"
            and snap["c"] == "")

    t3 = mk("t3")
    n0 = t3.snapshot().count()
    out3 = t3.requeue_quarantined()
    c_ok = (out3["rows_requarantined"] == 2 and out3["rows_applied"] == 0
            and t3.snapshot().count() == n0
            and t3.quarantined().count() == 2)

    return spark.createDataFrame(
        [(bool(a_ok), bool(b_ok), bool(c_ok))],
        "requeue_applies_and_purges boolean, "
        "lww_guard_protects_newer boolean, "
        "still_violating_routes_back boolean")
