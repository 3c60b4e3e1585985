"""Round-5 driver contracts: concurrency-safe commits, changefeed
retention, and IVM MIN/MAX/AVG — the three VERDICT-r4 asks, each as a
deterministic boolean contract the driver value-checks against a
literal oracle (the same invariant->boolean pattern as the r4 CDC-out
contracts in relational_ext2.py).
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


@q("cdc_concurrent_writers", """
SELECT CAST(1 AS BOOLEAN) AS disjoint_rebase_both_visible,
       CAST(1 AS BOOLEAN) AS overlap_conflict_loud_and_clean,
       CAST(1 AS BOOLEAN) AS retry_converges_unique_ids
""")
def cdc_concurrent_writers(spark, d):
    """Concurrency-control contract (round 5, VERDICT r4 #1): commits
    are optimistic with locked validate-and-rebase
    (plans/target.py LocalCowTable._commit_merge).  Deterministic
    interleaving — a competing writer is injected exactly between a
    writer's manifest read and its commit:
      (a) competing commit touches DISJOINT buckets -> rebase: both
          writes visible, both ledger entries kept, distinct batch ids;
      (b) competing commit touches the SAME bucket, victim uses an
          explicit batch id (CDC path) -> CommitConflict raised, and
          NOTHING of the failed commit is visible (no row, no ledger
          entry, no leaked batch id);
      (c) same-bucket race through the self-rederiving API writer ->
          bounded retry converges to the LWW merge of both writes."""
    from ..plans.target import CommitConflict, LocalCowTable

    work = tempfile.mkdtemp(prefix=f"dipper_ccq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=96)
    other = LocalCowTable(spark, table.root)
    ts = dt.datetime(2027, 1, 1)

    def df(rows):
        return spark.createDataFrame(rows, ROWS)

    def inject(action):
        orig = table._commit_merge
        fired = {"done": False}

        def wrapper(*a, **kw):
            if not fired["done"]:
                fired["done"] = True
                action()
            return orig(*a, **kw)

        table._commit_merge = wrapper

    # pick two keys in different buckets
    man = table._load()
    cands = [(f"ccq-{i}", 0) for i in range(40)]
    bs = [r["b"] for r in spark.createDataFrame(cands, "conv_id string, turn_idx long")
          .select(table._bucket_expr(man["n_buckets"]).alias("b")).collect()]
    k1 = cands[0]
    k2 = next(k for k, b in zip(cands[1:], bs[1:]) if b != bs[0])

    # (a) disjoint rebase
    inject(lambda: other.upsert(df([(k2[0], k2[1], "user", "other", ts)])))
    table.upsert(df([(k1[0], k1[1], "user", "main", ts)]))
    snap = {(r["conv_id"], r["turn_idx"]): r["text"] for r in table.snapshot()
            .filter(F.col("conv_id").startswith("ccq-")).collect()}
    api = [e for e in table.ledger() if e["scope"] == "api"]
    a_ok = (snap.get(k1) == "main" and snap.get(k2) == "other"
            and len(api) == 2 and len({e["batch_id"] for e in api}) == 2)

    # (b) overlapping conflict, explicit batch id: loud + clean
    inject(lambda: other.upsert(df([("ccq-ov", 0, "user", "racer", ts)])))
    raised = False
    try:
        table.upsert(df([("ccq-ov", 0, "user", "loser", dt.datetime(2027, 2, 1))]),
                     batch_id=777, scope="explicit")
    except CommitConflict:
        raised = True
    row = table.snapshot().filter("conv_id = 'ccq-ov'").first()
    b_ok = (raised and row["text"] == "racer"
            and all(e["batch_id"] != 777 for e in table.ledger()))

    # (c) overlapping race through the retrying API writer
    inject(lambda: other.upsert(df([("ccq-re", 0, "user", "early", ts)])))
    table.upsert(df([("ccq-re", 0, "user", "late-wins", dt.datetime(2027, 3, 1))]))
    row = table.snapshot().filter("conv_id = 'ccq-re'").first()
    api = [e for e in table.ledger() if e["scope"] == "api"]
    c_ok = (row["text"] == "late-wins"
            and len({e["batch_id"] for e in api}) == len(api))

    return spark.createDataFrame(
        [(a_ok, b_ok, c_ok)],
        "disjoint_rebase_both_visible boolean, "
        "overlap_conflict_loud_and_clean boolean, "
        "retry_converges_unique_ids boolean")


@q("cdc_feed_retention", """
SELECT CAST(1 AS BOOLEAN) AS floor_set_and_dirs_pruned,
       CAST(1 AS BOOLEAN) AS expired_reads_raise,
       CAST(1 AS BOOLEAN) AS floor_read_and_consumers_survive
""")
def cdc_feed_retention(spark, d):
    """Changefeed retention contract (round 5, VERDICT r4 #2):
    expire_changefeed prunes old batch dirs and records per-scope
    floors; expired ranges raise ChangefeedExpiredError on every read
    surface (changefeed full read, too-early since_batch, fresh
    changefeed_stream); reads from the floor and consumers that
    already consumed the expired range keep working, and an
    IncrementalView refreshed across the expiry still equals a full
    recompute."""
    from ..plans.ivm import IncrementalView
    from ..plans.target import ChangefeedExpiredError

    work = tempfile.mkdtemp(prefix=f"dipper_crq_{uuid.uuid4().hex[:6]}_")
    table, stats = _mk_table(spark, work, seed=97, chunk_lsn=150, changefeed=True)
    n_batches = len([s for s in stats if not s.skipped])
    view = IncrementalView(spark, table, os.path.join(work, "view"),
                           ["conv_id"], {"n_turns": "1"})
    view.refresh()  # consume everything BEFORE retention

    out = table.expire_changefeed(keep_last_batches=2)
    tag, floor = next(iter(out["floors"].items()))
    scope_dir = os.path.join(table.root, "_changes", f"scope={tag}")
    dirs = sorted(int(x.split("=")[1]) for x in os.listdir(scope_dir)
                  if x.startswith("batch="))
    pruned_ok = (n_batches >= 3 and floor == n_batches - 2
                 and dirs == [n_batches - 2, n_batches - 1])

    def raises(fn):
        try:
            fn()
            return False
        except ChangefeedExpiredError:
            return True

    raise_ok = (raises(lambda: table.changefeed())
                and raises(lambda: table.changefeed(since_batch=floor - 2))
                and raises(lambda: table.changefeed_stream()))

    floor_batches = sorted(
        r["batch"] for r in table.changefeed(since_batch=floor - 1)
        .select("batch").distinct().collect())
    table.upsert(spark.createDataFrame(
        [("ret-q", 0, "user", "post-expiry", dt.datetime(2027, 1, 1))], ROWS))
    view.refresh()  # consumed range expired -> still refreshes incrementally
    got = view.read().orderBy("conv_id").toPandas()
    want = view.full_recompute().orderBy("conv_id").toPandas()
    survive_ok = (floor_batches == [n_batches - 2, n_batches - 1]
                  and got.shape == want.shape and bool((got.values == want.values).all()))

    return spark.createDataFrame(
        [(pruned_ok, raise_ok, survive_ok)],
        "floor_set_and_dirs_pruned boolean, expired_reads_raise boolean, "
        "floor_read_and_consumers_survive boolean")


@q("cdc_ivm_minmax", """
SELECT CAST(1 AS BOOLEAN) AS bootstrap_equals_recompute,
       CAST(1 AS BOOLEAN) AS clean_inserts_no_rescan,
       CAST(1 AS BOOLEAN) AS retraction_rescan_equals_recompute
""")
def cdc_ivm_minmax(spark, d):
    """IVM MIN/MAX/AVG contract (round 5, VERDICT r4 #3): a view with
    SUM + AVG + MIN/MAX aggregates maintained from the changefeed must
    equal a full recompute (a) at bootstrap, (b) after pure inserts —
    which must fold WITHOUT any base rescan, and (c) after a
    retraction storm that deletes every group's minimum — which must
    rescan exactly the dirty groups and still match."""
    from ..plans.ivm import IncrementalView

    work = tempfile.mkdtemp(prefix=f"dipper_imq_{uuid.uuid4().hex[:6]}_")
    table, _ = _mk_table(spark, work, seed=98, chunk_lsn=300, changefeed=True)
    view = IncrementalView(
        spark, table, os.path.join(work, "view"), ["conv_id"],
        aggs={"n_turns": "1"},
        avgs={"avg_chars": "length(coalesce(text, ''))"},
        extrema={"min_turn": ("min", "turn_idx"),
                 "max_turn": ("max", "turn_idx")})

    def equals_recompute():
        got = view.read().orderBy("conv_id").toPandas().reset_index(drop=True)
        want = view.full_recompute().orderBy("conv_id").toPandas().reset_index(drop=True)
        if got.shape != want.shape:
            return False
        import numpy as np
        for c in got.columns:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            ok = (np.allclose(a.astype(float), b.astype(float), equal_nan=True)
                  if a.dtype.kind in "fiu" else bool((a == b).all()))
            if not ok:
                return False
        return True

    view.refresh()
    boot_ok = equals_recompute()

    conv = table.snapshot().first()["conv_id"]
    table.upsert(spark.createDataFrame(
        [("imq-new", 0, "user", "fresh group", dt.datetime(2027, 1, 1)),
         (conv, 999, "user", "tail turn", dt.datetime(2027, 1, 1))], ROWS))
    out = view.refresh()
    clean_ok = (out["rescanned_groups"] == 0 and equals_recompute()
                and view.read().filter(f"conv_id = '{conv}'")
                .first()["max_turn"] == 999)

    table.delete_where("turn_idx = 0")  # every group's min-turn witness
    out = view.refresh()
    storm_ok = out["rescanned_groups"] > 0 and equals_recompute()

    return spark.createDataFrame(
        [(boot_ok, clean_ok, storm_ok)],
        "bootstrap_equals_recompute boolean, clean_inserts_no_rescan boolean, "
        "retraction_rescan_equals_recompute boolean")
