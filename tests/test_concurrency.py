"""Concurrency control on LocalCowTable (round 5, VERDICT r4 #1).

The commit protocol is optimistic (Iceberg's model): Spark work runs
against the manifest version read at start; the commit — file renames
+ manifest swap — is a flock-guarded metadata critical section that
validates nothing this writer read was changed by a concurrent commit,
rebases onto the latest manifest when commits commute (disjoint
buckets / ledger-append), and raises CommitConflict otherwise.

Covered here:
  * deterministic rebase: a commit lands between a writer's read and
    its commit but touches DISJOINT buckets -> both commits survive,
    nothing lost, batch ids never collide;
  * deterministic conflict: the interleaved commit touches the SAME
    bucket -> CommitConflict for an explicit-batch-id writer; the
    self-rederiving API writers retry and converge;
  * threaded stress: concurrent upsert/delete writers in one process
    (the driver JVM is shared, like concurrent jobs on one cluster);
  * process stress (slow): two separate Spark drivers writing the same
    table root — the full multi-writer story the flock serializes;
  * per-scope batch-id monotonicity across LEDGER_CAP trimming
    (ADVICE r4: trimmed ledgers must never restart ids — a restarted
    id overwrites its old _changes/ dir and is skipped by consumers).
"""

import datetime as dt
import os
import subprocess
import sys
import threading

import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import CommitConflict, LocalCowTable
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

TS = dt.datetime(2026, 6, 1, 12, 0, 0)
ROWS_SCHEMA = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _table(spark, tmp_path, **kw):
    spec = ChangelogSpec(seed=60, n_conv=30, extra_rate=1.0, dup_rate=0.05)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "tbl"), **kw)
    return table


def _df(spark, rows):
    return spark.createDataFrame(rows, ROWS_SCHEMA)


def _inject_before_commit(table, action):
    """Run `action` once, right before the table's next locked commit —
    a deterministic interleaving (no sleeps, no timing flake)."""
    orig = table._commit_merge
    fired = {"done": False}

    def wrapper(*args, **kwargs):
        if not fired["done"]:
            fired["done"] = True
            action()
        return orig(*args, **kwargs)

    table._commit_merge = wrapper


def _buckets_of(table, keys):
    man = table._load()
    df = table.spark.createDataFrame(keys, "conv_id string, turn_idx long")
    expr = table._bucket_expr(man["n_buckets"], table._fmt(man))
    return [r["b"] for r in df.select(expr.alias("b")).collect()]


def _two_keys_distinct_buckets(table):
    """Two synthetic keys guaranteed to land in different buckets."""
    cands = [(f"cc-conv-{i}", 0) for i in range(40)]
    bs = _buckets_of(table, cands)
    first = cands[0]
    for k, b in zip(cands[1:], bs[1:]):
        if b != bs[0]:
            return first, k
    raise AssertionError("40 candidate keys all hashed to one bucket?!")


def test_disjoint_commits_rebase_not_conflict(spark, tmp_path):
    """A concurrent commit to DIFFERENT buckets lands between read and
    commit: the second writer rebases onto it — both rows visible,
    both ledger entries kept, distinct batch ids, no retry needed."""
    table = _table(spark, tmp_path)
    other = LocalCowTable(spark, table.root)
    k1, k2 = _two_keys_distinct_buckets(table)

    _inject_before_commit(
        table, lambda: other.upsert(
            _df(spark, [(k2[0], k2[1], "user", "from-other", TS)])))
    st = table.upsert(_df(spark, [(k1[0], k1[1], "user", "from-main", TS)]))
    assert st.rows_applied == 1 and not st.skipped

    snap = table.snapshot().toPandas().set_index(["conv_id", "turn_idx"])
    assert snap.loc[k1, "text"] == "from-main"
    assert snap.loc[k2, "text"] == "from-other"
    ledger = table.ledger()
    api = [e for e in ledger if e["scope"] == "api"]
    assert len(api) == 2
    assert len({e["batch_id"] for e in api}) == 2  # commit-time re-allocation
    # both changefeed-less here; scope_seq advanced past both
    assert table._load()["scope_seq"]["api"] == max(e["batch_id"] for e in api) + 1


def test_overlapping_commit_conflicts_for_explicit_batch_id(spark, tmp_path):
    """A concurrent commit to the SAME key (same bucket) invalidates
    the files this merge joined against: explicit-batch-id writers
    (the CDC path — single-writer per scope by contract) get a loud
    CommitConflict, never a silent lost update."""
    table = _table(spark, tmp_path)
    other = LocalCowTable(spark, table.root)
    k = ("cc-overlap", 0)

    _inject_before_commit(
        table, lambda: other.upsert(
            _df(spark, [(k[0], k[1], "user", "racer", TS)])))
    with pytest.raises(CommitConflict):
        table.upsert(_df(spark, [(k[0], k[1], "user", "loser", dt.datetime(2026, 6, 2))]),
                     batch_id=777, scope="explicit")
    # nothing from the failed commit leaked
    snap = table.snapshot().toPandas().set_index(["conv_id", "turn_idx"])
    assert snap.loc[k, "text"] == "racer"
    assert all(e["batch_id"] != 777 for e in table.ledger())


def test_api_upsert_retries_conflict_and_converges(spark, tmp_path):
    """The API writers re-derive from fresh state on conflict: an
    upsert that raced a same-bucket commit retries and the final state
    is the LWW merge of BOTH writes."""
    table = _table(spark, tmp_path)
    other = LocalCowTable(spark, table.root)
    k = ("cc-retry", 0)

    _inject_before_commit(
        table, lambda: other.upsert(
            _df(spark, [(k[0], k[1], "user", "earlier-racer", TS)])))
    st = table.upsert(_df(spark, [(k[0], k[1], "user", "later-wins",
                                   dt.datetime(2026, 6, 3))]))
    assert st.rows_applied == 1
    snap = table.snapshot().toPandas().set_index(["conv_id", "turn_idx"])
    assert snap.loc[k, "text"] == "later-wins"
    api = [e for e in table.ledger() if e["scope"] == "api"]
    assert len(api) == 2 and len({e["batch_id"] for e in api}) == 2


def test_threaded_writers_no_lost_update(spark, tmp_path):
    """3 upsert writers + 1 predicate-delete writer, interleaved
    threads, one table: every writer's final batch must be fully
    visible (a manifest read-modify-write race would silently drop
    whole batches), ledger ids unique per scope."""
    table = _table(spark, tmp_path)
    # seed keys the delete writer will tombstone
    table.upsert(_df(spark, [(f"del-{i}", 0, "user", "doomed", TS) for i in range(8)]))

    n_batches, per = 3, 6
    errors: list = []

    def upserter(tag):
        try:
            h = LocalCowTable(spark, table.root)
            for b in range(n_batches):
                rows = [(f"{tag}-{i}", 0, "user", f"{tag}-b{b}",
                         dt.datetime(2026, 6, 1, 12, b)) for i in range(per)]
                h.upsert(_df(spark, rows), scope=f"w-{tag}")
        except Exception as e:  # surface in main thread
            errors.append(e)

    def deleter():
        try:
            LocalCowTable(spark, table.root).delete_where(
                "conv_id like 'del-%'", scope="w-del")
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=upserter, args=(t,)) for t in ("ta", "tb", "tc")]
    threads.append(threading.Thread(target=deleter))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    snap = table.snapshot().toPandas().set_index(["conv_id", "turn_idx"])
    for tag in ("ta", "tb", "tc"):
        for i in range(per):
            assert snap.loc[(f"{tag}-{i}", 0), "text"] == f"{tag}-b{n_batches - 1}", \
                f"lost update for writer {tag} key {i}"
    assert not any(str(ix[0]).startswith("del-") for ix in snap.index)
    ledger = table.ledger()
    for tag in ("ta", "tb", "tc"):
        ids = [e["batch_id"] for e in ledger if e["scope"] == f"w-{tag}"]
        assert sorted(ids) == list(range(n_batches))


@pytest.mark.slow
def test_two_driver_processes_no_lost_update(spark, tmp_path):
    """Two SEPARATE Spark drivers (own JVMs) write the same table root
    concurrently — the flock serializes commits across processes."""
    table = _table(spark, tmp_path)
    script = os.path.join(os.path.dirname(__file__), "_concurrent_writer.py")
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
               DIPPER_DRIVER_MEM="3g")
    procs = [
        subprocess.Popen([sys.executable, script, table.root, tag, "3", "5"],
                         env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for tag in ("pa", "pb")
    ]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs

    snap = table.snapshot().toPandas().set_index(["conv_id", "turn_idx"])
    for tag in ("pa", "pb"):
        for i in range(5):
            assert snap.loc[(f"{tag}-{i}", 0), "text"] == f"{tag}-b2", \
                f"lost update from process {tag}"
    for tag in ("pa", "pb"):
        ids = [e["batch_id"] for e in table.ledger() if e["scope"] == f"proc-{tag}"]
        assert sorted(ids) == [0, 1, 2]


def test_batch_ids_survive_ledger_trim(spark, tmp_path, monkeypatch):
    """ADVICE r4 (medium): with the ledger trimmed below a scope's
    history, the per-scope manifest sequence must keep ids monotonic —
    never restart at 0 (which would overwrite _changes/ dirs and be
    invisible to consumers whose watermark passed it)."""
    monkeypatch.setattr(LocalCowTable, "LEDGER_CAP", 3)
    table = _table(spark, tmp_path, changefeed=True)
    table.upsert(_df(spark, [("seq-a", 0, "user", "a0", TS)]), scope="scope-a")
    # flood scope-b so scope-a's ledger entry is evicted
    for b in range(4):
        table.upsert(_df(spark, [("seq-b", 0, "user", f"b{b}",
                                  dt.datetime(2026, 6, 1, 12, b))]), scope="scope-b")
    assert all(e["scope"] != "scope-a" for e in table.ledger())  # evicted
    st = table.upsert(_df(spark, [("seq-a2", 0, "user", "a1",
                                   dt.datetime(2026, 6, 2))]), scope="scope-a")
    assert st.batch_id == 1, "id restarted after ledger trim"
    tag = LocalCowTable._scope_tag("scope-a")
    dirs = sorted(os.listdir(os.path.join(table.root, "_changes", f"scope={tag}")))
    assert dirs == ["batch=0", "batch=1"], dirs


def test_upsert_same_key_same_ts_tie_is_deterministic(spark, tmp_path):
    """VERDICT r4 'what's wrong' #5: equal-ts upserts with different
    payloads tie-break on the content-hash lsn — the SAME winner in
    either arrival order (replay-stable), and a byte-identical
    re-upsert is a no-op under the strict guard."""
    rows_x = [("tie", 7, "user", "payload-x", TS)]
    rows_y = [("tie", 7, "user", "payload-y", TS)]

    winners = []
    for order in ((rows_x, rows_y), (rows_y, rows_x)):
        t = LocalCowTable.create(spark, str(tmp_path / f"tie{len(winners)}"), n_buckets=4)
        for r in order:
            t.upsert(_df(spark, r))
        winners.append(t.snapshot().first()["text"])
    assert winners[0] == winners[1], "tie winner depends on arrival order"

    # identical re-upsert: rejected by the strict (ts, lsn) guard
    t = LocalCowTable.create(spark, str(tmp_path / "tie-idem"), n_buckets=4)
    t.upsert(_df(spark, rows_x))
    st = t.upsert(_df(spark, rows_x))
    assert st.rows_applied == 0 and st.conflicts == 1
