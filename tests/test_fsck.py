"""fsck (round 5, plans/fsck.py): table integrity checker — healthy
tables report nothing; each planted corruption class surfaces as a
typed finding; the data tier proves bucket placement and live-key
uniqueness with one key-columns scan; fsck never mutates anything.
"""

import datetime as dt
import json
import os
import shutil

from dipper_spark.plans.replay import replay
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _table(spark, tmp_path, **kw):
    spec = ChangelogSpec(seed=79, n_conv=30, extra_rate=1.2, dup_rate=0.1)
    log = str(tmp_path / "log")
    gen_changelog(log, spec)
    t, _ = replay(spark, log, str(tmp_path / "tbl"), n_buckets=8, **kw)
    return t


def _checks(t, data=False):
    return {r["check"] for r in t.fsck(data=data).collect()}


def test_healthy_table_metadata_and_data(spark, tmp_path):
    t = _table(spark, tmp_path, write_mode="mor")
    t.upsert(spark.createDataFrame(
        [("fs-k", 0, "user", "delta", dt.datetime(2028, 7, 1))], ROWS))
    assert _checks(t) == set()
    assert _checks(t, data=True) == set()


def test_missing_and_empty_files_surface(spark, tmp_path):
    t = _table(spark, tmp_path)
    man = t._load()
    rels = [e[0] for es in man["buckets"].values() for e in es]
    os.remove(os.path.join(t.root, rels[0]))
    open(os.path.join(t.root, rels[1]), "w").close()  # truncate
    got = _checks(t)
    assert {"file_missing", "file_empty"} <= got


def test_manifest_tampering_surfaces(spark, tmp_path):
    # chunked replay -> multiple ledger batch ids, so a rewound
    # allocator (scope_seq=1 below) sits behind the max committed id
    t = _table(spark, tmp_path, write_mode="mor", chunk_lsn=400)
    t.upsert(spark.createDataFrame(
        [("fs-t", 0, "user", "delta", dt.datetime(2028, 7, 1))], ROWS))
    mp = t._manifest_path()
    with open(mp) as f:
        man = json.load(f)
    # a file claimed by two buckets + a ledger duplicate + a stale
    # allocator + a dangling stats entry + a delta from the future
    first = man["buckets"]["0"][0]
    man["buckets"]["1"].append(first)
    man["ledger"].append(dict(man["ledger"][0]))
    # 0 means "allocator unused" (explicit-id ledgers don't draw from
    # it) — a REWOUND allocator is a positive value behind the ledger
    scope = man["ledger"][0].get("scope", "default")
    man["ledger"].append({**man["ledger"][0], "batch_id": 7})
    man["scope_seq"] = {scope: 1}
    man["file_stats"]["data/ghost.parquet"] = {"conv": ["a", "b"],
                                               "turn": [0, 1], "rows": 1}
    db, des = next((b, es) for b, es in man["deltas"].items() if es)
    man["deltas"][db] = [[des[0][0], des[0][1], 10_000]]
    with open(mp, "w") as f:
        json.dump(man, f)
    got = _checks(t)
    assert {"file_double_claimed", "ledger_duplicate_batch",
            "scope_seq_behind", "stats_dangling",
            "delta_from_future"} <= got


def test_data_tier_catches_misplaced_rows(spark, tmp_path):
    t = _table(spark, tmp_path)
    man = t._load()
    # swap two buckets' file lists: metadata stays self-consistent, but
    # every row in those files now hashes to the OTHER bucket
    mp = t._manifest_path()
    with open(mp) as f:
        man = json.load(f)
    bs = [b for b, es in man["buckets"].items() if es]
    a, b = bs[0], bs[1]
    man["buckets"][a], man["buckets"][b] = man["buckets"][b], man["buckets"][a]
    with open(mp, "w") as f:
        json.dump(man, f)
    assert _checks(t) == set()  # metadata tier can't see it
    got = t.fsck(data=True).collect()
    assert any(r["check"] == "row_in_wrong_bucket" for r in got)


def test_data_tier_catches_duplicate_live_keys(spark, tmp_path):
    t = _table(spark, tmp_path)
    man = t._load()
    # duplicate one bucket's file under a second name in ANOTHER bucket
    # whose list we replace -> same live keys appear twice
    mp = t._manifest_path()
    with open(mp) as f:
        man = json.load(f)
    bs = [b for b, es in man["buckets"].items() if es]
    src = man["buckets"][bs[0]][0]
    dup_rel = "data/fsck_dup_" + os.path.basename(src[0])
    shutil.copy(os.path.join(t.root, src[0]), os.path.join(t.root, dup_rel))
    man["buckets"][bs[1]] = [[dup_rel, src[1]]]
    # keep the manifest metadata-consistent (prune dropped files' stats)
    # so the METADATA tier passes and the data tier gets to run
    live = {e[0] for es in man["buckets"].values() for e in es}
    man["file_stats"] = {k: v for k, v in man.get("file_stats", {}).items()
                         if k in live}
    with open(mp, "w") as f:
        json.dump(man, f)
    got = t.fsck(data=True).collect()
    assert any(r["check"] == "duplicate_live_keys" for r in got)
    # (the copied rows also sit in the wrong bucket — both findings fire)
    assert any(r["check"] == "row_in_wrong_bucket" for r in got)


def test_data_tier_bucket_sampling(spark, tmp_path):
    t = _table(spark, tmp_path)
    mp = t._manifest_path()
    with open(mp) as f:
        man = json.load(f)
    bs = [b for b, es in man["buckets"].items() if es]
    a, b = bs[0], bs[1]
    man["buckets"][a], man["buckets"][b] = man["buckets"][b], man["buckets"][a]
    with open(mp, "w") as f:
        json.dump(man, f)
    # sampling only untouched buckets sees nothing; sampling a swapped
    # bucket catches the misplacement; an empty-bucket sample is a no-op
    clean = [int(x) for x in bs[2:4]]
    assert {r["check"] for r in t.fsck(data=True, buckets=clean).collect()} \
        == set()
    hit = t.fsck(data=True, buckets=[int(a)]).collect()
    assert any(r["check"] == "row_in_wrong_bucket" for r in hit)
    empty = [bb for bb in range(man["n_buckets"])
             if str(bb) not in man["buckets"]]
    if empty:
        assert t.fsck(data=True, buckets=[empty[0]]).count() == 0
