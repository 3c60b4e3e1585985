"""Per-file conv_id Bloom filters (round 5): compute_stats() is the
Iceberg `compute_table_stats` analog (Puffin blob shape) — a
maintenance action, NOT a write-path cost — that lets conv-only
lookups skip base files at planning time.  On a hash-bucketed layout
a base file's conv RANGE is ~the whole conv universe (hashing mixes
conversations), so min/max alone never prunes base files; the Bloom
does.  Invariants pinned here:

  * no false negatives ever (a pruned manifest keeps every file that
    holds the conv; lookups stay exact);
  * real pruning (an absent conv *inside* the global conv range drops
    files that range stats must keep);
  * idempotent + compaction-aware (new files are picked up by the next
    run; dropped files' blooms die with their stats entries);
  * commutes with concurrent writers (only adds entries for files
    still live at commit time).
"""

import datetime as dt
import json

import pytest

from dipper_spark.plans.replay import replay
from dipper_spark.plans.target import (
    LocalCowTable, _bloom_build, _bloom_maybe_contains, _bloom_probes)
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

ROWS = "conv_id string, turn_idx long, role string, text string, ts timestamp"


def _table(spark, tmp_path, **kw):
    spec = ChangelogSpec(seed=93, n_conv=60, extra_rate=1.5, dup_rate=0.1)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "tbl"),
                      chunk_lsn=400, n_buckets=32, **kw)
    return table


def _all_rels(man):
    rels = [rel for rel, _sid in LocalCowTable._entries(man)]
    rels += [rel for rel, _sid, _seq in LocalCowTable._delta_entries(man)]
    return rels


def _kept_files(table, man, conv):
    pruned = table._prune_man_by_conv(man, conv)
    return set(_all_rels(pruned))


# ---------------- pure bloom kernel ----------------

def test_bloom_kernel_no_false_negatives_and_sane_fpp():
    vals = [f"conv{i:08d}" for i in range(500)]
    bl = _bloom_build(vals)
    assert bl["n"] == 500 and bl["m"] >= 10 * 500 / 2  # power-of-2 round
    assert all(_bloom_maybe_contains(bl, v) for v in vals)
    # fpp over 10k absent probes stays in the designed ballpark
    fp = sum(_bloom_maybe_contains(bl, f"absent{i:08d}") for i in range(10000))
    assert fp < 500  # <5% — design target ~1.2% with headroom
    # deterministic probes (manifest blooms are read by other processes)
    assert _bloom_probes("conv00000001", 1 << 12) == _bloom_probes(
        "conv00000001", 1 << 12)


def test_bloom_kernel_edges():
    assert _bloom_build([]) is None
    assert _bloom_build([None]) is None
    sat = _bloom_build([f"c{i}" for i in range(9000)])
    assert sat == {"m": 0, "n": 9000}
    # absent / saturated blooms never prune
    assert _bloom_maybe_contains(None, "x")
    assert _bloom_maybe_contains(sat, "x")
    # blooms survive a manifest JSON round-trip bit-exactly
    bl = _bloom_build(["a", "b", "c"])
    bl2 = json.loads(json.dumps(bl))
    assert _bloom_maybe_contains(bl2, "a") and _bloom_maybe_contains(bl2, "c")


# ---------------- table integration ----------------

@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_compute_stats_covers_every_live_file(spark, tmp_path, mode):
    table = _table(spark, tmp_path, write_mode=mode)
    res = table.compute_stats()
    man = table._load()
    rels = _all_rels(man)
    assert res["computed"] == len(rels) and res["saturated"] == 0
    assert all("bloom" in man["file_stats"][r] for r in rels)
    # idempotent: second run reads nothing, commits nothing
    v = man["version"]
    res2 = table.compute_stats()
    assert res2["computed"] == 0
    assert table._load()["version"] == v


def test_bloom_prunes_absent_conv_and_never_present_conv(spark, tmp_path):
    table = _table(spark, tmp_path)
    man0 = table._load()
    total = len(_all_rels(man0))
    present = "conv00000007"
    # absent conv INSIDE the global conv range: min/max prunes only the
    # files whose local range happens to miss it — the bloom must beat
    # that baseline strictly
    absent = "conv00000007x"
    range_only = len(_kept_files(table, man0, absent))
    assert range_only > total // 2  # ranges alone leave most files
    table.compute_stats()
    man = table._load()
    kept_absent = _kept_files(table, man, absent)
    assert len(kept_absent) < range_only  # bloom pruned base files
    # no false negatives: every file actually holding `present` is kept
    from pyspark.sql import functions as F
    kept_present = _kept_files(table, man, present)
    got = table.lookup(present).orderBy("turn_idx").toPandas()
    want = (table.snapshot().filter(F.col("conv_id") == present)
            .orderBy("turn_idx").toPandas())
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    assert len(want) > 0 and len(kept_present) >= 1
    # and the absent conv still reads as absent (exactness under pruning)
    assert table.lookup(absent).count() == 0


def test_compaction_invalidates_then_recomputes(spark, tmp_path):
    table = _table(spark, tmp_path, write_mode="mor")
    table.compute_stats()
    table.compact()
    man = table._load()
    rels = _all_rels(man)
    # compacted files are new -> no blooms yet; stats map carries no
    # dead keys (dropped files' blooms died with their entries)
    assert set(man["file_stats"]) == set(rels)
    assert all("bloom" not in man["file_stats"][r] for r in rels)
    res = table.compute_stats()
    assert res["computed"] == len(rels)
    man2 = table._load()
    assert all("bloom" in man2["file_stats"][r] for r in rels)


def test_upsert_after_analyze_keeps_lookup_exact(spark, tmp_path):
    table = _table(spark, tmp_path, write_mode="mor")
    table.compute_stats()
    conv = "conv00000003"
    table.upsert(table.spark.createDataFrame(
        [(conv, 0, "user", "fresh", dt.datetime(2028, 1, 1))], ROWS))
    # the new delta file has no bloom yet -> never pruned; winner visible
    assert table.lookup(conv, 0).first()["text"] == "fresh"
    # advisor flags nothing yet (1 unbloomed file out of many), but a
    # compact (all files fresh) flips the coverage recommendation on
    table.compact()
    acts = [r["action"] for r in table.advise().collect()]
    assert "analyze" in acts
    table.compute_stats()
    acts2 = [r["action"] for r in table.advise().collect()]
    assert "analyze" not in acts2
