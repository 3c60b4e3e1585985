"""Manifest format versioning (ADVICE r2, medium): a v1 table bucketed
with pmod(xxhash64(conv_id), N) must keep being probed with the v1 hash
— touching it with the v2 murmur3(key) hash reads the wrong bucket
files, misses existing keys, and silently duplicates them.  compact()
is the migration: it re-buckets everything and bumps the version.

Also covers the r3 manifest change (schema ids stamped per file at
write time, killing driver-side footer reads) including the legacy
bare-string-entry fallback.
"""

from datetime import datetime

from pyspark.sql import functions as F

from dipper_spark.plans.target import LocalCowTable


def _batch(spark, texts: dict[tuple[str, int], str], lsn0: int, day: int):
    rows = [
        (c, t, "user", txt, lsn0 + i, datetime(2026, 1, day), 1, 1, False)
        for i, ((c, t), txt) in enumerate(sorted(texts.items()))
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx long, role string, text string, "
        "lsn long, ts timestamp, n_events long, n_unique long, is_delete boolean",
    )


def _force_v1_legacy(table: LocalCowTable) -> None:
    """Rewrite the manifest the way a pre-r2 build would have left it:
    format_version 1, bare-string file entries, no schema registry."""
    man = table._load()
    man["format_version"] = 1
    man.pop("schemas", None)
    man["buckets"] = {
        b: [e if isinstance(e, str) else e[0] for e in fs]
        for b, fs in man["buckets"].items()
    }
    table._write_manifest(man)


def test_v1_table_merges_with_v1_hash_then_migrates(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    table = LocalCowTable.create(spark, tbl, n_buckets=8)
    man = table._load()
    man["format_version"] = 1
    man.pop("schemas", None)
    table._write_manifest(man)

    keys = {(f"conv{i:03d}", j): f"v1-{i}-{j}" for i in range(20) for j in range(3)}
    table.merge(_batch(spark, keys, lsn0=0, day=1), batch_id=0, scope="fmt")
    # files must sit in the buckets the V1 hash assigns, else lookup
    # (which prunes to ONE bucket via the manifest's format) misses
    row = table.lookup("conv007", 2).collect()
    assert len(row) == 1 and row[0]["text"] == "v1-7-2"
    assert table._fmt(table._load()) == 1  # merge never silently upgrades

    # simulate a fully legacy manifest (bare-string entries) and merge
    # an overlapping newer batch: every key must be FOUND (updated, not
    # duplicated) — this is exactly the silent-duplication bug the
    # format dispatch prevents
    _force_v1_legacy(table)
    upd = {k: f"v2-{k[0]}-{k[1]}" for k in list(keys)[: len(keys) // 2]}
    st = table.merge(_batch(spark, upd, lsn0=1000, day=2), batch_id=1, scope="fmt")
    assert st.updates == len(upd) and st.inserts == 0
    snap = table.snapshot()
    assert snap.count() == len(keys)  # no duplicate keys
    assert snap.groupBy("conv_id", "turn_idx").count().filter(F.col("count") > 1).count() == 0

    # migration: compact re-buckets with the v2 hash and bumps the format
    n = table.compact()
    assert n > 0
    man = table._load()
    assert man["format_version"] == 2
    for fs in man["buckets"].values():
        for rel, sid in fs:
            assert man["schemas"][sid] == man["schema"]
    assert table.snapshot().count() == len(keys)
    assert table.lookup("conv007", 2).collect()[0]["text"].startswith("v2-")

    # post-migration merges keep working against the v2 layout
    upd2 = {("conv000", 0): "v3"}
    st2 = table.merge(_batch(spark, upd2, lsn0=2000, day=3), batch_id=2, scope="fmt")
    assert st2.updates == 1 and st2.inserts == 0
    assert table.snapshot().count() == len(keys)


def test_bucket_expr_dispatch(spark):
    df = spark.createDataFrame([("abc", 5)], "conv_id string, turn_idx long")
    v1 = df.select(LocalCowTable._bucket_expr(8, 1).alias("b")).first()["b"]
    ref = df.select(F.pmod(F.xxhash64("conv_id"), F.lit(8)).cast("int").alias("b")).first()["b"]
    assert v1 == ref
    v2 = df.select(LocalCowTable._bucket_expr(8, 2).alias("b")).first()["b"]
    ref2 = df.select(
        F.pmod(F.hash("conv_id", F.col("turn_idx").cast("long")), F.lit(8)).cast("int").alias("b")
    ).first()["b"]
    assert v2 == ref2
