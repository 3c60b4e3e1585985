"""Row-level changefeed OUT (round 4 — CDC in both directions): a
changefeed-enabled table emits its applied changes per merge under
_changes/scope=<tag>/batch=<id>, exactly-once like the table itself.

The defining property: replaying the feed in (batch, change_lsn)
order against an empty dict reproduces the table snapshot exactly —
so a downstream consumer (e.g. an incremental training-data pipeline)
that tails `changefeed(since_batch=k)` converges to the same state as
re-reading the whole table.
"""

import pandas as pd

from dipper_spark.plans.replay import replay
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import SPEC_COLUMNS, apply_log_pandas


def _apply_feed(feed: pd.DataFrame) -> dict:
    state: dict = {}
    for _, r in feed.sort_values(["batch", "change_lsn"]).iterrows():
        k = (r["conv_id"], int(r["turn_idx"]))
        if r["change_op"] == "D":
            state.pop(k, None)
        else:
            state[k] = (r["role"], r["text"], r.get("tool"))
    return state


def test_changefeed_reconstructs_snapshot(spark, tmp_path):
    spec = ChangelogSpec(seed=41, n_conv=80, extra_rate=1.8, dup_rate=0.15, hot_frac=0.3)
    log_dir = str(tmp_path / "log")
    logical, man = gen_changelog(log_dir, spec)
    # chunk_lsn splits the replay into several batches -> several
    # changefeed partitions, exercising the incremental shape
    table, stats = replay(spark, log_dir, str(tmp_path / "tbl"),
                          chunk_lsn=400, changefeed=True)
    n_batches = len([s for s in stats if not s.skipped])
    assert n_batches >= 3

    feed = table.changefeed().toPandas()
    # partition columns present for pruning-based incremental reads
    assert {"scope", "batch", "change_op", "change_ts", "change_lsn"} <= set(feed.columns)
    assert feed["batch"].nunique() == n_batches

    # feed counts reconcile with per-merge stats
    by_op = feed["change_op"].value_counts().to_dict()
    assert by_op.get("I", 0) == sum(s.inserts for s in stats)
    assert by_op.get("U", 0) == sum(s.updates for s in stats)
    assert by_op.get("D", 0) == sum(s.deletes for s in stats)

    # replaying the feed == oracle final state
    oracle = apply_log_pandas(logical)
    want = {(r["conv_id"], int(r["turn_idx"])): (r["role"], r["text"], r["tool"])
            for _, r in oracle.iterrows()}
    got = _apply_feed(feed)
    assert got == want

    # incremental read: since_batch prunes whole batches
    later = table.changefeed(since_batch=0).toPandas()
    assert set(later["batch"].unique()) == set(feed["batch"].unique()) - {0}


def test_changefeed_idempotent_replay_no_duplicates(spark, tmp_path):
    spec = ChangelogSpec(seed=43, n_conv=40, extra_rate=1.0)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "tbl"), changefeed=True)
    n1 = table.changefeed().count()
    # replayed batch: ledger-skipped, feed must NOT grow or rewrite
    table2, stats2 = replay(spark, log_dir, str(tmp_path / "tbl"), changefeed=True)
    assert all(s.skipped for s in stats2)
    assert table2.changefeed().count() == n1


def test_changefeed_disabled_by_default(spark, tmp_path):
    import pytest

    spec = ChangelogSpec(seed=44, n_conv=20, extra_rate=0.5)
    log_dir = str(tmp_path / "log")
    gen_changelog(log_dir, spec)
    table, _ = replay(spark, log_dir, str(tmp_path / "tbl"))
    with pytest.raises(FileNotFoundError):
        table.changefeed()


def test_changefeed_stream_consumer(spark, tmp_path):
    """Downstream-consumer shape: tail the changefeed as a Structured
    Stream and keep a derived state in sync — after draining, the
    consumer's reduced state equals the table snapshot, and a SECOND
    producer batch arrives as incremental stream input (not a re-read
    of the whole feed)."""
    import os

    spec = ChangelogSpec(seed=45, n_conv=60, extra_rate=1.5, dup_rate=0.1)
    log_dir = str(tmp_path / "log")
    logical, man = gen_changelog(log_dir, spec)
    # producer commit 1: one replay batch -> one changefeed batch dir;
    # the incremental step below re-applies the log under a SECOND
    # scope (streaming ingest) to produce new batch dirs
    table, stats1 = replay(spark, log_dir, str(tmp_path / "tbl"), changefeed=True)
    n_feed1 = table.changefeed().count()

    def drain():
        # foreachBatch (not the memory sink): it supports checkpoint
        # RECOVERY, which the incremental step below depends on
        rows: list = []
        q = (table.changefeed_stream(max_files_per_trigger=8)
             .writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
             .option("checkpointLocation", str(tmp_path / "consumer_ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return rows

    got1 = drain()
    assert len(got1) == n_feed1
    # consumer state == snapshot (reduce by (batch, change_lsn))
    state: dict = {}
    for r in sorted(got1, key=lambda r: (r["batch"], r["change_lsn"])):
        k = (r["conv_id"], r["turn_idx"])
        if r["change_op"] == "D":
            state.pop(k, None)
        else:
            state[k] = r["text"]
    assert len(state) == table.snapshot().count()

    # incremental: a new commit under a fresh scope adds change files;
    # the SAME consumer checkpoint sees only the new rows
    table2, stats2 = replay(spark, log_dir, str(tmp_path / "tbl"),
                            changefeed=True)  # same scope -> all skipped
    assert all(s.skipped for s in stats2)
    from dipper_spark.streaming.ingest import ingest
    t3, _, stats3 = ingest(spark, log_dir, str(tmp_path / "tbl"),
                           str(tmp_path / "ckpt2"), changefeed=True)
    new_rows = table.changefeed().count() - n_feed1
    assert new_rows >= 0  # redelivery under a new scope: conflicts -> few/no changes
    got2 = drain()
    assert len(got2) == new_rows  # only the NEW batch dirs were read


def test_changefeed_across_schema_evolution(spark, tmp_path):
    """Batches emitted BEFORE an ADD-column evolution lack the new
    column; the feed read must mergeSchema so the evolved column
    survives (nulls for old batches) and feed-replay still reproduces
    the snapshot — including the evolved column."""
    from pyspark.sql import functions as F

    from dipper_spark.testkit.gen import ChangelogSpec as CS

    spec = CS(seed=46, n_conv=60, extra_rate=1.0, evolution_lsn_frac=0.5,
              shuffle_window=5)
    log_dir = str(tmp_path / "log")
    logical, man = gen_changelog(log_dir, spec)
    table, stats = replay(spark, log_dir, str(tmp_path / "tbl"),
                          chunk_lsn=man["n_events"] // 4 + 1, changefeed=True)
    feed = table.changefeed()
    assert "tool" in feed.columns  # evolved column present despite v1-only batches
    assert "tool" in feed.select("before.*").columns
    # reduce feed per key -> equals snapshot incl. the evolved column
    ordk = F.struct(F.col("batch"), F.col("change_lsn"))
    val = F.struct(*[F.col(c) for c in ["change_op", "role", "text", "tool", "ts"]])
    last = feed.groupBy("conv_id", "turn_idx").agg(F.max_by(val, ordk).alias("_w"))
    replayed = (last.filter(F.col("_w.change_op") != "D")
                .select("conv_id", "turn_idx", "_w.role", "_w.text", "_w.tool", "_w.ts")
                .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    snap = (table.snapshot().select("conv_id", "turn_idx", "role", "text", "tool", "ts")
            .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(replayed, snap, check_dtype=False)
