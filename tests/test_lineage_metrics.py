"""Lineage reconciliation + streaming metrics (SURVEY.md §5, ops C13/C14)."""

from dipper_spark.plans.lineage import MetricsListener, read_lineage
from dipper_spark.plans.replay import replay
from dipper_spark.streaming.ingest import ingest
from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog
from dipper_spark.testkit.oracle import lineage_totals


def test_lineage_reconciles_with_oracle(spark, tmp_path):
    spec = ChangelogSpec(seed=41, n_conv=60, extra_rate=1.5, dup_rate=0.2)
    logical, man = gen_changelog(str(tmp_path / "log"), spec)
    table, stats = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"))
    lin = read_lineage(spark, str(tmp_path / "tbl")).toPandas()
    totals = lineage_totals(logical)
    assert len(lin) == 1
    row = lin.iloc[0]
    assert row["rows_in"] == man["n_delivered"]
    assert row["rows_deduped"] == man["n_dups"]
    # single-batch replay: every unique key applied exactly once
    assert row["rows_applied"] == totals["keys_touched"]
    # inserts+deletes partition the applied keys (empty target: each key
    # becomes either a live insert or a tombstone insert)
    assert row["inserts"] + row["deletes"] == totals["keys_touched"]
    assert row["inserts"] == totals["final_rows"]
    assert row["deletes"] == totals["final_deleted"]
    assert row["conflicts"] == 0
    assert row["offset_min"] is not None and row["offset_max"] is not None


def test_lineage_multi_batch_conflicts(spark, tmp_path):
    spec = ChangelogSpec(seed=43, n_conv=50, extra_rate=2.0, max_disorder_s=86400)
    logical, man = gen_changelog(str(tmp_path / "log"), spec)
    n = man["n_events"]
    table, stats = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"), chunk_lsn=n // 3 + 1)
    lin = read_lineage(spark, str(tmp_path / "tbl")).toPandas()
    assert len(lin) == len([s for s in stats if not s.skipped])
    # with 1-day event-time disorder across LSN chunks, later batches
    # must observe stale losers -> conflicts recorded
    assert lin["rows_in"].sum() == man["n_delivered"]
    assert lin["conflicts"].sum() > 0


def test_streaming_metrics_listener(spark, tmp_path):
    spec = ChangelogSpec(seed=44, n_conv=30, extra_rate=1.0, n_chunks=3)
    gen_changelog(str(tmp_path / "log"), spec)
    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        table, query, stats = ingest(
            spark, str(tmp_path / "log"), str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
            max_files_per_trigger=1,
        )
        # listener delivery is async; give the bus time to drain
        import time

        for _ in range(40):
            if len(listener.progress) >= 3:
                break
            time.sleep(0.25)
    finally:
        spark.streams.removeListener(listener)
    s = listener.summary()
    assert s["batches"] >= 3
    assert s["input_rows"] > 0
    assert all(p["num_input_rows"] >= 0 for p in listener.progress)


def test_rows_bad_and_dead_letter(spark, tmp_path):
    """A corrupted log (malformed JSON payloads + a bogus op) yields
    nonzero rows_bad, a populated dead-letter dir, and totals that
    still reconcile: good rows all accounted for, bad rows excluded."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dipper_spark.plans.lineage import read_dead_letter
    from dipper_spark.testkit.gen import ENVELOPE_ARROW_SCHEMA, gen_logical_log, to_envelope

    spec = ChangelogSpec(seed=45, n_conv=40, extra_rate=1.0)
    logical = gen_logical_log(spec)
    env = to_envelope(logical)
    # corrupt every 10th payload; give one event an invalid op
    bad_mask = env.index % 10 == 3
    env.loc[bad_mask, "payload"] = "{not json"
    env.loc[env.index == 0, "op"] = "X"
    n_bad = int(bad_mask.sum()) + 1
    log_dir = str(tmp_path / "log")
    import os
    os.makedirs(log_dir, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(env, schema=ENVELOPE_ARROW_SCHEMA,
                                        preserve_index=False), log_dir + "/chunk_00000.parquet")

    table, stats = replay(spark, log_dir, str(tmp_path / "tbl"), dead_letter=True)
    lin = read_lineage(spark, str(tmp_path / "tbl")).toPandas()
    assert lin.iloc[0]["rows_bad"] == n_bad
    assert lin.iloc[0]["rows_in"] == len(env) - n_bad  # rows_in counts valid deliveries
    dl = read_dead_letter(spark, str(tmp_path / "tbl")).toPandas()
    assert len(dl) == n_bad
    # the engine state equals the oracle applied to the SURVIVING rows
    from dipper_spark.testkit.oracle import apply_log_pandas, state_hash
    surviving = logical[~logical["lsn"].isin(env.loc[bad_mask, "lsn"]) & (logical["lsn"] != env.iloc[0]["lsn"])]
    oracle = apply_log_pandas(surviving)
    assert state_hash(table.snapshot().toPandas()) == state_hash(oracle)


def test_late_events_counter_across_chunks(spark, tmp_path):
    """With 1-day event-time disorder split into LSN chunks, later
    chunks deliver events older than the running high-water mark minus
    the delay -> late_events > 0 (informational; correctness is
    guard-protected regardless)."""
    spec = ChangelogSpec(seed=46, n_conv=50, extra_rate=2.0, max_disorder_s=86400)
    logical, man = gen_changelog(str(tmp_path / "log"), spec)
    n = man["n_events"]
    table, stats = replay(spark, str(tmp_path / "log"), str(tmp_path / "tbl"),
                          chunk_lsn=n // 3 + 1, watermark_delay="30 seconds")
    lin = read_lineage(spark, str(tmp_path / "tbl")).toPandas().sort_values("batch_id")
    assert lin["late_events"].sum() > 0
    assert lin["late_events"].iloc[0] == 0  # no watermark before batch 0
