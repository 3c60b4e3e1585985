"""IcebergTable.merge SQL — the sandbox has no Iceberg runtime
(SURVEY.md §0.3), so the prod path is validated at the SQL level:
the statement must PARSE as Spark SQL and must mirror
LocalCowTable.merge's semantics clause by clause (struct-comparison
guard, tombstones on delete incl. NOT-MATCHED deletes, explicit
column mappings for the system columns).
"""

import re

import pytest

from dipper_spark.operators.cdc import CARRY_COLUMNS
from dipper_spark.plans.target import IcebergTable
from dipper_spark.schemas import KEY_COLUMNS


SOURCE_COLS = KEY_COLUMNS + CARRY_COLUMNS + ["n_events", "n_unique", "is_delete"]


def _sql(spark) -> str:
    return IcebergTable(spark, "lake.db.transcripts").merge_sql(SOURCE_COLS)


def test_merge_sql_parses(spark):
    """The statement is valid Spark SQL (ParseException otherwise).
    Analysis needs a real catalog; parsing does not."""
    sql = _sql(spark)
    parser = spark._jsparkSession.sessionState().sqlParser()
    parser.parsePlan(sql)  # raises on syntax errors


def test_merge_sql_guard_is_struct_comparison(spark):
    sql = _sql(spark)
    assert "struct(s.ts, s.lsn) > struct(t._op_ts, t._lsn)" in sql
    # the invalid tuple spelling must NOT appear
    assert "(s.ts, s.lsn) > (t._op_ts, t._lsn)" not in sql.replace(
        "struct(s.ts, s.lsn) > struct(t._op_ts, t._lsn)", "")


def test_merge_sql_tombstones_not_deletes(spark):
    sql = _sql(spark)
    assert "THEN DELETE" not in sql  # tombstone, never physical delete
    assert "t._deleted = s.is_delete" in sql
    # data columns nulled when the winner is a delete
    assert "t.text = CASE WHEN s.is_delete THEN NULL ELSE s.text END" in sql
    # NOT MATCHED has no `AND NOT s.is_delete` filter: a delete for an
    # absent key must INSERT a tombstone so staler events can't
    # resurrect it (mirrors LocalCowTable `_del` path)
    m = re.search(r"WHEN NOT MATCHED(.*?)THEN INSERT", sql, re.S)
    assert m and "is_delete" not in m.group(1)


def test_merge_sql_explicit_column_mappings(spark):
    sql = _sql(spark)
    assert "UPDATE SET *" not in sql and "INSERT *" not in sql
    assert "t._op_ts = s.ts" in sql and "t._lsn = s.lsn" in sql
    m = re.search(r"INSERT \(([^)]*)\)", sql)
    cols = [c.strip() for c in m.group(1).split(",")]
    for c in ["conv_id", "turn_idx", "role", "text", "tool", "ts",
              "_op_ts", "_lsn", "_deleted"]:
        assert c in cols, f"INSERT list missing {c}"
    # engine metadata never lands on the target
    for c in ["op", "lsn", "is_delete", "n_events", "n_unique"]:
        assert c not in cols, f"INSERT list leaks metadata col {c}"


def test_merge_sql_no_dangling_source_refs(spark):
    """Every s.<col> referenced exists in the source projection."""
    sql = _sql(spark)
    refs = set(re.findall(r"s\.(\w+)", sql))
    assert refs <= set(SOURCE_COLS), refs - set(SOURCE_COLS)


def test_merge_sql_no_data_columns_still_parses(spark):
    """A source carrying ONLY keys + engine metadata (no data columns)
    must still produce valid SQL — the pre-r3 builder emitted
    'UPDATE SET , t.ts = ...' here (ADVICE r2, low)."""
    cols = KEY_COLUMNS + ["ts", "lsn", "is_delete", "n_events", "n_unique"]
    sql = IcebergTable(spark, "lake.db.transcripts").merge_sql(cols)
    assert "SET ," not in sql and ", ," not in sql
    parser = spark._jsparkSession.sessionState().sqlParser()
    parser.parsePlan(sql)  # raises on syntax errors


# ---- round 4: marker path + MARKER_SCAN window logic (VERDICT r3 #8).
# No Iceberg runtime exists here, so the snapshot-summary machinery is
# exercised against a mocked snapshots table + a recording fake session:
# the scan SQL itself must parse, _seen must honor the bounded window,
# and merge() must (a) skip when the marker is present, (b) fall back
# to an unmarked MERGE when the CommitMetadata JVM bridge is absent.


class _FakeSpark:
    """Records sql() calls; returns canned rows for the snapshots scan."""

    def __init__(self, snapshot_summaries):
        self._summaries = snapshot_summaries  # newest-first, like ORDER BY DESC
        self.sql_calls = []

    def sql(self, stmt):
        self.sql_calls.append(stmt)
        if ".snapshots" in stmt:
            import re as _re

            limit = int(_re.search(r"LIMIT (\d+)", stmt).group(1))

            class _Res:
                def __init__(self, rows):
                    self._rows = rows

                def collect(self):
                    return self._rows

            return _Res([{"summary": s} for s in self._summaries[:limit]])
        return None  # the MERGE itself

    @property
    def _jvm(self):
        raise RuntimeError("no JVM bridge in fake session")


def test_seen_scan_sql_parses(spark):
    """The snapshots-summary scan is valid Spark SQL."""
    parser = spark._jsparkSession.sessionState().sqlParser()
    parser.parsePlan(
        f"SELECT summary FROM lake.db.transcripts.snapshots "
        f"ORDER BY committed_at DESC LIMIT {IcebergTable.MARKER_SCAN}")


def test_seen_finds_marker_in_window():
    fake = _FakeSpark([
        {"dipper.scope": "ckptA", "dipper.batch_id": "7"},
        {"other": "x"},
        {"dipper.scope": "ckptA", "dipper.batch_id": "3"},
    ])
    t = IcebergTable(fake, "lake.db.transcripts")
    assert t._seen(3, "ckptA") is True
    assert t._seen(3, "ckptB") is False     # scope mismatch
    assert t._seen(4, "ckptA") is False     # batch mismatch
    assert t._seen(3, "default") is False


def test_seen_window_is_bounded():
    """A marker older than MARKER_SCAN snapshots is legitimately not
    seen (re-merge is a (ts,lsn)-guard no-op) — and the scan must ask
    the catalog for exactly the bounded LIMIT, not the full history."""
    old_marker = {"dipper.scope": "ckptA", "dipper.batch_id": "1"}
    history = [{"noise": str(i)} for i in range(IcebergTable.MARKER_SCAN)] + [old_marker]
    fake = _FakeSpark(history)
    t = IcebergTable(fake, "lake.db.transcripts")
    assert t._seen(1, "ckptA") is False
    assert f"LIMIT {IcebergTable.MARKER_SCAN}" in fake.sql_calls[-1]


def test_merge_skips_seen_batch_and_falls_back_unmarked(spark):
    """merge(): (a) a marked (scope, batch_id) issues NO MERGE; (b) an
    unseen batch with no JVM bridge still runs the MERGE (unmarked
    fallback — correctness rests on the (ts, lsn) guard)."""
    src = spark.createDataFrame(
        [("c1", 0, "u", "hi", None, None, 1, True, 1, 1)],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, lsn long, is_delete boolean, n_events long, n_unique long")

    seen = _FakeSpark([{"dipper.scope": "ck", "dipper.batch_id": "5"}])
    t = IcebergTable(seen, "lake.db.transcripts")
    # _seen short-circuits BEFORE any view registration or SQL
    t.merge(src, batch_id=5, scope="ck")
    assert not any("MERGE INTO" in s for s in seen.sql_calls)

    unseen = _FakeSpark([])
    t2 = IcebergTable(unseen, "lake.db.transcripts")
    t2.merge(src, batch_id=6, scope="ck")
    merges = [s for s in unseen.sql_calls if "MERGE INTO" in s]
    assert len(merges) == 1  # fallback executed the statement unmarked


def test_create_sql_parses_and_mirrors_layout(spark):
    """CREATE TABLE DDL (round 4): parses as Spark SQL and pins the
    scale-relevant choices — bucket partitioning, format v2,
    merge-on-read write modes, hash distribution, in-table system
    columns."""
    sql = IcebergTable(spark, "lake.db.transcripts").create_sql(
        n_buckets=64, extra_data_cols={"meta_tokens": "INT"})
    parser = spark._jsparkSession.sessionState().sqlParser()
    parser.parsePlan(sql)  # raises on syntax errors
    assert "PARTITIONED BY (bucket(64, conv_id))" in sql
    assert "'format-version' = '2'" in sql
    for mode in ("delete", "update", "merge"):
        assert f"'write.{mode}.mode' = 'merge-on-read'" in sql
    assert "'write.distribution-mode' = 'hash'" in sql
    for col in ("_op_ts TIMESTAMP", "_lsn BIGINT", "_deleted BOOLEAN",
                "conv_id STRING NOT NULL", "turn_idx INT NOT NULL",
                "meta_tokens INT"):
        assert col in sql, f"DDL missing {col}"


# ---- round 5: optimistic-commit retry wrapper (VERDICT r4 #8) ----

def test_commit_retry_retries_retryable_then_succeeds():
    t = IcebergTable(_FakeSpark([]), "lake.db.transcripts")
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError(
                "org.apache.iceberg.exceptions.CommitFailedException: "
                "Cannot commit: stale table metadata")

    t._run_with_commit_retries(flaky, 9, "ck")
    assert calls["n"] == 3


def test_commit_retry_propagates_non_retryable_first_failure():
    t = IcebergTable(_FakeSpark([]), "lake.db.transcripts")
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise RuntimeError("AnalysisException: cannot resolve 'nope'")

    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="cannot resolve"):
        t._run_with_commit_retries(broken, 9, "ck")
    assert calls["n"] == 1  # genuine errors never re-run the MERGE


def test_commit_retry_exhausts_and_raises_last():
    t = IcebergTable(_FakeSpark([]), "lake.db.transcripts")
    calls = {"n": 0}

    def always():
        calls["n"] += 1
        raise RuntimeError("ValidationException: found conflicting files")

    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="ValidationException"):
        t._run_with_commit_retries(always, 9, "ck")
    assert calls["n"] == IcebergTable.COMMIT_RETRIES


def test_commit_retry_unknown_state_rechecks_marker():
    """CommitStateUnknown may mean the commit actually LANDED: before
    retrying, the wrapper re-checks the (scope, batch_id) marker and
    returns without a duplicate MERGE when it finds it."""
    summaries = []  # mutated by the failing attempt, like a real commit
    t = IcebergTable(_FakeSpark(summaries), "lake.db.transcripts")
    calls = {"n": 0}

    def unknown():
        calls["n"] += 1
        summaries.append({"dipper.scope": "ck", "dipper.batch_id": "9"})
        raise RuntimeError("CommitStateUnknownException: datacenter on fire")

    t._run_with_commit_retries(unknown, 9, "ck")
    assert calls["n"] == 1  # landed commit detected, no re-run


def test_add_column_sql_parses(spark):
    from dipper_spark.plans.target import IcebergTable

    t = IcebergTable(spark, "cat.db.transcripts")
    sql = t.add_column_sql("sentiment", "double")
    spark.sql(f"EXPLAIN {sql}") if False else None
    # ALTER TABLE ADD COLUMNS is plain Spark DDL: the parser accepts it
    # (execution would need the catalog; parse is the sandbox contract)
    plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    assert "sentiment" in plan.toString()
    import pytest
    with pytest.raises(ValueError, match="invalid column name"):
        t.add_column_sql("bad name", "double")


def test_compute_stats_sql_shape():
    from dipper_spark.plans.target import IcebergTable

    t = IcebergTable(None, "cat.db.transcripts")
    sql = t.compute_stats_sql()
    assert sql.startswith("CALL cat.system.compute_table_stats(")
    assert "'cat.db.transcripts'" in sql and "'conv_id'" in sql
