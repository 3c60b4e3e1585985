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
