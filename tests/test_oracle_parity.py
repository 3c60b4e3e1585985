"""Full query-surface parity vs DuckDB at sf0.001 (SURVEY.md §5.7).

Mirrors the driver's harness: for every registered query with an
oracle, compare row-count, column names, and values (order-
insensitive).  Queries without oracles are executed for rows-only.
This is the regression net that keeps all ~60 operators green.
"""

import duckdb
import pytest

import tools.check_oracles as co

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    from dipper_spark.operators import (  # noqa: F401
        relational,
        relational_ext,
        relational_ext2,
        relational_ext3,
        relational_ext4,
        relational_sim,
    )

    return relational.QUERIES, relational.ORACLES


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in co.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_all_queries_parity(spark, registry, duck):
    queries, oracles = registry
    failures = []
    for name, fn in queries.items():
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: spark error: {e}")
            continue
        if name not in oracles:
            continue  # rows-only in the driver harness
        try:
            ddf = duck.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: duckdb error: {e}")
            continue
        err = co.values_match(co.canon(sdf), co.canon(ddf))
        if err:
            failures.append(f"{name}: {err}")
    assert not failures, "\n".join(failures)
