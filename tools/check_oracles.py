"""Local replica of the driver's DuckDB-oracle comparison.

Runs every registered query on Spark AND its oracle SQL on DuckDB at
a given sf dir, compares row-count, column names, and values
(order-insensitive; floats to 1e-9 rel tol).  Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), ignore_index=True, na_position="last")


def _dtype_class(s: pd.Series) -> str:
    """Coarse dtype class: the driver's value hash is type-sensitive
    (int 7 != float 7.0), so int-vs-float column mismatches must FAIL
    locally too (fn_math_decimal escaped r1/r2 because this replica
    compared values at tolerance without comparing dtypes)."""
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    if k == "O":
        for v in s:
            if v is None:
                continue
            if isinstance(v, bool):
                return "bool"
            if isinstance(v, int):
                return "int"
            if isinstance(v, float):
                return "float"
            return "other"
    return "other"


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if list(a.columns) != list(b.columns):
        return f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        ka, kb = _dtype_class(a[c]), _dtype_class(b[c])
        if ka != kb:
            return f"col {c} dtype class {ka} ({a[c].dtype}) vs {kb} ({b[c].dtype})"
        av, bv = a[c].tolist(), b[c].tolist()
        def isnull(v):
            if v is None:
                return True
            if isinstance(v, (list, tuple)):
                return False
            try:
                return bool(pd.isna(v))
            except (TypeError, ValueError):
                return False

        for i, (x, y) in enumerate(zip(av, bv)):
            if isnull(x) and isnull(y):
                continue
            if isnull(x) != isnull(y):
                return f"col {c} row {i}: {x!r} vs {y!r}"
            if isinstance(x, float) or isinstance(y, float):
                if x is None or y is None:
                    return f"col {c} row {i}: {x!r} vs {y!r}"
                if not math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9):
                    return f"col {c} row {i}: {x!r} vs {y!r}"
            elif x != y:
                return f"col {c} row {i}: {x!r} vs {y!r}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # Go through __spark_entry__ (not the operator registry directly)
    # so this gate covers EXACTLY what the driver sees — including the
    # flagship contract and its literal oracle.  The driver's rotating
    # window samples 50 queries per round; THIS run over all of them is
    # the merge gate (ADVICE r3: window rows are point-in-time).
    import __spark_entry__ as E

    QUERIES = E.queries()
    ORACLES = E.oracle_sql()
    from dipper_spark.session import build_session

    spark = build_session("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_ok = n_fail = n_skip = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"rows-only {name}: {len(sdf)} rows")
            n_skip += 1
            continue
        try:
            ddf = con.execute(ORACLES[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        err = values_match(canon(sdf), canon(ddf))
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"ok   {name}: {len(sdf)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail, {n_skip} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
