"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: miniature end-to-end CDC replay (SURVEY.md
                §7.2): generate a deterministic changelog (dups,
                reorder, hot-key skew, deletes), replay it through the
                engine (decode -> salted LWW collapse -> CoW merge),
                return the final transcript snapshot.
queries()     — one entry per implemented operator (SURVEY.md §2).
oracle_sql()  — DuckDB-equivalent SQL per query (omitted for
                non-SQL-expressible ops -> rows-only check).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship CDC replay at sf0.001-equivalent scale; rows > 0."""
    from dipper_spark.plans.replay import replay
    from dipper_spark.testkit.gen import ChangelogSpec, gen_changelog

    work = tempfile.mkdtemp(prefix="dipper_entry_")
    spec = ChangelogSpec(seed=42, n_conv=150, extra_rate=1.2, hot_frac=0.3)
    gen_changelog(os.path.join(work, "log"), spec)
    table, _stats = replay(spark, os.path.join(work, "log"), os.path.join(work, "table"))
    return table.snapshot()


def _cdc_replay_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC replay as a checkable query (rows-only: the changelog is
    engine-generated, not one of the harness views)."""
    return entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dipper_spark.operators import (  # noqa: F401  (registration imports)
        relational,
        relational_ext,
        relational_ext2,
        relational_ext3,
        relational_ext4,
        relational_sim,
    )

    out = dict(relational.QUERIES)
    out["cdc_replay_snapshot"] = _cdc_replay_snapshot
    return out


def oracle_sql() -> dict[str, str]:
    from dipper_spark.operators import (  # noqa: F401  (registration imports)
        relational,
        relational_ext,
        relational_ext2,
        relational_ext3,
        relational_ext4,
        relational_sim,
    )

    return dict(relational.ORACLES)
