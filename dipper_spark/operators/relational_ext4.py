"""Bucketed co-located join + subquery surface (§4 scale patterns).

The bucketed join is the 100 TB pattern for repeated fact-fact joins:
both sides written with `bucketBy(n, key)` join WITHOUT a shuffle
exchange (verified by plan assert in tests) — on Iceberg the same idea
is storage-partitioned joins over bucket(N, key) partitioning.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from .relational import load, q

_BUCKETED_READY: dict[str, tuple[str, str]] = {}


def _bucketed_tables(spark, d):
    """Write orders/lineitem once per sf dir as bucketed tables."""
    if d in _BUCKETED_READY:
        return _BUCKETED_READY[d]
    tag = uuid.uuid4().hex[:8]
    to, tl = f"orders_b_{tag}", f"lineitem_b_{tag}"
    wh = os.path.join(tempfile.gettempdir(), f"dipper_wh_{tag}")
    # external tables (explicit path): warehouse dir is a static conf
    (load(spark, d, "orders").write.bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").option("path", os.path.join(wh, to))
     .mode("overwrite").saveAsTable(to))
    (load(spark, d, "lineitem").write.bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").option("path", os.path.join(wh, tl))
     .mode("overwrite").saveAsTable(tl))
    _BUCKETED_READY[d] = (to, tl)
    return to, tl


@q("join_bucketed_colocated", """
SELECT o.o_orderstatus AS st, COUNT(*) AS n_lines,
       ROUND(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS qty
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderstatus
""")
def join_bucketed_colocated(spark, d):
    """Shuffle-free fact-fact join: both sides pre-bucketed on the join
    key -> SortMergeJoin with NO Exchange (asserted in tests)."""
    to, tl = _bucketed_tables(spark, d)
    o, l = spark.table(to), spark.table(tl)
    # hint("merge"): at toy scale Spark would broadcast instead; the
    # point here is the exchange-free sort-merge join over buckets.
    return (
        o.join(l.hint("merge"), o.o_orderkey == l.l_orderkey)
        .groupBy(F.col("o_orderstatus").alias("st"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double"), 2).alias("qty"),
        )
    )


@q("subquery_scalar", """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
""")
def subquery_scalar(spark, d):
    # 1.5x the mean: non-empty at every sf (2x returned 0 rows at
    # sf0.01 -> the check passed vacuously)
    load(spark, d, "orders").createOrReplaceTempView("_o_sq")
    return spark.sql(
        "SELECT o_orderkey, o_totalprice FROM _o_sq "
        "WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM _o_sq)"
    )


@q("subquery_correlated_exists", """
SELECT c_custkey FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""")
def subquery_correlated_exists(spark, d):
    load(spark, d, "customer").createOrReplaceTempView("_c_sq")
    load(spark, d, "orders").createOrReplaceTempView("_o_sq2")
    return spark.sql(
        "SELECT c_custkey FROM _c_sq c WHERE EXISTS "
        "(SELECT 1 FROM _o_sq2 o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderpriority = '1-URGENT')"
    )


@q("subquery_in_having_cte", """
WITH big AS (
  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey HAVING COUNT(*) > 12
)
SELECT c.c_mktsegment AS seg, COUNT(*) AS n_big
FROM customer c WHERE c.c_custkey IN (SELECT o_custkey FROM big)
GROUP BY c.c_mktsegment
""")
def subquery_in_having_cte(spark, d):
    load(spark, d, "customer").createOrReplaceTempView("_c_sq3")
    load(spark, d, "orders").createOrReplaceTempView("_o_sq3")
    return spark.sql("""
        WITH big AS (
          SELECT o_custkey, COUNT(*) AS n FROM _o_sq3 GROUP BY o_custkey HAVING COUNT(*) > 12
        )
        SELECT c.c_mktsegment AS seg, COUNT(*) AS n_big
        FROM _c_sq3 c WHERE c.c_custkey IN (SELECT o_custkey FROM big)
        GROUP BY c.c_mktsegment
    """)
