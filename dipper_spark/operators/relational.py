"""Relational query surface (SURVEY.md §2.2) — driver-checkable operators.

Each entry registers (a) an idiomatic-Spark DataFrame program and
(b) an ANSI-SQL oracle string executable by DuckDB over the same
parquet tables (views: region nation customer supplier part orders
lineitem events documents embeddings).  The driver compares row-count,
schema and an order-insensitive value hash at sf0.01, so:

  * every computed column is aliased IDENTICALLY in both;
  * money aggregates go through DECIMAL(18,2) (exact, no float
    accumulation-order drift) and are cast to double after rounding;
  * floating aggregates are rounded on both sides.

Queries with no SQL equivalent (streaming, UDF-specific) register
oracle=None -> the driver records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _dsum(col, scale=2):
    """Exact money sum: decimal accumulate, round, surface as double."""
    return F.round(F.sum(F.col(col).cast("decimal(18,4)")).cast("double"), scale)


# ---------------------------------------------------------------- scans ---

@q("scan_parquet_pushdown", """
SELECT l_orderkey, l_quantity, l_extendedprice
FROM lineitem
WHERE l_quantity < 5 AND l_returnflag = 'R'
""")
def scan_parquet_pushdown(spark, d):
    # projection + predicate reach the parquet scan (PushedFilters)
    return (
        load(spark, d, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .filter((F.col("l_quantity") < 5) & (F.col("l_returnflag") == "R"))
    )


@q("scan_json_props", """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events WHERE event_type = 'click'
""")
def scan_json_props(spark, d):
    return (
        load(spark, d, "events")
        .filter(F.col("event_type") == "click")
        .select("event_id", F.get_json_object("props", "$.k").cast("int").alias("k"))
    )


# ---------------------------------------------------- projection / filter ---

@q("project_filter_case", """
SELECT o_orderkey,
       o_totalprice * 0.9 AS discounted,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS bucket
FROM orders WHERE o_orderstatus = 'F'
""")
def project_filter_case(spark, d):
    o = load(spark, d, "orders").filter(F.col("o_orderstatus") == "F")
    return o.select(
        "o_orderkey",
        (F.col("o_totalprice") * 0.9).alias("discounted"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
    )


@q("predicate_in_between_like", """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  AND c_acctbal BETWEEN 1000 AND 8000
  AND c_name LIKE '%5%'
  AND c_nationkey IS NOT NULL
""")
def predicate_in_between_like(spark, d):
    c = load(spark, d, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_acctbal").between(1000, 8000)
        & F.col("c_name").like("%5%")
        & F.col("c_nationkey").isNotNull()
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


# ---------------------------------------------------------------- joins ---

@q("join_broadcast_dim", """
SELECT p.p_brand AS brand,
       ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
       COUNT(*) AS n
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""")
def join_broadcast_dim(spark, d):
    l, p = load(spark, d, "lineitem"), load(spark, d, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(_dsum("l_extendedprice").alias("revenue"), F.count(F.lit(1)).alias("n"))
    )


@q("join_shuffle_hash", """
SELECT c.c_mktsegment AS seg, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""")
def join_shuffle_hash(spark, d):
    o, c = load(spark, d, "orders"), load(spark, d, "customer")
    return (
        o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("n_orders"), _dsum("o_totalprice").alias("total"))
    )


@q("join_sort_merge", """
SELECT o.o_orderpriority AS priority, COUNT(*) AS n_lines
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""")
def join_sort_merge(spark, d):
    # Round-6 MEASURED NEGATIVE: pre-aggregating lineitem per orderkey
    # before the shuffle ("aggregate before you shuffle") was A/B'd
    # and REJECTED — under this query's column pruning the SMJ shuffles
    # only the 8-byte join key (radix-sortable longs), so the pre-agg's
    # 6M-row hash build costs more than it saves (interleaved best-of-4
    # at sf1.0: pre-agg 0.946s vs direct 0.772s).  The rewrite pays off
    # only when the join carries wide payload columns; here it carried
    # none.  Kept as the direct SMJ.
    o, l = load(spark, d, "orders"), load(spark, d, "lineitem")
    return (
        o.join(l.hint("merge"), o.o_orderkey == l.l_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


@q("join_outer_left", """
SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
""")
def join_outer_left(spark, d):
    c, o = load(spark, d, "customer"), load(spark, d, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@q("join_outer_full", """
SELECT COALESCE(n.n_nationkey, -1) AS nk, COUNT(s.s_suppkey) AS n_supp
FROM nation n FULL JOIN supplier s ON s.s_nationkey = n.n_nationkey
GROUP BY COALESCE(n.n_nationkey, -1)
""")
def join_outer_full(spark, d):
    n, s = load(spark, d, "nation"), load(spark, d, "supplier")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey, "full")
        .groupBy(F.coalesce(F.col("n_nationkey"), F.lit(-1)).alias("nk"))
        .agg(F.count("s_suppkey").alias("n_supp"))
    )


@q("join_semi", """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""")
def join_semi(spark, d):
    c, o = load(spark, d, "customer"), load(spark, d, "orders")
    return c.join(
        o.filter(F.col("o_totalprice") > 300000), c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@q("join_anti", """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""")
def join_anti(spark, d):
    # customers with no urgent order — non-empty at every sf (a
    # customers-without-orders anti join passes vacuously with 0 rows)
    c, o = load(spark, d, "customer"), load(spark, d, "orders")
    return c.join(
        o.filter(F.col("o_orderpriority") == "1-URGENT"), c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@q("join_cross", """
SELECT r.r_name AS region, n.n_name AS nation
FROM region r CROSS JOIN nation n
""")
def join_cross(spark, d):
    r, n = load(spark, d, "region"), load(spark, d, "nation")
    return r.crossJoin(n).select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))


@q("join_theta_nonequi", """
SELECT s.s_suppkey, n.n_nationkey
FROM supplier s JOIN nation n
  ON s.s_nationkey < n.n_nationkey AND n.n_nationkey <= s.s_nationkey + 3
""")
def join_theta_nonequi(spark, d):
    s, n = load(spark, d, "supplier"), load(spark, d, "nation")
    cond = (s.s_nationkey < n.n_nationkey) & (n.n_nationkey <= s.s_nationkey + 3)
    return s.join(n, cond).select("s_suppkey", "n_nationkey")


@q("join_range_interval", """
SELECT e1.user_id, COUNT(*) AS n_pairs
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts
 AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
GROUP BY e1.user_id
""")
def join_range_interval(spark, d):
    """Interval self-join as a RANGE-frame window (round-6 rewrite).

    The timestamps are integer microseconds (timestamp[us]), so the
    pair predicate  ts2 > ts1 AND ts2 <= ts1 + 5 min  is EXACTLY the
    per-row count over a range frame [cur + 1 us, cur + 300e6 us] on
    unix_micros(ts), summed per user.  vs the previous equi-bucket
    join rewrite (explode x2 -> shuffle join -> filter -> agg): ONE
    exchange on user_id + one sort, no join, no row multiplication —
    measured 3.5x at sf1.0 (plans/r06/join_range_interval_*.txt;
    guide §2.4).  Users with zero pairs are filtered, matching the
    inner join which never produced their rows."""
    e = load(spark, d, "events").select("user_id", "ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))  # ts is NTZ; session TZ is pinned UTC
        .rangeBetween(1, 300_000_000)
    )
    per_row = e.select("user_id", F.count(F.lit(1)).over(w).alias("_c"))
    return (
        per_row.groupBy("user_id")
        .agg(F.sum("_c").alias("n_pairs"))
        .filter(F.col("n_pairs") > 0)
    )


@q("join_asof_last_view", """
SELECT event_id, last_view_ts FROM (
  SELECT event_id, event_type,
         MAX(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
  FROM events WHERE event_type IN ('view', 'purchase')
) WHERE event_type = 'purchase'
""")
def join_asof_last_view(spark, d):
    """As-of join: for each purchase, the latest strictly-prior 'view'
    of the same user — the LWW kernel (C8) as a point-in-time lookup."""
    e = load(spark, d, "events").filter(F.col("event_type").isin("view", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        e.withColumn(
            "last_view_ts",
            F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "last_view_ts")
    )


# ----------------------------------------------------------- aggregation ---

@q("agg_hash_group_q1", """
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base_price,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def agg_hash_group_q1(spark, d):
    l = load(spark, d, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum("l_quantity").alias("sum_qty"),
        _dsum("l_extendedprice").alias("sum_base_price"),
        F.round(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")).cast("double"), 2
        ).alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@q("agg_distinct", """
SELECT c_mktsegment AS seg, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n
FROM customer GROUP BY c_mktsegment
""")
def agg_distinct(spark, d):
    return (
        load(spark, d, "customer")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.countDistinct("c_nationkey").alias("n_nations"), F.count(F.lit(1)).alias("n"))
    )


@q("agg_rollup", """
SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
       COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def agg_rollup(spark, d):
    return (
        load(spark, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
        )
    )


@q("agg_cube", """
SELECT COALESCE(CAST(l_returnflag AS VARCHAR), 'ALL') AS rf,
       COALESCE(CAST(l_linenumber AS VARCHAR), 'ALL') AS ln,
       COUNT(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linenumber)
""")
def agg_cube(spark, d):
    return (
        load(spark, d, "lineitem")
        .cube("l_returnflag", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("l_returnflag").cast("string"), F.lit("ALL")).alias("rf"),
            F.coalesce(F.col("l_linenumber").cast("string"), F.lit("ALL")).alias("ln"),
            "n",
        )
    )


@q("agg_salted_skew", """
SELECT user_id, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 3) AS total
FROM events GROUP BY user_id
""")
def agg_salted_skew(spark, d):
    """The C7/C8 two-stage salted aggregate on a plain metric: partial
    per (key, salt), final per key. Result identical to a direct
    groupBy; the shape is what defuses single-hot-key skew."""
    e = load(spark, d, "events")
    p1 = e.groupBy("user_id", F.pmod(F.xxhash64("event_id"), F.lit(16)).alias("_salt")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("_s"),
    )
    return p1.groupBy("user_id").agg(
        F.sum("_n").alias("n"),
        F.round(F.sum("_s").cast("double"), 3).alias("total"),
    )


@q("agg_maxby_lww", """
SELECT user_id, event_type AS last_type, value AS last_value
FROM (
  SELECT user_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""")
def agg_maxby_lww(spark, d):
    """Batch LWW kernel (op C8) on the events table: arg-max per key
    over the (ts, event_id) ordering tuple."""
    e = load(spark, d, "events")
    w = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy("user_id").agg(
        F.max_by("event_type", w).alias("last_type"),
        F.max_by("value", w).alias("last_value"),
    )


@q("agg_approx_distinct", """
SELECT COUNT(DISTINCT user_id) AS exact_users, CAST(1 AS BOOLEAN) AS approx_ok
FROM events
""")
def agg_approx_distinct(spark, d):
    """HLL sketch vs exact: the tolerance assertion (<= 5% rel. error)
    is folded into the result as a boolean so the driver's exact hash
    can check it — the sketch value itself is engine-specific."""
    e = load(spark, d, "events")
    # Round-6 correctness fix (pre-existing, surfaced by running the
    # gate at sf0.1): the default HLL rsd (0.05) leaves no margin
    # against the <=5% contract — at sf0.1's 1,500 distinct users the
    # sketch's deterministic error exceeded it.  rsd=0.01 keeps the
    # estimate well inside the asserted tolerance at every sf.
    return e.agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            F.abs(F.approx_count_distinct("user_id", 0.01) - F.countDistinct("user_id"))
            <= 0.05 * F.countDistinct("user_id")
        ).alias("approx_ok"),
    )


# ---------------------------------------------------------------- windows ---

@q("win_rank_dense", """
SELECT o_orderkey, o_custkey,
       RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
       DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS drnk
FROM orders
""")
def win_rank_dense(spark, d):
    o = load(spark, d, "orders")
    w1 = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_orderkey", "o_custkey",
        F.rank().over(w1).alias("rnk"),
        F.dense_rank().over(w2).alias("drnk"),
    )


@q("win_lag_lead", """
SELECT event_id,
       LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events
""")
def win_lag_lead(spark, d):
    e = load(spark, d, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("event_type", 1).over(w).alias("next_type"),
    )


@q("win_frame_rows_running", """
SELECT event_id,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6)))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 3) AS running_total
FROM events
""")
def win_frame_rows_running(spark, d):
    e = load(spark, d, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double"), 3).alias("running_total"),
    )


@q("win_frame_range_1h", """
SELECT event_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour
FROM events
""")
def win_frame_range_1h(spark, d):
    # Round-6 correctness fix (pre-existing, surfaced by running the
    # gate at sf0.1): unix_timestamp TRUNCATES to whole seconds while
    # the oracle's epoch(ts) keeps the microsecond fraction, so pairs
    # straddling the 3600 s boundary within a second disagreed.  Order
    # by integer MICROseconds with the frame scaled to 3.6e9 us — the
    # exact equivalent of the oracle's fractional-seconds range frame
    # (timestamps are integer microseconds).
    e = load(spark, d, "events").withColumn(
        "_us", F.unix_micros(F.col("ts").cast("timestamp")))
    w = Window.partitionBy("user_id").orderBy("_us").rangeBetween(-3_600_000_000, 0)
    return e.select("event_id", F.count(F.lit(1)).over(w).alias("n_last_hour"))


@q("win_topk_per_group", """
SELECT seg, c_custkey, c_acctbal FROM (
  SELECT c_mktsegment AS seg, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn <= 3
""")
def win_topk_per_group(spark, d):
    c = load(spark, d, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("c_mktsegment").alias("seg"), "c_custkey", "c_acctbal")
    )


# ------------------------------------------------- sort / limit / set ops ---

@q("sort_limit_topk", """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""")
def sort_limit_topk(spark, d):
    # TakeOrderedAndProject: global top-k without a full sort
    return (
        load(spark, d, "orders")
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@q("sort_stable_multi", """
SELECT user_id, event_id, ts FROM events
ORDER BY user_id, ts, event_id LIMIT 500
""")
def sort_stable_multi(spark, d):
    # stable multi-key ordering — the C16 finalization shape
    return (
        load(spark, d, "events")
        .orderBy("user_id", "ts", "event_id")
        .limit(500)
        .select("user_id", "event_id", "ts")
    )


@q("set_union_all", """
SELECT event_id, event_type FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, event_type FROM events WHERE event_type = 'error'
""")
def set_union_all(spark, d):
    e = load(spark, d, "events").select("event_id", "event_type")
    return e.filter(F.col("event_type") == "click").unionAll(e.filter(F.col("event_type") == "error"))


@q("set_intersect", """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""")
def set_intersect(spark, d):
    o = load(spark, d, "orders")
    return o.filter(F.col("o_orderstatus") == "F").select("o_custkey").intersect(
        o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    )


@q("set_except", """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""")
def set_except(spark, d):
    # custkeys with open orders but no finished ones — non-empty at
    # every sf (customer-minus-orders passes vacuously with 0 rows)
    o = load(spark, d, "orders")
    return o.filter(F.col("o_orderstatus") == "O").select("o_custkey").subtract(
        o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    )  # EXCEPT (distinct) semantics, same as the SQL


@q("set_union_byname", """
SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal FROM customer
UNION ALL
SELECT s_suppkey AS id, s_name AS name, NULL AS bal FROM supplier
""")
def set_union_byname(spark, d):
    c = load(spark, d, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal")
    )
    s = load(spark, d, "supplier").select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("name")
    )
    return c.unionByName(s, allowMissingColumns=True)


# -------------------------------------------------------- scalar functions ---

@q("fn_string", """
SELECT c_custkey,
       LOWER(c_name) AS lo, UPPER(c_mktsegment) AS up,
       SUBSTR(c_name, 1, 8) AS pre,
       LENGTH(c_name) AS len,
       CONCAT_WS('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS tag,
       REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits,
       LEVENSHTEIN(c_mktsegment, 'BUILDING') AS lev
FROM customer
""")
def fn_string(spark, d):
    c = load(spark, d, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lo"),
        F.upper("c_mktsegment").alias("up"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.length("c_name").alias("len"),
        F.concat_ws("-", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("tag"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev"),
    )


@q("fn_datetime", """
SELECT o_orderkey,
       YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m,
       CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
       DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
       CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts
FROM orders
""")
def fn_datetime(spark, d):
    o = load(spark, d, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_98"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
    )


@q("fn_math_decimal", """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1) AS r1,
       CAST(FLOOR(l_discount * 100) AS BIGINT) AS disc_pct,
       ABS(l_tax - 0.05) AS tax_delta,
       ROUND(POW(l_quantity, 2), 2) AS qty_sq,
       ROUND(LN(l_extendedprice), 4) AS ln_price,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS dec_price
FROM lineitem WHERE l_extendedprice > 0
""")
def fn_math_decimal(spark, d):
    l = load(spark, d, "lineitem").filter(F.col("l_extendedprice") > 0)
    return l.select(
        "l_orderkey", "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct"),
        F.abs(F.col("l_tax") - 0.05).alias("tax_delta"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 4).alias("ln_price"),
        # decimal round-trip stays under test; surfaced as double because
        # the driver's value hash treats Decimal('x.00') != float x.0
        F.col("l_extendedprice").cast("decimal(12,2)").cast("double").alias("dec_price"),
    )


@q("fn_array_ops", """
SELECT vec_id, label,
       len(embedding) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 5) AS x0,
       ROUND(CAST(embedding[64] AS DOUBLE), 5) AS x_last
FROM embeddings
""")
def fn_array_ops(spark, d):
    e = load(spark, d, "embeddings")
    return e.select(
        "vec_id", "label",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 5).alias("x0"),
        F.round(F.element_at("embedding", 64).cast("double"), 5).alias("x_last"),
    )


@q("fn_array_higher_order", """
SELECT vec_id,
       ROUND(CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE), 4) AS sq_norm,
       len(list_filter(embedding, x -> x > 0)) AS n_pos
FROM embeddings
""")
def fn_array_higher_order(spark, d):
    e = load(spark, d, "embeddings")
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.round(sq, 4).alias("sq_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
    )


@q("fn_map_json", """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k,
       CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod
FROM events
""")
def fn_map_json(spark, d):
    e = load(spark, d, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select("event_id", k.alias("k"), (k % 10).alias("k_mod"))
