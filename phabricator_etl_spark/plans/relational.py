"""Core relational operator battery over the driver's TPC-H-ish tables.

Every entry demonstrates one (or a cluster) of the reference's operators from
SURVEY.md §2, re-expressed set-oriented. The reference executes these shapes
as correlated per-row ORM lookups (stats.py:1027-1091 — N+1); here each is a
single declarative plan Catalyst can optimize: filter/projection pushdown into
the parquet scan, broadcast hash joins for small dims, partial aggregation
before shuffle.

Scale notes are inline per query: which side broadcasts, where the shuffle
lands, and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..query import Q
from ..sources.catalog import load_table as _t


def _cents(col: str) -> F.Column:
    # Exact money math: 2-decimal doubles -> integer cents (SURVEY conventions).
    return F.round(F.col(col) * 100).cast("long")


def _ts(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


# --------------------------------------------------------------------------
# Flagship: TPC-H Q1 shape — scan + filter + groupBy agg (P6, A-family).
# Partial aggregation (map-side combine) means the shuffle carries only
# |groups| x |partitions| rows; at 100 TB this stays tiny because the group
# key cardinality (returnflag x linestatus) is constant.
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_cents"),
            F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")).alias("sum_disc_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", (F.col("sum_qty").cast("double") / F.col("count_order")))
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       COUNT(*) AS count_order,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# TPC-H Q3 shape — 3-way join + group + deterministic top-k (J2/J3, W4).
# customer is small relative to lineitem: the filtered customer side is
# broadcast; lineitem never shuffles for the join, only for the final agg.
# --------------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue_cents DESC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# TPC-H Q5 shape — 6-way join with dim broadcast chain (J9/J12/J13 analogs).
# region/nation/supplier are broadcast; the only shuffle is lineitem><orders.
# --------------------------------------------------------------------------

def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("n_name"))
    )


Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue_cents DESC, n_name ASC
"""


# --------------------------------------------------------------------------
# P-family: filters & predicates (SURVEY §2.2). Each pushes into the scan —
# .explain shows PushedFilters on the parquet relation.
# --------------------------------------------------------------------------

def p_filters_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3/P4/P5/P6/P7 in one plan: equality + compound + IN-list + OR +
    range + NOT-prefix (reference: stats.py:222..., 392-393, 523-525,
    841-846, 555-557)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderstatus") == "O")
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & ((F.col("o_totalprice") < 5000) | (F.col("o_totalprice") > 250000))
            & (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
            & ~F.col("o_orderpriority").startswith("3-")
        )
        .select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            "o_orderpriority",
            _cents("o_totalprice").alias("total_cents"),
            _ts("o_orderdate").alias("order_ts"),
        )
    )


P_FILTERS_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       o_orderpriority,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts
FROM orders
WHERE o_orderstatus = 'O'
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND (o_totalprice < 5000 OR o_totalprice > 250000)
  AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND o_orderpriority NOT LIKE '3-%'
"""


def p9_prefix_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: prefix test drives a two-way CASE dispatch (reference:
    stats.py:412-418 routes PHID-PROJ-* to project lookup, else user)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            F.col("p_partkey").cast("long").alias("p_partkey"),
            F.when(F.col("p_type").startswith("PROMO"), F.lit("promo"))
            .when(F.col("p_type").startswith("STANDARD"), F.lit("standard"))
            .otherwise(F.lit("other"))
            .alias("type_class"),
        )
        .groupBy("type_class")
        .agg(F.count(F.lit(1)).alias("n"), F.min("p_partkey").alias("min_key"))
        .orderBy("type_class")
    )


P9_ORACLE = """
SELECT type_class, COUNT(*) AS n, MIN(p_partkey) AS min_key
FROM (
  SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
         CASE WHEN p_type LIKE 'PROMO%' THEN 'promo'
              WHEN p_type LIKE 'STANDARD%' THEN 'standard'
              ELSE 'other' END AS type_class
  FROM part
) t
GROUP BY type_class
ORDER BY type_class
"""


# --------------------------------------------------------------------------
# J-family: join shapes (SURVEY §2.3).
# --------------------------------------------------------------------------

def j_left_null_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J5/J8 shape: left join with null propagation + empty->null (C2).
    Reference: get_bug_id stats.py:276-284 (`fieldValue or None`)."""
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey, "left")
        .select(
            F.col("event_id").cast("long").alias("event_id"),
            F.col("c_name").alias("customer_name"),
            F.when(F.col("c_mktsegment") != "", F.col("c_mktsegment")).alias("segment_or_null"),
        )
    )


J_LEFT_ORACLE = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       c_name AS customer_name,
       CASE WHEN c_mktsegment <> '' THEN c_mktsegment END AS segment_or_null
FROM events
LEFT JOIN customer ON user_id = c_custkey
"""


def j_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7/J14 semi-join + A7 anti-join set-difference shape in one output:
    per nation, how many customers have orders vs are dormant."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    active = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_nationkey")
    dormant = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_nationkey")
    return (
        active.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("active_customers"))
        .join(
            dormant.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("dormant_customers")),
            "c_nationkey",
            "outer",
        )
        .select(
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            F.coalesce("active_customers", F.lit(0)).cast("long").alias("active_customers"),
            F.coalesce("dormant_customers", F.lit(0)).cast("long").alias("dormant_customers"),
        )
        .orderBy("c_nationkey")
    )


J_SEMI_ANTI_ORACLE = """
WITH active AS (
  SELECT c_nationkey, COUNT(*) AS active_customers
  FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY c_nationkey
), dormant AS (
  SELECT c_nationkey, COUNT(*) AS dormant_customers
  FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY c_nationkey
)
SELECT CAST(COALESCE(a.c_nationkey, d.c_nationkey) AS BIGINT) AS c_nationkey,
       CAST(COALESCE(active_customers, 0) AS BIGINT) AS active_customers,
       CAST(COALESCE(dormant_customers, 0) AS BIGINT) AS dormant_customers
FROM active a FULL OUTER JOIN dormant d ON a.c_nationkey = d.c_nationkey
ORDER BY c_nationkey
"""


def j6_or_join_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: OR-join decomposed into two equi-joins + union + dedup.
    Reference: comments OR-join (stats.py:500-502) — a row can satisfy both
    arms, so dropDuplicates on the pair key is required. An OR equi-join is
    a nested loop for any engine; the decomposition keeps both arms hash
    joins, which is the 100 TB-safe plan."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    o = _t(spark, sf_dir, "orders")
    arm1 = e.join(o, e.user_id == o.o_custkey).select("event_id", "o_orderkey")
    arm2 = e.join(o, e.event_id == o.o_orderkey).select("event_id", "o_orderkey")
    return (
        arm1.unionByName(arm2)
        .dropDuplicates(["event_id", "o_orderkey"])
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("pair_count"),
            F.sum(F.col("event_id").cast("long") + F.col("o_orderkey").cast("long")).alias("pair_checksum"),
        )
    )


J6_ORACLE = """
SELECT COUNT(*) AS pair_count,
       CAST(SUM(CAST(event_id AS BIGINT) + CAST(o_orderkey AS BIGINT)) AS BIGINT) AS pair_checksum
FROM (
  SELECT DISTINCT event_id, o_orderkey
  FROM events JOIN orders ON user_id = o_custkey OR event_id = o_orderkey
  WHERE event_type = 'purchase'
) t
"""


# --------------------------------------------------------------------------
# A-family: aggregations (SURVEY §2.4).
# --------------------------------------------------------------------------

def a2_conditional_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3: conditional MAX via max(when(...)) — the reference computes
    these with Python max() over filtered lists (transforms.py:126-134,
    161-169: latest landed / latest approved date). C1 gating included:
    approved date only meaningful when a landing exists (stats.py:698-699)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("o_orderstatus") == "F", F.col("o_orderdate"))).alias("_landed"),
            F.max(F.when(F.col("o_orderstatus") == "O", F.col("o_orderdate"))).alias("_approved"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.col("o_custkey").cast("long").alias("o_custkey"),
            _ts("_landed").alias("date_landed"),
            F.when(F.col("_landed").isNotNull(), _ts("_approved")).alias("date_approved"),
            F.col("n_orders").cast("long").alias("n_orders"),
        )
    )


A2_ORACLE = """
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       strftime(MAX(CASE WHEN o_orderstatus = 'F' THEN o_orderdate END), '%Y-%m-%d %H:%M:%S') AS date_landed,
       CASE WHEN MAX(CASE WHEN o_orderstatus = 'F' THEN o_orderdate END) IS NOT NULL
            THEN strftime(MAX(CASE WHEN o_orderstatus = 'O' THEN o_orderdate END), '%Y-%m-%d %H:%M:%S')
       END AS date_approved,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
"""


def a5_collect_sorted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 + J14 semantics: per-group sorted-distinct list collect
    (usernames_for_member_phids returns sorted distinct, stats.py:623).
    Emitted as '|'-joined string for hash stability."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.array_sort(F.collect_set("c_mktsegment")).alias("_segs"))
        .select(
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            F.array_join("_segs", "|").alias("segments"),
        )
        .orderBy("c_nationkey")
    )


A5_ORACLE = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# --------------------------------------------------------------------------
# W-family: windows, dedup, bucketing (SURVEY §2.5).
# --------------------------------------------------------------------------

def w1_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: latest row per group via row_number desc (get_last_review_id,
    stats.py:219-226). Deterministic tiebreak on the id column (SURVEY §7.9)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").cast("long").alias("o_custkey"),
            F.col("o_orderkey").cast("long").alias("last_orderkey"),
            _ts("o_orderdate").alias("last_order_ts"),
        )
    )


W1_ORACLE = """
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS last_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS last_order_ts
FROM orders
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
"""


def w2_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: the reference's staging dedup — QUALIFY ROW_NUMBER() OVER
    (PARTITION BY id ORDER BY updated DESC) = 1 (stats.py:916-923). Here:
    one winner per user_id in events, deterministic tiebreak event_id."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_id").cast("long").alias("event_id"),
            "event_type",
            _ts("ts").alias("ts_s"),
        )
    )


W2_ORACLE = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def w5_month_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/F8: UTC month bucketing (revision_year_month, stats.py:876-879;
    the reference's month-loop merge unit stats.py:1142-1161 becomes a
    partition column here — partition pruning instead of a driver loop)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("ym", F.date_format("o_orderdate", "yyyy-MM"))
        .groupBy("ym")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents("o_totalprice")).alias("month_cents"),
        )
        .orderBy("ym")
    )


W5_ORACLE = """
SELECT strftime(o_orderdate, '%Y-%m') AS ym,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS month_cents
FROM orders
GROUP BY 1
ORDER BY ym
"""


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.6) — UNION/INTERSECT/EXCEPT on key sets.
# --------------------------------------------------------------------------

def setops_key_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey").distinct()
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey").distinct()
    union = a.union(b).distinct().agg(F.count(F.lit(1)).alias("n")).select(F.lit("union").alias("op"), "n")
    inter = a.intersect(b).agg(F.count(F.lit(1)).alias("n")).select(F.lit("intersect").alias("op"), "n")
    diff = a.subtract(b).agg(F.count(F.lit(1)).alias("n")).select(F.lit("except").alias("op"), "n")
    return union.unionByName(inter).unionByName(diff).orderBy("op")


SETOPS_ORACLE = """
WITH a AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
     b AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT * FROM a UNION SELECT * FROM b)
UNION ALL
SELECT 'intersect', COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
UNION ALL
SELECT 'except', COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
ORDER BY op
"""


# --------------------------------------------------------------------------
# C/F-family: conditional logic + JSON scalar functions (SURVEY §2.7-2.8).
# --------------------------------------------------------------------------

def f1_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F5: JSON field extraction (comment.attributes nested lookup
    transforms.py:71-75; repository details['default-branch']
    transforms.py:172-180). events.props is the JSON-in-string column."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            F.col("event_id").cast("long").alias("event_id"),
            F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        )
        .withColumn("k_is_high", F.coalesce(F.col("k_value") > 50, F.lit(False)))
    )


F1_ORACLE = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT) > 50, FALSE) AS k_is_high
FROM events
"""


def c3_value_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: convert_value_to_string_list parity shape (transforms.py:29-39):
    True->'1', False->'0', None->'None', else str(v) — exercised on a
    derived nullable boolean and a nullable numeric."""
    e = _t(spark, sf_dir, "events")
    flag = F.when(F.col("value") > 50, F.lit(True)).when(F.col("value") > 10, F.lit(False))  # else NULL
    coerced = (
        F.when(flag.isNull(), F.lit("None"))
        .when(flag == True, F.lit("1"))  # noqa: E712
        .otherwise(F.lit("0"))
    )
    return e.select(
        F.col("event_id").cast("long").alias("event_id"),
        coerced.alias("old_value"),
    )


C3_ORACLE = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CASE WHEN value > 50 THEN '1' WHEN value > 10 THEN '0' ELSE 'None' END AS old_value
FROM events
"""


# --------------------------------------------------------------------------
# Graph: connected components (A8 / stack_size, SURVEY §4.3) — defined in
# operators/graph.py; the driver-table harness query lives here.
# --------------------------------------------------------------------------

def a8_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: stack_size analog. Build an edge list chaining each customer's
    orders (consecutive by orderkey), run generic iterative label-propagation
    connected components, report component size per order. The oracle is the
    closed form: every order's component is its customer's full order set.
    The reference's per-seed BFS (stats.py:310-357) is the N+1 version of
    exactly this global pass."""
    from ..operators.graph import connected_components

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    edges = (
        o.withColumn("prev", F.lag("o_orderkey").over(w))
        .filter(F.col("prev").isNotNull())
        .select(F.col("prev").alias("src"), F.col("o_orderkey").alias("dst"))
    )
    vertices = o.select(F.col("o_orderkey").alias("id"))
    comp = connected_components(vertices, edges)
    # window count over component: one shuffle, single evaluation of comp
    # (vs groupBy + join-back = two shuffles and a double eval)
    wc = Window.partitionBy("component")
    return comp.select(
        F.col("id").cast("long").alias("o_orderkey"),
        F.count(F.lit(1)).over(wc).cast("long").alias("stack_size"),
    )


A8_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS stack_size
FROM orders
"""


# --------------------------------------------------------------------------
# Additional TPC-H shapes widening the relational battery.
# --------------------------------------------------------------------------

def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery -> left-semi join.
    The semi join keeps orders' partitioning; lineitem is only scanned for
    its join key (column pruning to 2 columns)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    late = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-06-01").cast("timestamp"))
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_shipdate > TIMESTAMP '1996-06-01')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join + count -> distribution of counts.
    Two aggregations with one shuffle each; the outer join preserves
    customers with zero orders (count 0 bucket)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(~F.col("o_orderpriority").startswith("5-"))
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    AND o_orderpriority NOT LIKE '5-%'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q18_large_volume_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a grouped sum, then join back to detail.
    The having-filtered key set is small -> broadcast back against orders."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.col("o_custkey").cast("long").alias("o_custkey"),
            "total_qty",
            _ts("o_orderdate").alias("order_ts"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
    )


Q18_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       total_qty,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts
FROM orders
JOIN (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 150
) b ON o_orderkey = b.l_orderkey
ORDER BY total_qty DESC, o_orderkey ASC
"""


RELATIONAL_QUERIES = [
    Q("q1_pricing_summary", q1_pricing_summary, Q1_ORACLE, "TPC-H Q1: scan+filter+agg"),
    Q("q3_shipping_priority", q3_shipping_priority, Q3_ORACLE, "3-way join + topk"),
    Q("q5_local_supplier", q5_local_supplier, Q5_ORACLE, "6-way broadcast join chain"),
    Q("p_filters_compound", p_filters_compound, P_FILTERS_ORACLE, "P2-P7 predicates"),
    Q("p9_prefix_dispatch", p9_prefix_dispatch, P9_ORACLE, "P9 prefix CASE dispatch"),
    Q("j_left_null_propagation", j_left_null_propagation, J_LEFT_ORACLE, "J1/J5/J8 left join null prop"),
    Q("j_semi_anti", j_semi_anti, J_SEMI_ANTI_ORACLE, "semi+anti join"),
    Q("j6_or_join_decomposition", j6_or_join_decomposition, J6_ORACLE, "OR-join decomposition"),
    Q("a2_conditional_max", a2_conditional_max, A2_ORACLE, "A2/A3 conditional max + C1 gate"),
    Q("a5_collect_sorted_distinct", a5_collect_sorted_distinct, A5_ORACLE, "A5/J14 sorted-distinct collect"),
    Q("w1_top1_per_group", w1_top1_per_group, W1_ORACLE, "W1 top-1 per group"),
    Q("w2_dedup_keep_latest", w2_dedup_keep_latest, W2_ORACLE, "W2 staging dedup"),
    Q("w5_month_bucketing", w5_month_bucketing, W5_ORACLE, "W5/F8 UTC month buckets"),
    Q("setops_key_algebra", setops_key_algebra, SETOPS_ORACLE, "union/intersect/except"),
    Q("f1_json_extract", f1_json_extract, F1_ORACLE, "F1/F5 JSON extraction"),
    Q("c3_value_coercion", c3_value_coercion, C3_ORACLE, "C3 coercion parity shape"),
    Q("a8_connected_components", a8_connected_components, A8_ORACLE, "A8 stack_size via CC"),
    Q("q4_order_priority_exists", q4_order_priority_exists, Q4_ORACLE, "TPC-H Q4 EXISTS semi-join"),
    Q("q13_customer_distribution", q13_customer_distribution, Q13_ORACLE, "TPC-H Q13 outer-join distribution"),
    Q("q18_large_volume_having", q18_large_volume_having, Q18_ORACLE, "TPC-H Q18 HAVING + broadcast-back"),
]
