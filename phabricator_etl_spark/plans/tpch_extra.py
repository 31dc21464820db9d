"""Extended TPC-H-shaped relational coverage over the driver tables.

The reference's operator inventory (SURVEY.md §2) has no correlated
subqueries, disjunctive multi-attribute predicates, distinct aggregates,
scalar-subquery comparisons, pivots, or full rank-function families — but a
complete analytics engine needs them, and TPC-H is the canonical public
corpus for those shapes. Each query here is adapted to the driver's schema
(no partsupp / shipmode / commitdate columns; see TESTDATA.md) and paired
with a DuckDB oracle.

Determinism rules (same as plans/relational.py):
- money: per-row ROUND(x*100) -> long cents, summed exactly (no float sums);
- every correlated avg compares integral-valued doubles (order-independent);
- rank functions that tie use value-only windows (tie-stable across engines);
  ntile/row_number use a total order including the unique key.

Scale notes inline: which side broadcasts, where the shuffles land, and how
each correlated subquery becomes a join so Catalyst can push filters below it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..query import Q
from ..sources.catalog import load_table as _t


def _disc_cents() -> F.Column:
    return F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")


_DISC_CENTS_SQL = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan + conjunctive range filter +
# single global agg. All three predicates push into the parquet scan; the
# shuffle carries one partial-agg row per partition.
# --------------------------------------------------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast("long")).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q6_ORACLE = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# Q7 — volume shipping between nation pairs: the two nation dims are joined
# twice under different roles (supplier's vs customer's). Both are broadcast;
# lineitem><orders is the only big shuffle. Group key (nation x nation x
# year) is constant-cardinality, so the final agg is map-side combinable.
# --------------------------------------------------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_disc_cents()).alias("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_ORACLE = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
       CAST(SUM({_DISC_CENTS_SQL}) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# Q8 (adapted) — local-supplier market share: per region and year, the share
# of revenue where the supplier sits in the customer's own nation. The
# numerator is a conditional sum over the same joined stream — one pass, no
# second join (the classic CASE-inside-SUM market-share rewrite).
# --------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    local = F.when(F.col("s_nationkey") == F.col("c_nationkey"), _disc_cents()).otherwise(F.lit(0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(local).alias("local_cents"),
            F.sum(_disc_cents()).alias("total_cents"),
        )
        .withColumn("local_share", F.col("local_cents").cast("double") / F.col("total_cents"))
        .orderBy("r_name", "o_year")
    )


Q8_ORACLE = f"""
SELECT r_name, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN s_nationkey = c_nationkey THEN {_DISC_CENTS_SQL} ELSE 0 END) AS BIGINT) AS local_cents,
       CAST(SUM({_DISC_CENTS_SQL}) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN s_nationkey = c_nationkey THEN {_DISC_CENTS_SQL} ELSE 0 END) AS DOUBLE)
         / SUM({_DISC_CENTS_SQL}) AS local_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Q9 (adapted) — product-type profit by nation and year: retailprice stands
# in for supplycost (no partsupp table). Predicate on p_name pushes into the
# broadcast part dim before the join — Catalyst prunes the fact scan to the
# join keys + measures.
# --------------------------------------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    profit = (
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
        - F.round(F.col("p_retailprice") * F.col("l_quantity") * 10).cast("long")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(profit).alias("profit_cents"))
        .orderBy("n_name", F.desc("l_year"))
    )


Q9_ORACLE = """
SELECT n_name, CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           - CAST(ROUND(p_retailprice * l_quantity * 10) AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
ORDER BY n_name, l_year DESC
"""


# --------------------------------------------------------------------------
# Q10 — returned-item reporting: revenue lost to returns per customer over a
# quarter, top 20. Fact-to-fact join shuffles on orderkey; customer/nation
# broadcast; top-k via global sort of the (small) aggregate.
# --------------------------------------------------------------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_disc_cents()).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_ORACLE = f"""
SELECT c_custkey, c_name, n_name, CAST(SUM({_DISC_CENTS_SQL}) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, c_custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# Q12 (adapted) — priority classes by line status (no shipmode column):
# conditional counts bucketing order priority into critical/non-critical.
# --------------------------------------------------------------------------

def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --------------------------------------------------------------------------
# Q14 — promotion effect: conditional-sum ratio over one joined month.
# part broadcasts; the ratio is computed from exact long cents so the double
# division is bit-identical across engines.
# --------------------------------------------------------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _disc_cents()).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(promo).alias("promo_cents"),
            F.sum(_disc_cents()).alias("total_cents"),
        )
        .withColumn("promo_share", F.col("promo_cents").cast("double") / F.col("total_cents"))
    )


Q14_ORACLE = f"""
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_CENTS_SQL} ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(SUM({_DISC_CENTS_SQL}) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_CENTS_SQL} ELSE 0 END) AS DOUBLE)
         / SUM({_DISC_CENTS_SQL}) AS promo_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""


# --------------------------------------------------------------------------
# Q15 — top supplier(s): per-supplier quarterly revenue, keep the max. The
# scalar subquery (global MAX) becomes a broadcast of one row joined back —
# the Catalyst rewrite of TPC-H's correlated HAVING.
# --------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_disc_cents()).alias("total_cents"))
    max_rev = rev.agg(F.max("total_cents").alias("m"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_cents == max_rev.m)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_cents")
        .orderBy("s_suppkey")
    )


Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({_DISC_CENTS_SQL}) AS BIGINT) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_cents
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_cents = (SELECT MAX(total_cents) FROM rev)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q16 (adapted) — supplier diversity per part class: COUNT(DISTINCT) after a
# join, derived from lineitem (no partsupp). Distinct-agg shuffles once on
# the group key with the distinct key folded into the shuffle key (two-phase
# distinct aggregation — Spark plans this automatically).
# --------------------------------------------------------------------------

def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 10, 15, 20)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_size"))
    )


Q16_ORACLE = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20)
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p_brand ASC, p_size ASC
"""


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: the correlated per-part AVG subquery
# becomes a groupBy + join-back (decorrelation). l_quantity is
# integral-valued, so the AVG double is order-independent and the comparison
# is engine-stable.
# --------------------------------------------------------------------------

def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li_p = li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
    avg_qty = li_p.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.5).alias("half_avg"))
    return (
        li_p.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("total_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_ORACLE = """
WITH li_p AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'
), thresholds AS (
  SELECT l_partkey, AVG(l_quantity) * 0.5 AS half_avg FROM li_p GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       COUNT(*) AS n_lines
FROM li_p JOIN thresholds USING (l_partkey)
WHERE l_quantity < half_avg
"""


# --------------------------------------------------------------------------
# Q19 — disjunctive multi-attribute predicate: three (brand x quantity x
# size) conjunctions OR-ed together after the join. Catalyst extracts the
# common l_partkey join key and pushes the residual OR as a post-join filter;
# the partkey join itself stays a broadcast.
# --------------------------------------------------------------------------

def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("l_quantity").between(1, 11)) & (F.col("p_size").between(1, 5)))
        | ((F.col("p_brand") == "Brand#23") & (F.col("l_quantity").between(10, 20)) & (F.col("p_size").between(1, 10)))
        | ((F.col("p_brand") == "Brand#34") & (F.col("l_quantity").between(20, 30)) & (F.col("p_size").between(1, 15)))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_disc_cents()).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q19_ORACLE = f"""
SELECT CAST(SUM({_DISC_CENTS_SQL}) AS BIGINT) AS revenue_cents, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


# --------------------------------------------------------------------------
# Q22 (adapted) — idle high-balance customers: scalar-subquery threshold
# (global avg on exact cents) + anti-join against orders. The threshold is a
# one-row broadcast; the anti-join shuffles customers once on custkey.
# --------------------------------------------------------------------------

def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").withColumn(
        "bal_cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    thresh = cust.filter(F.col("bal_cents") > 0).agg(
        (F.sum("bal_cents").cast("double") / F.count(F.lit(1))).alias("avg_cents")
    )
    return (
        cust.join(F.broadcast(thresh), cust.bal_cents > F.col("avg_cents"))
        .join(orders.select(F.col("o_custkey")), cust.c_custkey == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_cents").alias("totacctbal_cents"),
        )
        .orderBy("n_name")
    )


Q22_ORACLE = """
WITH c AS (
  SELECT c_custkey, c_nationkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
), t AS (
  SELECT CAST(SUM(bal_cents) AS DOUBLE) / COUNT(*) AS avg_cents FROM c WHERE bal_cents > 0
)
SELECT n_name, COUNT(*) AS numcust, CAST(SUM(bal_cents) AS BIGINT) AS totacctbal_cents
FROM c
CROSS JOIN t
JOIN nation ON c_nationkey = n_nationkey
WHERE bal_cents > avg_cents
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
ORDER BY n_name
"""


# --------------------------------------------------------------------------
# Q2 (adapted) — min-cost supplier per part: for every part a fixed size
# class is sourced from, the supplier with the lowest account balance
# (tie-break: lowest suppkey). The correlated MIN becomes groupBy + join-back
# on a struct-min, one shuffle on partkey.
# --------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == 10)
    supp = _t(spark, sf_dir, "supplier").withColumn(
        "bal_cents", F.round(F.col("s_acctbal") * 100).cast("long")
    )
    pairs = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    )
    # struct-min gives (min bal, then min suppkey) atomically — W3's
    # deterministic-first discipline applied to the classic Q2 correlation
    best = pairs.groupBy("p_partkey").agg(
        F.min(F.struct("bal_cents", "s_suppkey")).alias("best")
    )
    return best.select(
        "p_partkey",
        F.col("best.s_suppkey").alias("s_suppkey"),
        F.col("best.bal_cents").alias("bal_cents"),
    ).orderBy("p_partkey")


Q2_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT lineitem.l_partkey AS pk, lineitem.l_suppkey AS sk,
         CAST(ROUND(s_acctbal * 100) AS BIGINT) AS bal_cents
  FROM lineitem
  JOIN part ON lineitem.l_partkey = part.p_partkey AND p_size = 10
  JOIN supplier ON lineitem.l_suppkey = supplier.s_suppkey
), ranked AS (
  SELECT pk, sk, bal_cents,
         ROW_NUMBER() OVER (PARTITION BY pk ORDER BY bal_cents ASC, sk ASC) AS rn
  FROM pairs
)
SELECT pk AS p_partkey, sk AS s_suppkey, bal_cents
FROM ranked WHERE rn = 1
ORDER BY p_partkey
"""


# --------------------------------------------------------------------------
# Rank-function family (beyond the reference's single row_number W2): rank /
# dense_rank / percent_rank / cume_dist over a value-only window (tie-stable
# across engines), ntile + row_number over a total order. One shuffle on the
# partition key; all six functions share the same sort.
# --------------------------------------------------------------------------

def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").withColumn(
        "bal_cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    nation = _t(spark, sf_dir, "nation")
    w_val = Window.partitionBy("n_name").orderBy(F.desc("bal_cents"))
    w_total = Window.partitionBy("n_name").orderBy(F.desc("bal_cents"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "n_name",
            "bal_cents",
            F.rank().over(w_val).alias("bal_rank"),
            F.dense_rank().over(w_val).alias("bal_dense"),
            F.percent_rank().over(w_val).alias("bal_prank"),
            F.cume_dist().over(w_val).alias("bal_cume"),
            F.ntile(4).over(w_total).alias("bal_quartile"),
            F.row_number().over(w_total).alias("bal_rownum"),
        )
    )


WINDOW_RANK_ORACLE = """
SELECT c_custkey, n_name, bal_cents,
       RANK()         OVER w_val AS bal_rank,
       DENSE_RANK()   OVER w_val AS bal_dense,
       PERCENT_RANK() OVER w_val AS bal_prank,
       CUME_DIST()    OVER w_val AS bal_cume,
       NTILE(4)       OVER w_total AS bal_quartile,
       ROW_NUMBER()   OVER w_total AS bal_rownum
FROM (SELECT c_custkey, c_nationkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer)
JOIN nation ON c_nationkey = n_nationkey
WINDOW w_val   AS (PARTITION BY n_name ORDER BY bal_cents DESC),
       w_total AS (PARTITION BY n_name ORDER BY bal_cents DESC, c_custkey ASC)
"""


# --------------------------------------------------------------------------
# Pivot — long-to-wide reshape (no reference counterpart; standard BI op).
# Spark's groupBy().pivot() with an explicit value list compiles to a single
# hash aggregate with one output column per (value x agg) — no shuffle beyond
# the group key, and the explicit list keeps the schema static (a dynamic
# pivot would need a driver-side distinct scan first).
# --------------------------------------------------------------------------

def pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumn(
        "price_cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("price_cents").alias("cents"),
        )
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F_cnt"), F.lit(0)).alias("f_cnt"),
        F.coalesce(F.col("F_cents"), F.lit(0)).alias("f_cents"),
        F.coalesce(F.col("O_cnt"), F.lit(0)).alias("o_cnt"),
        F.coalesce(F.col("O_cents"), F.lit(0)).alias("o_cents"),
        F.coalesce(F.col("P_cnt"), F.lit(0)).alias("p_cnt"),
        F.coalesce(F.col("P_cents"), F.lit(0)).alias("p_cents"),
    ).orderBy("o_orderpriority")


PIVOT_ORACLE = """
SELECT o_orderpriority,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_cnt,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS f_cents,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_cnt,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS o_cents,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_cnt,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS p_cents
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q11 (adapted) — important stock: per-(nation, part) revenue kept only when
# it exceeds a threshold derived from a scalar subquery over the SAME
# aggregate (TPC-H's HAVING > SUM(..)*fraction shape). TPC-H scales its
# fraction by 1/SF; since this query must run unchanged at every SF, the
# threshold is 2x the MEAN group value instead — scale-invariant (~10% of
# groups qualify at any size). Exact integer compare (v*n_groups > 2*total)
# so no boundary row can flip between engines. Two shuffles total: the
# (nation, part) agg; the one-row threshold is a broadcast.
# --------------------------------------------------------------------------

def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey", _disc_cents().alias("cents"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "l_partkey")
        .agg(F.sum("cents").alias("value_cents"))
    )
    total = val.agg(
        F.sum("value_cents").alias("total_cents"), F.count(F.lit(1)).alias("n_groups")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * F.col("n_groups") > 2 * F.col("total_cents"))
        .select(
            "n_name",
            F.col("l_partkey").cast("long").alias("l_partkey"),
            "value_cents",
        )
        .orderBy(F.desc("value_cents"), "n_name", "l_partkey")
    )


Q11_ORACLE = f"""
WITH val AS (
  SELECT n_name, l_partkey, CAST(SUM({_DISC_CENTS_SQL}) AS BIGINT) AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, l_partkey
)
SELECT n_name, CAST(l_partkey AS BIGINT) AS l_partkey, value_cents
FROM val
WHERE value_cents * (SELECT COUNT(*) FROM val) > 2 * (SELECT SUM(value_cents) FROM val)
ORDER BY value_cents DESC, n_name, l_partkey
"""


# --------------------------------------------------------------------------
# Q20 (adapted) — promotion-eligible suppliers: nested IN subqueries. The
# inner IN (parts named 'red…') becomes a broadcast semi-join into the
# lineitem scan; the HAVING-qualified supplier set becomes a semi-join into
# supplier. Catalyst plans both INs as joins — no per-row subquery at any
# scale. Quantities are integral-valued doubles, compared as exact longs.
# --------------------------------------------------------------------------

def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    red_parts = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red")).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    qualified = (
        li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("red_qty"))
        .filter(F.col("red_qty") > 2000)
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supp.join(qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == F.col("n_nationkey"))
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "n_name",
        )
        .orderBy("s_suppkey")
    )


Q20_ORACLE = """
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY l_suppkey
  HAVING CAST(SUM(l_quantity) AS BIGINT) > 2000
)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q21 (adapted) — suppliers who kept orders waiting: the EXISTS + NOT EXISTS
# double correlation, TPC-H's hardest join shape. "Late" is adapted to the
# driver schema (no commit/receipt dates): shipped more than 60 days after
# the order date. A supplier is counted when, on a finished ('F') order, its
# line was late, ANOTHER supplier also supplied the order (EXISTS -> semi-
# join with a same-key/different-supplier residual), and NO OTHER supplier
# was late on it (NOT EXISTS -> anti-join, same residual). Both become hash
# joins on l_orderkey; the distinct (orderkey, suppkey) projections keep the
# state minimal. One wide shuffle on orderkey serves all three legs.
# --------------------------------------------------------------------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders_f = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    lines = li.join(
        orders_f.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey")
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)).alias("late"),
    )
    all_pairs = lines.select("l_orderkey", "l_suppkey").distinct()
    late_pairs = lines.filter("late").select("l_orderkey", "l_suppkey").distinct()

    l1 = late_pairs.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("s"))
    with_other = l1.join(
        all_pairs,
        (F.col("k") == all_pairs.l_orderkey) & (F.col("s") != all_pairs.l_suppkey),
        "left_semi",
    )
    sole_late = with_other.join(
        late_pairs,
        (F.col("k") == late_pairs.l_orderkey) & (F.col("s") != late_pairs.l_suppkey),
        "left_anti",
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(supp), F.col("s") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


Q21_ORACLE = """
WITH lines AS (
  SELECT l_orderkey, l_suppkey, l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), late_pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE late
), all_pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lines
)
SELECT s_name, COUNT(*) AS numwait
FROM late_pairs l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
  SELECT 1 FROM all_pairs l2
  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
)
AND NOT EXISTS (
  SELECT 1 FROM late_pairs l3
  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


TPCH_EXTRA_QUERIES = [
    Q("q2_min_cost_supplier", q2_min_cost_supplier, Q2_ORACLE, "correlated MIN -> struct-min join-back"),
    Q("q6_forecast_revenue", q6_forecast_revenue, Q6_ORACLE, "TPC-H Q6 range-filter agg"),
    Q("q7_volume_shipping", q7_volume_shipping, Q7_ORACLE, "TPC-H Q7 dual-role nation joins"),
    Q("q8_market_share", q8_market_share, Q8_ORACLE, "TPC-H Q8 conditional-share"),
    Q("q9_product_profit", q9_product_profit, Q9_ORACLE, "TPC-H Q9 profit by nation/year"),
    Q("q10_returned_items", q10_returned_items, Q10_ORACLE, "TPC-H Q10 returns top-20"),
    Q("q11_important_stock", q11_important_stock, Q11_ORACLE, "TPC-H Q11 scalar-subquery HAVING (above-mean)"),
    Q("q12_priority_classes", q12_priority_classes, Q12_ORACLE, "TPC-H Q12 conditional counts"),
    Q("q14_promo_revenue", q14_promo_revenue, Q14_ORACLE, "TPC-H Q14 promo ratio"),
    Q("q15_top_supplier", q15_top_supplier, Q15_ORACLE, "TPC-H Q15 scalar-max join-back"),
    Q("q16_supplier_diversity", q16_supplier_diversity, Q16_ORACLE, "TPC-H Q16 distinct agg"),
    Q("q17_small_quantity", q17_small_quantity, Q17_ORACLE, "TPC-H Q17 decorrelated avg"),
    Q("q19_disjunctive", q19_disjunctive, Q19_ORACLE, "TPC-H Q19 disjunctive predicate"),
    Q("q20_promotion_suppliers", q20_promotion_suppliers, Q20_ORACLE, "TPC-H Q20 nested IN semi-joins"),
    Q("q21_waiting_suppliers", q21_waiting_suppliers, Q21_ORACLE, "TPC-H Q21 EXISTS + NOT EXISTS"),
    Q("q22_idle_customers", q22_idle_customers, Q22_ORACLE, "TPC-H Q22 threshold + anti-join"),
    Q("window_rank_family", window_rank_family, WINDOW_RANK_ORACLE, "rank/dense/percent/cume/ntile"),
    Q("pivot_status_matrix", pivot_status_matrix, PIVOT_ORACLE, "groupBy().pivot() reshape"),
]
