"""The SQL surface: queries expressed as ``spark.sql`` text, not DataFrame
calls.

The reference has no query language at all (SQLAlchemy ORM only); this engine
exposes full ANSI SQL through Spark SQL. These gate entries certify the
text-SQL path end-to-end — view registration, parsing, Catalyst's correlated
subquery DECORRELATION (EXISTS / IN / scalar subqueries become joins; there
is no per-row subquery execution at any scale), CTEs, and window functions —
against the same DuckDB oracles as the DataFrame queries.

Views are registered per (session, sf_dir) once; temp views are metadata
only, so registration costs nothing at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..query import Q
from ..sources.catalog import load_table

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_VIEWS_MARKER = "spark_graft.views_for"


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create the ten fixture temp views on THIS session (skip if current).

    Temp views are per-SparkSession, so the guard must be too: a process- or
    applicationId-scoped set would skip a sibling session sharing the same
    context (TABLE_OR_VIEW_NOT_FOUND on every SQL-text query there). A
    session conf marker has exactly the right scope — ``newSession()`` gets
    fresh conf AND fresh views (both absent), ``cloneSession`` copies both
    (both present) — so the marker can never outlive the views it guards."""
    if spark.conf.get(_VIEWS_MARKER, None) == sf_dir:
        return
    for t in _TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    spark.conf.set(_VIEWS_MARKER, sf_dir)


# Each query is ONE SQL text valid in both Spark SQL and DuckDB, so the
# oracle string is literally the executed query — the strongest possible
# parity statement for the SQL surface.

SQL_EXISTS = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_quantity >= 45
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

SQL_SCALAR_SUBQUERY = """
SELECT n_name, COUNT(*) AS n_above
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > (
  -- AVG over exact cents: the long sum is < 2^53 so the double mean is
  -- bit-identical across engines; no cast back (int-cast rounding rules
  -- differ: Spark truncates, DuckDB rounds)
  SELECT AVG(CAST(ROUND(c_acctbal * 100) AS BIGINT)) FROM customer
)
GROUP BY n_name
ORDER BY n_name
"""

SQL_IN_SUBQUERY = """
SELECT p_brand, COUNT(*) AS n_parts
FROM part
WHERE p_partkey IN (
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 48
)
GROUP BY p_brand
ORDER BY p_brand
"""

SQL_CTE_WINDOW = """
WITH nation_rev AS (
  SELECT n_name,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, revenue_cents,
       RANK() OVER (ORDER BY revenue_cents DESC) AS rev_rank
FROM nation_rev
ORDER BY rev_rank, n_name
"""

SQL_NOT_IN_ANTI = """
SELECT c_mktsegment, COUNT(*) AS n_idle
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# WITH RECURSIVE (Spark 4.x): the per-customer order chain (consecutive
# orders linked by a LAG window) walked recursively from each chain head.
# depth(order) has a closed form — its position in the chain — and the
# SAME relation is computed by pointer-jumping in graph_bfs_distance, so
# one semantics is certified three independent ways: recursive SQL on both
# engines (this entry, hash-gated), the O(log n) pointer-jump fixpoint,
# and the analytic oracle. Each iteration is one shuffled equi-join on the
# frontier (the execution shape Catalyst plans for the UNION ALL loop) and
# every iteration is a synchronous stage, so recursion DEPTH, not data
# volume, is the cost driver. The walk is depth-bounded (w.depth < 7, the
# standard production guard): unbounded, sf0.1 chains recurse ~30 levels
# and wall-clock quadruples. Unbounded transitive closure belongs to the
# pointer-jumping operator, which does it in O(log n) rounds instead of
# O(chain length).
SQL_RECURSIVE_CHAIN = """
WITH RECURSIVE
edges AS (
  SELECT prev AS src, o_orderkey AS dst
  FROM (
    SELECT o_orderkey,
           LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev
    FROM orders
  )
  WHERE prev IS NOT NULL
),
seeds AS (
  SELECT o_orderkey
  FROM (
    SELECT o_orderkey,
           LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev
    FROM orders
  )
  WHERE prev IS NULL
),
walk(o_orderkey, depth) AS (
  SELECT o_orderkey, 0 FROM seeds
  UNION ALL
  SELECT e.dst, w.depth + 1
  FROM walk w JOIN edges e ON e.src = w.o_orderkey
  WHERE w.depth < 7
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, CAST(depth AS BIGINT) AS depth
FROM walk
"""


def _sql_query(text: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(text)

    return run


# ---------------------------------------------------------------------------
# SQL-defined scalar function (Spark 4 `CREATE TEMPORARY FUNCTION ... RETURN
# <expr>`): the declarative UDF. Unlike a Python UDF, the body is a Catalyst
# expression — inlined into the caller's plan, fully codegen'd, pushdown-
# transparent — so "user-defined" costs nothing at 100 TB. The oracle is the
# same query with the body inlined by hand (DuckDB macros are the analogous
# feature but the driver's oracle channel is single-statement SQL).
# ---------------------------------------------------------------------------

SQL_UDF_DDL = """
CREATE OR REPLACE TEMPORARY FUNCTION disc_cents(p DOUBLE, d DOUBLE)
RETURNS BIGINT
RETURN CAST(ROUND(p * (1.0 - d) * 100) AS BIGINT)
"""

SQL_UDF_BODY = """
SELECT l_returnflag,
       CAST(SUM(disc_cents(l_extendedprice, l_discount)) AS BIGINT) AS revenue_cents
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

SQL_UDF_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql(SQL_UDF_DDL)
    return spark.sql(SQL_UDF_BODY)


# ---------------------------------------------------------------------------
# Parameterized SQL (spark.sql(..., args=...)): named-marker binding — the
# injection-safe programmatic query path (parameters are bound as literals by
# the parser, they never string-concatenate). Oracle is the same query with
# the parameters inlined.
# ---------------------------------------------------------------------------

SQL_PARAM_TEXT = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_totalprice > :min_price AND o_orderstatus = :status
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

SQL_PARAM_ARGS = {"min_price": 150_000.0, "status": "O"}

SQL_PARAM_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_PARAM_TEXT, args=SQL_PARAM_ARGS)


# SQL PIVOT syntax (Spark's native PIVOT clause; DuckDB's PIVOT differs, so
# the oracle is the portable CASE-aggregation expansion — which is also
# exactly what Catalyst compiles PIVOT into: one Expand-free hash aggregate,
# no per-column scans).
SQL_PIVOT_TEXT = """
SELECT * FROM (
  SELECT o_orderpriority, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
PIVOT (
  COUNT(*) AS n, SUM(cents) AS cents
  FOR o_orderstatus IN ('O' AS o, 'F' AS f, 'P' AS p)
)
ORDER BY o_orderpriority
"""

SQL_PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS o_n,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS o_cents,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS f_n,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS f_cents,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS p_n,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS p_cents
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def sql_pivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_PIVOT_TEXT)


SQL_INTERFACE_QUERIES = [
    Q("sql_exists_decorrelated", _sql_query(SQL_EXISTS), SQL_EXISTS, "text-SQL EXISTS -> semi-join"),
    Q("sql_scalar_subquery", _sql_query(SQL_SCALAR_SUBQUERY), SQL_SCALAR_SUBQUERY, "text-SQL scalar subquery"),
    Q("sql_in_subquery", _sql_query(SQL_IN_SUBQUERY), SQL_IN_SUBQUERY, "text-SQL IN -> semi-join"),
    Q("sql_cte_window", _sql_query(SQL_CTE_WINDOW), SQL_CTE_WINDOW, "text-SQL CTE + window rank"),
    Q("sql_not_in_anti", _sql_query(SQL_NOT_IN_ANTI), SQL_NOT_IN_ANTI, "text-SQL NOT IN -> anti-join"),
    Q(
        "sql_recursive_chain",
        _sql_query(SQL_RECURSIVE_CHAIN),
        SQL_RECURSIVE_CHAIN,
        "WITH RECURSIVE transitive walk, cross-checked vs pointer-jump BFS",
    ),
    Q("sql_udf_scalar", sql_udf_scalar, SQL_UDF_ORACLE, "SQL-defined scalar function (declarative UDF, fully codegen)"),
    Q("sql_pivot_syntax", sql_pivot_syntax, SQL_PIVOT_ORACLE, "native PIVOT clause vs its CASE-aggregation expansion"),
    Q("sql_parameterized", sql_parameterized, SQL_PARAM_ORACLE, "named-parameter SQL binding (injection-safe literals)"),
]
