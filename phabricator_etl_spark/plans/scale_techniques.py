"""Scale techniques as first-class, checked queries.

These demonstrate — with oracle-verified results and plan-audited physical
shapes — the three levers SURVEY.md §4.4 names for the 100 TB deployment:

- bucketed co-located joins: pre-bucket both fact tables on the join key so
  the join needs NO Exchange at query time (the one-time shuffle happens at
  write). At 100 TB this turns the nightly join from the dominant shuffle
  into a map-side zip.
- salted skew aggregation: two-phase agg over a salted key. Semantics
  identical to a plain GROUP BY (the oracle is the plain form); the salt
  bounds any single reducer's input when one key dominates.
- storage-partitioned (ym) pruned scans are covered by
  extensions.sink_partitioned_roundtrip.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t

N_BUCKETS = 8
SALT_BUCKETS = 16


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """One-time bucketed materialization of orders+lineitem on the join key.
    saveAsTable is required (bucket metadata lives in the catalog)."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    ot, lt = f"orders_b_{tag}", f"lineitem_b_{tag}"

    # a fresh session has an empty in-memory catalog, but a previous run may
    # have left the managed-table directory behind — clear the orphan or
    # saveAsTable refuses with LOCATION_ALREADY_EXISTS
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    for name in (ot, lt):
        loc = os.path.join(warehouse, name)
        if not spark.catalog.tableExists(name) and os.path.exists(loc):
            shutil.rmtree(loc)

    # Materialize only the columns the co-located join consumes: bucketing
    # is a layout decision, and at 100 TB you prune columns at layout time
    # exactly as you would at scan time (a bucketed copy of cold columns
    # buys nothing — the full-width table stays in the primary layout).
    if not spark.catalog.tableExists(ot):
        (
            _t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderpriority")
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable(ot)
        )
    if not spark.catalog.tableExists(lt):
        (
            _t(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice")
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable(lt)
        )
    return ot, lt


def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem on the bucket key: zero Exchange at query time
    (asserted in tests/test_plan_audits.py). Result oracle-checked against
    the plain join."""
    ot, lt = _bucketed_tables(spark, sf_dir)
    o = spark.table(ot)
    li = spark.table(lt)
    # force sort-merge (the merge hint disables AQE's broadcast conversion):
    # at test scale the tables are broadcast-small, which would make the
    # no-Exchange claim vacuous; at 100 TB sort-merge over buckets is the
    # real plan this query exists to pin
    return (
        li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents"),
        )
        .orderBy("o_orderpriority")
    )


BUCKETED_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def salted_skew_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a deliberately skewed key
    (l_returnflag has ~3 values — every value is a hot key). Phase 1
    aggregates on (key, salt) spreading each hot key over SALT_BUCKETS
    reducers; phase 2 merges the partials. Identical semantics to the plain
    GROUP BY the oracle runs."""
    li = _t(spark, sf_dir, "lineitem")
    salted = li.withColumn("__salt", (F.col("l_orderkey") % SALT_BUCKETS).cast("int"))
    partial = salted.groupBy("l_returnflag", "__salt").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("p_qty"),
        F.count(F.lit(1)).alias("p_n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("p_cents"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("p_qty").alias("sum_qty"),
            F.sum("p_n").cast("long").alias("n"),
            F.sum("p_cents").alias("cents"),
        )
        .orderBy("l_returnflag")
    )


SALTED_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


SCALE_QUERIES = [
    Q("bucketed_colocated_join", bucketed_colocated_join, BUCKETED_ORACLE, "bucketed join, no Exchange"),
    Q("salted_skew_aggregation", salted_skew_aggregation, SALTED_ORACLE, "two-phase salted agg"),
]
