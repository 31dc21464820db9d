"""Incremental / watermark / upsert layer (SURVEY.md §2.9, S2/S5/S6/W2/P6).

The reference's protocol: read the destination's MAX(date_modified) as the
last-run watermark (get_last_run_timestamp, stats.py:757-772), filter the
source to rows changed since (get_time_queries, stats.py:828-873), dedup the
staging batch with ROW_NUMBER ... QUALIFY =1 (stats.py:916-923), then MERGE
matched->UPDATE / not-matched->INSERT (merge_into_bigquery, stats.py:896-939).

Spark-native: the watermark read is an agg on the destination; the merge is
the deterministic join-rewrite `target left-anti staging UNION staging` —
exactly what Delta's MERGE compiles to for whole-row upserts. On a real
deployment the sink is Delta `MERGE INTO` (ACID, no staging tables needed —
S3/S6/S7 disappear); these queries prove the semantics on plain DataFrames.

Scale: the anti-join shuffles both sides on the merge key once; with the
destination bucketed/partitioned by key (the ym-partitioning of SURVEY §4.4)
the rewrite touches only affected partitions (dynamic partition overwrite).

Tables stand in as follows: orders with status 'F' = already-loaded
destination; status 'O' = new source rows; events = a staging feed with
per-key duplicates to dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..query import Q
from ..sources.catalog import load_table as _t


def _ts(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


def incr_watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 + P6: destination-max readback drives the source window filter.

    The watermark is a 1-row aggregate broadcast into the filter — the
    declarative form of `SELECT MAX(..)` then `WHERE date > last_run`
    (stats.py:757-772, 841-869). Only rows strictly newer than the watermark
    pass, OR-ed with a created-after bound exactly like get_time_queries."""
    o = _t(spark, sf_dir, "orders")
    dest = o.filter(F.col("o_orderstatus") == "F")
    wm = dest.agg(F.max("o_orderdate").alias("last_run"))
    src = o.filter(F.col("o_orderstatus") != "F")
    return (
        src.crossJoin(F.broadcast(wm))
        .filter(F.col("o_orderdate") > F.col("last_run"))
        .select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            "o_orderstatus",
            _ts("o_orderdate").alias("order_ts"),
            _ts("last_run").alias("watermark_ts"),
        )
    )


INCR_WATERMARK_ORACLE = """
WITH wm AS (SELECT MAX(o_orderdate) AS last_run FROM orders WHERE o_orderstatus = 'F')
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       o_orderstatus,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts,
       strftime(last_run, '%Y-%m-%d %H:%M:%S') AS watermark_ts
FROM orders, wm
WHERE o_orderstatus <> 'F' AND o_orderdate > last_run
"""


def incr_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 + W2: window-dedup the staging feed, then join-rewrite MERGE.

    staging = latest event per user (ROW_NUMBER QUALIFY = 1, the literal
    reference pattern stats.py:916-923); target = one synthetic current row
    per even user_id. Result = matched rows replaced by staging, unmatched
    target rows untouched, new staging keys inserted — byte-for-byte what
    `MERGE ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT` yields."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    staging = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_type").alias("state"),
            _ts("ts").alias("updated_ts"),
        )
    )
    target = (
        e.filter(F.col("user_id") % 2 == 0)
        .select(F.col("user_id").cast("long").alias("user_id"))
        .distinct()
        .select("user_id", F.lit("baseline").alias("state"), F.lit("1970-01-01 00:00:00").alias("updated_ts"))
    )
    merged = target.join(staging, "user_id", "left_anti").unionByName(staging)
    return merged.select(
        "user_id",
        "state",
        "updated_ts",
        (F.col("state") != "baseline").alias("was_upserted"),
    )


INCR_MERGE_ORACLE = """
WITH staging AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         event_type AS state,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS updated_ts
  FROM events
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
), target AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id,
         'baseline' AS state, '1970-01-01 00:00:00' AS updated_ts
  FROM events WHERE user_id % 2 = 0
)
SELECT user_id, state, updated_ts, state <> 'baseline' AS was_upserted
FROM (
  SELECT t.* FROM target t ANTI JOIN staging s USING (user_id)
  UNION ALL
  SELECT * FROM staging
)
"""


def incr_month_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 + §4.4: the reference's month-loop merge unit re-expressed as a
    ym partition column plus per-partition upsert stats — what a
    partitionBy('ym') Delta write would commit per month, including the
    recency-winner rule within each (key, month)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", F.date_format("o_orderdate", "yyyy-MM")).orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("latest_cents"),
        )
        .orderBy("ym")
    )


INCR_MONTH_ORACLE = """
WITH latest AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym, o_totalprice
  FROM orders
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY o_custkey, strftime(o_orderdate, '%Y-%m')
    ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
)
SELECT ym, COUNT(*) AS n_keys,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS latest_cents
FROM latest
GROUP BY ym
ORDER BY ym
"""


# ---------------------------------------------------------------------------
# Delete maintenance (the TPC-H RF2 shape, public spec): retire a keyed batch
# of orders AND their lineitems from the maintained state — the GDPR-/
# retention-delete every lakehouse runs. The delete set derives from a
# content hash (reproducible without coordination); fact rows follow their
# parent via one anti-join each. On Delta this is `MERGE WHEN MATCHED THEN
# DELETE`; the join-rewrite here is what that compiles to. Output: survivor
# accounting per priority (counts + exact cents), proving cascade
# consistency (no orphaned lineitems) through the oracle.
# ---------------------------------------------------------------------------

RF_DELETE_MOD = 50  # retire ~2% of order keys per maintenance run


def incr_rf_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_long

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    doomed = o.filter(
        md5_long(F.col("o_orderkey").cast("string")) % RF_DELETE_MOD == 0
    ).select("o_orderkey")
    o_kept = o.join(doomed, "o_orderkey", "left_anti")
    li_kept = li.join(
        doomed.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", "left_anti"
    )
    li_per_order = li_kept.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents"),
    )
    return (
        o_kept.join(li_per_order, o_kept.o_orderkey == li_per_order.l_orderkey, "left")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders_kept"),
            F.sum(F.coalesce("n_lines", F.lit(0))).cast("long").alias("n_lines_kept"),
            F.sum(F.coalesce("cents", F.lit(0))).cast("long").alias("cents_kept"),
        )
        .orderBy("o_orderpriority")
    )


def _rf_delete_oracle() -> str:
    from ..functions.hashing import md5_long_sql

    h = md5_long_sql("CAST(o_orderkey AS VARCHAR)")
    return f"""
WITH doomed AS (
  SELECT o_orderkey FROM orders WHERE {h} % {RF_DELETE_MOD} = 0
), o_kept AS (
  SELECT * FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM doomed)
), li_per AS (
  SELECT l_orderkey, COUNT(*) AS n_lines,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cents
  FROM lineitem
  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM doomed)
  GROUP BY l_orderkey
)
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders_kept,
       CAST(SUM(COALESCE(li.n_lines, 0)) AS BIGINT) AS n_lines_kept,
       CAST(SUM(COALESCE(li.cents, 0)) AS BIGINT) AS cents_kept
FROM o_kept o LEFT JOIN li_per li ON li.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


INCREMENTAL_QUERIES = [
    Q("incr_watermark_filter", incr_watermark_filter, INCR_WATERMARK_ORACLE, "S2/P6 watermark window"),
    Q("incr_merge_upsert", incr_merge_upsert, INCR_MERGE_ORACLE, "S5/W2 join-rewrite MERGE"),
    Q("incr_month_partitioned", incr_month_partitioned, INCR_MONTH_ORACLE, "W5/§4.4 ym-partition upsert unit"),
    Q("incr_rf_delete", incr_rf_delete, _rf_delete_oracle(), "RF2-style cascaded delete maintenance (MERGE...DELETE join-rewrite)"),
]
