"""Snapshot-diff CDC: classify rows across two table versions.

The change-data-capture primitive for warehouses without a log: given two
snapshots of a keyed table, compute inserted / deleted / updated / unchanged
— the audit every incremental pipeline (including the reference's MERGE
protocol, plans/incremental.py) wants before trusting a load.

Spark shape: ONE full-outer join on the key comparing 60-bit row
fingerprints (md5 over a canonical rendering of the non-key columns) —
never a column-by-column comparison join, and the fingerprint means wide
tables diff at narrow-shuffle cost (key + 8 bytes). At 100 TB both sides
shuffle once on the key; with both snapshots bucketed by key the Exchange
disappears entirely (see bucketed_colocated_join).

The two "snapshots" are deterministic slices of `orders`: v_old drops keys
divisible by 97, v_new drops keys divisible by 89 and bumps the price by
1.00 where the key is divisible by 11 — so all four classes are non-empty
at every SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t
from ..functions.hashing import md5_long, md5_long_sql

_OLD_DROP = 97
_NEW_DROP = 89
_BUMP = 11


def _fingerprint(price_cents: F.Column) -> F.Column:
    return md5_long(
        F.concat_ws(
            "|",
            F.col("o_orderstatus"),
            price_cents.cast("string"),
            F.date_format(F.col("o_orderdate").cast("timestamp"), "yyyy-MM-dd HH:mm:ss"),
            F.col("o_orderpriority"),
        )
    )


def table_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    v_old = o.filter(F.col("o_orderkey") % _OLD_DROP != 0).select(
        F.col("o_orderkey").alias("k"), _fingerprint(cents).alias("h_old")
    )
    new_cents = F.when(F.col("o_orderkey") % _BUMP == 0, cents + 100).otherwise(cents)
    v_new = o.filter(F.col("o_orderkey") % _NEW_DROP != 0).select(
        F.col("o_orderkey").alias("k"), _fingerprint(new_cents).alias("h_new")
    )
    diff = v_old.join(v_new, "k", "full_outer").select(
        "k",
        F.when(F.col("h_old").isNull(), F.lit("inserted"))
        .when(F.col("h_new").isNull(), F.lit("deleted"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("k").cast("long").alias("first_key"),
        F.max("k").cast("long").alias("last_key"),
    )


def _fp_sql(cents_expr: str) -> str:
    rendered = (
        "concat_ws('|', o_orderstatus, CAST(" + cents_expr + " AS VARCHAR), "
        "strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S'), o_orderpriority)"
    )
    return md5_long_sql(rendered)


CDC_ORACLE = f"""
WITH v_old AS (
  SELECT o_orderkey AS k, {_fp_sql("CAST(ROUND(o_totalprice * 100) AS BIGINT)")} AS h_old
  FROM orders WHERE o_orderkey % {_OLD_DROP} <> 0
), v_new AS (
  SELECT o_orderkey AS k,
         {_fp_sql(f"(CASE WHEN o_orderkey % {_BUMP} = 0 THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) + 100 ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END)")} AS h_new
  FROM orders WHERE o_orderkey % {_NEW_DROP} <> 0
), diff AS (
  SELECT COALESCE(v_old.k, v_new.k) AS k,
         CASE WHEN h_old IS NULL THEN 'inserted'
              WHEN h_new IS NULL THEN 'deleted'
              WHEN h_old <> h_new THEN 'updated'
              ELSE 'unchanged' END AS change_type
  FROM v_old FULL OUTER JOIN v_new ON v_old.k = v_new.k
)
SELECT change_type, COUNT(*) AS n_rows,
       CAST(MIN(k) AS BIGINT) AS first_key, CAST(MAX(k) AS BIGINT) AS last_key
FROM diff GROUP BY change_type
"""


CDC_QUERIES = [
    Q(
        "table_diff_cdc",
        table_diff_cdc,
        CDC_ORACLE,
        "snapshot CDC diff via row fingerprints + one full-outer join",
    ),
]
