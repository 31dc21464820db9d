"""Table maintenance & data-quality operators.

The unglamorous operations that keep a 100 TB lakehouse usable:

- maint_compact_small_files: the small-file problem (every streaming /
  incremental sink produces it) fixed by a coalesce-rewrite to a target
  file count. The STAGE deliberately fragments lineitem into 64 files;
  the compaction rewrites to 8 with `coalesce` (a NARROW dependency — no
  shuffle; each output file concatenates ~8 inputs, which is exactly what
  a compactor wants, vs `repartition` which would shuffle every byte).
  The emitted result proves CONTENT INVARIANCE (row count + two integer
  checksums match the source table via the oracle) and reports the file
  counts the compaction is about.
- src_schema_evolution_union: two parquet generations (gen2 adds a
  column), read as one table with mergeSchema — the schema-evolution path
  every long-lived dataset hits; per-generation row/null accounting is
  hash-gated against an oracle that derives the same numbers from the
  source table.
- dq_referential_audit: orphan counts across the FK chain
  lineitem→orders→customer→nation via LEFT ANTI joins (the load-validation
  audit). All-zero on consistent data — the zeros are the assertion.

Staged artifacts are content-fingerprinted per (sf_dir, row count) and
reused across calls (same convention as scale_techniques staging).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t

FRAGMENT_FILES = 64
COMPACT_TARGET = 8


def _stage_dir(tag: str, sf_dir: str, nrows: int) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(tempfile.gettempdir(), f"maint_{tag}_{base}_{nrows}_v1")


def _parquet_files(path: str) -> list[str]:
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def maint_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    nrows = li.count()
    frag = _stage_dir("frag", sf_dir, nrows)
    if not os.path.exists(os.path.join(frag, "_SUCCESS")):
        li.repartition(FRAGMENT_FILES).write.mode("overwrite").parquet(frag)
    compact = _stage_dir("compact", sf_dir, nrows)
    if not os.path.exists(os.path.join(compact, "_SUCCESS")):
        # coalesce = narrow concatenation of input files, no shuffle.
        spark.read.parquet(frag).coalesce(COMPACT_TARGET).write.mode("overwrite").parquet(compact)
    out = spark.read.parquet(compact)
    # The hashed result certifies DATA integrity across the rewrite plus the
    # layout INVARIANT (a boolean — compaction never exceeds its target and
    # never grows the file count). The exact file counts are physical-plan
    # artifacts — AQE coalesces the round-robin shuffle by size, so 100 rows
    # can land in 44 files, not LEAST(100, 64) — no SQL oracle can predict
    # them; the stronger count assertions live in tests/test_formats_streaming.py.
    nb, na = len(_parquet_files(frag)), len(_parquet_files(compact))
    return out.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_cents"),
        F.lit(bool(na <= COMPACT_TARGET and na <= max(nb, 1))).alias("compaction_ok"),
    )


COMPACT_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       TRUE AS compaction_ok
FROM lineitem
"""


def src_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    nrows = o.count()
    gen = _stage_dir("gens", sf_dir, nrows)
    if not os.path.exists(os.path.join(gen, "gen=2", "_SUCCESS")):
        # gen1: the original schema; gen2: adds a priority_class column.
        o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_orderstatus").write.mode(
            "overwrite"
        ).parquet(os.path.join(gen, "gen=1"))
        o.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey",
            "o_orderstatus",
            F.substring("o_orderpriority", 1, 1).alias("priority_class"),
        ).write.mode("overwrite").parquet(os.path.join(gen, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").option("basePath", gen).parquet(
        os.path.join(gen, "gen=1"), os.path.join(gen, "gen=2")
    )
    return (
        merged.groupBy("gen")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("priority_class").isNull().cast("long")).cast("long").alias("null_new_col"),
            F.count_distinct("o_orderstatus").cast("long").alias("n_status"),
        )
        .select(F.col("gen").cast("long").alias("gen"), "n_rows", "null_new_col", "n_status")
    )


SCHEMA_EVOLUTION_ORACLE = """
SELECT CAST(gen AS BIGINT) AS gen, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN gen = 1 THEN 1 ELSE 0 END) AS BIGINT) AS null_new_col,
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_status
FROM (SELECT CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS gen, o_orderstatus
      FROM orders)
GROUP BY gen
"""


def dq_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey")
    orphan_li = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").count()
    orphan_o = o.join(c, o.o_custkey == c.c_custkey, "left_anti").count()
    orphan_c = c.join(n, c.c_nationkey == n.n_nationkey, "left_anti").count()
    return spark.createDataFrame(
        [(orphan_li, orphan_o, orphan_c)],
        "orphan_lineitems long, orphan_orders long, orphan_customers long",
    )


DQ_AUDIT_ORACLE = """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS orphan_lineitems,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS orphan_orders,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
    WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)) AS orphan_customers
"""


# ---------------------------------------------------------------------------
# dq_mad_outliers: robust per-group outlier flagging — median/MAD instead of
# mean/stddev (one fat-finger order doesn't move the fence). Exactness:
# "median" is the LOWER median (the floor((n+1)/2)-th smallest under a total
# (value, key) order) so it is an actual data value, integer, and identical
# across engines — no interpolation semantics to disagree on. Two window
# passes + one broadcast-size join per group; everything int64.
# ---------------------------------------------------------------------------

MAD_FENCE = 3  # |x - med| > MAD_FENCE * mad ⇒ outlier


def dq_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.col("o_orderkey").cast("long").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "k")
    n = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "k",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(n).alias("cnt"),
    )
    med = ranked.filter(F.col("rn") == F.floor((F.col("cnt") + 1) / 2)).select(
        "o_orderpriority", F.col("cents").alias("med")
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority", "k", "cents", "med", F.abs(F.col("cents") - F.col("med")).alias("ad")
    )
    wd = Window.partitionBy("o_orderpriority").orderBy("ad", "k")
    mad = (
        dev.select(
            "o_orderpriority",
            "ad",
            F.row_number().over(wd).alias("rn"),
            F.count(F.lit(1)).over(n).alias("cnt"),
        )
        .filter(F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
        .select("o_orderpriority", F.col("ad").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.max("med").cast("long").alias("median_cents"),
            F.max("mad").cast("long").alias("mad_cents"),
            F.sum(
                (F.col("ad") > F.lit(MAD_FENCE) * F.col("mad")).cast("long")
            ).alias("n_outliers"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


DQ_MAD_ORACLE = f"""
WITH o AS (
  SELECT o_orderpriority, CAST(o_orderkey AS BIGINT) AS k,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY cents, k) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
  FROM o
), med AS (
  SELECT o_orderpriority, cents AS med FROM ranked WHERE rn = (cnt + 1) // 2
), dev AS (
  SELECT o.o_orderpriority, o.k, o.cents, med.med, ABS(o.cents - med.med) AS ad
  FROM o JOIN med USING (o_orderpriority)
), dranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY ad, k) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
  FROM dev
), mad AS (
  SELECT o_orderpriority, ad AS mad FROM dranked WHERE rn = (cnt + 1) // 2
)
SELECT d.o_orderpriority,
       CAST(MAX(d.med) AS BIGINT) AS median_cents,
       CAST(MAX(m.mad) AS BIGINT) AS mad_cents,
       CAST(SUM(CASE WHEN d.ad > {MAD_FENCE} * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM dev d JOIN mad m USING (o_orderpriority)
GROUP BY d.o_orderpriority
ORDER BY d.o_orderpriority
"""


# ---------------------------------------------------------------------------
# dq_benford_profile: leading-digit distribution vs Benford's law — the
# classic fabricated-data / unit-mixup smell test for financial columns.
# The first significant digit comes from the DECIMAL STRING of the exact
# cents value (log10-free: floor(log10(x)) misrounds at exact powers of 10,
# and engines could disagree; substr of an integer's digits cannot).
# ---------------------------------------------------------------------------


def dq_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("long")
    total = o.count()
    return (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .withColumn("share_pct", F.round(F.lit(100.0) * F.col("n_orders") / F.lit(float(total)), 4))
        .orderBy("digit")
    )


DQ_BENFORD_ORACLE = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
), n AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM orders
)
SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(100.0 * COUNT(*) / n.total, 4) AS share_pct
FROM d CROSS JOIN n
GROUP BY digit, n.total
ORDER BY digit
"""


MAINTENANCE_QUERIES = [
    Q(
        "maint_compact_small_files",
        maint_compact_small_files,
        COMPACT_ORACLE,
        "small-file compaction by narrow coalesce-rewrite, content-invariant",
    ),
    Q(
        "src_schema_evolution_union",
        src_schema_evolution_union,
        SCHEMA_EVOLUTION_ORACLE,
        "mergeSchema read across parquet generations with an added column",
    ),
    Q(
        "dq_referential_audit",
        dq_referential_audit,
        DQ_AUDIT_ORACLE,
        "FK-chain orphan audit via left-anti joins",
    ),
    Q(
        "dq_mad_outliers",
        dq_mad_outliers,
        DQ_MAD_ORACLE,
        "median/MAD robust outlier fence per group (exact lower-median, all int64)",
    ),
    Q(
        "dq_benford_profile",
        dq_benford_profile,
        DQ_BENFORD_ORACLE,
        "Benford leading-digit profile (digit from decimal string, log10-free)",
    ),
]
