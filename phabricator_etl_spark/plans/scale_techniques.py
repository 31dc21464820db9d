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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t

N_BUCKETS = 8
SALT_BUCKETS = 16


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """One-time bucketed materialization of orders+lineitem on the join key.
    saveAsTable is required (bucket metadata lives in the catalog)."""
    import re

    # sanitize EVERY non-identifier character (dots, hyphens, ...): the tag
    # lands in a SQL table name, where "sf0.1" or "sf0-empty" would fail
    tag = re.sub(r"\W", "_", os.path.basename(sf_dir.rstrip("/")))
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


def sorted_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-clustered storage as a data-skipping lever: lineitem is staged
    once range-partitioned + sorted by l_shipdate with small parquet row
    groups, so every row group's min/max shipdate stats cover a narrow
    slice. A tight date-range query then prunes at THREE levels — partition
    files (range partitioning), row groups (statistics), and pages — before
    a single value is decoded. At 100 TB this is the difference between
    scanning a week and scanning the decade; it's the poor-man's form of
    what Delta/Iceberg call clustering/Z-ordering, expressed with nothing
    but repartitionByRange + sortWithinPartitions. The oracle runs the same
    filter over the unsorted original, certifying layout never changes
    results."""
    import shutil

    tag = os.path.basename(sf_dir.rstrip("/"))
    stage = os.path.join(tempfile.gettempdir(), f"sorted_li_{tag}")
    # Marker carries a content fingerprint (source mtime+size): if the
    # source lineitem.parquet is regenerated under the same sf_dir basename,
    # the stale stage is rebuilt instead of silently reused.
    src = os.path.join(sf_dir, "lineitem.parquet")
    st = os.stat(src)
    marker = os.path.join(stage, f"_STAGED_v2_{int(st.st_mtime)}_{st.st_size}")
    if not os.path.exists(marker):
        shutil.rmtree(stage, ignore_errors=True)
        (
            _t(spark, sf_dir, "lineitem")
            .select("l_shipdate", "l_orderkey", "l_quantity", "l_extendedprice")
            .repartitionByRange(8, "l_shipdate")
            .sortWithinPartitions("l_shipdate")
            .write.mode("overwrite")
            # ~1 MiB row groups: many stat ranges per file -> fine-grained
            # skipping (the default 128 MiB group would put the whole file
            # in one stats bucket at this scale)
            .option("parquet.block.size", 1 << 20)
            .parquet(stage)
        )
        with open(marker, "w") as f:
            f.write("ok\n")
    back = spark.read.parquet(stage).filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents"),
    )


SORTED_SKIP_ORACLE = """
SELECT COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
"""


ZORDER_BITS = 16  # per-dimension bits; 2^16 covers part/supp keys at any test SF


def _morton(px: Column, sx: Column) -> Column:
    """Z-order (Morton) interleave of two non-negative int columns.

    Pure codegen bit arithmetic — ((p >> i) & 1) placed at bit 2i+1 and
    ((s >> i) & 1) at bit 2i — no UDF, evaluated map-side during the one-time
    staging write.
    """
    z = F.lit(0).cast("long")
    for i in range(ZORDER_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(px, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(sx, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def zorder_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column data skipping via Z-order clustering (the public
    Delta/Iceberg OPTIMIZE ZORDER technique, expressed with plain Spark).

    A single-column sort (sorted_file_skipping) only skips on that column; a
    rectangle predicate over TWO columns needs the layout to localize both.
    Staging lineitem range-partitioned + sorted by the Morton interleave of
    (l_partkey, l_suppkey) makes every small row group cover a compact 2-D
    tile, so min/max stats on BOTH columns are narrow and a rectangle query
    prunes row groups on either predicate. The oracle runs the same filter
    over the unsorted original — layout can never change results.

    At 100 TB: the stage write is one shuffle (repartitionByRange on the
    z-value); every later rectangle query reads only the tiles it overlaps.
    """
    import shutil

    tag = os.path.basename(sf_dir.rstrip("/"))
    stage = os.path.join(tempfile.gettempdir(), f"zorder_li_{tag}")
    src = os.path.join(sf_dir, "lineitem.parquet")
    st = os.stat(src)
    marker = os.path.join(stage, f"_STAGED_v1_{int(st.st_mtime)}_{st.st_size}")
    if not os.path.exists(marker):
        shutil.rmtree(stage, ignore_errors=True)
        (
            _t(spark, sf_dir, "lineitem")
            .select("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
            .withColumn("z", _morton(F.col("l_partkey"), F.col("l_suppkey")))
            .repartitionByRange(8, "z")
            .sortWithinPartitions("z")
            .drop("z")
            .write.mode("overwrite")
            .option("parquet.block.size", 1 << 20)  # fine-grained stats tiles
            .parquet(stage)
        )
        with open(marker, "w") as f:
            f.write("ok\n")
    back = spark.read.parquet(stage).filter(
        (F.col("l_partkey") >= 100)
        & (F.col("l_partkey") < 200)
        & (F.col("l_suppkey") >= 10)
        & (F.col("l_suppkey") < 40)
    )
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents"),
    )


ZORDER_SKIP_ORACLE = """
SELECT COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM lineitem
WHERE l_partkey >= 100 AND l_partkey < 200
  AND l_suppkey >= 10 AND l_suppkey < 40
"""


def shuffle_hash_hint_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit join-strategy control: the SHUFFLE_HASH hint forces a
    shuffled hash join for the mid-size dimension case — too big to
    broadcast at 100 TB (a 10 GB customer dim would OOM every executor's
    broadcast cache), but small enough per-partition to hash, so the sort
    phase a sort-merge join would pay on BOTH sides is skipped. Same
    result as the hint-free plan (the oracle is the plain join); only the
    physical strategy moves. Plan-audited for ShuffledHashJoin in
    tests/test_plan_audits.py."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        )
        .orderBy("c_mktsegment")
    )


SHUFFLE_HASH_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def salted_replicated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-join salting: the join-side counterpart of the salted agg.

    The probe side (lineitem) appends a salt derived from a NON-join column
    (l_linenumber) so a hot join key's rows spread over SALT_BUCKETS
    reducers; the build side (orders) replicates each row SALT_BUCKETS ways
    via a literal-range explode. The join key becomes (key, salt) — still an
    equi-join, but no single reducer owns a hot key. This is what AQE's
    skewedJoin rewrite does adaptively; expressed manually it also covers
    engines/paths AQE can't reach (e.g. a stateful streaming join). The
    oracle is the plain join — salting must be invisible."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        (F.col("l_linenumber") % SALT_BUCKETS).cast("int").alias("__salt"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))).alias("__salt"),
    )
    joined = li.join(
        o, (li.l_orderkey == o.o_orderkey) & (li.__salt == o.__salt)
    )
    return (
        joined.groupBy("o_orderpriority", "l_returnflag")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"), F.sum("cents").alias("cents"))
        .orderBy("o_orderpriority", "l_returnflag")
    )


SALTED_JOIN_ORACLE = """
SELECT o_orderpriority, l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


SCALE_QUERIES = [
    Q("bucketed_colocated_join", bucketed_colocated_join, BUCKETED_ORACLE, "bucketed join, no Exchange"),
    Q("salted_skew_aggregation", salted_skew_aggregation, SALTED_ORACLE, "two-phase salted agg"),
    Q("salted_replicated_join", salted_replicated_join, SALTED_JOIN_ORACLE, "replicate-build skew join salting"),
    Q("sorted_file_skipping", sorted_file_skipping, SORTED_SKIP_ORACLE, "sort-clustered parquet row-group pruning"),
    Q("zorder_file_skipping", zorder_file_skipping, ZORDER_SKIP_ORACLE, "Z-order (Morton) 2-D clustering for rectangle-predicate skipping"),
    Q("shuffle_hash_hint_join", shuffle_hash_hint_join, SHUFFLE_HASH_ORACLE, "SHUFFLE_HASH strategy hint"),
]
