"""Extended operator surface beyond the reference's inventory.

The reference has no as-of joins, analytic frames, lead/lag, grouping sets,
or distinct aggregates (SURVEY.md §2.4/§2.5 "not present"); a user moving
real workloads onto this engine needs them, so they are implemented here as
first-class gated queries.

Scale notes per query; the as-of join is the interesting one: Spark has no
native ASOF, and the naive per-key crossJoin explodes. The scalable
composition is the union trick — tag both streams, sort within (key) by
(ts, tag), and carry the most recent build-side row forward with last_value
IGNORE NULLS over an unbounded-preceding frame. One shuffle on the key,
no join at all; at 100 TB this is strictly better than a range join
because the state per key is O(1).
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..query import Q
from ..sources.catalog import load_table as _t


def _ts(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


# ---------------------------------------------------------------------------
# As-of join: latest order at-or-before each event, per customer.
# ---------------------------------------------------------------------------

def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("key"),
        F.col("ts").alias("etime"),
        F.col("event_id").cast("long").alias("event_id"),
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("key"),
        F.col("o_orderdate").alias("otime"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
    )
    # union trick: orders sort before events at equal timestamps (tag 0 < 1)
    # so ts >= o_orderdate matches inclusively, mirroring ASOF semantics.
    # Equal-timestamp orders tie-break to the LARGEST o_orderkey so the
    # carried row is deterministic (DuckDB ASOF picks one arbitrarily; we
    # pin the winner and mirror it in the oracle).
    tagged = o.select(
        "key", F.col("otime").alias("t"), F.lit(0).alias("tag"),
        F.col("o_orderkey").alias("carry"), F.lit(None).cast("long").alias("event_id"),
    ).unionByName(
        e.select(
            "key", F.col("etime").alias("t"), F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("carry"), "event_id",
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy(F.col("t"), F.col("tag"), F.col("carry").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn("matched_order", F.last("carry", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("tag") == 1)
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            _ts("t").alias("event_ts"),
            F.col("matched_order").alias("o_orderkey"),
        )
    )


ASOF_ORACLE = """
WITH ranked_orders AS (
  -- pin the winner among equal-timestamp orders: largest orderkey
  SELECT o_custkey, o_orderdate, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
  FROM orders
)
SELECT CAST(e.event_id AS BIGINT) AS event_id,
       CAST(e.user_id AS BIGINT) AS user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
       CAST(o.o_orderkey AS BIGINT) AS o_orderkey
FROM events e
ASOF LEFT JOIN (SELECT * FROM ranked_orders WHERE rn = 1) o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


# ---------------------------------------------------------------------------
# Lead/lag + rolling analytic frames.
# ---------------------------------------------------------------------------

def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline: gap to previous order, next status."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        (F.unix_timestamp("o_orderdate") - F.unix_timestamp(F.lag("o_orderdate").over(w)))
        .cast("long").alias("gap_seconds"),
        F.lead("o_orderstatus").over(w).alias("next_status"),
        F.row_number().over(w).cast("long").alias("seq"),
    )


LEAD_LAG_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(epoch(o_orderdate) - epoch(LAG(o_orderdate) OVER w) AS BIGINT) AS gap_seconds,
       LEAD(o_orderstatus) OVER w AS next_status,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def window_rolling_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-order spend per customer (rowsBetween frame) + running
    total (unbounded preceding) — the analytic frames the reference lacks."""
    o = _t(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.sum(cents).over(base.rowsBetween(-2, 0)).alias("rolling3_cents"),
        F.sum(cents).over(base.rowsBetween(Window.unboundedPreceding, 0)).alias("running_cents"),
    )


ROLLING_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling3_cents,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
FROM orders
"""


# ---------------------------------------------------------------------------
# Grouping sets / rollup + distinct aggregates.
# ---------------------------------------------------------------------------

def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority): per-pair, per-status, grand total.
    Spark expands grouping sets via a single Expand node — one scan, one
    shuffle, regardless of the number of sets.

    Empty-relation patch (r5 verdict #5): the SQL standard's () grouping
    set emits one grand-total row even over an empty relation (DuckDB and
    Postgres do); Spark's rollup emits nothing. Restore standard semantics
    declaratively: a CONSTANT grand-total row (COUNT=0, SUM=NULL — the only
    possible () aggregate of zero rows) survives a left-anti join against
    ``input.limit(1)``, i.e. exactly when the input has no rows. No driver
    branch, and at scale the probe reads ~one row of one partition."""
    o = _t(spark, sf_dir, "orders")
    rolled = (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            F.col("n").cast("long").alias("n"),
            "cents",
        )
    )
    empty_total = spark.range(1).select(
        F.lit("<all>").alias("status"),
        F.lit("<all>").alias("priority"),
        F.lit(0).cast("long").alias("n"),
        F.lit(None).cast("long").alias("cents"),
    )
    probe = o.select(F.lit(1).alias("one")).limit(1)
    return rolled.unionByName(empty_total.join(probe, F.lit(True), "left_anti"))


ROLLUP_ORACLE = """
SELECT COALESCE(o_orderstatus, '<all>') AS status,
       COALESCE(o_orderpriority, '<all>') AS priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates (absent from the reference): exact distinct
    counts per group; Spark plans these as a two-phase expand+aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").cast("long").alias("distinct_parts"),
            F.countDistinct("l_suppkey").cast("long").alias("distinct_supps"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS distinct_parts,
       COUNT(DISTINCT l_suppkey) AS distinct_supps,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# W3 as a no-window aggregation: min(struct) instead of row_number. The
# struct-min form is a pure partial aggregate — no sort, no window state;
# at scale it beats the window for "pick one row per key" by a wide margin.
# ---------------------------------------------------------------------------

def w3_first_by_struct_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    picked = (
        o.groupBy("o_custkey")
        .agg(F.min(F.struct("o_orderdate", "o_orderkey", "o_orderpriority")).alias("first"))
    )
    return picked.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("first.o_orderkey").cast("long").alias("first_orderkey"),
        F.col("first.o_orderpriority").alias("first_priority"),
    )


W3_STRUCT_ORACLE = """
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS first_orderkey,
       o_orderpriority AS first_priority
FROM orders
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
"""


# ---------------------------------------------------------------------------
# Partitioned sink round-trip (§4.4): ym-partitioned write, pruned read.
# ---------------------------------------------------------------------------

def sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders partitioned by ym (the reference's month-loop unit as a
    partition column), read back ONE month through partition pruning, and
    aggregate it. The checked result proves the round-trip preserves rows
    and the pruned read matches a direct filter."""
    o = _t(spark, sf_dir, "orders")
    target = os.path.join(tempfile.gettempdir(), f"ym_sink_{os.path.basename(sf_dir.rstrip('/'))}")
    staged = o.withColumn("ym", F.date_format("o_orderdate", "yyyy-MM"))
    (
        staged
        # cluster by the partition column before the partitioned write:
        # without this every task writes a file into every ym directory
        # (tasks x months small files — the classic 100 TB sink mistake);
        # with it each month is one file written by one task
        .repartition("ym")
        .write.mode("overwrite")
        .partitionBy("ym")
        .parquet(target)
    )
    # explicit schema on the read-back: schema inference fails on the
    # zero-file directory an empty input produces (and is a listing round
    # trip we already know the answer to)
    back = spark.read.schema(staged.schema).parquet(target).filter(F.col("ym") == "1995-03")
    return back.groupBy("ym").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        F.countDistinct("o_custkey").cast("long").alias("customers"),
    )


SINK_ORACLE = """
SELECT strftime(o_orderdate, '%Y-%m') AS ym,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
       COUNT(DISTINCT o_custkey) AS customers
FROM orders
WHERE strftime(o_orderdate, '%Y-%m') = '1995-03'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Pandas-UDF parity demo (§2.10): the same integer quality score as
# functions/text.py computed through an Arrow-vectorized scalar UDF —
# demonstrating the sanctioned slow path gives identical results, and
# letting bench quantify the JVM-vs-Arrow gap.
# ---------------------------------------------------------------------------

@F.pandas_udf(T.LongType())
def _quality_pandas(text: pd.Series) -> pd.Series:
    import re as _re

    toks = text.str.split(r"\s+", regex=True)
    n_tokens = toks.map(len)
    n_distinct = toks.map(lambda t: len(set(t)))
    n_punct = text.map(lambda s: len(_re.sub(r"[^.,!?;:]", "", s)))
    n_chars = text.str.len()
    length_comp = (n_chars.clip(upper=500) / 5).map(int)
    # pandas .round() is banker's (half-even); SQL round is half-away —
    # floor(x + 0.5) matches for the positive ratios here
    import numpy as np

    diversity = np.floor(100.0 * n_distinct / n_tokens + 0.5).map(int)
    punct_pen = (n_punct * 5).clip(upper=50)
    return (length_comp + diversity - punct_pen).astype("int64")


def pandas_udf_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _quality_pandas(F.col("text")).alias("quality_score"),
    )


PANDAS_QUALITY_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(text, '\s+')) AS n_tokens,
         len(list_distinct(regexp_split_to_array(text, '\s+'))) AS n_distinct,
         length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
         length(text) AS n_chars
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(floor(least(n_chars, 500) / 5)
            + round(100.0 * n_distinct / n_tokens)
            - least(n_punct * 5, 50) AS BIGINT) AS quality_score
FROM t
"""


# ---------------------------------------------------------------------------
# Grouped-map applyInPandas: per-group model fitting — the one Pandas-UDF
# shape the engine hadn't exercised (scalar pandas_udf above, mapInPandas in
# multimodal, applyInPandasWithState in streaming). Each group arrives as ONE
# pandas DataFrame (so the group must fit an executor — fine for per-key
# model fits, the canonical use), and the fit returns EXACT integer
# sufficient statistics of the OLS slope of value_cents over day index:
# num = n*Σxy - Σx*Σy, den = n*Σx² - (Σx)² (slope = num/den). Integer stats
# instead of the float slope make the cross-engine compare bit-exact —
# DuckDB recomputes the same sums in bigint.
# ---------------------------------------------------------------------------

_REGR_SCHEMA = (
    "event_type string, n_points long, slope_num long, slope_den long"
)


def _fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
    x = pdf["x"].astype("int64")
    y = pdf["y"].astype("int64")
    n = int(len(pdf))
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx = int((x * x).sum())
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n_points": [n],
            "slope_num": [n * sxy - sx * sy],
            "slope_den": [n * sxx - sx * sx],
        }
    )


def _arrow_token_stats(batches):
    """RecordBatch -> RecordBatch token/char stats, pure pyarrow.compute —
    no pandas materialization at all (mapInArrow skips even the
    Arrow<->pandas conversion mapInPandas pays)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for b in batches:
        text = b.column(b.schema.get_field_index("text"))
        toks = pc.list_value_length(pc.split_pattern_regex(text, r"\s+"))
        yield pa.RecordBatch.from_arrays(
            [
                pc.cast(b.column(b.schema.get_field_index("doc_id")), pa.int64()),
                pc.cast(toks, pa.int64()),
                pc.cast(pc.utf8_length(text), pa.int64()),
            ],
            ["doc_id", "n_tokens", "n_chars"],
        )


def arrow_map_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the LOWEST-overhead Python escape hatch (Spark 4) — the
    worker receives raw Arrow RecordBatches and returns RecordBatches, with
    no pandas conversion on either side. Completes the Python-execution
    surface next to scalar pandas_udf, mapInPandas, applyInPandas,
    applyInPandasWithState / transformWithStateInPandas, UDTFs, and the
    Python DataSource. Same contract as every Python node here: these token
    stats are ALSO expressible as codegen expressions (functions/text.py
    does exactly that) — the query certifies the API, the oracle certifies
    the values."""
    d = _t(spark, sf_dir, "documents").select(F.col("doc_id"), F.col("text"))
    return d.mapInArrow(_arrow_token_stats, "doc_id long, n_tokens long, n_chars long")


ARROW_MAP_ORACLE = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def _arrow_group_stats(key, table):
    """applyInArrow grouped-map: one pyarrow.Table per group in, one out.
    Exact integer stats only (sum of cents, count, min/max id) so the
    cross-engine compare is bit-exact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cents = table.column("cents")
    return pa.table(
        {
            "event_type": [key[0].as_py()],
            "n_events": [table.num_rows],
            "value_cents": [pc.sum(cents).as_py() or 0],
            "min_event_id": [pc.min(table.column("event_id")).as_py()],
            "max_event_id": [pc.max(table.column("event_id")).as_py()],
        }
    )


def arrow_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInArrow (Spark 4): grouped-map with raw Arrow Tables — the
    grouped sibling of mapInArrow, completing the Arrow-native pair next to
    the pandas-based applyInPandas. The group key arrives as Arrow scalars;
    the whole group must fit one executor (canonical per-key-aggregate /
    model-fit shape)."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type"),
        F.col("event_id").cast("long").alias("event_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = ev.groupBy("event_type").applyInArrow(
        _arrow_group_stats,
        "event_type string, n_events long, value_cents long, min_event_id long, max_event_id long",
    )
    return out.orderBy("event_type")


ARROW_GROUPED_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(COALESCE(SUM(CAST(round(value * 100) AS BIGINT)), 0) AS BIGINT) AS value_cents,
       CAST(MIN(event_id) AS BIGINT) AS min_event_id,
       CAST(MAX(event_id) AS BIGINT) AS max_event_id
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def grouped_map_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    return (
        base.groupBy("event_type")
        .applyInPandas(_fit_group, schema=_REGR_SCHEMA)
        .orderBy("event_type")
    )


GROUPED_REGR_ORACLE = """
WITH b AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_points,
       CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) AS slope_num,
       CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS slope_den
FROM b
GROUP BY event_type
ORDER BY event_type
"""


def scd2_order_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 interval build: each order becomes a validity interval
    [valid_from, valid_to) per customer, closed by the NEXT order's date
    (lead), open-ended for the current row. The standard
    snapshot→time-versioned-dimension move, one window pass — no self-join.
    At 100 TB: one shuffle on the dimension key; the lead frame is O(1)
    state per row."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_orderstatus").alias("status"),
        _ts("o_orderdate").alias("valid_from"),
        _ts(nxt).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


SCD2_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       o_orderstatus AS status,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(LEAD(o_orderdate) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
       LEAD(o_orderdate) OVER w IS NULL AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per-user rolling 1-hour spend over events —
    the frame is defined by VALUE distance (epoch seconds), not row count,
    so peers and gaps behave identically however ties land. Completes the
    frame family next to rowsBetween (window_rolling_frames)."""
    e = _t(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy(sec).rangeBetween(-3600, 0)
    return e.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.sum(cents).over(w).alias("hour_cents"),
    )


TIME_RANGE_ORACLE = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       -- FLOOR before CAST: Spark's unix_timestamp truncates sub-second
       -- parts while a bare CAST(epoch(..)) in DuckDB rounds half-even, so
       -- RANGE frame edges straddling a second boundary diverge (first
       -- seen in the sf0.1 strict sweep; sf0.01 has no straddling pair).
       CAST(SUM(CAST(round(value * 100) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) AS hour_cents
FROM events
"""




# ---------------------------------------------------------------------------
# Python UDTF (Spark 4): the table-function extension point — one input row
# fans out to N output rows with a DECLARED schema, consumed via LATERAL
# join. Completes the user-function family next to scalar pandas_udf,
# mapInPandas, applyInPandas, and applyInPandasWithState. Row-at-a-time
# Python IS the slow path (SURVEY §2.10) — the demo runs over the 25-row
# nation dim; at scale the same fan-out over big tables should be the
# built-in explode/posexplode the oracle states.
# ---------------------------------------------------------------------------

def udtf_lateral_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: int")
    class SplitTokens:
        def eval(self, text: str):
            for i, tok in enumerate(text.split()):
                yield tok, i

    spark.udtf.register("split_tokens", SplitTokens)
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_udtf_src")
    return spark.sql(
        """
        SELECT n_name, token, pos
        FROM nation_udtf_src, LATERAL split_tokens(n_name)
        """
    )


UDTF_LATERAL_ORACLE = r"""
WITH s AS (SELECT n_name, regexp_split_to_array(n_name, '\s+') AS sp FROM nation)
SELECT n_name, sp[CAST(i AS INT)] AS token, CAST(i - 1 AS INT) AS pos
FROM s, LATERAL (SELECT unnest(range(1, len(sp) + 1)) AS i) t
"""


UDTF_N_COLS = 3


def udtf_polymorphic_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 `analyze()` static method): the
    output schema is COMPUTED at plan time from a constant argument — here
    "give me the first N tokens as N string columns". The engine calls
    analyze() with the foldable argument during resolution, so downstream
    operators see a concrete schema and column pruning still works; eval()
    then pads/truncates each row to exactly N fields. This is the
    schema-on-demand contract fixed-returnType UDTFs can't express.
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class FirstTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(int(n.value)):
                schema = schema.add(f"t{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            toks = text.split()
            yield tuple((toks[i] if i < len(toks) else None) for i in range(n))

    spark.udtf.register("first_tokens", udtf(FirstTokens))
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_udtf_src2")
    return spark.sql(
        f"""
        SELECT n_name, t.*
        FROM nation_udtf_src2, LATERAL first_tokens(n_name, {UDTF_N_COLS}) t
        ORDER BY n_name
        """
    )


UDTF_POLY_ORACLE = rf"""
WITH s AS (SELECT n_name, regexp_split_to_array(n_name, '\s+') AS sp FROM nation)
SELECT n_name,
       CASE WHEN len(sp) >= 1 THEN sp[1] END AS t0,
       CASE WHEN len(sp) >= 2 THEN sp[2] END AS t1,
       CASE WHEN len(sp) >= 3 THEN sp[3] END AS t2
FROM s
ORDER BY n_name
"""


def sql_modern_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL conveniences shared by Spark 4 and DuckDB — GROUP BY ALL
    (group on every non-aggregate select item) and ORDER BY ALL — run as the
    SAME text on both engines (the strongest parity form, like the
    sql_interface family)."""
    from .sql_interface import register_views

    register_views(spark, sf_dir)
    return spark.sql(SQL_MODERN_TEXT)


SQL_MODERN_TEXT = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


def sql_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases: a SELECT item referencing an alias defined
    earlier in the SAME select list (no subquery nesting needed) — same text
    on both engines."""
    from .sql_interface import register_views

    register_views(spark, sf_dir)
    return spark.sql(SQL_LATERAL_ALIAS_TEXT)


SQL_LATERAL_ALIAS_TEXT = """
SELECT o_orderpriority,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       -- FLOOR, not a bare int cast: double->int casts round in DuckDB but
       -- truncate in Spark; floor-then-cast is identical on both
       CAST(FLOOR(cents / n_orders) AS BIGINT) AS avg_cents_floor
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def obs_metrics_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Observation API: data-quality counters collected DURING the scan
    of the main job — no second pass over the table. At 100 TB this is how
    a load job reports row counts / null rates / guard-rail breaches
    without doubling its I/O: observe() attaches accumulator-backed metric
    expressions to the plan; any action materializes them. The emitted
    result is the metric row itself, oracle-checked against a plain
    aggregation — proving the inline metrics equal the ground truth."""
    from pyspark.sql import Observation

    li = _t(spark, sf_dir, "lineitem")
    obs = Observation()
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_cents"),
        F.sum((F.col("l_discount") > 0.05).cast("long")).alias("n_high_discount"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("n_null_qty"),
    )
    observed.count()  # the "main job"; metrics ride along
    row = obs.get
    return spark.createDataFrame(
        [(row["n_rows"], row["sum_cents"], row["n_high_discount"], row["n_null_qty"])],
        "n_rows long, sum_cents long, n_high_discount long, n_null_qty long",
    )


OBS_METRICS_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_discount,
       CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_qty
FROM lineitem
"""


EXTENSION_QUERIES = [
    Q("asof_join_events_orders", asof_join_events_orders, ASOF_ORACLE, "as-of join via union trick"),
    Q("obs_metrics_inline", obs_metrics_inline, OBS_METRICS_ORACLE, "Observation API: scan-time DQ counters"),
    Q("window_lead_lag", window_lead_lag, LEAD_LAG_ORACLE, "lead/lag timeline"),
    Q("window_rolling_frames", window_rolling_frames, ROLLING_ORACLE, "rolling + running frames"),
    Q("agg_rollup", agg_rollup, ROLLUP_ORACLE, "ROLLUP grouping sets"),
    Q("agg_distinct", agg_distinct, DISTINCT_ORACLE, "exact distinct aggregates"),
    Q("w3_first_by_struct_min", w3_first_by_struct_min, W3_STRUCT_ORACLE, "no-window top-1 via struct-min"),
    Q("sink_partitioned_roundtrip", sink_partitioned_roundtrip, SINK_ORACLE, "ym-partitioned sink + pruned read"),
    Q("pandas_udf_quality", pandas_udf_quality, PANDAS_QUALITY_ORACLE, "Arrow pandas_udf parity"),
    Q("udtf_lateral_tokens", udtf_lateral_tokens, UDTF_LATERAL_ORACLE, "Python UDTF via LATERAL join"),
    Q("udtf_polymorphic_columns", udtf_polymorphic_columns, UDTF_POLY_ORACLE, "polymorphic UDTF: analyze()-computed output schema"),
    Q("sql_modern_syntax", sql_modern_syntax, SQL_MODERN_TEXT, "GROUP BY ALL / ORDER BY ALL, same text on both engines"),
    Q("sql_lateral_alias", sql_lateral_alias, SQL_LATERAL_ALIAS_TEXT, "lateral column alias referenced in the same select list"),
    Q("grouped_map_regression", grouped_map_regression, GROUPED_REGR_ORACLE, "applyInPandas per-group OLS fit"),
    Q("arrow_map_batches", arrow_map_batches, ARROW_MAP_ORACLE, "mapInArrow RecordBatch pass (no pandas conversion)"),
    Q("arrow_grouped_stats", arrow_grouped_stats, ARROW_GROUPED_ORACLE, "applyInArrow grouped-map (Arrow Tables per group)"),
    Q("scd2_order_intervals", scd2_order_intervals, SCD2_ORACLE, "SCD2 validity intervals via lead"),
    Q("window_time_range", window_time_range, TIME_RANGE_ORACLE, "time-valued RANGE frame"),
]
