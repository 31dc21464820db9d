"""Scalar-function batteries: strings, dates, arrays, multiset set-ops,
unpivot.

The reference's scalar surface is tiny (SURVEY.md §2.8: JSON + prefix tests +
epoch bucketing); a usable engine needs the full everyday function library.
Each battery packs many functions into one gated query so the DuckDB oracle
certifies exact cross-engine semantics — including the classic portability
traps, handled explicitly:

- Spark ``dayofweek`` is 1-based Sunday=1; DuckDB ``EXTRACT(dow)`` is 0-based
  Sunday=0 (oracle adds 1).
- ``regexp_extract`` returns '' on no-match in BOTH engines (probed, not
  assumed).
- Date-typed results are formatted to strings before hashing so date vs
  timestamp representation differences can't leak into the comparison.

All batteries are pure projections (no shuffle) except the set-ops and
unpivot queries — at 100 TB every function here runs inside whole-stage
codegen; nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t


# --------------------------------------------------------------------------
# String battery over documents.text — one row per doc, 12 functions.
# --------------------------------------------------------------------------

def fn_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.upper(F.col("lang")).alias("lang_upper"),
        F.lower(F.substring(t, 1, 12)).alias("head_lower"),
        F.length(t).cast("long").alias("text_len"),
        F.trim(F.substring(t, 1, 8)).alias("head_trim"),
        F.lpad(F.col("lang"), 5, "_").alias("lang_lpad"),
        F.rpad(F.col("lang"), 5, ".").alias("lang_rpad"),
        F.reverse(F.col("lang")).alias("lang_rev"),
        F.repeat(F.col("lang"), 2).alias("lang_x2"),
        F.instr(t, "the").cast("long").alias("the_pos"),
        t.contains("data").alias("has_data"),
        F.regexp_extract(t, r"([0-9]+)", 1).alias("first_number"),
        F.regexp_replace(F.substring(t, 1, 20), r"\s+", "_").alias("head_snake"),
        F.translate(F.col("lang"), "aeiou", "AEIOU").alias("lang_caps_vowels"),
        F.concat_ws("|", F.col("lang"), F.col("source")).alias("lang_source"),
        F.split(t, r"\s+").getItem(0).alias("first_token"),
    )


FN_STRING_ORACLE = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       UPPER(lang) AS lang_upper,
       LOWER(text[1:12]) AS head_lower,
       CAST(LENGTH(text) AS BIGINT) AS text_len,
       TRIM(text[1:8]) AS head_trim,
       LPAD(lang, 5, '_') AS lang_lpad,
       RPAD(lang, 5, '.') AS lang_rpad,
       REVERSE(lang) AS lang_rev,
       REPEAT(lang, 2) AS lang_x2,
       CAST(STRPOS(text, 'the') AS BIGINT) AS the_pos,
       CONTAINS(text, 'data') AS has_data,
       regexp_extract(text, '([0-9]+)', 1) AS first_number,
       regexp_replace(text[1:20], '\s+', '_', 'g') AS head_snake,
       translate(lang, 'aeiou', 'AEIOU') AS lang_caps_vowels,
       lang || '|' || source AS lang_source,
       regexp_split_to_array(text, '\s+')[1] AS first_token
FROM documents
"""


# --------------------------------------------------------------------------
# Date battery over orders.o_orderdate — extraction, truncation, arithmetic.
# --------------------------------------------------------------------------

def fn_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.year(d).cast("long").alias("y"),
        F.quarter(d).cast("long").alias("q"),
        F.month(d).cast("long").alias("m"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.dayofweek(d).cast("long").alias("dow_sun1"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus_30d"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).cast("long").alias("days_since_epoch_start"),
        F.unix_timestamp(d).cast("long").alias("epoch_s"),
    )


FN_DATE_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
       CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
       CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dom,
       CAST(EXTRACT(dow FROM o_orderdate) + 1 AS BIGINT) AS dow_sun1,
       CAST(EXTRACT(week FROM o_orderdate) AS BIGINT) AS iso_week,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT)
         AS days_since_epoch_start,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders
"""


# --------------------------------------------------------------------------
# Array battery over tokenized documents.text — construction, slicing,
# sorting, joining, membership, higher-order transform/filter/aggregate.
# --------------------------------------------------------------------------

def fn_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.element_at(toks, -1).alias("last_token"),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_join(F.array_sort(F.slice(toks, 1, 4)), ",").alias("first4_sorted"),
        F.array_max(F.transform(toks, lambda t: F.length(t))).cast("long").alias("max_token_len"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).cast("long").alias("n_long_tokens"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_token_len"),
    )


FN_ARRAY_ORACLE = r"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, regexp_split_to_array(text, '\s+') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       array_to_string(toks[1:3], ' ') AS first3,
       toks[-1] AS last_token,
       list_contains(toks, 'the') AS has_the,
       array_to_string(list_sort(toks[1:4]), ',') AS first4_sorted,
       CAST(list_max(list_transform(toks, x -> LENGTH(x))) AS BIGINT) AS max_token_len,
       CAST(len(list_filter(toks, x -> LENGTH(x) > 5)) AS BIGINT) AS n_long_tokens,
       CAST(list_sum(list_transform(toks, x -> LENGTH(x))) AS BIGINT) AS sum_token_len
FROM t
"""


# --------------------------------------------------------------------------
# Multiset set-ops: EXCEPT ALL / INTERSECT ALL keep duplicate multiplicity —
# bag semantics the dedup-flavored setops_key_algebra (DataFrame
# distinct-ops) doesn't cover. Spark plans these as aggregate+generate
# (count per row, then replicate) — one shuffle each.
# --------------------------------------------------------------------------

def fn_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") <= 30).select(F.col("l_partkey").alias("k"))
    b = li.filter(F.col("l_returnflag") == "R").select(F.col("l_partkey").alias("k"))
    ex = a.exceptAll(b).groupBy("k").agg(F.count(F.lit(1)).alias("n")).withColumn("op", F.lit("except_all"))
    ix = a.intersectAll(b).groupBy("k").agg(F.count(F.lit(1)).alias("n")).withColumn("op", F.lit("intersect_all"))
    return ex.unionByName(ix).select(F.col("op"), F.col("k").cast("long").alias("k"), F.col("n"))


FN_MULTISET_ORACLE = """
WITH a AS (SELECT l_partkey AS k FROM lineitem WHERE l_quantity <= 30),
     b AS (SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'),
     ex AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b),
     ix AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
SELECT 'except_all' AS op, CAST(k AS BIGINT) AS k, COUNT(*) AS n FROM ex GROUP BY k
UNION ALL
SELECT 'intersect_all' AS op, CAST(k AS BIGINT) AS k, COUNT(*) AS n FROM ix GROUP BY k
"""


# --------------------------------------------------------------------------
# Unpivot (wide -> long): the inverse of pivot_status_matrix. Spark's
# ``unpivot`` compiles to Expand (each input row emits one output row per
# measure) — no shuffle, linear output.
# --------------------------------------------------------------------------

def fn_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    wide = li.select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("discount_bp"),
        F.round(F.col("l_tax") * 10000).cast("long").alias("tax_bp"),
    )
    return wide.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["price_cents", "discount_bp", "tax_bp"],
        variableColumnName="measure",
        valueColumnName="amount",
    )


FN_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
         CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
         CAST(ROUND(l_discount * 10000) AS BIGINT) AS discount_bp,
         CAST(ROUND(l_tax * 10000) AS BIGINT) AS tax_bp
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, 'price_cents' AS measure, price_cents AS amount FROM wide
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount_bp', discount_bp FROM wide
UNION ALL
SELECT l_orderkey, l_linenumber, 'tax_bp', tax_bp FROM wide
"""


# --------------------------------------------------------------------------
# Null-handling battery: nullif / nvl / nvl2 / coalesce chains / null-safe
# equality (<=>). The reference leans on Python truthiness (C2/C4); these are
# the SQL-native equivalents an engine must expose.
# --------------------------------------------------------------------------

def fn_null_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    # Manufacture nulls deterministically: value > 50 -> null bucket.
    v = F.when(F.col("value") <= 50, F.col("value"))
    w = F.when(F.col("value") > 20, F.col("value"))
    vc = F.round(v * 100).cast("long")
    wc = F.round(w * 100).cast("long")
    return e.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_no_error"),
        F.coalesce(vc, wc, F.lit(-1)).alias("first_present"),
        F.nvl(vc, F.lit(0)).alias("v_or_zero"),
        F.nvl2(vc, F.lit("small"), F.lit("large")).alias("size_class"),
        (vc.eqNullSafe(wc)).alias("v_eq_w_nullsafe"),
        vc.isNull().alias("v_is_null"),
    )


FN_NULL_ORACLE = """
WITH base AS (
  SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
         CASE WHEN value <= 50 THEN CAST(ROUND(value * 100) AS BIGINT) END AS vc,
         CASE WHEN value > 20 THEN CAST(ROUND(value * 100) AS BIGINT) END AS wc
  FROM events
)
SELECT event_id,
       NULLIF(event_type, 'error') AS type_no_error,
       COALESCE(vc, wc, -1) AS first_present,
       COALESCE(vc, 0) AS v_or_zero,
       CASE WHEN vc IS NOT NULL THEN 'small' ELSE 'large' END AS size_class,
       (vc IS NOT DISTINCT FROM wc) AS v_eq_w_nullsafe,
       vc IS NULL AS v_is_null
FROM base
"""


def fn_cube_rollup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over (priority, status): all 4 grouping combinations in
    one pass. Spark computes the cube with a single Expand + hash aggregate —
    one shuffle regardless of how many grouping sets — vs. 4 separate
    aggregations unioned. grouping_id disambiguates the NULL subtotal rows
    (standard bit order: 2*grouping(priority) + grouping(status), identical
    in DuckDB's GROUPING()). Money uses the cents trick (query.py) so the
    subtotals hash bit-exactly."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cubed = (
        o.select("o_orderpriority", "o_orderstatus", cents.alias("cents"))
        .cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )
    # Empty-relation patch (r5 verdict #5, same construction as
    # extensions.agg_rollup): the standard's () grouping set (gid=3) emits
    # one zero-count row over an empty relation; Spark's cube emits none.
    # The constant patch row survives the anti-join against input.limit(1)
    # exactly when the input is empty.
    empty_total = spark.range(1).select(
        F.lit(None).cast("string").alias("o_orderpriority"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(3).cast("long").alias("gid"),
        F.lit(0).cast("long").alias("n_orders"),
        F.lit(None).cast("long").alias("sum_cents"),
    )
    probe = o.select(F.lit(1).alias("one")).limit(1)
    return cubed.unionByName(empty_total.join(probe, F.lit(True), "left_anti"))


FN_CUBE_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def fn_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (linear interpolation, quartiles + median) per order
    status — Spark ``percentile`` and DuckDB ``quantile_cont`` implement the
    same type-7 estimator, so values agree to rounding. The exact form needs
    a per-group sort; the 100 TB path is percentile_approx (see
    approx_quantiles_price in sampling_stats) — this entry pins the exact
    semantics the sketch is judged against."""
    o = _t(spark, sf_dir, "orders")
    pct = F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))")
    return (
        o.groupBy("o_orderstatus")
        .agg(pct.alias("p"))
        .select(
            "o_orderstatus",
            F.round(F.element_at("p", 1), 4).alias("p25"),
            F.round(F.element_at("p", 2), 4).alias("p50"),
            F.round(F.element_at("p", 3), 4).alias("p75"),
        )
        .orderBy("o_orderstatus")
    )


FN_PERCENTILE_ORACLE = """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""




# --------------------------------------------------------------------------
# Map battery: the MapType surface (absent from the reference, SURVEY §1.2 —
# a complete engine needs typed maps for exactly the reviewer-JSON shapes F2
# handles as strings). Build per-row maps, merge, filter, transform, and
# flatten back to deterministic strings/scalars so each engine's internal
# map representation never leaks into the comparison. Pure projection: whole
# map algebra stays in codegen, no shuffle.
# --------------------------------------------------------------------------

def fn_map_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    merged = F.map_concat(m, F.create_map(F.lit("grp"), F.substring("o_orderpriority", 1, 1)))
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "status").alias("status_val"),
        F.element_at(m, "zz").alias("missing_val"),  # absent key -> NULL
        F.element_at(merged, "grp").alias("merged_grp"),
        F.size(F.map_filter(m, lambda k, v: v != F.lit("O"))).cast("long").alias("n_non_open"),
        F.element_at(F.transform_values(m, lambda k, v: F.upper(v)), "status").alias("status_upper"),
        F.array_join(
            F.array_sort(F.transform(F.map_entries(m), lambda e: F.concat_ws("=", e["key"], e["value"]))),
            "|",
        ).alias("entries_sorted"),
    )


FN_MAP_ORACLE = """
WITH t AS (
  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         MAP {'status': o_orderstatus, 'priority': o_orderpriority} AS m,
         map_concat(MAP {'status': o_orderstatus, 'priority': o_orderpriority},
                    MAP {'grp': substr(o_orderpriority, 1, 1)}) AS merged
  FROM orders
)
SELECT o_orderkey,
       array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
       m['status'][1] AS status_val,
       m['zz'][1] AS missing_val,
       merged['grp'][1] AS merged_grp,
       CAST(len(list_filter(map_values(m), v -> v <> 'O')) AS BIGINT) AS n_non_open,
       upper(m['status'][1]) AS status_upper,
       array_to_string(list_sort(list_transform(map_entries(m), e -> e.key || '=' || e.value)), '|') AS entries_sorted
FROM t
"""


# --------------------------------------------------------------------------
# try_* battery: ANSI error-safe arithmetic — at 100 TB one bad row must
# yield NULL, not kill the stage (the expression-level form of the C5
# tolerant-JSON policy). The oracle spells out each function's exact
# semantics with CASE/TRY_CAST, certifying the NULL-on-error contract
# including the int64 overflow boundary.
# --------------------------------------------------------------------------

_I64_MAX = 9223372036854775807


def fn_try_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.select(
        F.col("event_id").cast("long").alias("event_id"),
        # divide-by-zero -> NULL (denominator cycles through 0,1,2)
        F.try_divide(F.col("event_id").cast("double"), (F.col("user_id") % 3).cast("double")).alias("safe_div"),
        # non-numeric cast -> NULL, numeric JSON field -> value
        F.col("event_type").try_cast("long").alias("cast_text"),
        F.get_json_object("props", "$.k").try_cast("long").alias("cast_json_k"),
        # int64 overflow -> NULL; 0 and 1 are the exact non-overflow edge
        F.try_multiply(F.col("event_id"), F.lit(_I64_MAX)).alias("safe_mul"),
        # out-of-bounds element -> NULL
        F.try_element_at(F.split("event_type", "_"), F.lit(5)).alias("elem5"),
    )


FN_TRY_ORACLE = f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CASE WHEN user_id % 3 = 0 THEN NULL
            ELSE CAST(event_id AS DOUBLE) / CAST(user_id % 3 AS DOUBLE) END AS safe_div,
       TRY_CAST(event_type AS BIGINT) AS cast_text,
       TRY_CAST(props ->> '$.k' AS BIGINT) AS cast_json_k,
       CASE WHEN event_id = 0 THEN 0
            WHEN event_id = 1 THEN {_I64_MAX}
            ELSE NULL END AS safe_mul,
       string_split(event_type, '_')[5] AS elem5
FROM events
"""




# --------------------------------------------------------------------------
# Bitwise battery: AND/OR/XOR/shifts/popcount/NOT over int64 — the last
# scalar family (used by every hash/sketch/bitmap operator: SimHash bands,
# LSH bucket codes, bitmap indexes). Pure codegen projection.
# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# VARIANT (Spark 4): the open-format semi-structured type — parse once at
# the scan edge, path-extract with variant_get downstream. At 100 TB this
# replaces repeated from_json re-parses of the same string column (VARIANT
# parses once into a binary encoding; every later path access is a cheap
# binary walk, and parquet can store it natively). The DuckDB oracle walks
# the same paths with its JSON operators — semantically the same battery.
# --------------------------------------------------------------------------

def fn_variant_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        e.select("event_type", v.alias("v"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
            F.sum(F.isnull("k").cast("long")).cast("long").alias("n_missing"),
        )
    )


FN_VARIANT_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k,
       CAST(SUM(CASE WHEN props->>'k' IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM events
GROUP BY event_type
"""


def fn_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("long")
    c = F.col("o_custkey").cast("long")
    return o.select(
        k.alias("o_orderkey"),
        k.bitwiseAND(c).alias("b_and"),
        k.bitwiseOR(c).alias("b_or"),
        k.bitwiseXOR(c).alias("b_xor"),
        F.shiftleft(k, 3).alias("b_shl"),
        F.shiftright(k, 2).alias("b_shr"),
        F.bit_count(k).cast("long").alias("b_pop"),
        F.bitwise_not(k).alias("b_not"),
    )


FN_BITWISE_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       o_orderkey & o_custkey AS b_and,
       o_orderkey | o_custkey AS b_or,
       xor(o_orderkey, o_custkey) AS b_xor,
       o_orderkey << 3 AS b_shl,
       o_orderkey >> 2 AS b_shr,
       CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS b_pop,
       ~CAST(o_orderkey AS BIGINT) AS b_not
FROM orders
"""




# --------------------------------------------------------------------------
# Regex battery: extract / extract-all / replace / count / match over the
# documents text. Spark compiles Java regex, DuckDB RE2 — the battery sticks
# to the shared subset (no backrefs/lookaround), which is also the subset
# that stays fast at 100 TB (RE2-safe patterns are linear-time).
# --------------------------------------------------------------------------

def fn_regex_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    pat = r"[a-z]+a[a-z]*"  # words containing 'a'
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.regexp_extract(t, pat, 0).alias("first_a_word"),
        F.array_join(F.regexp_extract_all(t, F.lit(pat), 0), ",").alias("all_a_words"),
        F.regexp_count(t, F.lit(pat)).cast("long").alias("n_a_words"),
        F.regexp_replace(t, pat, "_").alias("replaced"),
        t.rlike("vector").alias("mentions_vector"),
    )


FN_REGEX_ORACLE = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       COALESCE(regexp_extract(text, '[a-z]+a[a-z]*'), '') AS first_a_word,
       -- zero-match case: DuckDB regexp_extract_all yields NULL (not []),
       -- so the joined string must be coalesced to match Spark's ''.
       -- (Only sf>=0.1 has documents with no 'a'-words — found by the
       -- sf0.1 strict sweep, invisible at the sf0.01 gate.)
       COALESCE(array_to_string(regexp_extract_all(text, '[a-z]+a[a-z]*'), ','), '') AS all_a_words,
       CAST(len(regexp_extract_all(text, '[a-z]+a[a-z]*')) AS BIGINT) AS n_a_words,
       regexp_replace(text, '[a-z]+a[a-z]*', '_', 'g') AS replaced,
       regexp_matches(text, 'vector') AS mentions_vector
FROM documents
"""


# --------------------------------------------------------------------------
# Window value-function family: first/last/nth over explicit frames — the
# analytic functions beyond rank/lead/lag the other window batteries cover.
# last_value needs the full-partition frame (the default frame ends at
# CURRENT ROW — the classic silent-wrong-answer trap, stated explicitly).
# --------------------------------------------------------------------------

def fn_window_value_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    full = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.first_value(F.col("o_orderkey").cast("long")).over(full).alias("first_order"),
        F.last_value(F.col("o_orderkey").cast("long")).over(full).alias("last_order"),
        F.nth_value(F.col("o_orderkey").cast("long"), 2).over(full).alias("second_order"),
    )


FN_WINDOW_VALUE_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(first_value(o_orderkey) OVER w AS BIGINT) AS first_order,
       CAST(last_value(o_orderkey) OVER w AS BIGINT) AS last_order,
       CAST(nth_value(o_orderkey, 2) OVER w AS BIGINT) AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# ---------------------------------------------------------------------------
# Winsorized mean per group: robust location estimate — clip at the exact
# rank-based P10/P90 data values (lo rank = ceil(n/10) via (n+9)//10, hi
# symmetric) then average. Rank-based cutpoints are actual data values under
# a (cents, key) total order, so there is no interpolation semantics to
# diverge on; the mean is one division of an exact int64 sum (bit-identical).
# Complements dq_mad_outliers as the other standard robust statistic.
# ---------------------------------------------------------------------------


def fn_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.col("o_orderkey").cast("long").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "k")
    n = Window.partitionBy("o_orderpriority")
    r = o.select(
        "o_orderpriority",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(n).alias("cnt"),
    )
    lo_rank = F.floor((F.col("cnt") + 9) / 10)
    hi_rank = F.col("cnt") - lo_rank + 1
    cuts = (
        r.select(
            "o_orderpriority",
            F.when(F.col("rn") == lo_rank, F.col("cents")).alias("lo"),
            F.when(F.col("rn") == hi_rank, F.col("cents")).alias("hi"),
        )
        .groupBy("o_orderpriority")
        .agg(F.max("lo").alias("lo"), F.max("hi").alias("hi"))
    )
    clipped = o.join(F.broadcast(cuts), "o_orderpriority").select(
        "o_orderpriority",
        F.greatest(F.least(F.col("cents"), F.col("hi")), F.col("lo")).alias("cc"),
        "lo",
        "hi",
    )
    return (
        clipped.groupBy("o_orderpriority")
        .agg(
            F.max("lo").cast("long").alias("p10_cents"),
            F.max("hi").cast("long").alias("p90_cents"),
            F.round(
                F.sum("cc").cast("double") / F.count(F.lit(1)).cast("double"), 4
            ).alias("winsorized_mean_cents"),
        )
        .orderBy("o_orderpriority")
    )


FN_WINSORIZED_ORACLE = """
WITH o AS (
  SELECT o_orderpriority, CAST(o_orderkey AS BIGINT) AS k,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY cents, k) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
  FROM o
), cuts AS (
  SELECT o_orderpriority,
         MAX(CASE WHEN rn = (cnt + 9) // 10 THEN cents END) AS lo,
         MAX(CASE WHEN rn = cnt - (cnt + 9) // 10 + 1 THEN cents END) AS hi
  FROM r GROUP BY o_orderpriority
), clipped AS (
  SELECT o.o_orderpriority, GREATEST(LEAST(o.cents, c.hi), c.lo) AS cc, c.lo, c.hi
  FROM o JOIN cuts c USING (o_orderpriority)
)
SELECT o_orderpriority,
       CAST(MAX(lo) AS BIGINT) AS p10_cents,
       CAST(MAX(hi) AS BIGINT) AS p90_cents,
       ROUND(CAST(SUM(cc) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS winsorized_mean_cents
FROM clipped
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""




# ---------------------------------------------------------------------------
# fn_mode_deterministic: modal value per group with an explicit tiebreak
# (max count, then min value) — built-in mode() breaks ties arbitrarily in
# both engines, so the deterministic form is counts + one window, the same
# move as every "first"/W3 rewrite in this repo.
# ---------------------------------------------------------------------------


def fn_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    counts = li.groupBy("l_returnflag", "qty").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("c"), F.asc("qty"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("qty").alias("modal_qty"),
            F.col("c").cast("long").alias("n_occurrences"),
        )
        .orderBy("l_returnflag")
    )


FN_MODE_ORACLE = """
WITH counts AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY c DESC, qty) AS rk
  FROM counts
)
SELECT l_returnflag, qty AS modal_qty, CAST(c AS BIGINT) AS n_occurrences
FROM ranked WHERE rk = 1
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# window_pareto_share: the ABC/Pareto curve — order customers by revenue
# descending and report how few account for 50% / 80% / 95% of the total.
# Running SUM over exact int64 cents (order-free correctness: the frame is a
# total order), one division per row for the share; output counts are ints.
# ---------------------------------------------------------------------------


def window_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").cast("long").alias("cust")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    w = Window.orderBy(F.desc("cents"), F.asc("cust")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # `or 0`: SUM over an empty table is NULL; threshold 0 then yields
    # n_customers = 0+1 = 1 per pct, matching the oracle's NULL-comparison
    # path on empty input
    total = per_cust.agg(F.sum("cents").cast("long")).collect()[0][0] or 0
    ranked = per_cust.select(
        "cust",
        "cents",
        F.sum("cents").over(w).alias("cum_cents"),
    )
    # customers needed to reach each threshold = rows strictly below it + 1
    # (thresholds in exact integer cents: ceil(total*pct/100))
    res = None
    for pct in (50, 80, 95):
        thresh = -(-total * pct // 100)
        n = ranked.filter(F.col("cum_cents") < thresh).agg(
            (F.count(F.lit(1)) + 1).cast("long").alias("n_customers")
        ).select(F.lit(pct).cast("long").alias("pct"), "n_customers")
        res = n if res is None else res.unionByName(n)
    return res.orderBy("pct")


PARETO_ORACLE = """
WITH per_cust AS (
  SELECT CAST(o_custkey AS BIGINT) AS cust,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
), t AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS total FROM per_cust
), ranked AS (
  SELECT cust, cents,
         SUM(cents) OVER (ORDER BY cents DESC, cust
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
  FROM per_cust
)
SELECT p.pct,
       CAST((SELECT COUNT(*) FROM ranked, t
             WHERE cum_cents < (total * p.pct + 99) // 100) + 1 AS BIGINT) AS n_customers
FROM (VALUES (CAST(50 AS BIGINT)), (CAST(80 AS BIGINT)), (CAST(95 AS BIGINT))) AS p(pct)
ORDER BY p.pct
"""




# ---------------------------------------------------------------------------
# fn_boolean_agg_battery: the boolean/conditional aggregate family —
# count_if, bool_and/bool_or (every/any), plus a DETERMINISTIC stand-in for
# any_value (MIN — any_value is whichever-row-wins in both engines, so the
# portable form pins it, same policy as W3/mode).
# ---------------------------------------------------------------------------


def fn_boolean_agg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_totalprice") > 150_000).cast("long").alias("n_big"),
            F.bool_and(F.col("o_totalprice") > 1_000).alias("all_over_1k"),
            F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
            F.min(F.col("o_custkey").cast("long")).cast("long").alias("first_custkey"),  # deterministic any_value
            F.count_if(F.dayofweek("o_orderdate") == 1).cast("long").alias("n_sunday"),
        )
        .orderBy("o_orderpriority")
    )


FN_BOOL_AGG_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) FILTER (o_totalprice > 150000) AS BIGINT) AS n_big,
       BOOL_AND(o_totalprice > 1000) AS all_over_1k,
       BOOL_OR(o_orderstatus = 'P') AS any_pending,
       CAST(MIN(o_custkey) AS BIGINT) AS first_custkey,
       CAST(COUNT(*) FILTER (EXTRACT(dow FROM o_orderdate) + 1 = 1) AS BIGINT) AS n_sunday
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


FUNCTIONS_BATTERY_QUERIES = [
    Q("fn_string_battery", fn_string_battery, FN_STRING_ORACLE, "16-function string battery"),
    Q("fn_date_battery", fn_date_battery, FN_DATE_ORACLE, "12-function date battery (dow parity)"),
    Q("fn_array_battery", fn_array_battery, FN_ARRAY_ORACLE, "array + higher-order functions"),
    Q("fn_multiset_ops", fn_multiset_ops, FN_MULTISET_ORACLE, "EXCEPT ALL / INTERSECT ALL bags"),
    Q("fn_unpivot_measures", fn_unpivot_measures, FN_UNPIVOT_ORACLE, "unpivot wide->long"),
    Q("fn_null_battery", fn_null_battery, FN_NULL_ORACLE, "nullif/nvl/nvl2/<=> battery"),
    Q("fn_cube_rollup_matrix", fn_cube_rollup_matrix, FN_CUBE_ORACLE, "CUBE grouping sets + grouping_id"),
    Q("fn_percentile_exact", fn_percentile_exact, FN_PERCENTILE_ORACLE, "exact type-7 percentiles per group"),
    Q("fn_map_battery", fn_map_battery, FN_MAP_ORACLE, "MapType algebra battery"),
    Q("fn_try_battery", fn_try_battery, FN_TRY_ORACLE, "ANSI try_* error-safe battery"),
    Q("fn_bitwise_battery", fn_bitwise_battery, FN_BITWISE_ORACLE, "bitwise int64 battery"),
    Q("fn_variant_battery", fn_variant_battery, FN_VARIANT_ORACLE, "VARIANT parse + path extraction (Spark 4)"),
    Q("fn_regex_battery", fn_regex_battery, FN_REGEX_ORACLE, "RE2-safe regex battery"),
    Q("fn_window_value_family", fn_window_value_family, FN_WINDOW_VALUE_ORACLE, "first/last/nth_value frames"),
    Q("fn_winsorized_mean", fn_winsorized_mean, FN_WINSORIZED_ORACLE, "rank-based winsorized mean per group (exact cutpoints)"),
    Q("fn_mode_deterministic", fn_mode_deterministic, FN_MODE_ORACLE, "modal value per group with explicit tiebreak"),
    Q("window_pareto_share", window_pareto_share, PARETO_ORACLE, "Pareto/ABC curve: customers needed for 50/80/95% of revenue"),
    Q("fn_boolean_agg_battery", fn_boolean_agg_battery, FN_BOOL_AGG_ORACLE, "count_if / bool_and / bool_or / deterministic any_value"),
]
