"""Data-quality profiling: the one-pass column-profile every warehouse runs
before trusting a new 100 TB drop.

profile_table_orders computes, for each column of `orders`, in a SINGLE
aggregation pass over one scan (no per-column re-scans — the classic
profiling mistake at scale is one job per column):

- n_rows, n_null, null fraction (x10000 integer)
- n_distinct (exact here; swap approx_count_distinct at 100 TB — noted)
- min / max rendered as strings (one schema for heterogeneous columns)

The wide 1-row aggregate is then unpivoted to (column, metric-row) long
form. Numeric renderings are canonicalized (timestamps to UTC strings,
doubles via integer cents) so both engines print identical text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t

# (column, renderer kind) — money columns render as exact cents so min/max
# strings never hit float-formatting differences.
_PROFILE_COLS = [
    ("o_orderkey", "long"),
    ("o_custkey", "long"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "cents"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _render(kind: str, c: F.Column) -> F.Column:
    if kind == "long":
        return c.cast("long").cast("string")
    if kind == "cents":
        return F.round(c * 100).cast("long").cast("string")
    if kind == "ts":
        return F.date_format(c.cast("timestamp"), "yyyy-MM-dd HH:mm:ss")
    return c


def profile_table_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, kind in _PROFILE_COLS:
        c = F.col(col)
        aggs += [
            F.count(c).alias(f"{col}__nn"),
            F.count_distinct(c).alias(f"{col}__nd"),
            F.min(_render(kind, c)).alias(f"{col}__mn"),
            F.max(_render(kind, c)).alias(f"{col}__mx"),
        ]
    # ONE row after ONE scan+aggregation; materialize it so the six
    # per-column union branches below don't each replay the scan lineage
    # (Spark only dedupes identical subplans via ReusedExchange when AQE
    # happens to cooperate — an eager checkpoint of 1 row is certain).
    wide = o.agg(*aggs).localCheckpoint(eager=True)
    per_col = [
        wide.select(
            F.lit(col).alias("column"),
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("n_rows") - F.col(f"{col}__nn")).cast("long").alias("n_null"),
            F.floor(
                F.lit(10000) * (F.col("n_rows") - F.col(f"{col}__nn")) / F.col("n_rows")
            ).cast("long").alias("null_x10000"),
            F.col(f"{col}__nd").cast("long").alias("n_distinct"),
            F.col(f"{col}__mn").alias("min_repr"),
            F.col(f"{col}__mx").alias("max_repr"),
        )
        for col, _ in _PROFILE_COLS
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionAll(p)
    return out


def _render_sql(kind: str, col: str) -> str:
    if kind == "long":
        return f"CAST(CAST({col} AS BIGINT) AS VARCHAR)"
    if kind == "cents":
        return f"CAST(CAST(ROUND({col} * 100) AS BIGINT) AS VARCHAR)"
    if kind == "ts":
        return f"strftime(CAST({col} AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')"
    return col


def _profile_oracle() -> str:
    parts = []
    for col, kind in _PROFILE_COLS:
        r = _render_sql(kind, col)
        parts.append(f"""
SELECT '{col}' AS "column",
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
       CAST(FLOOR(10000 * (COUNT(*) - COUNT({col})) / COUNT(*)) AS BIGINT) AS null_x10000,
       CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
       MIN({r}) AS min_repr,
       MAX({r}) AS max_repr
FROM orders""")
    return "\nUNION ALL\n".join(parts)


PROFILE_ORACLE = _profile_oracle()


PROFILING_QUERIES = [
    Q(
        "profile_table_orders",
        profile_table_orders,
        PROFILE_ORACLE,
        "one-pass per-column profile (nulls/distinct/min/max) + unpivot",
    ),
]
