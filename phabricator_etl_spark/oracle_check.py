"""Local stand-in for the driver's correctness gate.

Runs each registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count + column names + sorted row
values. Used by tests (sf0.001) so mismatches surface before the driver's
sf0.01 run does.

Comparison is STRICT: both sides go through pandas (the driver's path),
column dtype kinds must agree, and values compare at full precision. The
earlier 6-sig-fig float compare hid a whole bug class — DuckDB widens
SUM(BIGINT) to HUGEINT, which pandas renders as float64 ("1524135.0") while
Spark returns int64 ("1524135"): numerically equal, hash-different.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import SparkSession

from .query import Q
from .sources.catalog import DRIVER_TABLES


@dataclass
class CheckResult:
    name: str
    ok: bool
    detail: str


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v) -> str:
    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return "NULL" if math.isnan(f) else repr(f)
    if isinstance(v, np.integer):
        return repr(int(v))
    return repr(v)


def _frame_rows(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in t) for t in pdf[cols].itertuples(index=False, name=None)]
    rows.sort()
    return rows


def check_query(spark: SparkSession, q: Q, sf_dir: str) -> CheckResult:
    if q.oracle is None:
        df = q.build(spark, sf_dir)
        n = df.count()
        return CheckResult(q.name, True, f"rows-only: {n}")
    spdf = q.build(spark, sf_dir).toPandas()
    con = _duck_con(sf_dir)
    try:
        dpdf = con.execute(q.oracle).fetchdf()
    finally:
        con.close()
    if sorted(spdf.columns) != sorted(dpdf.columns):
        return CheckResult(q.name, False, f"schema: spark={sorted(spdf.columns)} duck={sorted(dpdf.columns)}")
    if len(spdf) != len(dpdf):
        return CheckResult(q.name, False, f"rowcount: spark={len(spdf)} duck={len(dpdf)}")
    for c in sorted(spdf.columns):
        sk, dk = spdf[c].dtype.kind, dpdf[c].dtype.kind
        if sk != dk and not ({sk, dk} <= {"O", "b"}):
            return CheckResult(q.name, False, f"dtype[{c}]: spark={spdf[c].dtype} duck={dpdf[c].dtype}")
    s_rows, d_rows = _frame_rows(spdf), _frame_rows(dpdf)
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
        return CheckResult(q.name, False, f"values differ, first diffs: {diffs}")
    return CheckResult(q.name, True, f"match: {len(spdf)} rows")
