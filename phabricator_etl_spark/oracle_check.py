"""Local stand-in for the driver's correctness gate.

Runs each registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count + column names + sorted row
values. Used by tests (sf0.001) so mismatches surface before the driver's
sf0.01 run does.
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


def _normalize(rows, cols):
    # sort columns by name (driver convention), then rows by repr
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v:.6g}")
            elif v is None:
                vals.append("NULL")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def check_query(spark: SparkSession, q: Q, sf_dir: str) -> CheckResult:
    if q.oracle is None:
        df = q.build(spark, sf_dir)
        n = df.count()
        return CheckResult(q.name, True, f"rows-only: {n}")
    sdf = q.build(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    con = _duck_con(sf_dir)
    try:
        res = con.execute(q.oracle)
        dcols = [d[0] for d in res.description]
        drows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()
    if sorted(scols) != sorted(dcols):
        return CheckResult(q.name, False, f"schema: spark={sorted(scols)} duck={sorted(dcols)}")
    if len(srows) != len(drows):
        return CheckResult(q.name, False, f"rowcount: spark={len(srows)} duck={len(drows)}")
    _, s_norm = _normalize(srows, scols)
    _, d_norm = _normalize(drows, dcols)
    if s_norm != d_norm:
        diffs = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
        return CheckResult(q.name, False, f"values differ, first diffs: {diffs}")
    return CheckResult(q.name, True, f"match: {len(srows)} rows")
