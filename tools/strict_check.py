#!/usr/bin/env python
"""Strict local stand-in for the driver's correctness gate.

The driver compares Spark vs DuckDB with an order-insensitive VALUE HASH at
full precision — oracle_check.py's 6-sig-fig float compare is too lax and
missed a whole class of bug (DuckDB SUM(BIGINT) -> HUGEINT -> float64 in
pandas, while Spark returns int64: "1524135.0" vs "1524135" hash-mismatch).

This checker mimics the strict path: both sides to pandas, columns sorted by
name, rows sorted, values compared by exact repr (type-sensitive: int vs
float dtype difference is a failure even when values are numerically equal).

Usage: python tools/strict_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def norm_cell(v) -> str:
    # Full-precision canonical repr. Intentionally distinguishes 5 from 5.0:
    # a dtype difference between engines is exactly what the driver's hash
    # sees, so it must fail here too. NaN normalizes to "NULL" (matching
    # oracle_check._norm_cell): pandas renders SQL NULL in float columns as
    # NaN, so NULL-vs-NaN is not engine-distinguishable post-toPandas.
    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return repr(f)
    if isinstance(v, np.integer):
        return repr(int(v))
    return repr(v)


def frame_key(pdf):
    cols = sorted(pdf.columns)
    rows = []
    for t in pdf[cols].itertuples(index=False, name=None):
        rows.append(tuple(norm_cell(v) for v in t))
    rows.sort()
    return cols, rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from phabricator_etl_spark.registry import all_queries
    from phabricator_etl_spark.session import get_spark
    from phabricator_etl_spark.sources.catalog import DRIVER_TABLES

    spark = get_spark("strict-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in DRIVER_TABLES:
        # gen_scale_data writes big tables as DIRECTORIES of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    n_bad = 0
    for q in all_queries():
        if only and q.name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = q.build(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {q.name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
            continue
        if q.oracle is None:
            print(f"ok(rows-only) {q.name}: {len(spdf)} rows  [{time.perf_counter()-t0:.1f}s]")
            continue
        try:
            dpdf = con.execute(q.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {q.name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
            continue
        status = []
        if sorted(spdf.columns) != sorted(dpdf.columns):
            status.append(f"schema: spark={sorted(spdf.columns)} duck={sorted(dpdf.columns)}")
        elif len(spdf) != len(dpdf):
            status.append(f"rows: spark={len(spdf)} duck={len(dpdf)}")
        else:
            # dtype kinds must match per column (int vs float mismatch = the
            # HUGEINT bug class)
            for c in sorted(spdf.columns):
                sk, dk = spdf[c].dtype.kind, dpdf[c].dtype.kind
                if sk != dk and {sk, dk} != {"O"}:
                    # allow object-vs-object only; any numeric kind mismatch flags
                    if not ({sk, dk} <= {"O", "b"}):
                        status.append(f"dtype[{c}]: spark={spdf[c].dtype} duck={dpdf[c].dtype}")
            if not status:
                _, s_rows = frame_key(spdf)
                _, d_rows = frame_key(dpdf)
                if s_rows != d_rows:
                    diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:2]
                    status.append(f"values: first diffs {diffs}")
        dt = time.perf_counter() - t0
        if status:
            n_bad += 1
            print(f"FAIL {q.name}: {'; '.join(status)}  [{dt:.1f}s]")
        else:
            print(f"ok {q.name}: {len(spdf)} rows  [{dt:.1f}s]")
    con.close()
    print(f"\n{'ALL OK' if n_bad == 0 else f'{n_bad} FAILURES'}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
