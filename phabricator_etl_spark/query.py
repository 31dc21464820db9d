"""Query registry primitives.

Each engine capability from SURVEY.md §2 is exposed as a named `Q`:
a Spark builder `(spark, sf_dir) -> DataFrame` plus (where SQL-expressible)
an equivalent DuckDB oracle SQL string over the same parquet tables.

Cross-engine hash-match conventions (the driver compares row-count + schema +
order-insensitive value hash, with columns sorted by name):
- integer outputs CAST to bigint on both sides;
- money sums use the exact "cents trick": per-row `cast(round(x*100) as
  bigint)` then integer SUM — bit-exact across engines regardless of
  aggregation order (doubles would differ in the last bit);
- ratios derived from exact integers (int/int in double) are bit-exact;
  genuinely floating results are round()ed to 4 decimals;
- timestamps are formatted to 'yyyy-MM-dd HH:mm:ss' strings (UTC session);
- arrays are emitted as '|'-joined strings (sorted unless order is the
  semantics under test) so value hashing never depends on list typing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Q:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""
