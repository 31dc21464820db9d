"""Driver-testdata catalog: parquet scans for the TPC-H-ish tables.

The reference reflects 15 MySQL tables dynamically via SQLAlchemy automap
(stats.py:126-149). The Spark-native equivalent is a declared catalog of
parquet scans — Catalyst pushes filters/column pruning into the scan, which
the reference delegates to MySQL's planner (SURVEY.md §4).

At 100 TB these reads become partitioned parquet/Delta directories; nothing
in the query code changes — only the paths and (optionally) bucketing DDL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor we target.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, normalizing physical quirks at scan time.

    Current driver testdata stores events.ts as parquet TIMESTAMP(MICROS,
    no-TZ), which scans directly as a timestamp — no config needed. Earlier
    testdata generations used TIMESTAMP(NANOS) (scanning as ns-since-epoch
    long under `spark.sql.legacy.parquet.nanosAsLong`); the LongType guard
    below tolerates that physical layout if it ever comes back — the same
    "normalize at scan" move the SURVEY prescribes for the reference's
    BINARY phid columns (§1.2).
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver table as a DataFrame keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in DRIVER_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load + register temp views so spark.sql(...) sees the same names the
    DuckDB oracle does."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
