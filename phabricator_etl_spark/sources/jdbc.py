"""JDBC source layer: the production ingest path (SURVEY §2.1 S1).

The reference builds four SQLAlchemy engines from env config — namespace +
per-database suffix (create_engines, stats.py:126-140; Config/get_config,
stats.py:84-123) — then reflects tables via automap. The Spark equivalent is
spark.read.format("jdbc") per table with a declared schema; reflection
disappears (schemas are code, SURVEY §1.1), and Catalyst pushes filters and
column pruning down to MySQL via the JDBC source.

No MySQL exists in the test environment, so everything here is pure plan
construction — unit-tested for option shape (tests/test_jdbc_config.py), and
swapped for parquet fixtures everywhere else (the reader interface is the
same DataFrame).

Scale: `partition_column/num_partitions` turn the single-cursor read the
reference does into N parallel range scans — the difference between a
one-connection bottleneck and a saturated NIC at ingest time.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

# database suffix -> tables, mirroring Db.from_bases (stats.py:161-191)
DATABASE_TABLES: dict[str, tuple[str, ...]] = {
    "user": ("user", "user_email"),
    "project": ("project", "edge", "project_transaction"),
    "repository": ("repository", "repository_uri"),
    "differential": (
        "differential_revision",
        "differential_diff",
        "differential_changeset",
        "differential_transaction",
        "differential_transaction_comment",
        "differential_reviewer",
        "edge",
        "differential_customfieldstorage",
    ),
}


@dataclass(frozen=True)
class JdbcConfig:
    """Env-driven connection config (get_config analog, stats.py:102-123)."""

    host: str
    port: int
    namespace: str  # databases are f"{namespace}_{suffix}" (stats.py:130)
    user: str
    password: str = field(repr=False, default="")
    driver: str = "com.mysql.cj.jdbc.Driver"

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "JdbcConfig":
        e = env if env is not None else dict(os.environ)
        return cls(
            host=e["PHAB_DB_HOST"],
            port=int(e.get("PHAB_DB_PORT", "3306")),
            namespace=e["PHAB_DB_NAMESPACE"],
            user=e["PHAB_DB_USER"],
            password=e.get("PHAB_DB_PASSWORD", ""),
        )

    def url(self, suffix: str) -> str:
        return f"jdbc:mysql://{self.host}:{self.port}/{self.namespace}_{suffix}"


def reader_options(
    cfg: JdbcConfig,
    suffix: str,
    table: str,
    *,
    partition_column: str | None = "id",
    num_partitions: int = 16,
    lower_bound: int = 0,
    upper_bound: int = 1 << 40,
) -> dict[str, str]:
    """The JDBC option map for one table — pure/testable (no live MySQL in
    this environment). Range-partitioned on the integer PK by default; pass
    partition_column=None for tiny dims."""
    if table not in DATABASE_TABLES[suffix]:
        raise ValueError(f"{table!r} is not a known table of the {suffix!r} database")
    opts = {
        "url": cfg.url(suffix),
        "dbtable": table,
        "user": cfg.user,
        "password": cfg.password,
        "driver": cfg.driver,
        # the reference decodes utf8 bytes columns by hand (stats.py:617-619);
        # the connector normalizes at the wire instead
        "characterEncoding": "utf-8",
    }
    if partition_column is not None:
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    return opts


def table_reader(
    spark: SparkSession,
    cfg: JdbcConfig,
    suffix: str,
    table: str,
    **kwargs,
) -> DataFrameReader:
    """Configured (unexecuted) reader for one table."""
    return spark.read.format("jdbc").options(**reader_options(cfg, suffix, table, **kwargs))


def load_phabricator(spark: SparkSession, cfg: JdbcConfig) -> dict[tuple[str, str], DataFrame]:
    """All 15 source tables as DataFrames keyed by (database, table) —
    the Sessions.from_config analog (stats.py:194-216)."""
    out: dict[tuple[str, str], DataFrame] = {}
    for suffix, tables in DATABASE_TABLES.items():
        for t in tables:
            dims_without_pk = {"user_email", "repository_uri", "edge"}
            pc = None if t in dims_without_pk else "id"
            out[(suffix, t)] = table_reader(spark, cfg, suffix, t, partition_column=pc).load()
    return out
