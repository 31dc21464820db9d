"""JDBC source layer: the production ingest path (SURVEY §2.1 S1).

The reference builds four SQLAlchemy engines from env config — namespace +
per-database suffix (create_engines, stats.py:126-140; Config/get_config,
stats.py:84-123) — then reflects tables via automap. The Spark equivalent is
spark.read.format("jdbc") per table with a declared schema; reflection
disappears (schemas are code, SURVEY §1.1), and Catalyst pushes filters and
column pruning down to MySQL via the JDBC source.

No MySQL exists in the test environment, so the MySQL layer is pure plan
construction — unit-tested for option shape (tests/test_jdbc_config.py) and
exercised against a real server via docker-compose.integration.yml. The
EXECUTION path, however, is live-tested here through embedded Derby (the
JDBC database Spark itself ships for its Hive metastore): ``src_jdbc_live``
seeds a Derby database from parquet via ``df.write.jdbc`` and reads it back
through the same ``table_reader`` options machinery — real JDBC writes,
real partitioned range scans, real filter pushdown (the plan shows
``PushedFilters`` into JDBCRelation), value-hash-gated against DuckDB.

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


# ---------------------------------------------------------------------------
# Live JDBC execution path — embedded Derby (ships inside pyspark's own jars)
# ---------------------------------------------------------------------------

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _quiet_derby(spark: SparkSession) -> None:
    """Point Derby's engine log at the temp dir (it defaults to ./derby.log
    in the driver CWD). Derby reads the property at engine boot — the first
    connection — so setting it per call is an idempotent no-op afterwards."""
    import os as _os
    import tempfile as _tempfile

    spark._jvm.System.setProperty(
        "derby.stream.error.file", _os.path.join(_tempfile.gettempdir(), "derby.log")
    )


def derby_url(db_dir: str, *, create: bool = False) -> str:
    """Embedded-Derby connection URL rooted at ``db_dir`` (single-JVM — the
    database lives in-process, no server to stand up)."""
    return f"jdbc:derby:{db_dir}{';create=true' if create else ''}"


def jdbc_write(df: DataFrame, url: str, table: str, *, driver: str = DERBY_DRIVER) -> None:
    """Real ``df.write.jdbc`` (executors open connections and batch-insert;
    mode=overwrite drops/recreates the table)."""
    if driver == DERBY_DRIVER:
        _quiet_derby(df.sparkSession)
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .mode("overwrite")
        .save()
    )


def jdbc_read(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    driver: str = DERBY_DRIVER,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int = 0,
    upper_bound: int = 1 << 40,
) -> DataFrame:
    """Partitioned JDBC scan with the same option shape as ``reader_options``
    (range-split on an integer PK into N parallel cursors)."""
    if driver == DERBY_DRIVER:
        _quiet_derby(spark)
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table).option("driver", driver)
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return r.load()


def _derby_stage(spark: SparkSession, sf_dir: str) -> str:
    """Seed a Derby database with supplier + nation from ``sf_dir`` parquet,
    marker-idempotent like formats._stage. Content-addressed key (r5
    ADVICE): the stage dir folds in a hash of the ABSOLUTE source path and
    the source parquet mtimes, so two fixture roots sharing a leaf name
    (/a/sf0.01 vs /b/sf0.01) stage separately, and a regenerated fixture
    (newer mtime) restages instead of silently reusing stale rows."""
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    src = _os.path.abspath(sf_dir.rstrip("/"))
    sig = _hashlib.md5(src.encode()).hexdigest()[:8]
    for t in ("supplier", "nation"):
        p = _os.path.join(src, f"{t}.parquet")
        try:
            mt = str(int(_os.stat(p).st_mtime)) if _os.path.isfile(p) else ",".join(
                f"{f}:{int(_os.stat(_os.path.join(p, f)).st_mtime)}"
                for f in sorted(_os.listdir(p))
            )
        except OSError:
            mt = "missing"
        sig = _hashlib.md5(f"{sig}|{t}|{mt}".encode()).hexdigest()[:8]
    base = _os.path.join(
        _tempfile.gettempdir(),
        f"jdbc_stage_{_os.path.basename(src)}_{sig}",
    )
    marker = _os.path.join(base, "_STAGED_v1")
    db_dir = _os.path.join(base, "db")
    if _os.path.exists(marker):
        return db_dir
    _shutil.rmtree(base, ignore_errors=True)
    _os.makedirs(base, exist_ok=True)
    url = derby_url(db_dir, create=True)
    jdbc_write(spark.read.parquet(_os.path.join(sf_dir, "supplier.parquet")), url, "supplier")
    jdbc_write(spark.read.parquet(_os.path.join(sf_dir, "nation.parquet")), url, "nation")
    with open(marker, "w") as f:
        f.write("ok\n")
    return db_dir


def src_jdbc_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 over a LIVE JDBC database: parquet -> Derby via df.write.jdbc,
    read back as a range-partitioned scan (supplier split on s_suppkey into
    8 cursors; nation as a single-cursor dim), joined and aggregated. A
    value-hash match against the parquet-side oracle certifies the whole
    write->read round-trip, not just option construction. The supplier
    filter is pushed into the JDBCRelation scan (plan-audited in
    tests/test_jdbc_live.py)."""
    from pyspark.sql import functions as F

    db_dir = _derby_stage(spark, sf_dir)
    url = derby_url(db_dir)
    # exact bounds from the (already-local) parquet footer stats keep the 8
    # range cursors balanced — production would run the same MIN/MAX probe
    lo, hi = (
        spark.read.parquet(f"{sf_dir.rstrip('/')}/supplier.parquet")
        .agg(F.min("s_suppkey"), F.max("s_suppkey"))
        .collect()[0]
    )
    if lo is None:  # empty source table: any single-cursor range works
        lo = hi = 0
    supplier = jdbc_read(
        spark, url, "supplier",
        partition_column="s_suppkey", num_partitions=8,
        lower_bound=int(lo), upper_bound=int(hi) + 1,
    ).filter(F.col("s_acctbal") >= 0)
    nation = jdbc_read(spark, url, "nation")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum(F.round(F.col("s_acctbal") * 100).cast("long")).alias("acctbal_cents"),
        )
        .orderBy("n_name")
    )


SRC_JDBC_LIVE_ORACLE = """
SELECT n_name,
       COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal >= 0
GROUP BY n_name
ORDER BY n_name
"""
