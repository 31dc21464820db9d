"""JDBC source layer: option-shape unit tests (no MySQL in this
environment; the reader is never executed)."""

from __future__ import annotations

import pytest

from phabricator_etl_spark.sources.jdbc import (
    DATABASE_TABLES,
    JdbcConfig,
    reader_options,
    table_reader,
)

ENV = {
    "PHAB_DB_HOST": "db.example.internal",
    "PHAB_DB_PORT": "3307",
    "PHAB_DB_NAMESPACE": "phab",
    "PHAB_DB_USER": "etl",
    "PHAB_DB_PASSWORD": "s3cret",
}


def test_config_from_env_and_url():
    cfg = JdbcConfig.from_env(ENV)
    assert cfg.url("differential") == "jdbc:mysql://db.example.internal:3307/phab_differential"
    assert cfg.port == 3307
    # password must not leak through repr (it ends up in logs)
    assert "s3cret" not in repr(cfg)


def test_fifteen_source_tables_mapped():
    # the reference reflects exactly 15 tables across 4 DBs (stats.py:161-191)
    assert sum(len(v) for v in DATABASE_TABLES.values()) == 15
    assert set(DATABASE_TABLES) == {"user", "project", "repository", "differential"}


def test_reader_is_range_partitioned(spark):
    cfg = JdbcConfig.from_env(ENV)
    opts = reader_options(cfg, "differential", "differential_revision", num_partitions=8)
    assert opts["url"].endswith("/phab_differential")
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "8"
    # reader construction itself must not raise (never load()ed: no MySQL)
    table_reader(spark, cfg, "differential", "differential_revision", num_partitions=8)


def test_unknown_table_rejected():
    cfg = JdbcConfig.from_env(ENV)
    with pytest.raises(ValueError, match="not a known table"):
        reader_options(cfg, "user", "differential_diff")


def test_exact_options_for_the_four_reference_dsns():
    """VERDICT r9 #5: pin the MySQL dialect mapping without a server — the
    EXACT option map emitted for one table of each of the four reference
    databases (stats.py:126-149's DSNs). If the live seam ever opens, these
    are the options that meet the MySQL wire."""
    cfg = JdbcConfig.from_env(ENV)
    base = {
        "user": "etl",
        "password": "s3cret",
        "driver": "com.mysql.cj.jdbc.Driver",
        # the reference decodes utf8 bytes columns by hand (stats.py:617-619);
        # the connector normalizes at the wire instead
        "characterEncoding": "utf-8",
    }
    part = {
        "partitionColumn": "id",
        "numPartitions": "16",
        "lowerBound": "0",
        "upperBound": str(1 << 40),
    }
    assert reader_options(cfg, "user", "user") == {
        "url": "jdbc:mysql://db.example.internal:3307/phab_user",
        "dbtable": "user",
        **base,
        **part,
    }
    assert reader_options(cfg, "project", "project") == {
        "url": "jdbc:mysql://db.example.internal:3307/phab_project",
        "dbtable": "project",
        **base,
        **part,
    }
    assert reader_options(cfg, "repository", "repository_uri", partition_column=None) == {
        "url": "jdbc:mysql://db.example.internal:3307/phab_repository",
        "dbtable": "repository_uri",
        **base,
    }
    assert reader_options(cfg, "differential", "differential_revision") == {
        "url": "jdbc:mysql://db.example.internal:3307/phab_differential",
        "dbtable": "differential_revision",
        **base,
        **part,
    }
