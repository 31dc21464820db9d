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
