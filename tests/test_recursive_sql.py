"""Three-way certification of the order-chain walk: recursive SQL (Spark),
pointer-jump BFS, and the analytic closed form must agree."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from phabricator_etl_spark.operators.iterative import graph_bfs_distance
from phabricator_etl_spark.plans.sql_interface import SQL_RECURSIVE_CHAIN, register_views
from phabricator_etl_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
DEPTH_BOUND = 7  # mirrors the WHERE w.depth < 7 guard in the SQL


def test_recursive_cte_equals_pointer_jump_and_closed_form(spark):
    register_views(spark, SF)
    rec = {r.o_orderkey: r.depth for r in spark.sql(SQL_RECURSIVE_CHAIN).collect()}

    bfs = {
        r.o_orderkey: r.hops_from_first
        for r in graph_bfs_distance(spark, SF).collect()
        if r.hops_from_first <= DEPTH_BOUND
    }
    assert rec == bfs

    # closed form: position in the per-customer chain
    o = load_table(spark, SF, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    pos = {
        r.o_orderkey: r.pos
        for r in o.select(
            "o_orderkey", (F.row_number().over(w) - 1).alias("pos")
        ).collect()
        if r.pos <= DEPTH_BOUND
    }
    assert rec == pos


def test_registration_is_per_session_not_per_context(spark):
    """A sibling session created with newSession() shares the SparkContext
    (same applicationId) but has its OWN temp-view catalog and data-source
    registry. The registration guards must therefore be session-scoped: an
    applicationId-keyed set silently skipped the sibling, failing every SQL
    query there with TABLE_OR_VIEW_NOT_FOUND / DATA_SOURCE_NOT_FOUND."""
    register_views(spark, SF)
    assert spark.sql("SELECT COUNT(*) AS n FROM orders").collect()[0].n > 0

    sib = spark.newSession()
    try:
        register_views(sib, SF)
        assert sib.sql("SELECT COUNT(*) AS n FROM orders").collect()[0].n > 0

        # Python data sources, by contrast, CANNOT cross to a clone in
        # Spark 4.1.2 (upstream inconsistency: the ALREADY_EXISTS existence
        # check is context-level, the read-path lookup session-level).
        # register_ticks must tolerate that without crashing, and this pin
        # flips if an upstream Spark fixes which registry wins.
        from phabricator_etl_spark.sources.pydatasource import register_ticks

        register_ticks(spark)  # owning session: re-register is a no-op replace
        register_ticks(sib)  # clone: swallows DATA_SOURCE_ALREADY_EXISTS
        import pytest as _pytest

        with _pytest.raises(Exception, match="DATA_SOURCE_NOT_FOUND"):
            sib.read.format("ticks").option("rows", "10").load().count()
        assert spark.read.format("ticks").option("rows", "10").load().count() == 10
    finally:
        # newSession shares the context; nothing to stop, but drop the
        # sibling's temp views so no state leaks via the shared JVM
        # (NOT catalog.clearCache(): that clears the application-wide
        # CacheManager for every session, not this session's views)
        from phabricator_etl_spark.plans.sql_interface import _TABLES

        for t in _TABLES:
            sib.catalog.dropTempView(t)
