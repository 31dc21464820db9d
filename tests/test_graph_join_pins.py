"""Plan-pin tests for the NO_BROADCAST_MIN_EDGES seam (r7 verdict #5).

triangles.py pins every join against a localCheckpointed (stats-free) graph
relation to shuffle_hash once the edge count crosses NO_BROADCAST_MIN_EDGES
— below it, Catalyst's broadcast of a few-MB side is measured strictly
better; above it, the optimizer's size guess for the stats-free relation
straddles autoBroadcastJoinThreshold and the plan flips run-to-run between
a partition-local build and a 190-500 s full-relation broadcast (measured
at sf30, triangles.py:82). Both sides of the threshold are asserted on the
executed AQE plan, next to the skew-world plan asserts, so a Spark upgrade
(or a refactor dropping the hint) cannot silently flip either arm.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phabricator_etl_spark.operators.triangles import (
    NO_BROADCAST_MIN_EDGES,
    _blocked_adjacency,
    triangle_corner_counts,
)


def _final_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, "expected an AQE-finalized plan"
    return plan


def _chain_edges(spark, n: int):
    # path graph 0-1-2-...-n: degrees <= 2, wedge volume linear — the big
    # arm's cost is the shuffles under test, not triangle work
    return spark.range(n).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )


def test_small_graph_keeps_catalyst_broadcast(spark):
    # kB-sized checkpointed relations: the threshold guard must leave
    # Catalyst's choice alone, and at this size that choice is broadcast
    df = triangle_corner_counts(_chain_edges(spark, 2_000))
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "ShuffledHashJoin" not in plan, (
        "sub-threshold graph got the shuffle_hash pin; the hint must only "
        "apply above NO_BROADCAST_MIN_EDGES"
    )


def test_big_graph_pins_shuffle_hash(spark):
    # At exactly the threshold (1M edges ~ 16 MB of bigint pairs, under the
    # 64 MB autoBroadcastJoinThreshold) Catalyst WOULD broadcast the
    # checkpointed relation; the pin must override it with shuffle_hash on
    # every graph-relation join
    df = triangle_corner_counts(_chain_edges(spark, NO_BROADCAST_MIN_EDGES))
    plan = _final_plan(df)
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan, (
        "a >=NO_BROADCAST_MIN_EDGES stats-free relation won a broadcast — "
        "the measured 190-500s sf30 flip this pin exists to prevent"
    )


def test_blocked_adjacency_small_graph_not_force_shuffled(spark):
    # r8 advisor: _blocked_adjacency used to hint shuffle_hash
    # unconditionally, forcing full shuffle machinery on the kB-sized degree
    # table of a small graph with one >cap hub — the exact input the
    # threshold comment says broadcast is strictly better for
    leaves = list(range(1, 300))
    e = spark.createDataFrame([(0, leaf) for leaf in leaves], "a long, b long")
    adj = e.select(F.col("a").alias("node"), F.col("b").alias("nb")).union(
        e.select(F.col("b").alias("node"), F.col("a").alias("nb"))
    )
    df = _blocked_adjacency(adj, cap=16)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "ShuffledHashJoin" not in plan
