"""Iterative graph algorithms as driver-orchestrated DataFrame fixpoints.

The reference's one graph computation is the stack_size BFS (SURVEY §4.3);
connected components generalizes it. This module adds the other two shapes a
graph workload needs — frontier BFS (shortest hop distance) and power
iteration (PageRank) — using the same pattern: per-round equi-joins,
localCheckpoint to cut lineage, convergence by cheap aggregate.

Scale: every round is one join edges⋈frontier + one groupBy min — shuffle
volume proportional to the frontier, not the graph. Pre-partitioning edges by
src keeps one side exchange-free across rounds (same layout trick as
operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..query import Q
from ..sources.catalog import load_table as _t


def bfs_distances(seeds: DataFrame, edges: DataFrame, *, max_iterations: int = 50) -> DataFrame:
    """Hop distance from a seed set over DIRECTED edges (src -> dst).

    seeds: DataFrame(id); edges: DataFrame(src, dst).
    Returns (id, distance) for every reachable vertex (seeds at 0).
    """
    # Size the per-round layout to the graph (same trick as graph.py):
    # hash-partition edges by src once; every round's frontier join then
    # exchanges only the (small) frontier side.
    spark = edges.sparkSession
    n_edges = edges.count()
    default_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = max(2, min(default_parts, n_edges // 100_000 + 2))
    edges = edges.repartition(parts, "src").localCheckpoint(eager=True)

    dist = (
        seeds.select(F.col("id"), F.lit(0).cast("long").alias("distance"))
        .repartition(parts, "id")
        .localCheckpoint(eager=True)
    )
    frontier = dist
    settled_chunks = [dist]  # checkpointed pieces; union only at the end
    for hop in range(1, max_iterations + 1):
        # one anti-join against the lazy union of checkpointed chunks: the
        # union is a plan over already-cached partitions, so no extra
        # materialization per round
        settled_ids = settled_chunks[0].select("id")
        for chunk in settled_chunks[1:]:
            settled_ids = settled_ids.unionByName(chunk.select("id"))
        reached = (
            edges.join(frontier, edges.src == frontier.id)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(settled_ids, "id", "left_anti")
            .withColumn("distance", F.lit(hop).cast("long"))
            .localCheckpoint(eager=True)
        )
        if reached.isEmpty():
            break
        settled_chunks.append(reached)
        frontier = reached
    out = settled_chunks[0]
    for chunk in settled_chunks[1:]:
        out = out.unionByName(chunk)
    return out


def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS over each customer's order chain (consecutive orders linked, as in
    a8), seeded at every customer's first order. The hop distance has a
    closed form — position in the chain — which is the oracle: a nontrivial
    iterative execution checked against an exact analytic answer."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    chained = o.withColumn("prev", F.lag("o_orderkey").over(w))
    edges = chained.filter(F.col("prev").isNotNull()).select(
        F.col("prev").alias("src"), F.col("o_orderkey").alias("dst")
    )
    seeds = chained.filter(F.col("prev").isNull()).select(F.col("o_orderkey").alias("id"))
    return bfs_distances(seeds, edges).select(
        F.col("id").cast("long").alias("o_orderkey"),
        F.col("distance").alias("hops_from_first"),
    )


BFS_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1 AS BIGINT)
         AS hops_from_first
FROM orders
"""


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """Power-iteration PageRank over directed edges; dangling mass is
    redistributed uniformly. Returns (id, rank); sum(rank) == |V|."""
    n = vertices.count()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e = edges.join(out_deg, "src").localCheckpoint(eager=True)
    ranks = vertices.select("id", F.lit(1.0).alias("rank")).localCheckpoint(eager=True)
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e.src == ranks.id)
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        dangling = (
            ranks.join(out_deg.withColumnRenamed("src", "id"), "id", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
            .collect()[0][0]
        )
        base = (1.0 - damping) + damping * dangling / n
        ranks = (
            vertices.join(contribs, "id", "left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer->customer graph induced by shared order
    priority within a nation (synthetic but deterministic). Rows-only check:
    float summation order makes cross-engine hashing meaningless; invariants
    (mass conservation, convergence) are pytest-checked instead."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    a = c.withColumnRenamed("c_custkey", "src")
    b = c.select(F.col("c_custkey").alias("dst"), F.col("c_nationkey").alias("nk2"))
    edges = (
        a.join(b, (a.c_nationkey == b.nk2) & (a.src != b.dst))
        .filter((F.col("src") + F.col("dst")) % 37 == 0)  # sparse deterministic subset
        .select("src", "dst")
    )
    vertices = c.select(F.col("c_custkey").alias("id"))
    pr = pagerank(vertices, edges, iterations=5)
    return pr.select(F.col("id").cast("long").alias("c_custkey"), F.round("rank", 6).alias("rank"))


ITERATIVE_QUERIES = [
    Q("graph_bfs_distance", graph_bfs_distance, BFS_ORACLE, "frontier BFS vs closed-form oracle"),
    Q("graph_pagerank", graph_pagerank, None, "power-iteration PageRank (invariants in pytest)"),
]
