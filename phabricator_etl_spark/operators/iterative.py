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


def _local_pointer_distances(seeds: DataFrame, epd) -> DataFrame:
    """Driver-side list ranking for subcritical forests — the same size
    cutover as graph._local_components (see LOCAL_EDGE_THRESHOLD's cost
    model there). Memoized root-walk: O(E) driver work, exact same output
    contract as the distributed path (asserted in tests). ``epd`` is the
    caller's probe result (pandas frame dst/src) — probe doubles as
    transfer."""
    import pandas as pd

    seed_ids = set(seeds.select("id").toPandas()["id"].tolist())
    parent: dict = dict(zip(epd["dst"].tolist(), epd["src"].tolist()))
    memo: dict = {}  # node -> (terminal_root | None, distance_to_root)

    def resolve(v) -> None:
        path, seen = [], set()
        cur = v
        while cur in parent and cur not in memo:
            if cur in seen:  # cycle: violates the forest contract -> no root
                for n in path:
                    memo[n] = (None, 0)
                return
            seen.add(cur)
            path.append(cur)
            cur = parent[cur]
        root, base = memo[cur] if cur in memo else (cur, 0)
        for i, node in enumerate(reversed(path), start=1):
            memo[node] = (root, base + i) if root is not None else (None, 0)

    for v in parent:
        resolve(v)
    rows = [(v, 0) for v in sorted(seed_ids, key=str)] + [
        (v, d) for v, (root, d) in memo.items() if root in seed_ids
    ]
    schema = seeds.select(F.col("id"), F.lit(0).cast("long").alias("distance")).schema
    out = pd.DataFrame({"id": [r[0] for r in rows], "distance": [r[1] for r in rows]})
    return seeds.sparkSession.createDataFrame(out, schema)


def pointer_jump_distances(
    seeds: DataFrame,
    edges: DataFrame,
    *,
    max_iterations: int = 40,
    local_threshold: int | None = None,
) -> DataFrame:
    """Hop distance from seeds over an IN-FOREST (every vertex has at most one
    incoming edge; seeds are the roots) by pointer jumping — Wyllie's parallel
    list ranking.

    Each round, every vertex's known-ancestor pointer jumps to its ancestor's
    ancestor, accumulating the hop count, so the compressed path length
    doubles per round: O(log diameter) rounds and self-joins vs frontier
    BFS's O(diameter). At 100 TB this is the difference between ~30 shuffle
    rounds and ~5 for long chains (e.g. event/session successor graphs).

    Falls under the same semantics as ``bfs_distances`` when the graph is a
    forest rooted at the seeds; use ``bfs_distances`` for general graphs.
    """
    from .graph import LOCAL_EDGE_THRESHOLD

    if local_threshold is None:
        local_threshold = LOCAL_EDGE_THRESHOLD
    edges = edges.persist()
    if local_threshold > 0:
        # LIMIT probe doubles as the Arrow transfer (see graph.py); nulls
        # dropped Spark-side to keep pandas dtypes integral.
        probe = (
            edges.select("dst", "src")
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .limit(local_threshold + 1)
            .toPandas()
        )
        if len(probe) <= local_threshold:
            try:
                return _local_pointer_distances(seeds, probe)
            finally:
                edges.unpersist()
    seeds = seeds.select("id").localCheckpoint(eager=True)
    # Non-root vertices start pointing at their parent, one hop away.
    ptr = edges.select(
        F.col("dst").alias("id"),
        F.col("src").alias("anc"),
        F.lit(1).cast("long").alias("distance"),
    ).localCheckpoint(eager=True)
    edges.unpersist()
    # distance is elementwise non-decreasing and strictly increases somewhere
    # iff any pointer can still jump, so one scalar sum detects the fixpoint.
    prev_sum = ptr.agg(F.sum("distance")).collect()[0][0] or 0
    for _ in range(max_iterations):
        j = ptr.select(
            F.col("id").alias("j_id"),
            F.col("anc").alias("j_anc"),
            F.col("distance").alias("j_d"),
        )
        ptr = (
            ptr.join(j, ptr.anc == j.j_id, "left")
            .select(
                "id",
                F.coalesce("j_anc", "anc").alias("anc"),
                (F.col("distance") + F.coalesce("j_d", F.lit(0))).alias("distance"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = ptr.agg(F.sum("distance")).collect()[0][0] or 0
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # Keep only vertices whose terminal ancestor is a seed (reachability), and
    # the seeds themselves at distance 0.
    reached = ptr.join(seeds.withColumnRenamed("id", "anc"), "anc").select("id", "distance")
    return seeds.select("id", F.lit(0).cast("long").alias("distance")).unionByName(reached)


def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance over each customer's order chain (consecutive orders
    linked, as in a8), seeded at every customer's first order. The distance
    has a closed form — position in the chain — which is the oracle: a
    nontrivial iterative execution checked against an exact analytic answer.
    The chain graph is an in-forest, so pointer jumping applies."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    chained = o.withColumn("prev", F.lag("o_orderkey").over(w))
    edges = chained.filter(F.col("prev").isNotNull()).select(
        F.col("prev").alias("src"), F.col("o_orderkey").alias("dst")
    )
    seeds = chained.filter(F.col("prev").isNull()).select(F.col("o_orderkey").alias("id"))
    return pointer_jump_distances(seeds, edges).select(
        F.col("id").cast("long").alias("o_orderkey"),
        F.col("distance").alias("hops_from_first"),
    )


BFS_ORACLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1 AS BIGINT)
         AS hops_from_first
FROM orders
"""


def _local_pagerank(
    vertices: DataFrame, epd, damping: float, iterations: int
) -> DataFrame:
    """Driver numpy power iteration for subcritical graphs (same cutover +
    probe mechanics as graph._local_components). Identical update rule to
    the distributed loop: rank <- (1-d) + d*(inflow + dangling_mass/n)."""
    import numpy as np
    import pandas as pd

    ids = vertices.select("id").toPandas()["id"].tolist()
    n = len(ids)
    idx = {v: i for i, v in enumerate(ids)}
    # Mirror the distributed joins exactly: out-degree counts EVERY edge of a
    # known src (even to unknown dsts — that mass evaporates, as in the
    # e⋈ranks join); inflow only lands on known dsts.
    known_src = epd[epd["src"].isin(idx)]
    deg_src = np.fromiter((idx[v] for v in known_src["src"]), dtype=np.int64, count=len(known_src))
    deg = np.bincount(deg_src, minlength=n).astype(np.float64)
    flow = known_src[known_src["dst"].isin(idx)]
    src = np.fromiter((idx[v] for v in flow["src"]), dtype=np.int64, count=len(flow))
    dst = np.fromiter((idx[v] for v in flow["dst"]), dtype=np.int64, count=len(flow))
    dangling = deg == 0
    rank = np.ones(n, dtype=np.float64)
    safe_deg = np.where(dangling, 1.0, deg)
    for _ in range(iterations):
        contrib = rank / safe_deg
        inflow = np.bincount(dst, weights=contrib[src], minlength=n)
        dmass = rank[dangling].sum()
        rank = (1.0 - damping) + damping * (inflow + dmass / n)
    out = pd.DataFrame({"id": ids, "rank": rank})
    schema = vertices.select(F.col("id"), F.lit(1.0).alias("rank")).schema
    return vertices.sparkSession.createDataFrame(out, schema)


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    damping: float = 0.85,
    iterations: int = 10,
    local_threshold: int | None = None,
) -> DataFrame:
    """Power-iteration PageRank over directed edges; dangling mass is
    redistributed uniformly. Returns (id, rank); sum(rank) == |V|."""
    from .graph import LOCAL_EDGE_THRESHOLD

    if local_threshold is None:
        local_threshold = LOCAL_EDGE_THRESHOLD
    if local_threshold > 0:
        probe = (
            edges.select("src", "dst")
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .limit(local_threshold + 1)
            .toPandas()
        )
        if len(probe) <= local_threshold:
            return _local_pagerank(vertices, probe, damping, iterations)
    n = vertices.count()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e = edges.join(out_deg, "src").localCheckpoint(eager=True)
    # The dangling-vertex SET is static across iterations; precompute it once
    # so each round only sums ranks over it.
    dangling_ids = (
        vertices.join(out_deg.withColumnRenamed("src", "id"), "id", "left_anti")
        .select("id")
        .localCheckpoint(eager=True)
    )
    ranks = vertices.select("id", F.lit(1.0).alias("rank")).localCheckpoint(eager=True)
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e.src == ranks.id)
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        # Dangling mass stays a one-row DataFrame broadcast-crossed into the
        # update — no driver collect(), so each round is ONE job (the
        # checkpoint) instead of two.
        dmass = ranks.join(dangling_ids, "id", "left_semi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
        )
        ranks = (
            vertices.join(contribs, "id", "left")
            .crossJoin(F.broadcast(dmass))
            .select(
                "id",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (F.coalesce("inflow", F.lit(0.0)) + F.col("dmass") / F.lit(float(n)))
                ).alias("rank"),
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


KCORE_K = 2  # non-empty at every test SF (the residue graph only grows a 3-core at sf>=0.01)
_KCORE_MAX_ROUNDS = 64


def kcore_subgraph(edges: DataFrame, k: int) -> DataFrame:
    """Iterative k-core peeling over canonical (a < b) undirected edges.

    Each round drops every vertex whose CURRENT degree is < k, then removes
    its edges; the fixpoint is the k-core. Monotone shrinkage ⇒ #rounds ≤
    peeling depth (tiny for real degree distributions); each round is one
    degree aggregation + one semi-join-shaped filter, both keyed on vertex
    id. The per-round collect() is a single scalar (the standard convergence
    probe, same as CC/PageRank here). Returns (node, core_degree) for the
    surviving vertices.
    """
    e = edges.select("a", "b").localCheckpoint(eager=True)
    for _ in range(_KCORE_MAX_ROUNDS):
        deg = (
            e.select(F.col("a").alias("node"))
            .union(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        bad = deg.filter(F.col("deg") < k).select("node").localCheckpoint(eager=True)
        if bad.count() == 0:
            return deg.select(F.col("node").cast("long"), F.col("deg").cast("long").alias("core_degree"))
        e = (
            e.join(bad.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(bad.withColumnRenamed("node", "b"), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError("k-core peeling did not converge")  # pragma: no cover


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the residue-rule customer graph (same edge set as
    graph_triangle_count). Rows-only gate: the peel is an iterative fixpoint
    (not SQL-expressible); exactness is pytest-pinned against a Python
    peeling oracle on the same edges (tests/test_graph_paths.py)."""
    from .triangles import _canonical_edges

    core = kcore_subgraph(_canonical_edges(spark, sf_dir), KCORE_K)
    return core.orderBy("node")


ITERATIVE_QUERIES = [
    Q("graph_bfs_distance", graph_bfs_distance, BFS_ORACLE, "frontier BFS vs closed-form oracle"),
    Q("graph_pagerank", graph_pagerank, None, "power-iteration PageRank (invariants in pytest)"),
    Q("graph_kcore", graph_kcore, None, "iterative k-core peeling to fixpoint (Python-oracle pytest)"),
]
