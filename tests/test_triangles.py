"""Triangle-counting certification: known graphs and a brute-force oracle
on a random-ish deterministic graph (the gate oracle covers the fixture
graph; these cover the algorithm core on adversarial shapes)."""

from __future__ import annotations

from itertools import combinations

from phabricator_etl_spark.operators.triangles import triangle_corner_counts


def _edges_df(spark, pairs):
    canon = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    return spark.createDataFrame(canon, "a long, b long")


def _brute(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    nodes = sorted({n for e in es for n in e})
    tri_count = {n: 0 for n in nodes}
    for x, y, z in combinations(nodes, 3):
        if (x, y) in es and (x, z) in es and (y, z) in es:
            for n in (x, y, z):
                tri_count[n] += 1
    return {n: c for n, c in tri_count.items() if c}


def test_k4_every_node_in_three_triangles(spark):
    pairs = [(a, b) for a, b in combinations([1, 2, 3, 4], 2)]
    got = {r.n: (r.n_triangles, r.deg) for r in triangle_corner_counts(_edges_df(spark, pairs)).collect()}
    assert got == {n: (3, 3) for n in (1, 2, 3, 4)}


def test_star_has_no_triangles(spark):
    pairs = [(0, i) for i in range(1, 8)]
    assert triangle_corner_counts(_edges_df(spark, pairs)).count() == 0


def test_hub_with_rim_matches_bruteforce(spark):
    # hub 0 connected to a 6-cycle rim: triangles = 6 (hub + each rim edge).
    # This is the degree-skew case the orientation exists for.
    rim = [(i, i % 6 + 1) for i in range(1, 7)]
    pairs = rim + [(0, i) for i in range(1, 7)]
    expect = _brute(pairs)
    got = {r.n: r.n_triangles for r in triangle_corner_counts(_edges_df(spark, pairs)).collect()}
    assert got == expect
    assert got[0] == 6


def test_pseudorandom_graph_matches_bruteforce(spark):
    # deterministic pseudo-random graph on 24 nodes
    pairs = [
        (u, v)
        for u, v in combinations(range(24), 2)
        if (u * 7919 + v * 104729) % 5 == 0
    ]
    expect = _brute(pairs)
    got = {r.n: r.n_triangles for r in triangle_corner_counts(_edges_df(spark, pairs)).collect()}
    assert got == expect


def test_chain_fixture_constant_degree_linear_triangles(spark, sf_smoke):
    """The r6 scale-probe fixture must have the shape that makes it a valid
    linearity probe: degree <= 4 everywhere and exactly n-2 triangles on a
    contiguous key range (every consecutive triple closes one); interior
    nodes sit in 3 triangles."""
    from phabricator_etl_spark.operators.triangles import graph_triangles_chain

    rows = {r.c_custkey: r for r in graph_triangles_chain(spark, sf_smoke).collect()}
    assert rows, "probe produced no corners"
    lo, hi = min(rows), max(rows)
    # on a contiguous key range every node is a corner of >= 1 triangle
    n = len(rows)
    assert n == hi - lo + 1, "smoke customer keys expected contiguous"
    assert all(r.n_edges <= 4 for r in rows.values()), "degree must stay constant-bounded"
    total_corner_credits = sum(r.n_triangles for r in rows.values())
    assert total_corner_credits == 3 * (n - 2), "chain graph must carry exactly n-2 triangles"
    interior = [r for k, r in rows.items() if lo + 1 < k < hi - 1]
    assert interior and all(r.n_triangles == 3 for r in interior)


def test_blocked_wedge_join_exact_and_bounded_on_hot_hub(spark):
    """r6 verdict #3: link prediction's wedge generation must stay exact AND
    bound the last reducer at a hub. Double-star fixture: hubs 0 and 1 each
    adjacent to 200 shared leaves -> cn(0,1)=200, cn(leaf,leaf')=2,
    cn(hub,leaf)=0. With cap=16 the hubs split into ceil(200/16)=13 blocks;
    the pair multiset must equal the plain wedge join's, and no (ctr, blk)
    bucket may exceed 2x the cap."""
    from pyspark.sql import functions as F

    from phabricator_etl_spark.operators.triangles import (
        _blocked_adjacency,
        _blocked_common_neighbors,
    )

    leaves = list(range(2, 202))
    edges = [(0, l) for l in leaves] + [(1, l) for l in leaves]
    e = spark.createDataFrame(edges, "a long, b long")
    adj = e.select(F.col("a").alias("node"), F.col("b").alias("nb")).union(
        e.select(F.col("b").alias("node"), F.col("a").alias("nb"))
    )
    cap = 16
    got = {(r["x"], r["y"]): r["cn"] for r in _blocked_common_neighbors(adj, cap).collect()}
    expected = {(0, 1): 200}
    expected.update({(x, y): 2 for x, y in combinations(leaves, 2)})
    assert got == expected

    blocks = _blocked_adjacency(adj, cap).groupBy("ctr", "nblk", "blk").count().collect()
    hub_rows = [r for r in blocks if r["ctr"] in (0, 1)]
    assert hub_rows and all(r["nblk"] == 13 for r in hub_rows), "hubs must actually split"
    assert max(r["count"] for r in blocks) <= 2 * cap, "block occupancy must stay near the cap"
    # leaves (degree 2) take the degenerate single-block path
    assert all(r["nblk"] == 1 for r in blocks if r["ctr"] not in (0, 1))


def test_blocked_wedge_join_matches_plain_join_on_pseudorandom_graph(spark):
    """The blocked form must be pair-for-pair identical to the plain wedge
    join on an irregular graph, at a cap small enough that multi-block
    centers are common."""
    from pyspark.sql import functions as F

    from phabricator_etl_spark.operators.triangles import _blocked_common_neighbors

    pairs = [
        (u, v)
        for u, v in combinations(range(60), 2)
        if (u * 7919 + v * 104729) % 3 == 0
    ]
    e = _edges_df(spark, pairs)
    adj = e.select(F.col("a").alias("node"), F.col("b").alias("nb")).union(
        e.select(F.col("b").alias("node"), F.col("a").alias("nb"))
    )
    plain = (
        adj.select(F.col("node").alias("x"), F.col("nb").alias("ctr"))
        .join(adj.select(F.col("node").alias("y"), F.col("nb").alias("ctr")), "ctr")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    want = {(r["x"], r["y"]): r["cn"] for r in plain.collect()}
    got = {(r["x"], r["y"]): r["cn"] for r in _blocked_common_neighbors(adj, cap=4).collect()}
    assert got == want
    # sub-cap max degree dispatches to the plain wedge join; same pairs
    got_plain = {
        (r["x"], r["y"]): r["cn"]
        for r in _blocked_common_neighbors(adj, cap=1000).collect()
    }
    assert got_plain == want


def test_link_pred_chain_distances_and_counts(spark, sf_smoke):
    """The r7 scale probe must predict exactly the distance-3/4 pairs of the
    chain graph: on a contiguous key range N(u) = {u-2, u-1, u+1, u+2}, so a
    non-adjacent pair with common neighbors is (u, u+3) with cn=2 or
    (u, u+4) with cn=1 — nothing else."""
    from phabricator_etl_spark.operators.triangles import (
        LINK_PRED_TOP_K,
        graph_link_pred_chain,
    )

    rows = graph_link_pred_chain(spark, sf_smoke).collect()
    assert len(rows) == LINK_PRED_TOP_K
    for r in rows:
        dist = r.y - r.x
        assert dist in (3, 4), f"unexpected candidate pair {(r.x, r.y)}"
        assert r.common_neighbors == (2 if dist == 3 else 1)
    scores = [r.jaccard_x1000 for r in rows]
    assert scores == sorted(scores, reverse=True), "top-k must come out rank-ordered"
