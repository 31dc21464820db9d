"""The two connected-components execution paths must agree exactly.

``connected_components`` cuts over to a driver union-find below
LOCAL_EDGE_THRESHOLD edges (the graph analog of a broadcast join's size
cutover); above it, the distributed pointer-doubling fixpoint runs. Both
must produce the identical (id, component=min-id) labeling.
"""

from __future__ import annotations

import random

from phabricator_etl_spark.operators.graph import connected_components


def _random_graph(seed: int, n: int, m: int):
    rng = random.Random(seed)
    vertices = list(range(n))
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    return vertices, edges


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_local_and_distributed_paths_agree(spark):
    vertices, edges = _random_graph(seed=11, n=300, m=180)
    vdf = spark.createDataFrame([(v,) for v in vertices], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    local = _labels(connected_components(vdf, edf))
    dist = _labels(connected_components(vdf, edf, local_threshold=0))
    assert local == dist


def test_local_path_matches_python_oracle(spark):
    vertices, edges = _random_graph(seed=23, n=120, m=90)
    vdf = spark.createDataFrame([(v,) for v in vertices], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = _labels(connected_components(vdf, edf))

    # independent oracle: repeated relaxation to fixpoint
    label = {v: v for v in vertices}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            lo = min(label[a], label[b])
            if label[a] != lo or label[b] != lo:
                label[a] = label[b] = lo
                changed = True
    assert got == label


def test_isolated_vertices_and_self_loops(spark):
    vdf = spark.createDataFrame([(1,), (2,), (3,), (9,)], "id long")
    edf = spark.createDataFrame([(2, 2), (3, 9)], "src long, dst long")
    got = _labels(connected_components(vdf, edf))
    assert got == {1: 1, 2: 2, 3: 3, 9: 3}
