"""K-means (Lloyd's) over embedding columns + IVF index build/search.

The IVF coarse quantizer in operators/similarity.py uses the dataset's label
column as a stand-in cell id; this module builds REAL cells: k-means via
iterative DataFrame aggregation (no MLlib dependency — the point is the
engine primitive), then IVF search against the learned centroids.

Determinism: init = the k lowest vec_ids; each iteration assigns by exact
argmin over quantized-integer distances and recomputes centroids with
Spark's avg. Float summation order varies across engines, so these are
rows-only gate entries; the semantic invariants (SSE monotonically
non-increasing, assignment = argmin to final centroids, k cells non-empty)
are pytest-checked in tests/test_clustering.py.

Scale: each iteration is one broadcast of k centroids (tiny) + one scan with
map-side partial aggregation — the canonical embarrassingly-parallel Lloyd.
The centroid table never exceeds k x dim doubles; the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..query import Q
from ..session import session_key
from ..sources.catalog import load_table as _t

K_CELLS = 8
ITERATIONS = 5
TOP_K = 5
N_QUERIES = 10

# Driver-cutover threshold in VECTORS (same philosophy + probe mechanics as
# graph.LOCAL_EDGE_THRESHOLD): below it, 5 Lloyd rounds are pure scheduling
# overhead vs one Arrow transfer + numpy matmuls. 64Ki x dim=64 doubles is
# ~32 MB driver-side — the broadcast-sized regime. The distributed loop is
# the 100 TB path and stays the default above the threshold.
KMEANS_LOCAL_ROWS = 65_536


def _sq_dist(a: str, b: str) -> F.Column:
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, v: s + v,
    )


def _local_kmeans(vectors: DataFrame, vpd, k: int, iterations: int) -> DataFrame:
    """Driver numpy Lloyd for subcritical inputs — identical semantics to the
    distributed loop: init = k lowest vec_ids, argmin assignment with
    lowest-cell tie-break (np.argmin returns the FIRST min, matching
    min(struct(d, cell))), empty cells keep their centroid. Distances via
    the |x-c|^2 = |x|^2 - 2x.c + |c|^2 expansion: an (n,k) matmul, never an
    (n,k,dim) tensor."""
    import numpy as np
    import pandas as pd

    order = np.argsort(vpd["vec_id"].to_numpy())
    X = np.vstack(vpd["vec"].to_numpy()).astype(np.float64)[order]
    C = X[:k].copy()
    for _ in range(iterations):
        d = (X * X).sum(1, keepdims=True) - 2.0 * (X @ C.T) + (C * C).sum(1)
        a = d.argmin(1)
        for c in range(k):
            members = X[a == c]
            if len(members):
                C[c] = members.mean(0)
    out = pd.DataFrame({"cell": np.arange(1, k + 1, dtype=np.int32), "centroid": list(C)})
    return vectors.sparkSession.createDataFrame(out, "cell int, centroid array<double>")


def kmeans_fit(
    vectors: DataFrame,
    *,
    k: int = K_CELLS,
    iterations: int = ITERATIONS,
    local_threshold: int | None = None,
) -> DataFrame:
    """vectors: (vec_id long, vec array<double>). Returns (cell, centroid).

    Lloyd's algorithm: assign to nearest centroid, recompute means. Empty
    cells keep their previous centroid (standard fix)."""
    if local_threshold is None:
        local_threshold = KMEANS_LOCAL_ROWS
    if local_threshold > 0:
        # LIMIT probe doubles as the Arrow transfer (see graph.py).
        probe = vectors.select("vec_id", "vec").limit(local_threshold + 1).toPandas()
        if len(probe) <= local_threshold:
            return _local_kmeans(vectors, probe, k, iterations)
    centroids = (
        vectors.orderBy("vec_id")
        .limit(k)
        .select(F.row_number().over(Window.orderBy("vec_id")).alias("cell"), F.col("vec").alias("centroid"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        assigned = assign_cells(vectors, centroids)
        # Per-dimension means via posexplode + (cell, pos) groupBy, then
        # reassemble the centroid array ordered by pos. The plan size is
        # CONSTANT in dim — the per-dimension-column alternative (dim
        # separate avg aggregates) recompiles an O(dim)-wide codegen stage
        # every iteration, which dominates wall-clock for dim >= 64.
        means = (
            assigned.select("cell", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("new_centroid")
            )
        )
        centroids = (
            centroids.join(means, "cell", "left")
            .select("cell", F.coalesce("new_centroid", "centroid").alias("centroid"))
            .localCheckpoint(eager=True)
        )
    return centroids


def assign_cells(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """argmin cell per vector, Arrow-vectorized: the centroid table is k rows
    BY CONSTRUCTION (the model, not data), so it rides a broadcast variable
    as a (k, dim) numpy matrix and each corpus Arrow batch scores as one
    |x|^2 - 2XC^T + |c|^2 matmul. No shuffle — the assignment stays in the
    scan stage, which is exactly the 100 TB shape (vectorized model
    application over a corpus scan). np.argmin takes the FIRST min, matching
    the lowest-cell tie-break of the former min(struct(d, cell)) plan.

    (History: a crossJoin(broadcast) + zip_with/aggregate HOF distance was
    measured 3-4x slower — Catalyst higher-order functions evaluate
    interpreted per element; an inlined-literal projection bloated the plan
    worse. The matmul replaces n*k interpreted array walks with one BLAS
    call per batch.)"""
    import numpy as np
    import pandas as pd

    cl = centroids.orderBy("cell").collect()
    cells = np.array([r["cell"] for r in cl], dtype=np.int64)
    cm = np.vstack([np.asarray(r["centroid"], dtype=np.float64) for r in cl])
    bc = vectors.sparkSession.sparkContext.broadcast((cells, cm))

    def score(batches):
        cell_ids, C = bc.value
        c_sq = (C * C).sum(1)
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            d = (X * X).sum(1, keepdims=True) - 2.0 * (X @ C.T) + c_sq
            a = d.argmin(1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "vec": pdf["vec"],
                    "cell": cell_ids[a],
                    "d": d[np.arange(len(a)), a],
                }
            )

    return vectors.select("vec_id", "vec").mapInPandas(
        score, "vec_id long, vec array<double>, cell int, d double"
    )


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No _spread here: the fit loop is scheduling-bound (5 sequential tiny
    # rounds), so fanning 2k vectors across 32 partitions adds task overhead
    # per round without parallelism payoff. The heavy-projection operators
    # (dedup, text, multimodal) DO spread — their cost is per-row compute.
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )


# The fitted centroid table is deterministic per sf_dir; both gate entries
# need it, so cache the (checkpointed) result per session+path.
_FIT_CACHE: dict[tuple[str, str], DataFrame] = {}


def _fitted(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (session_key(spark), sf_dir)
    if key not in _FIT_CACHE:
        _FIT_CACHE[key] = kmeans_fit(_vectors(spark, sf_dir))
    return _FIT_CACHE[key]


def kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry (rows-only): final cell assignment + per-cell sizes."""
    v = _vectors(spark, sf_dir)
    centroids = _fitted(spark, sf_dir)
    assigned = assign_cells(v, centroids)
    return (
        assigned.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.round(F.sum("d"), 4).alias("cell_sse"))
        .orderBy("cell")
    )


def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat search with a LEARNED coarse quantizer, nprobe=1: assign
    corpus and queries to k-means cells, search only the query's cell.
    Rows-only (depends on float centroids)."""
    v = _vectors(spark, sf_dir)
    centroids = _fitted(spark, sf_dir)
    assigned = assign_cells(v, centroids).select("vec_id", "vec", "cell")
    queries = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"), "cell"
    )
    corpus = assigned.select(F.col("vec_id").alias("cand_id"), F.col("vec").alias("cvec"), "cell")
    scored = (
        corpus.join(F.broadcast(queries), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("d", _sq_dist("qvec", "cvec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", F.col("rank").cast("long").alias("rank"))
    )


CLUSTERING_QUERIES = [
    Q("kmeans_cells", kmeans_cells, None, "Lloyd k-means cell build (invariants in pytest)"),
    Q("ann_ivf_kmeans", ann_ivf_kmeans, None, "IVF search over learned centroids"),
]
