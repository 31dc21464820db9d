"""K-means (Lloyd's) over embedding columns + IVF index build/search.

The IVF coarse quantizer in operators/similarity.py uses the dataset's label
column as a stand-in cell id; this module builds REAL cells: k-means via
iterative DataFrame aggregation (no MLlib dependency — the point is the
engine primitive), then IVF search against the learned centroids.

INTEGER-EXACT Lloyd (VERDICT r4 #3 — formerly rows-only): vectors are
quantized to int64 (scale 1e4) and SHIFTED non-negative (+OFFSET_Q; squared
distances are translation-invariant, and non-negative operands make
DuckDB's truncating `//`, Spark's `div` and numpy's `//` agree — they
differ on negatives). Centroid updates floor-divide exact integer sums, so
every iteration is order-free int64 arithmetic and the SAME fixpoint is
reproduced bit-for-bit by the numpy local path, the distributed DataFrame
loop, and a DuckDB oracle with the iterations unrolled as CTE blocks
(iteration count is a plan constant — no recursion needed). The
grid-quantized centroid (vs the exact rational mean) perturbs each
coordinate by < 1 quantization unit = 1e-4 of the data scale; semantic
invariants (near-monotone SSE, argmin assignment, k cells non-empty) remain
pytest-checked in tests/test_clustering.py.

Scale: each iteration is one broadcast of k centroids (tiny) + one scan with
map-side partial aggregation — the canonical embarrassingly-parallel Lloyd.
The centroid table never exceeds k x dim longs; the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..query import Q
from ..session import evict_stale
from ..sources.catalog import load_table as _t

K_CELLS = 8
ITERATIONS = 5
TOP_K = 5
N_QUERIES = 10
SCALE_Q = 10_000  # fixed-point scale (matches similarity.COSINE_SCALE)
OFFSET_Q = 10_000  # shift into non-negative so floor == trunc in every engine

# Driver-cutover threshold in VECTORS (same philosophy + probe mechanics as
# graph.LOCAL_EDGE_THRESHOLD): below it, 5 Lloyd rounds are pure scheduling
# overhead vs one Arrow transfer + numpy matmuls. 64Ki x dim=64 longs is
# ~32 MB driver-side — the broadcast-sized regime. The distributed loop is
# the 100 TB path and stays the default above the threshold.
KMEANS_LOCAL_ROWS = 65_536


def _sq_dist(a: str, b: str) -> F.Column:
    """Exact integer squared distance between two long-array columns."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda s, v: s + v,
    )


def _local_kmeans(vectors: DataFrame, vpd, k: int, iterations: int) -> DataFrame:
    """Driver numpy Lloyd for subcritical inputs — identical INTEGER
    semantics to the distributed loop: init = k lowest vec_ids, argmin
    assignment with lowest-cell tie-break (np.argmin returns the FIRST min,
    matching the ROW_NUMBER-over-(d, cell) rule), centroid = floor of the
    exact integer mean, empty cells keep their centroid. Distances via the
    |x-c|^2 = |x|^2 - 2x.c + |c|^2 expansion: an (n,k) int64 matmul, never
    an (n,k,dim) tensor."""
    import numpy as np
    import pandas as pd

    order = np.argsort(vpd["vec_id"].to_numpy())
    X = np.vstack(vpd["vec"].to_numpy()).astype(np.int64)[order]
    # fewer vectors than k: the model has min(n, k) cells — exactly what the
    # SQL oracle's ROW_NUMBER <= k init yields and what the distributed
    # path's limit(k) seeds
    C = X[:k].copy()
    kk = len(C)
    for _ in range(iterations):
        d = (X * X).sum(1, keepdims=True) - 2 * (X @ C.T) + (C * C).sum(1)
        a = d.argmin(1)
        for c in range(kk):
            members = X[a == c]
            if len(members):
                C[c] = members.sum(0) // len(members)
    out = pd.DataFrame({"cell": np.arange(1, kk + 1, dtype=np.int32), "centroid": list(C)})
    return vectors.sparkSession.createDataFrame(out, "cell int, centroid array<bigint>")


def kmeans_fit(
    vectors: DataFrame,
    *,
    k: int = K_CELLS,
    iterations: int = ITERATIONS,
    local_threshold: int | None = None,
) -> DataFrame:
    """vectors: (vec_id long, vec array<long> — quantized, non-negative).
    Returns (cell, centroid array<long>).

    Lloyd's algorithm: assign to nearest centroid, recompute floored integer
    means. Empty cells keep their previous centroid (standard fix)."""
    if local_threshold is None:
        local_threshold = KMEANS_LOCAL_ROWS
    if local_threshold > 0:
        # LIMIT probe doubles as the Arrow transfer (see graph.py).
        probe = vectors.select("vec_id", "vec").limit(local_threshold + 1).toPandas()
        if probe.empty:  # no vectors, no model: empty centroid table
            return vectors.sparkSession.createDataFrame([], "cell int, centroid array<bigint>")
        if len(probe) <= local_threshold:
            return _local_kmeans(vectors, probe, k, iterations)
    # Distributed Lloyd with the MODEL ON THE DRIVER (the MLlib shape): the
    # corpus never shuffles; each round is ONE job — an Arrow pass that both
    # assigns each batch (same argmin matmul + first-min tie-break as
    # assign_cells) and map-side-combines it into per-cell integer partials
    # (k x dim (cell, pos, Σx, n) rows per batch), reduced by one tiny
    # groupBy and collected as the next model (k x dim longs — model-sized,
    # the sanctioned readback). The floored-mean arithmetic is unchanged
    # (global sum div global count on exact int64), so the fixpoint is
    # bit-identical to the local numpy path and the unrolled-CTE oracle.
    # (History: the first distributed form posexploded the assigned corpus
    # to n x dim rows and shuffled that — 9.6M rows/round at sf3, measured
    # 51-98 s for the 5-round fit; it also ran ~3 jobs/round through a
    # CheckpointChain, exposing 15 sequential jobs to scheduler/GC spikes.
    # This form is 5 jobs total with an O(partitions x k x dim) shuffle.)
    import numpy as np
    import pandas as pd

    init = sorted(
        vectors.orderBy("vec_id").limit(k).collect(), key=lambda r: r["vec_id"]
    )
    if not init:  # reachable with local_threshold=0 (forced-distributed)
        return vectors.sparkSession.createDataFrame([], "cell int, centroid array<bigint>")
    C = np.vstack([np.asarray(r["vec"], dtype=np.int64) for r in init])
    kk = len(C)
    spark = vectors.sparkSession
    for _ in range(iterations):
        bc = spark.sparkContext.broadcast(C)

        def partials(batches, _bc=bc):
            Cb = _bc.value
            c_sq = (Cb * Cb).sum(1)
            dim = Cb.shape[1]
            pos = np.tile(np.arange(dim, dtype=np.int32), len(Cb))
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.vstack(pdf["vec"].to_numpy()).astype(np.int64)
                d = (X * X).sum(1, keepdims=True) - 2 * (X @ Cb.T) + c_sq
                a = d.argmin(1)
                sums = np.zeros((len(Cb), dim), dtype=np.int64)
                np.add.at(sums, a, X)
                counts = np.bincount(a, minlength=len(Cb)).astype(np.int64)
                keep = counts > 0
                if not keep.any():
                    continue
                yield pd.DataFrame(
                    {
                        "cell0": np.repeat(np.arange(len(Cb), dtype=np.int32), dim),
                        "pos": pos,
                        "s": sums.reshape(-1),
                        "n": np.repeat(counts, dim),
                    }
                )[np.repeat(keep, dim)]

        rows = (
            vectors.select("vec")
            .mapInPandas(partials, "cell0 int, pos int, s long, n long")
            .groupBy("cell0", "pos")
            .agg(F.expr("sum(s) div sum(n)").alias("m"))
            .collect()
        )
        # the collect() above is the last reader of this round's model —
        # free its executor/driver copies now instead of leaking one stale
        # broadcast per round for the session lifetime (r6 ADVICE; bench
        # repeats that re-pay the fit multiply the leak)
        bc.destroy()
        # empty cells simply don't appear in `rows` and keep their centroid
        for r in rows:
            C[r["cell0"], r["pos"]] = r["m"]
    out = pd.DataFrame(
        {"cell": np.arange(1, kk + 1, dtype=np.int32), "centroid": list(C)}
    )
    return spark.createDataFrame(out, "cell int, centroid array<bigint>")


def assign_cells(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """argmin cell per vector, Arrow-vectorized: the centroid table is k rows
    BY CONSTRUCTION (the model, not data), so it rides a broadcast variable
    as a (k, dim) int64 matrix and each corpus Arrow batch scores as one
    |x|^2 - 2XC^T + |c|^2 matmul — exact int64 arithmetic, no shuffle: the
    assignment stays in the scan stage, which is exactly the 100 TB shape
    (vectorized model application over a corpus scan). np.argmin takes the
    FIRST min, matching the lowest-cell tie-break of the SQL oracle's
    ROW_NUMBER OVER (ORDER BY d, cell).

    (History: a crossJoin(broadcast) + zip_with/aggregate HOF distance was
    measured 3-4x slower — Catalyst higher-order functions evaluate
    interpreted per element; an inlined-literal projection bloated the plan
    worse. The matmul replaces n*k interpreted array walks with one
    vectorized call per batch.)"""
    import numpy as np
    import pandas as pd

    cl = centroids.orderBy("cell").collect()
    if not cl:  # empty model (empty input): nothing can be assigned
        return vectors.sparkSession.createDataFrame(
            [], "vec_id long, vec array<bigint>, cell int, d long"
        )
    cells = np.array([r["cell"] for r in cl], dtype=np.int64)
    cm = np.vstack([np.asarray(r["centroid"], dtype=np.int64) for r in cl])
    bc = vectors.sparkSession.sparkContext.broadcast((cells, cm))

    def score(batches):
        cell_ids, C = bc.value
        c_sq = (C * C).sum(1)
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.vstack(pdf["vec"].to_numpy()).astype(np.int64)
            d = (X * X).sum(1, keepdims=True) - 2 * (X @ C.T) + c_sq
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
        score, "vec_id long, vec array<bigint>, cell int, d long"
    )


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No _spread here: the fit loop is scheduling-bound (5 sequential tiny
    # rounds), so fanning 2k vectors across 32 partitions adds task overhead
    # per round without parallelism payoff. The heavy-projection operators
    # (dedup, text, multimodal) DO spread — their cost is per-row compute.
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: (F.round(x.cast("double") * SCALE_Q) + OFFSET_Q).cast("long"),
        ).alias("vec"),
    )


_VECS_SQL = f"""
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * {SCALE_Q}) + {OFFSET_Q} AS BIGINT)) AS qe
  FROM embeddings
"""


def _fit_sql(
    dim: int = 64,
    k: int = K_CELLS,
    iterations: int = ITERATIONS,
    *,
    prefix: str = "",
    vecs_sql: str | None = None,
) -> str:
    """The kmeans_fit twin as DuckDB CTE blocks:
    {prefix}cent0..{prefix}cent{iterations} over {prefix}vecs(vec_id, qe).
    Callers splice this after WITH and select from {prefix}cent{iterations}.
    `prefix` lets several independent fits (e.g. the 4 PQ sub-space
    codebooks in operators/quantization.py) coexist in one statement."""
    d_expr = (
        "list_sum(list_transform(range(1, "
        f"{dim + 1}), j -> (v.qe[j] - c.cq[j]) * (v.qe[j] - c.cq[j])))"
    )
    P = prefix
    blocks = [
        f"""{P}vecs AS ({vecs_sql if vecs_sql is not None else _VECS_SQL}),
{P}dims AS (SELECT unnest(range(1, {dim + 1})) AS pos),
{P}cent0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cell, qe AS cq
  FROM (SELECT * FROM {P}vecs ORDER BY vec_id LIMIT {k})
)"""
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        blocks.append(
            f"""{P}asg{i} AS (
  SELECT vec_id, qe, cell FROM (
    SELECT vec_id, qe, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM (SELECT v.vec_id, v.qe, c.cell, {d_expr} AS d FROM {P}vecs v CROSS JOIN {P}cent{p} c)
  ) WHERE rn = 1
),
{P}cent{i} AS (
  SELECT c.cell, COALESCE(m.cq, c.cq) AS cq
  FROM {P}cent{p} c
  LEFT JOIN (
    SELECT cell, list(m ORDER BY pos) AS cq FROM (
      SELECT a.cell, d.pos, CAST(SUM(a.qe[d.pos]) // COUNT(*) AS BIGINT) AS m
      FROM {P}asg{i} a CROSS JOIN {P}dims d
      GROUP BY a.cell, d.pos
    ) GROUP BY cell
  ) m ON m.cell = c.cell
)"""
        )
    return ",\n".join(blocks)


def _final_assign_sql(dim: int = 64) -> str:
    d_expr = (
        "list_sum(list_transform(range(1, "
        f"{dim + 1}), j -> (v.qe[j] - c.cq[j]) * (v.qe[j] - c.cq[j])))"
    )
    return f"""asgF AS (
  SELECT vec_id, qe, cell, d FROM (
    SELECT vec_id, qe, cell, d, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM (SELECT v.vec_id, v.qe, c.cell, {d_expr} AS d FROM vecs v CROSS JOIN cent{ITERATIONS} c)
  ) WHERE rn = 1
)"""


# The fitted centroid table is deterministic per sf_dir; both gate entries
# need it, so cache the (checkpointed) result per session+path.
_FIT_CACHE: dict[tuple[str, str], DataFrame] = {}


def _fitted(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (evict_stale(_FIT_CACHE, spark), sf_dir)
    if key not in _FIT_CACHE:
        _FIT_CACHE[key] = kmeans_fit(_vectors(spark, sf_dir))
    return _FIT_CACHE[key]


def kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final cell assignment + per-cell sizes and exact integer SSE —
    value-hash gated against the unrolled-CTE DuckDB twin of the fit."""
    v = _vectors(spark, sf_dir)
    centroids = _fitted(spark, sf_dir)
    assigned = assign_cells(v, centroids)
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.sum("d").cast("long").alias("sse_q"),
        )
        .orderBy("cell")
        .select(F.col("cell").cast("long").alias("cell"), "n_vectors", "sse_q")
    )


KMEANS_CELLS_ORACLE = f"""
WITH {_fit_sql()},
{_final_assign_sql()}
SELECT CAST(cell AS BIGINT) AS cell,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(d) AS BIGINT) AS sse_q
FROM asgF
GROUP BY cell
ORDER BY cell
"""


def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat search with a LEARNED coarse quantizer, nprobe=1: assign
    corpus and queries to k-means cells, search only the query's cell.
    Value-hash gated (integer centroids + integer distances)."""
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


ANN_IVF_KMEANS_ORACLE = f"""
WITH {_fit_sql()},
{_final_assign_sql()},
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         list_sum(list_transform(range(1, 65), j -> (q.qe[j] - c.qe[j]) * (q.qe[j] - c.qe[j]))) AS d
  FROM asgF q JOIN asgF c ON q.cell = c.cell AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, cand_id, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT query_id, cand_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, cand_id) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023): k-means-cluster-scoped
# near-duplicate removal keeping the MOST CENTRAL representative.
#
# Composition of two proven primitives: the integer-exact Lloyd fit above
# (cells + exact distance-to-centroid d) and the banded Gram verify from
# operators/dedup.py (sign-bit LSH bands bound the pairwise work inside each
# cell). A vector is DROPPED iff some peer in the same cell shares at least
# one (band, bucket), has quantized dot >= SEM_TAU, and is strictly more
# central ((d, vec_id) lexicographically smaller) — so within any near-dup
# clique exactly the most-central member survives, deterministically, with
# no transitive closure required.
#
# 100 TB shape: the model (k centroids) broadcasts; assignment stays in the
# scan stage (assign_cells mapInPandas matmul); candidate generation is an
# equi-join on (cell, band, bucket) with the same occupancy cap as the
# production cosine dedup, so per-bucket work is bounded and k (a model
# parameter) is the dial that keeps cell occupancy constant as the corpus
# grows. Output is always exactly n rows (vec_id, cell, kept) — never
# pair-shaped, so output volume is Theta(n) at every threshold.
# ---------------------------------------------------------------------------

SEM_TAU_X1E8 = 10_000_000  # cos >= 0.10 at quantized-dot scale 1e8: low on
# purpose — the driver corpus is spread random unit vectors (max pairwise
# cos ~0.6 overall, lower within banded buckets), so a production 0.95 would
# never exercise the selection rule here; injected-duplicate corpora in
# tests/test_clustering.py prove the high-threshold behavior.
SEM_MAX_BUCKET = 500  # occupancy cap, same semantics as dedup.COS_MAX_BUCKET


def dedup_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-scoped near-dup removal; returns (vec_id, cell, kept 0/1)."""
    import numpy as np
    import pandas as pd

    from .dedup import COS_GROUP_SHIFT, COS_STRICT_BANDS, _strict_bucket

    v = _vectors(spark, sf_dir)
    centroids = _fitted(spark, sf_dir)
    assigned = assign_cells(v, centroids)  # vec_id, vec (shifted), cell, d
    # unshift for the dot product: cosine is translation-SENSITIVE, so the
    # sign bands and the Gram run on round(x * 1e4), not the +OFFSET_Q form
    u = assigned.select(
        "vec_id",
        "cell",
        "d",
        F.transform("vec", lambda x: x - F.lit(OFFSET_Q)).alias("qe"),
    )
    buckets = F.array(*[_strict_bucket(F.col("qe"), t) for t in range(COS_STRICT_BANDS)])
    long = u.select(
        "vec_id", "cell", "d", "qe", F.posexplode(buckets).alias("band", "bucket")
    ).withColumn("grp", F.shiftright("bucket", COS_GROUP_SHIFT))

    def _losers(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        # band is group-constant; the true key inside is (cell, bucket).
        # cell stays OUT of the Spark group key on purpose: keying the
        # applyInPandas exchange by (cell, band, grp) made 8x more, 8x
        # smaller Arrow groups and the per-group overhead dominated
        # (measured 26 s -> 9 s at sf3 moving cell into the pandas groupby).
        for _, g in pdf.groupby(["cell", "bucket"], sort=False):
            n = len(g)
            if n < 2 or n > SEM_MAX_BUCKET:
                continue
            ids = g["vec_id"].to_numpy(dtype=np.int64)
            dd = g["d"].to_numpy(dtype=np.int64)
            V = np.vstack(g["qe"].to_numpy()).astype(np.int64)
            sim = (V @ V.T) >= SEM_TAU_X1E8
            np.fill_diagonal(sim, False)
            more_central = (dd[None, :] < dd[:, None]) | (
                (dd[None, :] == dd[:, None]) & (ids[None, :] < ids[:, None])
            )
            dropped = (sim & more_central).any(axis=1)
            if dropped.any():
                out.append(pd.DataFrame({"vec_id": ids[dropped]}))
        if not out:
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64")})
        return pd.concat(out)

    losers = (
        long.groupBy("band", "grp")
        .applyInPandas(_losers, "vec_id long")
        .distinct()
    )
    return u.join(losers.withColumn("dr", F.lit(1)), "vec_id", "left").select(
        "vec_id",
        F.col("cell").cast("long").alias("cell"),
        F.when(F.col("dr").isNull(), F.lit(1)).otherwise(F.lit(0)).cast("long").alias("kept"),
    )


def _semantic_oracle() -> str:
    from .dedup import COS_STRICT_BANDS, _strict_band_sql

    lng = "\nUNION ALL\n".join(
        f"SELECT vec_id, cell, d, qe, {t} AS band, {_strict_band_sql(t)} AS bucket FROM u"
        for t in range(COS_STRICT_BANDS)
    )
    # MATERIALIZED: kept is referenced twice (self-join) and u three times;
    # DuckDB inlines CTEs by default, which re-runs the unrolled fit per
    # reference (measured 19 s -> 1.0 s at sf0.01 with materialization)
    return f"""
WITH {_fit_sql()},
{_final_assign_sql()},
u AS MATERIALIZED (
  SELECT vec_id, cell, d, list_transform(qe, x -> x - {OFFSET_Q}) AS qe FROM asgF
),
lng AS MATERIALIZED ({lng}),
occ AS (SELECT cell, band, bucket FROM lng GROUP BY 1, 2, 3 HAVING COUNT(*) <= {SEM_MAX_BUCKET}),
kept AS MATERIALIZED (SELECT l.* FROM lng l JOIN occ USING (cell, band, bucket)),
dropped AS (
  SELECT DISTINCT x.vec_id
  FROM kept x JOIN kept y ON x.cell = y.cell AND x.band = y.band AND x.bucket = y.bucket
   AND x.vec_id <> y.vec_id
   AND (y.d < x.d OR (y.d = x.d AND y.vec_id < x.vec_id))
   AND list_sum(list_transform(range(1, 65), j -> x.qe[j] * y.qe[j])) >= {SEM_TAU_X1E8}
)
SELECT u.vec_id, CAST(u.cell AS BIGINT) AS cell,
       CAST(CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM u LEFT JOIN dropped dr ON dr.vec_id = u.vec_id
"""


CLUSTERING_QUERIES = [
    Q(
        "kmeans_cells",
        kmeans_cells,
        KMEANS_CELLS_ORACLE,
        "integer-exact Lloyd k-means cells (unrolled-CTE oracle)",
    ),
    Q(
        "ann_ivf_kmeans",
        ann_ivf_kmeans,
        ANN_IVF_KMEANS_ORACLE,
        "IVF search over learned integer centroids",
    ),
    Q(
        "dedup_semantic_kmeans",
        dedup_semantic_kmeans,
        _semantic_oracle(),
        "SemDeDup: cluster-scoped near-dup removal, most-central survivor",
    ),
]
