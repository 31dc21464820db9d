"""Approximate-nearest-neighbor search over the ``embeddings`` table.

Greenfield LLM-pipeline operators (SURVEY.md §7 Phase 8). Three tiers:

- ann_topk_bruteforce: exact top-k by cosine — the correctness baseline.
  Query side is a small filtered set, broadcast against the corpus; the
  corpus never shuffles. At 100 TB this is the "small query batch x huge
  corpus" shape: one scan, map-side scoring, per-query top-k via window.
- ann_lsh_bucket: multi-table random-hyperplane sign sketches (LSH_BITS x
  LSH_TABLES disjoint dim slices); candidates = union of per-table bucket
  collisions. The recall/cost dials are bits-per-table and table count; the
  plan is an equi-join on (table, sketch), which scales linearly and
  AQE-splits hot buckets.
- ann_ivf_probe1: IVF-flat with nprobe=1, using the ``label`` column as the
  coarse-quantizer cell id (the k-means assignment a real IVF build step
  would produce). Search only scans the query's own cell: an equi-join on
  the cell id — the classic inverted-file pruning.

All scoring is fixed-point integer dot product (functions/hashing rationale:
bit-exact across engines; embeddings are unit-norm so dot == cosine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..query import Q
from ..sources.catalog import load_table as _t

COSINE_SCALE = 10_000
TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
SKETCH_DIMS = 8


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _spread

    e = _spread(_t(spark, sf_dir, "embeddings"))
    return e.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("label").cast("long").alias("label"),
        F.transform(F.col("embedding"), lambda x: F.round(x.cast("double") * COSINE_SCALE).cast("long")).alias("qe"),
    )


_QUANT_SQL = f"""
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(label AS BIGINT) AS label,
       list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {COSINE_SCALE}) AS BIGINT)) AS qe
FROM embeddings
"""


def _dot(a: str, b: str) -> F.Column:
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda s, v: s + v,
    )


def _dot_sql(a: str, b: str) -> str:
    # CAST: DuckDB list_sum over BIGINT widens to HUGEINT, which pandas/arrow
    # render as float — must come back to int64 to hash-match Spark's long.
    return f"CAST(list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])) AS BIGINT)"


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k: broadcast the query batch, score everything, reduce.

    Two-level top-k (exactness preserved — top-k is a monotone reduction,
    so partial-then-global over any partitioning of the candidates is
    bit-identical to a single global sort):

    1. local rank over (query_id, spark_partition_id): each scored corpus
       partition sorts only its OWN rows and keeps its local top-k — the
       per-reducer work is bounded by the input split size regardless of
       corpus scale, and the sort fans out over |partitions| x |queries|
       reducers instead of |queries|.
    2. global rank over query_id on the surviving
       |partitions| x |queries| x k rows — a constant-size tail stage.

    Before this, the single global window funneled all |corpus| x |queries|
    scored rows through |queries| reducers: the one measured super-linear
    family (sf3->sf10 5.79x, SCALE_BENCH r5). The corpus-side scan remains
    a single narrow stage; the query batch rides a broadcast."""
    q = _quantized(spark, sf_dir)
    queries = q.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("q_qe")
    )
    corpus = q.select(F.col("vec_id").alias("cand_id"), F.col("qe").alias("c_qe"))
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", _dot("q_qe", "c_qe").alias("dot_q"))
        .withColumn("pid", F.spark_partition_id())
    )
    order = [F.desc("dot_q"), F.asc("cand_id")]
    w_local = Window.partitionBy("query_id", "pid").orderBy(*order)
    partial = (
        scored.withColumn("lrank", F.row_number().over(w_local))
        .filter(F.col("lrank") <= TOP_K)
        .drop("pid", "lrank")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "dot_q", F.col("rank").cast("long").alias("rank"))
    )


ANN_BRUTE_ORACLE = f"""
WITH q AS ({_QUANT_SQL}),
scored AS (
  SELECT qq.vec_id AS query_id, c.vec_id AS cand_id, {_dot_sql('qq.qe', 'c.qe')} AS dot_q
  FROM q qq JOIN q c ON c.vec_id <> qq.vec_id
  WHERE qq.vec_id < {N_QUERIES}
)
SELECT query_id, cand_id, dot_q, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot_q DESC, cand_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


# Multi-table hyperplane LSH operating point, chosen from the measured
# neighbor geometry of the driver embeddings (tools: mean per-dim sign
# agreement of true top-5 pairs p ~= 0.60, random pairs 0.50): recall per
# table ~= p^bits, union over tables 1-(1-p^b)^L, candidate cost
# ~= 1-(1-2^-b)^L of the corpus. 5 bits x 12 tables => ~64% expected
# recall at ~30% candidate cost; 8 bits x 1 table (the naive config)
# measures <5% recall. Bits/tables are the recall/cost dials at scale.
LSH_BITS = 5
LSH_TABLES = 12  # table t hashes dims [5t+1 .. 5t+5]


def _sketch(qe: str, table: int = 0) -> F.Column:
    b = F.lit(0)
    for j in range(LSH_BITS):
        dim = table * LSH_BITS + j + 1
        b = b + F.when(F.element_at(F.col(qe), dim) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return b


def _sketch_sql(qe: str, table: int = 0) -> str:
    return " + ".join(
        f"CASE WHEN {qe}[{table * LSH_BITS + j + 1}] >= 0 THEN {1 << j} ELSE 0 END"
        for j in range(LSH_BITS)
    )


def ann_lsh_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via MULTI-TABLE hyperplane LSH: LSH_TABLES tables,
    each bucketing on the sign pattern of a disjoint LSH_BITS-dim slice; a
    candidate is scored if it collides with the query in ANY table (the
    union-of-bands recall lever — one 8-bit table recovers <5% of true
    neighbors on this corpus, 5 bits x 12 tables ~65-70%, measured in
    tests/test_clustering.py). Candidate generation stays an equi-join on
    (table, sketch) — never a crossJoin — so the scale path holds: corpus
    explodes to L rows/vector ID-ONLY, collides per bucket, dedups
    (query, cand) id pairs, and only THEN joins the vectors back in for the
    exact scoring — the L-way fan-out never shuffles an embedding (the
    round-3 plan carried c_qe through the collision join: ~12x embedding
    width of useless shuffle at scale)."""
    # cache: the quantized table feeds the sketch explode AND both sides of
    # the scoring join (same reuse pattern as dedup_embedding_cosine)
    q = _quantized(spark, sf_dir).select("vec_id", "qe").localCheckpoint(eager=True)
    sketches = F.array(*[_sketch("qe", t) for t in range(LSH_TABLES)])
    long = q.select("vec_id", F.posexplode(sketches).alias("table", "sketch"))
    q_long = long.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "table", "sketch"
    )
    cands = (
        long.join(F.broadcast(q_long), ["table", "sketch"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
        .distinct()  # any-table union, score once
    )
    qv = q.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("q_qe")
    )
    cv = q.select(F.col("vec_id").alias("cand_id"), F.col("qe").alias("c_qe"))
    scored = (
        cands.join(cv, "cand_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("dot_q", _dot("q_qe", "c_qe"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "dot_q", F.col("rank").cast("long").alias("rank"))
    )


_LSH_LONG_SQL = "\nUNION ALL\n".join(
    f"SELECT vec_id, qe, {t} AS tbl, {_sketch_sql('qe', t)} AS sketch FROM q0"
    for t in range(LSH_TABLES)
)

ANN_LSH_ORACLE = f"""
WITH q0 AS ({_QUANT_SQL}),
long AS ({_LSH_LONG_SQL}),
cands AS (
  SELECT DISTINCT qq.vec_id AS query_id, c.vec_id AS cand_id, qq.qe AS q_qe, c.qe AS c_qe
  FROM long qq JOIN long c ON c.tbl = qq.tbl AND c.sketch = qq.sketch AND c.vec_id <> qq.vec_id
  WHERE qq.vec_id < {N_QUERIES}
),
scored AS (
  SELECT query_id, cand_id, {_dot_sql('q_qe', 'c_qe')} AS dot_q FROM cands
)
SELECT query_id, cand_id, dot_q, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot_q DESC, cand_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


def ann_ivf_probe1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=1: scan only the query's coarse cell (label). The
    inverted-file equi-join prunes the corpus to ~1/n_cells of its size.

    Recall caveat, measured: the driver's `label` column is NOT a geometric
    clustering of these embeddings (same-label mean cosine == random), so
    probe1 recall here is ~0.08 — the query demonstrates the inverted-file
    JOIN SHAPE, not retrieval quality. The ann_ivf_kmeans variant
    (operators/clustering.py) learns real Voronoi cells; on data with actual
    cluster structure nprobe trades recall against scanned fraction."""
    q = _quantized(spark, sf_dir)
    queries = q.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("q_qe"), F.col("label").alias("cell")
    )
    corpus = q.select(F.col("vec_id").alias("cand_id"), F.col("qe").alias("c_qe"), F.col("label").alias("cell"))
    scored = (
        corpus.join(F.broadcast(queries), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("dot_q", _dot("q_qe", "c_qe"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "dot_q", F.col("rank").cast("long").alias("rank"))
    )


ANN_IVF_ORACLE = f"""
WITH q AS ({_QUANT_SQL}),
scored AS (
  SELECT qq.vec_id AS query_id, c.vec_id AS cand_id, {_dot_sql('qq.qe', 'c.qe')} AS dot_q
  FROM q qq JOIN q c ON c.label = qq.label AND c.vec_id <> qq.vec_id
  WHERE qq.vec_id < {N_QUERIES}
)
SELECT query_id, cand_id, dot_q, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot_q DESC, cand_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


def ann_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k via Arrow-batched numpy matmul — the SIMD form of
    ann_topk_bruteforce, bit-identical output (shared oracle).

    The query matrix (tiny) rides a broadcast variable; mapInPandas scores
    each corpus Arrow batch as ONE (batch x dim) @ (dim x nq) int64 matmul
    and emits only its LOCAL top-k per query — the map-side partial top-k
    reduction — so the final window sees |partitions| * k * nq rows, not
    |corpus| * nq. Top-k is a monotone reduction, so partial-then-global is
    exact. This is the pattern for when per-element expression trees
    (F.aggregate/zip_with) become the bottleneck at real vector widths:
    the HOF dot is a per-element Catalyst expression; the matmul is one BLAS
    call per batch.
    """
    import numpy as np
    import pandas as pd

    q = _quantized(spark, sf_dir)
    qpd = q.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "qe").toPandas()
    if qpd.empty:  # empty corpus -> no query batch -> empty top-k (== oracle)
        return spark.createDataFrame([], "query_id long, cand_id long, dot_q long, rank long")
    q_ids = qpd["vec_id"].to_numpy(dtype=np.int64)
    q_mat = np.vstack(qpd["qe"].to_numpy()).astype(np.int64)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def score(batches):
        ids, qm = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            cand = pdf["cand_id"].to_numpy(dtype=np.int64)
            cm = np.vstack(pdf["qe"].to_numpy()).astype(np.int64)
            scores = cm @ qm.T  # (n, nq)
            frames = []
            for j in range(len(ids)):
                mask = cand != ids[j]
                s, c = scores[mask, j], cand[mask]
                if not len(s):
                    continue
                # local exact top-k, ordered by (-dot, cand_id)
                top = np.lexsort((c, -s))[: min(TOP_K, len(s))]
                frames.append(
                    pd.DataFrame({"query_id": ids[j], "cand_id": c[top], "dot_q": s[top]})
                )
            if frames:
                yield pd.concat(frames)

    partial = q.select(F.col("vec_id").alias("cand_id"), "qe").mapInPandas(
        score, "query_id long, cand_id long, dot_q long"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("cand_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "dot_q", F.col("rank").cast("long").alias("rank"))
    )


def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe LSH: same tables/sketches as ann_lsh_bucket, but each
    query additionally probes every Hamming-distance-1 neighbor bucket
    (flip one of the LSH_BITS sign bits -> LSH_BITS+1 probes per table).

    The standard recall lever without extra tables (Lv et al., multi-probe
    LSH, VLDB'07): a near neighbor that lands one sign off the query's
    bucket is recovered by the flipped probe. Cost model: the probe
    expansion multiplies only the QUERY side of the collision join
    (N_QUERIES x LSH_TABLES x (LSH_BITS+1) rows — broadcast-tiny); the
    corpus side is untouched, so the scale story is identical to
    ann_lsh_bucket with ~(1+bits*p^(b-1))x candidate volume. Measured on
    this corpus: recall ~0.65-0.70 (exact-bucket) -> ~0.85+ at ~2x
    candidates (tests/test_clustering.py).

    Kept as a separate registry entry: ann_lsh_bucket sits in the frozen
    driver-gate window (GATE_PRIORITY pos 41), whose output contract is
    top-k over exact-bucket candidates; multiprobe recovers MORE true
    neighbors, so its top-k differs by design. The paired oracle repeats
    the probe expansion in SQL (xor over the bit positions)."""
    q = _quantized(spark, sf_dir).select("vec_id", "qe").localCheckpoint(eager=True)
    sketches = F.array(*[_sketch("qe", t) for t in range(LSH_TABLES)])
    long = q.select("vec_id", F.posexplode(sketches).alias("table", "sketch"))
    probes = F.array(
        F.col("sketch"), *[F.col("sketch").bitwiseXOR(F.lit(1 << j)) for j in range(LSH_BITS)]
    )
    q_probe = (
        long.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "table", F.explode(probes).alias("sketch"))
    )
    cands = (
        long.join(F.broadcast(q_probe), ["table", "sketch"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
        .distinct()
    )
    qv = q.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("q_qe")
    )
    cv = q.select(F.col("vec_id").alias("cand_id"), F.col("qe").alias("c_qe"))
    scored = (
        cands.join(cv, "cand_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("dot_q", _dot("q_qe", "c_qe"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "dot_q", F.col("rank").cast("long").alias("rank"))
    )


_PROBE_SQL = "\nUNION ALL\n".join(
    ["SELECT vec_id, tbl, sketch FROM qside"]
    + [f"SELECT vec_id, tbl, xor(sketch, {1 << j}) AS sketch FROM qside" for j in range(LSH_BITS)]
)

ANN_LSH_MULTIPROBE_ORACLE = f"""
WITH q0 AS ({_QUANT_SQL}),
long AS ({_LSH_LONG_SQL}),
qside AS (SELECT vec_id, tbl, sketch FROM long WHERE vec_id < {N_QUERIES}),
qprobe AS ({_PROBE_SQL}),
cands AS (
  SELECT DISTINCT qq.vec_id AS query_id, c.vec_id AS cand_id
  FROM qprobe qq JOIN long c ON c.tbl = qq.tbl AND c.sketch = qq.sketch AND c.vec_id <> qq.vec_id
),
scored AS (
  SELECT cands.query_id, cands.cand_id, {_dot_sql('qv.qe', 'cv.qe')} AS dot_q
  FROM cands
  JOIN q0 qv ON qv.vec_id = cands.query_id
  JOIN q0 cv ON cv.vec_id = cands.cand_id
)
SELECT query_id, cand_id, dot_q, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot_q DESC, cand_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


SIMILARITY_QUERIES = [
    Q("ann_topk_bruteforce", ann_topk_bruteforce, ANN_BRUTE_ORACLE, "exact cosine top-k"),
    Q(
        "ann_topk_vectorized",
        ann_topk_vectorized,
        ANN_BRUTE_ORACLE,
        "Arrow/numpy matmul exact top-k (partial top-k per batch)",
    ),
    Q("ann_lsh_bucket", ann_lsh_bucket, ANN_LSH_ORACLE, "sign-sketch bucketed ANN"),
    Q(
        "ann_lsh_multiprobe",
        ann_lsh_multiprobe,
        ANN_LSH_MULTIPROBE_ORACLE,
        "multi-probe LSH (Hamming-1 neighbor buckets, query-side-only expansion)",
    ),
    Q("ann_ivf_probe1", ann_ivf_probe1, ANN_IVF_ORACLE, "IVF nprobe=1 cell-pruned ANN"),
]
