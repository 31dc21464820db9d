"""ML feature-engineering operators: the hashing trick and Johnson-
Lindenstrauss random projection.

Both are public-literature staples of large-scale feature pipelines:

- **Feature hashing** (Weinberger et al., "Feature Hashing for Large Scale
  Multitask Learning"): categorical features are mapped into a FIXED-width
  vector by hashing the feature string to a bucket and a ±1 sign — no
  vocabulary build, no dictionary shuffle, fully map-side. The one pass a
  100 TB feature pipeline can always afford.
- **Random projection** (Johnson-Lindenstrauss via a ±1 sign matrix, per
  Achlioptas "Database-friendly random projections"): embeddings are
  reduced 64→16 dims by multiplying with a deterministic ±1 matrix. Distances
  are preserved within JL distortion (pytest-bounded); the projected table is
  4× smaller to shuffle, which is the point at scale.

Cross-engine determinism: the sign matrix is generated ONCE in Python from
md5 (the repo's shared cross-engine hash) and embedded literally in both the
Spark plan and the DuckDB oracle; vectors are fixed-point quantized so every
sum is exact int64 — no float-addition-order hazards anywhere.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t
from ..functions.hashing import md5_long, md5_long_sql

FH_DIM = 16  # hashed feature-vector width

JL_IN_DIM = 64
JL_OUT_DIM = 16
JL_SCALE = 10_000  # fixed-point quantization (shared convention with dedup)


def _md5_int(s: str) -> int:
    """Python twin of functions.hashing.md5_long (first 15 hex digits)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _jl_signs() -> list[tuple[int, int, int]]:
    """Deterministic ±1 sign matrix rows (i: 1-based in-dim, j: out-dim)."""
    return [
        (i, j, 1 if _md5_int(f"jl|{i}|{j}") % 2 == 0 else -1)
        for i in range(1, JL_IN_DIM + 1)
        for j in range(JL_OUT_DIM)
    ]


def feature_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash two categorical customer features into a 16-bucket signed vector,
    summed per market segment.

    bucket = md5(feat) % D, sign = ±1 from an independent md5 bit — the
    standard unbiased estimator form. Everything is a codegen projection +
    one aggregation; no vocabulary pass, no dictionary broadcast.
    """
    c = _t(spark, sf_dir, "customer")
    feats = F.array(
        F.concat(F.lit("seg:"), F.col("c_mktsegment")),
        F.concat(F.lit("nat:"), F.col("c_nationkey").cast("string")),
    )
    f = c.select(F.col("c_mktsegment").alias("seg"), F.explode(feats).alias("feat"))
    bucket = (md5_long(F.col("feat")) % FH_DIM).cast("long")
    sign = (F.lit(2) * (md5_long(F.concat(F.lit("s|"), F.col("feat"))) % 2) - 1).cast("long")
    return (
        f.select("seg", bucket.alias("dim"), sign.alias("s"))
        .groupBy("seg", "dim")
        .agg(F.sum("s").cast("long").alias("val"))
        .orderBy("seg", "dim")
    )


FEATURE_HASHING_ORACLE = f"""
WITH f AS (
  SELECT c_mktsegment AS seg, 'seg:' || c_mktsegment AS feat FROM customer
  UNION ALL
  SELECT c_mktsegment AS seg, 'nat:' || CAST(c_nationkey AS VARCHAR) AS feat FROM customer
)
SELECT seg,
       CAST({md5_long_sql('feat')} % {FH_DIM} AS BIGINT) AS dim,
       CAST(SUM(2 * ({md5_long_sql("'s|' || feat")} % 2) - 1) AS BIGINT) AS val
FROM f
GROUP BY 1, 2
ORDER BY 1, 2
"""


def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL-project quantized embeddings 64→16 dims with a ±1 sign matrix.

    Spark side is the scale path: one Arrow batch pass, int64 matmul per
    batch (exact — quantized inputs, ±1 weights). The matrix is a driver
    constant closed over by the UDF; nothing joins, nothing shuffles. The
    projected column is emitted '|'-joined (array hashing convention,
    query.py docstring).
    """
    import numpy as np

    signs = np.zeros((JL_IN_DIM, JL_OUT_DIM), dtype=np.int64)
    for i, j, s in _jl_signs():
        signs[i - 1, j] = s

    e = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: F.round(x.cast("double") * JL_SCALE).cast("long")
        ).alias("qe"),
    )

    def _project(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if pdf.empty:
                continue
            v = _np.vstack(pdf["qe"].to_numpy()).astype(_np.int64)
            p = v @ signs
            yield _pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "proj": ["|".join(str(int(x)) for x in row) for row in p],
                }
            )

    return e.mapInPandas(_project, "vec_id long, proj string").orderBy("vec_id")


def _jl_oracle() -> str:
    values = ",\n".join(f"({i},{j},{s})" for i, j, s in _jl_signs())
    return f"""
WITH signs(i, j, s) AS (VALUES
{values}
), q AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {JL_SCALE}) AS BIGINT)) AS qe
  FROM embeddings
), tok AS (
  SELECT vec_id, CAST(generate_subscripts(qe, 1) AS BIGINT) AS i, unnest(qe) AS qi FROM q
), proj AS (
  SELECT vec_id, j, SUM(s * qi) AS pj
  FROM tok JOIN signs USING (i)
  GROUP BY 1, 2
)
SELECT vec_id, string_agg(CAST(pj AS VARCHAR), '|' ORDER BY j) AS proj
FROM proj GROUP BY vec_id ORDER BY vec_id
"""


def embed_group_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group embedding pooling: elementwise SUM of quantized vectors per
    label, plus the member count (mean pooling = sum/n, kept as exact
    integers so the gate hash never sees a float division).

    The "centroid of my cluster / embedding of my document from its chunks"
    aggregation every retrieval pipeline runs. Shape: posexplode to
    (label, dim, q) — 64 rows per vector — one (label, dim) aggregation,
    then reassembly into an ordered '|'-joined vector string. One shuffle,
    keyed on (label, dim): uniform, scales linearly. (An Arrow mapInPandas
    per-partition partial-sum would cut the explode 64× at real widths; the
    explode form is kept here because it is the pure-Catalyst baseline the
    vectorized form must match — same pairing as ann_topk_bruteforce /
    ann_topk_vectorized.)
    """
    e = _t(spark, sf_dir, "embeddings").select(
        F.col("label").cast("long").alias("label"),
        F.transform(
            F.col("embedding"), lambda x: F.round(x.cast("double") * JL_SCALE).cast("long")
        ).alias("qe"),
    )
    long = e.select("label", F.posexplode(F.col("qe")).alias("dim", "q"))
    sums = long.groupBy("label", "dim").agg(F.sum("q").alias("s"))
    n = e.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    pooled = (
        sums.groupBy("label")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "s"))),
                    lambda x: x["s"].cast("string"),
                ),
                "|",
            ).alias("sum_vec")
        )
        .join(n, "label")
        .select("label", "n_vecs", "sum_vec")
        .orderBy("label")
    )
    return pooled


EMBED_POOL_ORACLE = f"""
WITH q AS (
  SELECT CAST(label AS BIGINT) AS label,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {JL_SCALE}) AS BIGINT)) AS qe
  FROM embeddings
), long AS (
  SELECT label, CAST(generate_subscripts(qe, 1) AS BIGINT) - 1 AS dim, unnest(qe) AS v
  FROM q
), sums AS (
  SELECT label, dim, SUM(v) AS s FROM long GROUP BY 1, 2
), n AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM q GROUP BY label
)
SELECT s.label, n.n_vecs,
       string_agg(CAST(s.s AS VARCHAR), '|' ORDER BY s.dim) AS sum_vec
FROM sums s JOIN n USING (label)
GROUP BY s.label, n.n_vecs
ORDER BY s.label
"""


FEATURE_QUERIES = [
    Q(
        "feature_hashing_trick",
        feature_hashing_trick,
        FEATURE_HASHING_ORACLE,
        "hashing-trick categorical features into a fixed signed vector",
    ),
    Q(
        "embed_random_projection",
        embed_random_projection,
        _jl_oracle(),
        "Johnson-Lindenstrauss ±1 projection 64→16 (exact int64, Arrow matmul)",
    ),
    Q(
        "embed_group_pool",
        embed_group_pool,
        EMBED_POOL_ORACLE,
        "per-group embedding sum-pooling (exact int64 elementwise aggregation)",
    ),
]
