"""Streaming HyperLogLog: mergeable sketch state inside the streaming engine.

The point of a mergeable sketch is that its state composes under ANY
partitioning of the input — including arrival order. Here the HLL register
build (groupBy(group, bucket) -> MAX(rho)) runs as a genuine Structured
Streaming aggregation (micro-batches, state store, complete mode: registers
are monotone under MAX so every batch only raises them), and the SAME
finalization arithmetic as the batch sketch (operators/sketches.finalize_hll)
turns the final registers into the estimate. Because every piece is
deterministic integer math on md5-derived hashes, the streaming result is
hash-gated against the same DuckDB oracle as a batch query would be — the
stream/batch equivalence is part of the verified contract, not a pytest
assertion alone.

State size: HLL_M registers per group key — CONSTANT per key (that is the
sketch's promise), so watermarking is unnecessary; at 100 TB/day the state
store holds |groups| x 256 longs regardless of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t
from ..functions.hashing import md5_long_sql
from ..operators.sketches import HLL_M, HLL_P, HLL_SCALE, _HLL_NUM, finalize_hll, hll_bucket_rho
from .events import _events_stream, _run_stream_to_table


def stream_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event_type, registers built by the
    streaming engine; exact COUNT(DISTINCT) joined batch-side for error
    visibility (streaming can't do exact global distinct — that asymmetry
    is the sketch's reason to exist)."""
    ev = _events_stream(spark, sf_dir)
    bucket, rho = hll_bucket_rho(F.col("user_id").cast("string"))
    regs_stream = (
        ev.select("event_type", bucket, rho)
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("mj"))
    )
    regs = _run_stream_to_table(spark, regs_stream, "complete")
    exact = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").cast("long").alias("exact_distinct"))
    )
    return finalize_hll(regs, "event_type").join(exact, "event_type")


STREAM_HLL_ORACLE = f"""
WITH hashed AS (
  SELECT event_type, {md5_long_sql('CAST(user_id AS VARCHAR)')} AS h FROM events
), rhod AS (
  SELECT event_type, h % {HLL_M} AS bucket,
         CASE WHEN (h >> {HLL_P}) = 0 THEN {HLL_SCALE}
              ELSE CAST(log2((h >> {HLL_P}) & (-(h >> {HLL_P}))) AS INT) + 1 END AS rho
  FROM hashed
), regs AS (
  SELECT event_type, bucket, MAX(rho) AS mj FROM rhod GROUP BY 1, 2
), per_group AS (
  SELECT event_type, COUNT(*) AS n_used,
         SUM((1::BIGINT) << ({HLL_SCALE} - mj))::BIGINT AS s_used
  FROM regs GROUP BY 1
), exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY 1
), scored AS (
  SELECT event_type, n_used,
         s_used + ({HLL_M} - n_used) * ((1::BIGINT) << {HLL_SCALE}) AS s_total
  FROM per_group
)
SELECT s.event_type,
       CAST(s.n_used AS BIGINT) AS n_registers_used,
       CAST(s.s_total AS BIGINT) AS reg_sum_scaled,
       CAST(FLOOR((CASE WHEN ({_HLL_NUM} / CAST(s.s_total AS DOUBLE)) <= {2.5 * HLL_M}
                        AND ({HLL_M} - s.n_used) > 0
                   THEN {HLL_M}.0 * ln({HLL_M}.0 / CAST({HLL_M} - s.n_used AS DOUBLE))
                   ELSE {_HLL_NUM} / CAST(s.s_total AS DOUBLE) END) * 10000) AS BIGINT)
         AS hll_estimate_x10000,
       e.exact_distinct
FROM scored s JOIN exact e USING (event_type)
"""


STREAM_HLL_QUERIES = [
    Q(
        "stream_hll_distinct",
        stream_hll_distinct,
        STREAM_HLL_ORACLE,
        "HLL registers built by the streaming engine, batch-identical finalize",
    ),
]
