"""Time-series operators: gap-fill + linear interpolation, rolling anomaly.

The hypertable-style operations (TimescaleDB's time_bucket_gapfill /
interpolate, QuestDB's FILL) re-expressed Spark-first over `events`:

- ts_gapfill_interpolate: per-user hourly buckets densified over each
  user's [first, last] hour (explode(sequence(..)) — the grid is generated
  where the data lives, never on the driver), missing buckets linearly
  interpolated between the nearest observed neighbors via
  last/first IGNORE NULLS frame windows. ONE shuffle on user_id serves the
  bucket aggregation, the grid join and both windows.
- ts_rolling_anomaly: rolling 24-bucket mean/variance per user with ALL
  accumulation in exact int64 (cents and squared cents — sum of 24 squares
  of <=10^6-cent values is < 2^63), so the variance enters floating point
  through two divisions of exact integers: bit-identical on both engines,
  no accumulation-order hazard. Anomalies = |z| > 2, emitted with
  floor(z*1000).

Determinism conventions: money as integer cents; every float is produced by
an arithmetic DAG over exact integers written identically in both engines,
then floor()-scaled — never ROUND (half-even vs half-up) and never a
float SUM (order-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t

ROLL_WINDOW = 24  # buckets (hours) in the rolling frame
Z_X1000_THRESHOLD = 2000  # |z| > 2.0


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 3600).alias("hour"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return e.groupBy("user_id", "hour").agg(
        F.sum("cents").alias("sc"), F.count(F.lit(1)).alias("c")
    )


_HOURLY_SQL = """
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sc,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
"""


def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    sparse = _hourly(spark, sf_dir).withColumn(
        "avg_cents", F.col("sc").cast("double") / F.col("c").cast("double")
    )
    bounds = sparse.groupBy("user_id").agg(F.min("hour").alias("mn"), F.max("hour").alias("mx"))
    dense = bounds.select("user_id", F.explode(F.sequence("mn", "mx")).alias("hour"))
    j = dense.join(sparse, ["user_id", "hour"], "left")

    fwd = Window.partitionBy("user_id").orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    bwd = Window.partitionBy("user_id").orderBy("hour").rowsBetween(0, Window.unboundedFollowing)
    obs_hour = F.when(F.col("avg_cents").isNotNull(), F.col("hour"))
    filled = (
        j.withColumn("pv", F.last("avg_cents", ignorenulls=True).over(fwd))
        .withColumn("pb", F.last(obs_hour, ignorenulls=True).over(fwd))
        .withColumn("nv", F.first("avg_cents", ignorenulls=True).over(bwd))
        .withColumn("nb", F.first(obs_hour, ignorenulls=True).over(bwd))
    )
    # Grid spans [first obs, last obs], so interior gaps always have both
    # neighbors; the formula is written once, identically to the SQL.
    interp = F.when(F.col("avg_cents").isNotNull(), F.col("avg_cents")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * ((F.col("hour") - F.col("pb")).cast("double") / (F.col("nb") - F.col("pb")).cast("double"))
    )
    return filled.select(
        "user_id",
        "hour",
        F.col("avg_cents").isNotNull().alias("is_observed"),
        F.floor(interp).cast("long").alias("interp_cents"),
    )


GAPFILL_ORACLE = f"""
WITH sparse AS (
  SELECT *, CAST(sc AS DOUBLE) / CAST(c AS DOUBLE) AS avg_cents FROM ({_HOURLY_SQL})
), bounds AS (
  SELECT user_id, MIN(hour) AS mn, MAX(hour) AS mx FROM sparse GROUP BY user_id
), dense AS (
  SELECT user_id, UNNEST(range(mn, mx + 1)) AS hour FROM bounds
), j AS (
  SELECT d.user_id, d.hour, s.avg_cents
  FROM dense d LEFT JOIN sparse s ON s.user_id = d.user_id AND s.hour = d.hour
), filled AS (
  SELECT *,
    LAST_VALUE(avg_cents IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    LAST_VALUE(CASE WHEN avg_cents IS NOT NULL THEN hour END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
    FIRST_VALUE(avg_cents IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY hour ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    FIRST_VALUE(CASE WHEN avg_cents IS NOT NULL THEN hour END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY hour ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
  FROM j
)
SELECT user_id, hour,
       avg_cents IS NOT NULL AS is_observed,
       CAST(FLOOR(CASE WHEN avg_cents IS NOT NULL THEN avg_cents
                       ELSE pv + (nv - pv) * (CAST(hour - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))
                  END) AS BIGINT) AS interp_cents
FROM filled
"""


def ts_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Series = hourly TOTAL cents per user (an integer!) so the window sums
    # s1/s2 are exact int64 regardless of each engine's frame-aggregation
    # order (Spark iterates the frame; DuckDB merges a segment tree — a
    # float sum would differ in the last ulp between them).
    h = _hourly(spark, sf_dir).select("user_id", "hour", F.col("sc").alias("x"))
    # Rolling stats over the PRECEDING frame only (the current point is
    # scored against its past, the standard online-anomaly convention).
    w = Window.partitionBy("user_id").orderBy("hour").rowsBetween(-ROLL_WINDOW, -1)
    rolled = (
        h.withColumn("n", F.count("x").over(w))
        .withColumn("s1", F.sum("x").over(w))
        .withColumn("s2", F.sum(F.col("x") * F.col("x")).over(w))
        .filter(F.col("n") >= 8)  # need history before scoring
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ) / F.col("n")
    z = (F.col("x") - mean) / F.sqrt(var)
    return (
        rolled.withColumn("z1000", F.floor(z * 1000).cast("long"))
        .filter((F.col("z1000") >= Z_X1000_THRESHOLD) | (F.col("z1000") < -Z_X1000_THRESHOLD))
        .select("user_id", "hour", F.col("x").cast("long").alias("cents"), "z1000")
    )


ROLLING_ORACLE = f"""
WITH h AS (
  SELECT user_id, hour, sc AS x FROM ({_HOURLY_SQL})
), rolled AS (
  SELECT *,
    COUNT(x) OVER w AS n, SUM(x) OVER w AS s1, SUM(x * x) OVER w AS s2
  FROM h
  WINDOW w AS (PARTITION BY user_id ORDER BY hour ROWS BETWEEN {ROLL_WINDOW} PRECEDING AND 1 PRECEDING)
), scored AS (
  SELECT user_id, hour, x,
    CAST(FLOOR((x - CAST(s1 AS DOUBLE) / n)
               / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n) * 1000)
         AS BIGINT) AS z1000
  FROM rolled WHERE n >= 8
)
SELECT user_id, hour, CAST(x AS BIGINT) AS cents, z1000
FROM scored
WHERE z1000 >= {Z_X1000_THRESHOLD} OR z1000 < -{Z_X1000_THRESHOLD}
"""


TIMESERIES_QUERIES = [
    Q(
        "ts_gapfill_interpolate",
        ts_gapfill_interpolate,
        GAPFILL_ORACLE,
        "hourly gap-fill + linear interpolation (hypertable FILL semantics)",
    ),
    Q(
        "ts_rolling_anomaly",
        ts_rolling_anomaly,
        ROLLING_ORACLE,
        "rolling z-score anomaly flags with exact-integer accumulation",
    ),
]
