"""Event-analytics operators: funnel, cohort retention, path transitions.

The product-analytics trio every event warehouse runs (and the reference's
transaction/revision event streams would feed at scale), Spark-first over
the `events` table:

- funnel_view_click_purchase: strictly-ordered 3-stage funnel (earliest
  view -> first click after it -> first purchase after that), one summary
  row. Three per-user MIN aggregations chained by user_id equi-joins: each
  stage is a shuffle on user_id — and because every stage shuffles on the
  SAME key, Spark reuses the partitioning; no event ever joins events (no
  self-join explosion), so the shape is linear in |events| at 100 TB.
- cohort_retention_weekly: users bucketed by first-activity week (from a
  fixed epoch date, NOT date_trunc — engines disagree on week start),
  counted distinct per (cohort_week, week_offset). Two shuffles: first-seen
  per user, then the cohort matrix aggregation.
- event_path_transitions: (event -> next event) Markov transition counts
  with per-source probability, via LEAD over (user, ts, event_id). One
  shuffle on user_id for the window sort; event_id breaks timestamp ties so
  both engines see the same successor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t

_EPOCH = "2024-01-01"  # cohort week anchor (data starts here)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
    )


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Three chained windows over ONE user_id partitioning: t2's predicate
    # reads t1, t3's reads t2 (NULL short-circuits each later stage — no
    # view means ts > t1 is never true). Spark plans a single Exchange on
    # user_id with the Window operators stacked in one stage, vs the naive
    # three-aggregation/two-join chain (6+ stages, measured 5.8s -> ~1s at
    # sf0.001). The final one-row summary is a global partial-aggregated
    # collapse.
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    ev = F.col("event_type")
    staged = (
        e.withColumn("t1", F.min(F.when(ev == "view", F.col("ts"))).over(w))
        .withColumn(
            "t2", F.min(F.when((ev == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))).over(w)
        )
        .withColumn(
            "t3", F.min(F.when((ev == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts"))).over(w)
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("t1").alias("t1"), F.first("t2").alias("t2"), F.first("t3").alias("t3")
    )
    return per_user.filter(F.col("t1").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("users_view"),
        F.count("t2").cast("long").alias("users_click_after_view"),
        F.count("t3").cast("long").alias("users_full_funnel"),
        F.coalesce(
            F.sum(F.unix_timestamp("t3") - F.unix_timestamp("t1")), F.lit(0)
        ).cast("long").alias("total_conversion_secs"),
    )


FUNNEL_ORACLE = """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2, MIN(t1.t1) AS t1
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t1
  GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3, MIN(t2.t1) AS t1
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
  GROUP BY e.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS users_view,
       CAST(COUNT(t2.user_id) AS BIGINT) AS users_click_after_view,
       CAST(COUNT(t3.user_id) AS BIGINT) AS users_full_funnel,
       -- FLOOR: Spark's unix_timestamp truncates sub-second parts; a bare
       -- CAST(epoch(..)) in DuckDB would round-half-even instead.
       CAST(COALESCE(SUM(CAST(FLOOR(epoch(t3.t3)) AS BIGINT)
                         - CAST(FLOOR(epoch(t3.t1)) AS BIGINT)), 0) AS BIGINT)
         AS total_conversion_secs
FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id LEFT JOIN t3 ON t1.user_id = t3.user_id
"""


def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    week = lambda c: F.floor(F.datediff(F.to_date(c), F.lit(_EPOCH).cast("date")) / 7)  # noqa: E731
    first_seen = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    joined = e.join(first_seen, "user_id").select(
        "user_id",
        week(F.col("first_ts")).alias("cohort_week"),
        (week(F.col("ts")) - week(F.col("first_ts"))).alias("week_offset"),
    )
    return (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("active_users"))
    )


COHORT_ORACLE = f"""
WITH first_seen AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
)
SELECT CAST(FLOOR(datediff('day', DATE '{_EPOCH}', CAST(first_ts AS DATE)) / 7) AS BIGINT)
         AS cohort_week,
       CAST(FLOOR(datediff('day', DATE '{_EPOCH}', CAST(e.ts AS DATE)) / 7)
            - FLOOR(datediff('day', DATE '{_EPOCH}', CAST(first_ts AS DATE)) / 7) AS BIGINT)
         AS week_offset,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
FROM events e JOIN first_seen f ON e.user_id = f.user_id
GROUP BY 1, 2
"""


def event_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    counts = pairs.groupBy("event_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("event_type").agg(F.sum("n").alias("tot"))
    return counts.join(totals, "event_type").select(
        "event_type",
        "next_type",
        F.col("n").cast("long").alias("n_transitions"),
        F.floor(F.lit(1000) * F.col("n") / F.col("tot")).cast("long").alias("prob_x1000"),
    )


PATH_ORACLE = """
WITH pairs AS (
  SELECT event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), counts AS (
  SELECT event_type, next_type, COUNT(*) AS n
  FROM pairs WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, next_type,
       CAST(n AS BIGINT) AS n_transitions,
       CAST(FLOOR(1000 * n / SUM(n) OVER (PARTITION BY event_type)) AS BIGINT) AS prob_x1000
FROM counts
"""


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credited to the most recent
    PRIOR non-purchase event. One IGNORE NULLS window over the strictly-
    preceding frame — no self-join, linear at scale (the naive formulation
    joins events to events on user + time inequality)."""
    e = _events(spark, sf_dir)
    sec = F.unix_timestamp("ts")
    prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_type = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")), ignorenulls=True
    ).over(prev)
    touch_sec = F.last(
        F.when(F.col("event_type") != "purchase", sec), ignorenulls=True
    ).over(prev)
    return (
        e.withColumn("touch_type", touch_type)
        .withColumn("secs_since_touch", (sec - touch_sec).cast("long"))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "touch_type", "secs_since_touch")
    )


ATTRIBUTION_ORACLE = """
WITH w AS (
  SELECT event_id, user_id, event_type,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
           OVER prev AS touch_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT)
           - LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END
                        IGNORE NULLS) OVER prev AS secs_since_touch
  FROM events
  WINDOW prev AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT CAST(event_id AS BIGINT) AS event_id, CAST(user_id AS BIGINT) AS user_id,
       touch_type, CAST(secs_since_touch AS BIGINT) AS secs_since_touch
FROM w WHERE event_type = 'purchase'
"""


def cep_clean_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP negation pattern: click FOLLOWED BY purchase within 1 hour with
    NO error in between — the "A then B within T without C" shape MATCH_
    RECOGNIZE engines sell. Expressed with two IGNORE NULLS last-value
    windows over the strictly-preceding frame (last click time, last error
    time): clean iff the click exists, is recent, and the latest error
    predates it. No self-joins; one user_id Exchange."""
    e = _events(spark, sf_dir)
    sec = F.unix_timestamp("ts")
    prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t_click = F.last(F.when(F.col("event_type") == "click", sec), ignorenulls=True).over(prev)
    t_err = F.last(F.when(F.col("event_type") == "error", sec), ignorenulls=True).over(prev)
    p = (
        e.withColumn("t_click", t_click)
        .withColumn("t_err", t_err)
        .filter(F.col("event_type") == "purchase")
        .withColumn("converted", F.col("t_click").isNotNull() & ((sec - F.col("t_click")) <= 3600))
        .withColumn(
            "clean",
            F.col("converted") & (F.col("t_err").isNull() | (F.col("t_err") < F.col("t_click"))),
        )
    )
    return p.agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum(F.col("converted").cast("long")).cast("long").alias("n_converted_1h"),
        F.sum(F.col("clean").cast("long")).cast("long").alias("n_clean"),
    )


CEP_ORACLE = """
WITH w AS (
  SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END
                    IGNORE NULLS) OVER prev AS t_click,
         LAST_VALUE(CASE WHEN event_type = 'error' THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END
                    IGNORE NULLS) OVER prev AS t_err
  FROM events
  WINDOW prev AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), p AS (
  SELECT *,
         (t_click IS NOT NULL AND sec - t_click <= 3600) AS converted,
         (t_click IS NOT NULL AND sec - t_click <= 3600
          AND (t_err IS NULL OR t_err < t_click)) AS clean
  FROM w WHERE event_type = 'purchase'
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_1h,
       CAST(SUM(CASE WHEN clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
FROM p
"""


EVENT_ANALYTICS_QUERIES = [
    Q(
        "attribution_last_touch",
        attribution_last_touch,
        ATTRIBUTION_ORACLE,
        "last-touch purchase attribution via strictly-preceding IGNORE NULLS window",
    ),
    Q(
        "cep_clean_conversion",
        cep_clean_conversion,
        CEP_ORACLE,
        "CEP 'A then B within T without C' negation pattern, window-only",
    ),
    Q(
        "funnel_view_click_purchase",
        funnel_view_click_purchase,
        FUNNEL_ORACLE,
        "strictly-ordered 3-stage funnel, linear per-user aggregation chain",
    ),
    Q(
        "cohort_retention_weekly",
        cohort_retention_weekly,
        COHORT_ORACLE,
        "weekly cohort retention matrix from a fixed epoch anchor",
    ),
    Q(
        "event_path_transitions",
        event_path_transitions,
        PATH_ORACLE,
        "event->next-event Markov transition counts with probabilities",
    ),
]


# ---------------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-ACTIVE-DAY streak per user. The
# classic rewrite — distinct active days, then (day - row_number) is constant
# exactly within a consecutive run, so one GROUP BY on that anchor yields the
# islands with zero self-joins. One user_id-keyed Exchange feeds the distinct,
# the window AND the island aggregation; linear at 100 TB. Day arithmetic in
# integer days-since-epoch (UTC session) — no date-diff semantics to diverge.
# ---------------------------------------------------------------------------


def streak_active_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    days = (
        ev.select("user_id", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn("anchor", F.col("day") - F.row_number().over(w))
    runs = islands.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("start_day"),
    )
    best = Window.partitionBy("user_id").orderBy(F.desc("len"), F.asc("start_day"))
    return (
        runs.withColumn("rk", F.row_number().over(best))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("len").cast("long").alias("longest_streak_days"),
            F.col("start_day").cast("long").alias("streak_start_day"),
        )
        .orderBy("user_id")
    )


STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id,
         CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
  FROM events
), islands AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS anchor
  FROM days
), runs AS (
  SELECT user_id, anchor, COUNT(*) AS len, MIN(day) AS start_day
  FROM islands GROUP BY 1, 2
), best AS (
  SELECT user_id, len, start_day,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY len DESC, start_day) AS rk
  FROM runs
)
SELECT user_id, CAST(len AS BIGINT) AS longest_streak_days,
       CAST(start_day AS BIGINT) AS streak_start_day
FROM best WHERE rk = 1
ORDER BY user_id
"""


EVENT_ANALYTICS_QUERIES.append(
    Q(
        "streak_active_days",
        streak_active_days,
        STREAK_ORACLE,
        "gaps-and-islands longest consecutive-day streak (zero self-joins)",
    )
)


# ---------------------------------------------------------------------------
# RFM segmentation: the classic recency / frequency / monetary customer
# scoring. Recency is anchored to a FIXED date (a runtime `now` would make
# results non-reproducible — same policy as the cohort anchor); R/F/M are
# quintile scores from ntile over TOTAL orders ((metric, user_id)) so bucket
# boundaries are deterministic across engines. One user_id aggregation +
# three cheap ntile windows over the (small) per-user rollup.
# ---------------------------------------------------------------------------

RFM_ANCHOR = "2026-01-01"


def event_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.datediff(F.lit(RFM_ANCHOR).cast("date"), F.max(F.to_date("ts")))
        .cast("long")
        .alias("recency_days"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum("cents").cast("long").alias("monetary_cents"),
    )
    r_w = Window.orderBy(F.asc("recency_days"), F.asc("user_id"))  # recent = best
    f_w = Window.orderBy(F.desc("frequency"), F.asc("user_id"))
    m_w = Window.orderBy(F.desc("monetary_cents"), F.asc("user_id"))
    return (
        per_user.withColumn("r_score", F.ntile(5).over(r_w).cast("long"))
        .withColumn("f_score", F.ntile(5).over(f_w).cast("long"))
        .withColumn("m_score", F.ntile(5).over(m_w).cast("long"))
        .orderBy("user_id")
    )


RFM_ORACLE = f"""
WITH per_user AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(DATEDIFF('day', MAX(CAST(ts AS DATE)), DATE '{RFM_ANCHOR}') AS BIGINT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
  FROM events
  GROUP BY user_id
)
SELECT user_id, recency_days, frequency, monetary_cents,
       CAST(NTILE(5) OVER (ORDER BY recency_days, user_id) AS BIGINT) AS r_score,
       CAST(NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT) AS f_score,
       CAST(NTILE(5) OVER (ORDER BY monetary_cents DESC, user_id) AS BIGINT) AS m_score
FROM per_user
ORDER BY user_id
"""


EVENT_ANALYTICS_QUERIES.append(
    Q(
        "event_rfm_segmentation",
        event_rfm_segmentation,
        RFM_ORACLE,
        "RFM quintile segmentation (fixed anchor, deterministic ntile boundaries)",
    )
)
