"""Session windows + custom stateful streaming (SURVEY.md §2.9's upgrade
path: the reference has no stream abstraction; these are the stateful
operators a streaming deployment of this engine needs).

- stream_session_window: the REAL streaming engine (AvailableNow) running
  session_window aggregation with a watermark — merging-session state per
  (user, session). Oracle: the classic gaps-and-islands rewrite in SQL
  (lag -> gap flag -> running sum as session id), which must agree with
  Spark's session merge on bounded input.
- batch_session_window: same operator in batch mode, proving the semantics
  are mode-independent (Dataflow-model equivalence).
- stream_stateful_counter: applyInPandasWithState custom stateful operator —
  per-user running event counter with GroupStateTimeout, the escape hatch
  for operators Spark lacks natively. Registered rows-only (its per-batch
  emission pattern is not SQL-expressible; the driver records the weaker
  check by design).

Scale: session state is bounded by the watermark (late data beyond 1 day is
dropped); state store is keyed by (user, open session) — RocksDB-backed on a
real cluster.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..query import Q
from .events import _events_stream, _run_stream_to_table

SESSION_GAP = "2 hours"

SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 7200
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_no
"""


def _sessionize(df: DataFrame) -> DataFrame:
    agg = df.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return agg.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.col("n_events").cast("long").alias("n_events"),
    )


def batch_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import load_table

    return _sessionize(load_table(spark, sf_dir, "events"))


def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 day")
    agg = ev.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    out = _run_stream_to_table(spark, agg, "complete")
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.col("n_events").cast("long").alias("n_events"),
    )


_STATE_SCHEMA = "total BIGINT"
_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("events_seen", T.LongType()),
    ]
)


def _count_events(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom stateful op: running per-user event count across micro-batches.
    State is one integer per user; emits the updated total each batch."""
    (user_id,) = key
    total = state.get[0] if state.exists else 0
    for pdf in pdfs:
        total += len(pdf)
    state.update((total,))
    yield pd.DataFrame({"user_id": [user_id], "events_seen": [total]})


def stream_stateful_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState: the custom-stateful escape hatch. Rows-only
    check (per-batch emission is not a SQL-expressible shape)."""
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 day")
    counted = ev.groupBy(F.col("user_id").cast("long").alias("user_id")).applyInPandasWithState(
        _count_events,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_stream_to_table(spark, counted, "update")


SESSION_QUERIES = [
    Q("batch_session_window", batch_session_window, SESSION_ORACLE, "session windows, batch mode"),
    Q("stream_session_window", stream_session_window, SESSION_ORACLE, "session windows, streaming engine"),
    Q("stream_stateful_counter", stream_stateful_counter, None, "applyInPandasWithState custom operator"),
]
