"""Streaming funnel: an ordered state machine in applyInPandasWithState.

The batch funnel (plans/event_analytics.funnel_view_click_purchase) re-done
as a per-user streaming state machine: state = (t1, t2, t3) epoch-micros
progress through view -> click -> purchase, advanced by each micro-batch's
rows in (ts, event_id) order. The update-mode emissions carry a cumulative
events_seen counter, so the FINAL emission per user (max counter) is the
settled state; one batch-side aggregation turns those into the same
4-column summary as the batch funnel — and the query is therefore
hash-gated against the SAME DuckDB oracle. Stream/batch equivalence of a
custom stateful operator, verified by the gate, not just claimed.

Ordering caveat (documented, inherent): the fold is exact when each user's
events arrive time-ordered ACROSS micro-batches (true here — AvailableNow
over one input file; in production a source-side watermark buffer provides
it). Within a batch, rows are explicitly sorted before folding.

State size: 3 longs + a counter per user — constant, no watermark needed
for the state itself.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from ..query import Q
from ..plans.event_analytics import FUNNEL_ORACLE
from .events import _events_stream, _run_stream_to_table

_STATE = StructType(
    [
        StructField("t1", LongType()),
        StructField("t2", LongType()),
        StructField("t3", LongType()),
        StructField("seen", LongType()),
    ]
)
_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t1", LongType()),
        StructField("t2", LongType()),
        StructField("t3", LongType()),
        StructField("seen", LongType()),
    ]
)


def _advance(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    t1, t2, t3, seen = state.get if state.exists else (0, 0, 0, 0)
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ts", "event_id"])
    for ts, etype in zip(batch["ts"], batch["event_type"]):
        us = int(ts.value // 1000)  # pandas ns -> micros
        if t1 == 0 and etype == "view":
            t1 = us
        elif t1 != 0 and t2 == 0 and etype == "click" and us > t1:
            t2 = us
        elif t2 != 0 and t3 == 0 and etype == "purchase" and us > t2:
            t3 = us
        seen += 1
    state.update((t1, t2, t3, seen))
    yield pd.DataFrame(
        {"user_id": [user_id], "t1": [t1], "t2": [t2], "t3": [t3], "seen": [seen]}
    )


def stream_funnel_state_machine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir).select(
        F.col("event_id").cast("long").alias("event_id"),
        "ts",
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
    ).withWatermark("ts", "1 day")
    staged = ev.groupBy("user_id").applyInPandasWithState(
        _advance,
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emissions = _run_stream_to_table(spark, staged, "update")
    # Final emission per user = the row with the max cumulative counter.
    w = Window.partitionBy("user_id").orderBy(F.desc("seen"))
    final = emissions.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return final.filter(F.col("t1") != 0).agg(
        F.count(F.lit(1)).cast("long").alias("users_view"),
        # coalesce: SUM over zero users is NULL, the oracle's conditional
        # COUNT is 0 — the empty stream must agree
        F.coalesce(F.sum((F.col("t2") != 0).cast("long")), F.lit(0))
        .cast("long")
        .alias("users_click_after_view"),
        F.coalesce(F.sum((F.col("t3") != 0).cast("long")), F.lit(0))
        .cast("long")
        .alias("users_full_funnel"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("t3") != 0,
                    F.floor(F.col("t3") / 1_000_000) - F.floor(F.col("t1") / 1_000_000),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("total_conversion_secs"),
    )


STREAM_FUNNEL_QUERIES = [
    Q(
        "stream_funnel_state_machine",
        stream_funnel_state_machine,
        FUNNEL_ORACLE,
        "per-user funnel state machine in applyInPandasWithState, batch-oracle-gated",
    ),
]
