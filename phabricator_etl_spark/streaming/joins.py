"""Streaming joins + the foreachBatch upsert sink.

The reference is pure batch (SURVEY.md §2.10); its closest shapes are the
revision⋈transaction joins (J4-J8) and the staging→MERGE upsert (S5,
stats.py:896-939). These queries run the same semantics on the REAL
streaming engine:

- stream-STREAM inner join with watermarks on both sides and a time-range
  predicate (the state-store bounded "interval join");
- stream-STATIC enrichment join (the streaming form of the J10/J11 broadcast
  dimension joins — the static side re-plans per micro-batch and
  broadcasts);
- a foreachBatch upsert sink: each micro-batch MERGEs into a keyed target
  (latest-timestamp-wins + additive counters), the streaming form of the
  incremental runner's watermark/merge protocol (plans/incremental_runner).

All run Trigger.AvailableNow over the staged events directory, so
bounded-input results are deterministic and equal to the batch join/agg the
DuckDB oracle states (the Dataflow-model equivalence).

Scale notes: stream-stream join state is bounded by the watermark delay x
input rate per key; the range condition lets Spark expire rows from the
state store (without it, both sides buffer forever). The foreachBatch merge
is commutative (max + sum), so final state is independent of micro-batch
boundaries — asserted by running the same sink at multiple
maxFilesPerTrigger pacings in tests.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query import Q
from ..sources.catalog import load_table as _t
from .events import _events_stream, _run_stream_to_table


def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→click conversion pairs per user within 2 hours.

    Both sides carry a watermark; the join predicate pairs an equi-key
    (user_id) with an event-time range, which is what lets the engine expire
    buffered state (click older than view+2h can never match future views).
    Append output: pairs emit once both sides pass the watermark.
    """
    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    pairs = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOURS")),
    )
    out = _run_stream_to_table(spark, pairs, "append")
    return out.select(
        F.col("v_user").cast("long").alias("user_id"),
        F.col("view_id").cast("long").alias("view_id"),
        F.col("click_id").cast("long").alias("click_id"),
        (F.unix_micros("c_ts") - F.unix_micros("v_ts")).cast("long").alias("gap_us"),
    )


STREAM_STREAM_JOIN_ORACLE = """
SELECT v.user_id AS user_id,
       v.event_id AS view_id,
       c.event_id AS click_id,
       CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
FROM events v
JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
"""


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the (batch)
    customer dimension keyed by user_id, then aggregated per market segment.
    The static side is planned fresh each micro-batch and broadcast — the
    streaming form of the reference's user/project dimension caches
    (J10/J11, stats.py:585-607)."""
    ev = _events_stream(spark, sf_dir)
    dim = (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    agg = (
        ev.withWatermark("ts", "1 day")
        .join(F.broadcast(dim), "user_id")  # inner: unmatched users drop
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )
    out = _run_stream_to_table(spark, agg, "complete")
    return out.select(
        "c_mktsegment",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "value_cents",
    )


STREAM_STATIC_ORACLE = """
SELECT c_mktsegment,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# foreachBatch upsert sink
# ---------------------------------------------------------------------------

def _staged_chunks(spark: SparkSession, sf_dir: str, n_chunks: int) -> str:
    """Stage the events table as n_chunks parquet files in a temp dir so the
    file-stream source delivers MULTIPLE micro-batches (one file per
    trigger) — a single-file source would collapse the whole run into one
    batch and prove nothing about merge-across-batches."""
    stage = os.path.join(
        tempfile.gettempdir(),
        f"stream_chunks_{os.path.basename(sf_dir.rstrip('/'))}_{n_chunks}",
    )
    marker = os.path.join(stage, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(stage, ignore_errors=True)
        (
            _t(spark, sf_dir, "events")
            # chunk by event_id range => chunks arrive roughly in time order,
            # like a backfill; any order yields the same merged state
            .repartitionByRange(n_chunks, "event_id")
            .write.mode("overwrite")
            .parquet(stage)
        )
        with open(marker, "w") as f:
            f.write("ok\n")
    return stage


def run_upsert_sink(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_chunks: int = 4,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming upsert: per user_id keep last_ts (max) and n_events (sum),
    merged into an in-memory target once per micro-batch via foreachBatch.

    foreachBatch hands each micro-batch to arbitrary BATCH code — here the
    same join-rewrite MERGE the incremental layer uses (S5): aggregate the
    batch, full-outer-merge with the current target, swap. The merge
    functions are commutative+associative, so the final table is independent
    of batch boundaries and arrival order.
    """
    stage = _staged_chunks(spark, sf_dir, n_chunks)
    schema = spark.read.parquet(stage).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(stage)
    )
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )

    target: dict[str, DataFrame] = {}

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        delta = batch.groupBy("user_id").agg(
            F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("n_events")
        )
        if "t" not in target:
            target["t"] = delta.localCheckpoint(eager=True)
            return
        cur = target["t"]
        merged = (
            cur.select("user_id", F.col("last_ts").alias("o_ts"), F.col("n_events").alias("o_n"))
            .join(delta, "user_id", "full_outer")
            .select(
                "user_id",
                F.greatest(F.col("o_ts"), F.col("last_ts")).alias("last_ts"),
                (F.coalesce("o_n", F.lit(0)) + F.coalesce("n_events", F.lit(0))).alias("n_events"),
            )
        )
        # checkpoint per batch: truncates lineage AND materializes, so the
        # closure never re-reads prior micro-batches (same reason the CC
        # fixpoint checkpoints per round)
        target["t"] = merged.localCheckpoint(eager=True)

    from .events import stream_state_partitions

    with tempfile.TemporaryDirectory(prefix="ckpt_upsert_") as ckpt, stream_state_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return target["t"]


def stream_upsert_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = run_upsert_sink(spark, sf_dir)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.col("n_events").cast("long").alias("n_events"),
    )


STREAM_UPSERT_ORACLE = """
SELECT user_id,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
"""


def stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: views that never converted
    emit with a NULL click once the watermark PROVES no future click can
    match — the semantics that separate streaming outer joins from inner
    ones (state can only release an unmatched row when event time has moved
    past its whole match window).

    Determinism: a view at the tail of the bounded input is undecidable —
    the final watermark (global max ts - 1h delay) may not have passed its
    v_ts + 2h window, so the engine (correctly) never emits it as
    unmatched. Both this query and the oracle therefore restrict the view
    side to v_ts <= max_ts - 3h - 1s: every retained view's outcome is
    watermark-decided, and the 1s guard band keeps the exact boundary
    comparison (engine-internal >= vs >) out of the result. Matched pairs
    are unaffected (they emit immediately)."""
    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    pairs = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOURS")),
        "leftOuter",
    )
    out = _run_stream_to_table(spark, pairs, "append")
    # The GLOBAL watermark of a two-input stateful query is the MIN of the
    # per-input watermarks (each = that side's max event time - its delay),
    # computed on the post-filter streams — so the decidability cutoff keys
    # off the LOWER of the two sides' maxima, not the table-wide max.
    ev = _t(spark, sf_dir, "events")
    m = ev.agg(
        F.least(
            F.max(F.when(F.col("event_type") == "view", F.col("ts"))),
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
        ).alias("m")
    ).collect()[0][0]
    cutoff = F.lit(m).cast("timestamp") - F.expr("INTERVAL 3 HOURS") - F.expr("INTERVAL 1 SECOND")
    return out.filter(F.col("v_ts") <= cutoff).select(
        F.col("v_user").cast("long").alias("user_id"),
        F.col("view_id").cast("long").alias("view_id"),
        F.col("click_id").cast("long").alias("click_id"),
        F.col("click_id").isNotNull().alias("converted"),
    )


STREAM_OUTER_JOIN_ORACLE = """
WITH mx AS (
  SELECT LEAST(MAX(CASE WHEN event_type = 'view' THEN ts END),
               MAX(CASE WHEN event_type = 'click' THEN ts END)) AS m
  FROM events
),
v AS (
  SELECT event_id, user_id, ts FROM events, mx
  WHERE event_type = 'view' AND ts <= m - INTERVAL 3 HOUR - INTERVAL 1 SECOND
),
c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT v.user_id AS user_id,
       v.event_id AS view_id,
       c.event_id AS click_id,
       c.event_id IS NOT NULL AS converted
FROM v LEFT JOIN c
  ON v.user_id = c.user_id
 AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
"""


STREAM_JOIN_QUERIES = [
    Q(
        "stream_stream_interval_join",
        stream_stream_interval_join,
        STREAM_STREAM_JOIN_ORACLE,
        "stream-stream interval join, watermarked state",
    ),
    Q(
        "stream_stream_outer_join",
        stream_stream_outer_join,
        STREAM_OUTER_JOIN_ORACLE,
        "stream-stream LEFT OUTER interval join, watermark-decided unmatched rows",
    ),
    Q(
        "stream_static_enrich",
        stream_static_enrich,
        STREAM_STATIC_ORACLE,
        "stream-static broadcast dimension join",
    ),
    Q(
        "stream_upsert_foreach_batch",
        stream_upsert_foreach_batch,
        STREAM_UPSERT_ORACLE,
        "foreachBatch MERGE upsert sink across micro-batches",
    ),
]
