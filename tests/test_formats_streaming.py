"""Claims made by sources/formats.py and streaming/joins.py that the driver
gate does not cover: batch-boundary independence of the foreachBatch merge,
and ORC predicate pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from phabricator_etl_spark.sources.formats import _stage, EVENTS_SCHEMA
from phabricator_etl_spark.streaming.joins import run_upsert_sink


def _state(df):
    return {
        r["user_id"]: (r["last_ts"], r["n_events"])
        for r in df.collect()
    }


def test_upsert_sink_is_batch_boundary_independent(spark, sf_smoke):
    """The merged target must be identical whether the stream arrives as 4
    one-file micro-batches or 2 two-file micro-batches — commutative merge
    (max last_ts, additive n_events) means pacing cannot change the result."""
    fine = _state(run_upsert_sink(spark, sf_smoke, n_chunks=4, max_files_per_trigger=1))
    coarse = _state(run_upsert_sink(spark, sf_smoke, n_chunks=4, max_files_per_trigger=2))
    assert fine == coarse
    assert len(fine) > 0


def test_orc_scan_pushes_filters(spark, sf_smoke):
    stage = _stage(spark, sf_smoke, "orc")
    df = (
        spark.read.schema(EVENTS_SCHEMA)
        .orc(stage)
        .filter(F.col("event_type") == "click")
        .select("event_id", "value")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "event_type" in plan, plan[:1500]
    # column pruning: the scan's read schema is the 3 referenced columns only
    assert "ReadSchema: struct<event_id:bigint,event_type:string,value:double>" in plan, plan[:1500]
