"""Claims made by sources/formats.py and streaming/joins.py that the driver
gate does not cover: batch-boundary independence of the foreachBatch merge,
and ORC predicate pushdown."""

from __future__ import annotations

import pytest

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


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def test_transform_with_state_processor_folds_monotonically():
    """The TWS processor's folding logic, unit-tested against fake state
    cells (the real wire protocol needs protobuf, absent in this container —
    see the ENVIRONMENT SEAM note in streaming/sessions.py)."""
    import pandas as pd

    from phabricator_etl_spark.streaming.sessions import _RunningTotalsProcessor

    p = _RunningTotalsProcessor()
    p._count = _FakeValueState()
    p._maxv = _FakeValueState()

    out1 = list(p.handleInputRows((7,), iter([pd.DataFrame({"value_cents": [5, 9]})]), None))
    out2 = list(p.handleInputRows((7,), iter([pd.DataFrame({"value_cents": [3]})]), None))
    assert out1[0].iloc[0].tolist() == [7, 2, 9]
    assert out2[0].iloc[0].tolist() == [7, 3, 9]  # count grows, max monotone
    # empty micro-batch leaves state untouched but still reports it
    out3 = list(p.handleInputRows((7,), iter([pd.DataFrame({"value_cents": []})]), None))
    assert out3[0].iloc[0].tolist() == [7, 3, 9]


def test_transform_with_state_gate_matches_batch_when_protobuf_present(spark):
    pytest.importorskip("google.protobuf")
    from phabricator_etl_spark.streaming.sessions import stream_transform_with_state

    got = {r["user_id"]: (r["n_events"], r["max_value_cents"])
           for r in stream_transform_with_state(spark, "/root/testdata/sf0.001").collect()}
    from pyspark.sql import functions as F

    from phabricator_etl_spark.sources.catalog import load_table

    exp = {
        r["user_id"]: (r["n"], r["m"])
        for r in load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy(F.col("user_id").cast("long").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n"), F.max(F.round(F.col("value") * 100).cast("long")).alias("m"))
        .collect()
    }
    assert got == exp


def test_compaction_reduces_files_and_preserves_rows(spark, sf_smoke):
    """The physical claim the gated `maint_compact_small_files` row can't
    carry (AQE makes exact intermediate file counts unpredictable — 100 rows
    round-robin'd into 64 partitions landed in 44 files): after compaction
    the file count is within the target and never above the fragmented
    count, and every row survives the rewrite."""
    import os

    from phabricator_etl_spark.plans.maintenance import (
        COMPACT_TARGET,
        _parquet_files,
        _stage_dir,
        maint_compact_small_files,
    )
    from phabricator_etl_spark.sources.catalog import load_table

    row = maint_compact_small_files(spark, sf_smoke).collect()[0]
    nrows = load_table(spark, sf_smoke, "lineitem").count()
    assert row["n_rows"] == nrows
    assert row["compaction_ok"] is True
    frag = _stage_dir("frag", sf_smoke, nrows)
    compact = _stage_dir("compact", sf_smoke, nrows)
    nb, na = len(_parquet_files(frag)), len(_parquet_files(compact))
    assert 1 <= na <= COMPACT_TARGET
    assert na <= nb
