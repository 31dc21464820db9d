"""Custom Python DataSource (sources/pydatasource.py): partition planning,
offset replay, and batch/stream equivalence."""

from __future__ import annotations

from phabricator_etl_spark.sources.pydatasource import (
    TICKS_PARTITIONS,
    TICKS_ROWS,
    TicksReader,
    TicksStreamReader,
    register_ticks,
    src_python_datasource,
    src_python_stream_source,
    tick_row,
)

SF = "/root/testdata/sf0.001"


def test_partitions_cover_range_disjointly():
    r = TicksReader({})
    parts = r.partitions()
    assert len(parts) == TICKS_PARTITIONS
    seen = []
    for p in parts:
        seen.extend(range(p.start, p.end))
    assert seen == list(range(TICKS_ROWS))


def test_stream_offsets_replay_identically():
    sr = TicksStreamReader({})
    off = sr.initialOffset()
    live, boundaries = [], [off]
    while True:
        it, nxt = sr.read(off)
        rows = list(it)
        if not rows:
            break
        live.extend(rows)
        boundaries.append(nxt)
        off = nxt
    assert len(live) == TICKS_ROWS
    # replay every committed slice through readBetweenOffsets — recovery path
    replayed = []
    for a, b in zip(boundaries, boundaries[1:]):
        replayed.extend(list(sr.readBetweenOffsets(a, b)))
    assert replayed == live


def test_copy_of_inflight_slice_restarts_at_position():
    import copy

    sr = TicksStreamReader({})
    it, _ = sr.read({"i": 0})
    next(it), next(it)
    clone = copy.copy(it)
    assert list(clone) == list(it)  # both resume from position 2... proven by
    # comparing against ground truth below
    assert list(copy.copy(sr.readBetweenOffsets({"i": 2}, {"i": 5}))) == [
        tick_row(2), tick_row(3), tick_row(4)
    ]


def test_batch_and_stream_faces_agree(spark):
    register_ticks(spark)
    batch = {r["symbol"]: tuple(r) for r in src_python_datasource(spark, SF).collect()}
    stream = {r["symbol"]: tuple(r) for r in src_python_stream_source(spark, SF).collect()}
    assert batch == stream
    assert sum(r[1] for r in batch.values()) == TICKS_ROWS
