"""Measurement-discipline helpers: shared by bench.py and tools/scale_bench.py.

The contract under test is the r8 advisor finding: a min-of-N repeat (or a
contended-retry rerun) must re-pay model builds the timed query itself
performed, while keeping caches that predate its snapshot (the documented
kmeans_cells -> ann_ivf_kmeans layering).
"""

from __future__ import annotations

from phabricator_etl_spark.benchutil import (
    WARM_DEPS,
    cache_rollback,
    cache_snapshot,
    model_caches,
)


def test_rollback_evicts_only_keys_added_since_snapshot():
    caches = model_caches()
    try:
        caches[0]["pre-existing"] = "warm-dep-model"
        snap = cache_snapshot()
        # rollback at rep 0 of the FIRST attempt: nothing added yet -> no-op
        cache_rollback(snap)
        assert caches[0]["pre-existing"] == "warm-dep-model"
        # the timed query builds a model; the next rep must re-pay it
        caches[0]["built-by-query"] = "fit"
        caches[1]["postings-by-query"] = "index"
        cache_rollback(snap)
        assert "built-by-query" not in caches[0]
        assert "postings-by-query" not in caches[1]
        # ...but the pre-populated dep model survives every rollback
        assert caches[0]["pre-existing"] == "warm-dep-model"
    finally:
        for c in caches:
            c.clear()


def test_warm_deps_name_real_registry_queries():
    from phabricator_etl_spark.registry import all_queries

    names = {q.name for q in all_queries()}
    for query, dep in WARM_DEPS.items():
        assert query in names and dep in names


def test_initial_heap_clamps_to_available_ram():
    from phabricator_etl_spark.session import _initial_heap, _mem_to_mb

    assert _mem_to_mb("8g") == 8192
    assert _mem_to_mb("512m") == 512
    small = _initial_heap("1g")
    assert _mem_to_mb(small) <= 1024  # never above the configured cap
    # a heap far beyond this host's RAM must clamp below the request
    # (keeps -Xms startable where -Xms == -Xmx would OOM at JVM start)
    huge = _initial_heap("100000g")
    assert _mem_to_mb(huge) < _mem_to_mb("100000g")
