"""Assembles the full query registry consumed by __spark_entry__.py.

Import is deliberately lazy-tolerant: a module with an optional dependency
failing to import should not take down the whole registry.
"""

from __future__ import annotations

from .query import Q


def all_queries() -> list[Q]:
    queries: list[Q] = []
    from .plans.relational import RELATIONAL_QUERIES

    queries.extend(RELATIONAL_QUERIES)
    try:
        from .plans.tpch_extra import TPCH_EXTRA_QUERIES

        queries.extend(TPCH_EXTRA_QUERIES)
    except ImportError:
        pass
    try:
        from .plans.functions_battery import FUNCTIONS_BATTERY_QUERIES

        queries.extend(FUNCTIONS_BATTERY_QUERIES)
    except ImportError:
        pass
    try:
        from .plans.sampling_stats import SAMPLING_STATS_QUERIES

        queries.extend(SAMPLING_STATS_QUERIES)
    except ImportError:
        pass
    try:
        from .plans.sql_interface import SQL_INTERFACE_QUERIES

        queries.extend(SQL_INTERFACE_QUERIES)
    except ImportError:
        pass
    try:
        from .plans.phab_queries import PHAB_QUERIES

        queries.extend(PHAB_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.dedup import DEDUP_QUERIES

        queries.extend(DEDUP_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.similarity import SIMILARITY_QUERIES

        queries.extend(SIMILARITY_QUERIES)
    except ImportError:
        pass
    try:
        from .functions.text import TEXT_QUERIES

        queries.extend(TEXT_QUERIES)
    except ImportError:
        pass
    try:
        from .functions.json_ops import JSON_QUERIES

        queries.extend(JSON_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.multimodal import MULTIMODAL_QUERIES

        queries.extend(MULTIMODAL_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.iterative import ITERATIVE_QUERIES

        queries.extend(ITERATIVE_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.clustering import CLUSTERING_QUERIES

        queries.extend(CLUSTERING_QUERIES)
    except ImportError:
        pass
    try:
        from .plans.extensions import EXTENSION_QUERIES

        queries.extend(EXTENSION_QUERIES)
    except ImportError:
        pass
    try:
        from .plans.scale_techniques import SCALE_QUERIES

        queries.extend(SCALE_QUERIES)
    except ImportError:
        pass
    try:
        from .plans.incremental import INCREMENTAL_QUERIES

        queries.extend(INCREMENTAL_QUERIES)
    except ImportError:
        pass
    try:
        from .streaming.events import STREAMING_QUERIES

        queries.extend(STREAMING_QUERIES)
    except ImportError:
        pass
    try:
        from .streaming.sessions import SESSION_QUERIES

        queries.extend(SESSION_QUERIES)
    except ImportError:
        pass
    try:
        from .streaming.joins import STREAM_JOIN_QUERIES

        queries.extend(STREAM_JOIN_QUERIES)
    except ImportError:
        pass
    try:
        from .sources.formats import FORMAT_QUERIES

        queries.extend(FORMAT_QUERIES)
    except ImportError:
        pass
    try:
        from .operators.corpus import CORPUS_QUERIES

        queries.extend(CORPUS_QUERIES)
    except ImportError:
        pass
    return queries


def queries_dict():
    return {q.name: q.build for q in all_queries()}


def oracles_dict():
    return {q.name: q.oracle.strip() for q in all_queries() if q.oracle}
