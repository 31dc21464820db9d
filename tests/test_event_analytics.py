"""Semantic checks for the event-analytics trio (oracles certify equality;
these certify the funnel ordering rule on a constructed world)."""

from __future__ import annotations

import os
import tempfile
from datetime import datetime

from phabricator_etl_spark.plans.event_analytics import (
    cohort_retention_weekly,
    event_path_transitions,
    funnel_view_click_purchase,
)

SF = "/root/testdata/sf0.001"


def _world(spark, rows):
    d = tempfile.mkdtemp(prefix="evworld_")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def _ts(s):
    return datetime.fromisoformat(s)


def test_funnel_requires_strict_order(spark):
    rows = [
        # user 1: view -> click -> purchase, fully ordered (converts)
        (0, _ts("2024-01-01 10:00:00"), 1, "view"),
        (1, _ts("2024-01-01 11:00:00"), 1, "click"),
        (2, _ts("2024-01-01 12:00:00"), 1, "purchase"),
        # user 2: click BEFORE view, purchase after view but no click after
        # view -> stops at stage 1
        (3, _ts("2024-01-01 09:00:00"), 2, "click"),
        (4, _ts("2024-01-01 10:00:00"), 2, "view"),
        (5, _ts("2024-01-01 11:00:00"), 2, "purchase"),
        # user 3: view -> click, no purchase -> stage 2
        (6, _ts("2024-01-01 10:00:00"), 3, "view"),
        (7, _ts("2024-01-01 10:30:00"), 3, "click"),
        # user 4: never views -> not in funnel at all
        (8, _ts("2024-01-01 10:00:00"), 4, "purchase"),
    ]
    world = _world(spark, rows)
    r = funnel_view_click_purchase(spark, world).collect()[0]
    assert r.users_view == 3
    assert r.users_click_after_view == 2  # users 1 and 3
    assert r.users_full_funnel == 1  # user 1 only
    assert r.total_conversion_secs == 2 * 3600  # user 1: 10:00 -> 12:00


def test_cohort_week0_has_every_user(spark):
    rows = cohort_retention_weekly(spark, SF).collect()
    by = {(r.cohort_week, r.week_offset): r.active_users for r in rows}
    # every user is active in their own cohort week by definition
    week0 = {c: n for (c, o), n in by.items() if o == 0}
    for (c, o), n in by.items():
        assert o >= 0
        assert n <= week0[c]  # retention never exceeds the cohort size


def test_path_transitions_probabilities_sum(spark):
    rows = event_path_transitions(spark, SF).collect()
    assert rows
    per_src = {}
    for r in rows:
        per_src.setdefault(r.event_type, []).append(r.prob_x1000)
        assert r.n_transitions > 0
    for src, probs in per_src.items():
        # floor(x1000) shares sum to <= 1000, within |outgoing| of it
        assert 1000 - len(probs) <= sum(probs) <= 1000
