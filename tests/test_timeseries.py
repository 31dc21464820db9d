"""Gap-fill/interpolate and rolling-anomaly semantics on constructed series."""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timedelta

from phabricator_etl_spark.plans.timeseries import (
    ts_gapfill_interpolate,
    ts_rolling_anomaly,
)

BASE = datetime(2024, 1, 1, 0, 30)


def _world(spark, rows):
    d = tempfile.mkdtemp(prefix="tsworld_")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def _at(hours, value, user=1, eid=[0]):  # noqa: B006 - deliberate counter
    eid[0] += 1
    return (eid[0], BASE + timedelta(hours=hours), user, value)


def test_linear_interpolation_exact(spark):
    # observations at hour 0 (1.00) and hour 4 (5.00): gaps 1,2,3 must be
    # exactly 200/300/400 cents on the straight line.
    world = _world(spark, [_at(0, 1.0), _at(4, 5.0)])
    got = {r.hour: (r.interp_cents, r.is_observed) for r in ts_gapfill_interpolate(spark, world).collect()}
    base = min(got)  # absolute epoch-hour of the first bucket
    got = {k - base: v for k, v in got.items()}
    assert got == {
        0: (100, True),
        1: (200, False),
        2: (300, False),
        3: (400, False),
        4: (500, True),
    }


def test_multiple_events_in_bucket_average(spark):
    world = _world(spark, [_at(0, 1.0), _at(0, 3.0), _at(2, 6.0)])
    rows = sorted(ts_gapfill_interpolate(spark, world).collect(), key=lambda r: r.hour)
    # bucket 0 average = 2.00 -> 200; gap at 1 = midpoint 400; obs 600
    assert [r.interp_cents for r in rows] == [200, 400, 600]
    assert [r.is_observed for r in rows] == [True, False, True]


def test_rolling_anomaly_flags_spike_only(spark):
    # 30 hourly buckets of 10.00 then one 100.00 spike: variance over the
    # flat history is 0 -> z is NULL/inf-free guard? variance 0 gives
    # division by zero -> add jitter: alternate 10.00/10.02 history.
    rows = []
    for h in range(30):
        rows.append(_at(h, 10.0 if h % 2 == 0 else 10.02))
    rows.append(_at(30, 100.0))
    world = _world(spark, rows)
    got = ts_rolling_anomaly(spark, world).collect()
    assert len(got) == 1
    assert got[0].cents == 10000
    assert got[0].z1000 > 2000


def test_rolling_anomaly_quiet_series_empty(spark):
    rows = [_at(h, 10.0 if h % 2 == 0 else 10.02) for h in range(40)]
    world = _world(spark, rows)
    assert ts_rolling_anomaly(spark, world).count() == 0
