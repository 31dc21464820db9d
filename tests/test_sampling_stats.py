"""Accuracy bounds for the approximate aggregates and semantic invariants for
the deterministic samplers (plans/sampling_stats.py).

The sketch-based queries are rows-only at the gate (HLL / KLL internals are
engine-specific); these tests pin them to exact answers within published
error bounds, so "approximate" can't silently degrade to "wrong".
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from phabricator_etl_spark.plans.sampling_stats import (
    SAMPLE_PCT,
    approx_distinct_sketch,
    approx_quantiles_price,
    range_join_attribution,
    sample_hash_bernoulli,
)
from phabricator_etl_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.01"


def test_approx_distinct_within_bound(spark, sf_dir):
    """KMV bottom-k estimate within the sketch's expected relative error
    (~1/sqrt(K-1) ~ 12.6% at K=64; allow 2 sigma), and the exact_distinct
    column must equal countDistinct. Spark's native HLL approx_count_distinct
    is exercised here too (its per-engine sketch kept it off the value-hash
    gate; the registry entry now carries the deterministic KMV instead)."""
    rows = approx_distinct_sketch(spark, sf_dir).collect()
    got = {r.l_returnflag: (r.kmv_estimate, r.exact_distinct) for r in rows}
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.exact
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_partkey").alias("exact")).collect()
    }
    native = {
        r.l_returnflag: r.hll
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("hll"))
        .collect()
    }
    for flag, (kmv, nd) in got.items():
        assert nd == exact[flag]
        rel_err = abs(kmv - exact[flag]) / exact[flag]
        assert rel_err < 0.26, f"{flag}: KMV {kmv} vs exact {exact[flag]} (rel err {rel_err:.3f})"
        hll_err = abs(native[flag] - exact[flag]) / exact[flag]
        assert hll_err < 0.05, f"{flag}: native HLL err {hll_err:.3f}"


def test_approx_quantiles_bracket_exact(spark, sf_dir):
    """Deterministic-sample rank-pick quantiles within 2% rank error of the
    exact order statistic (20% sample of ~15k rows => rank sd ~0.9%); the
    native percentile_approx stays exercised with its own tighter bound."""
    row = approx_quantiles_price(spark, sf_dir).collect()[0]
    p10, p50, p90 = row.p10_cents, row.p50_cents, row.p90_cents
    assert row.min_cents <= p10 <= p50 <= p90 <= row.max_cents
    assert row.sample_size > 1000
    o = load_table(spark, sf_dir, "orders")
    cents = [r[0] for r in o.select(F.round(F.col("o_totalprice") * 100).cast("long")).collect()]
    cents.sort()
    n = len(cents)
    for q, got in [(0.1, p10), (0.5, p50), (0.9, p90)]:
        lo = cents[max(0, int(n * (q - 0.02)) - 1)]
        hi = cents[min(n - 1, int(n * (q + 0.02)) + 1)]
        assert lo <= got <= hi, f"q={q}: {got} outside [{lo}, {hi}]"
    (native,) = (
        o.select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .agg(F.percentile_approx("c", [0.1, 0.5, 0.9], 10_000).alias("p"))
        .collect()
    )
    for q, got in zip([0.1, 0.5, 0.9], native.p):
        lo = cents[max(0, int(n * (q - 0.01)) - 1)]
        hi = cents[min(n - 1, int(n * (q + 0.01)) + 1)]
        assert lo <= got <= hi, f"native q={q}: {got} outside [{lo}, {hi}]"


def test_bernoulli_sample_rate(spark, sf_dir):
    sampled = sample_hash_bernoulli(spark, sf_dir).agg(F.sum("n_sampled")).collect()[0][0]
    total = load_table(spark, sf_dir, "lineitem").count()
    rate = sampled / total
    # md5 is uniform; at 60k rows the 10% rate holds within +/-1.5pp
    assert abs(rate - SAMPLE_PCT / 100) < 0.015, f"sample rate {rate:.4f}"


def test_bernoulli_sample_deterministic(spark, sf_dir):
    a = {tuple(r) for r in sample_hash_bernoulli(spark, sf_dir).collect()}
    b = {tuple(r) for r in sample_hash_bernoulli(spark, sf_dir).collect()}
    assert a == b


def test_range_join_windows_are_exact(spark, sf_dir):
    """Every counted click really is within (purchase_ts - 1h, purchase_ts):
    re-verify one purchase's count by brute force."""
    out = range_join_attribution(spark, sf_dir).orderBy(F.desc("clicks_1h")).first()
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_id") == out.purchase_id).collect()[0]
    n = (
        e.filter(F.col("event_type") == "click")
        .filter(F.col("user_id") == p.user_id)
        .filter(
            (F.col("ts") >= F.lit(p.ts) - F.expr("INTERVAL 1 HOUR")) & (F.col("ts") < F.lit(p.ts))
        )
        .count()
    )
    assert n == out.clicks_1h
