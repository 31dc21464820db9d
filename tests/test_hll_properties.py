"""Property-based certification of the HLL register algebra.

The sketch's value rests on algebraic properties no example test pins down:
registers must be insensitive to duplication and order, and must merge by
elementwise MAX (that is what makes the sketch distributable — map-side
partial states, streaming state, cross-shard union all rely on it).
Hypothesis drives a pure-Python mirror of the exact md5 arithmetic the
Spark/DuckDB implementations share; one seeded Spark case binds the mirror
to the real operator so the mirror cannot drift.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from phabricator_etl_spark.operators.sketches import HLL_M, HLL_P, HLL_SCALE

KEYS = st.lists(st.integers(min_value=0, max_value=10_000), min_size=0, max_size=400)


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _registers(keys) -> dict[int, int]:
    regs: dict[int, int] = {}
    for k in keys:
        h = _md5_long(str(k))
        bucket = h % HLL_M
        w = h >> HLL_P
        rho = HLL_SCALE if w == 0 else (w & -w).bit_length()
        if regs.get(bucket, 0) < rho:
            regs[bucket] = rho
    return regs


@settings(max_examples=60, derandomize=True)
@given(KEYS)
def test_registers_duplication_and_order_insensitive(keys):
    doubled = keys + list(reversed(keys))
    assert _registers(keys) == _registers(doubled)


@settings(max_examples=60, derandomize=True)
@given(KEYS, KEYS)
def test_registers_merge_by_elementwise_max(a, b):
    ra, rb, ru = _registers(a), _registers(b), _registers(a + b)
    merged: dict[int, int] = dict(ra)
    for bucket, rho in rb.items():
        merged[bucket] = max(merged.get(bucket, 0), rho)
    assert merged == ru


@settings(max_examples=30, derandomize=True)
@given(st.integers(min_value=0, max_value=2**59))
def test_rho_is_trailing_zeros_plus_one(h):
    w = h >> HLL_P
    rho = HLL_SCALE if w == 0 else (w & -w).bit_length()
    if w:
        assert (w >> (rho - 1)) & 1 == 1
        assert w & ((1 << (rho - 1)) - 1) == 0
    assert 1 <= rho <= HLL_SCALE


def test_mirror_matches_spark_registers(spark):
    # Bind the Python mirror to the real operator: identical registers for a
    # seeded key set routed through the Spark expression path.
    import random

    from pyspark.sql import functions as F

    from phabricator_etl_spark.operators.sketches import hll_bucket_rho

    rng = random.Random(99)
    keys = [rng.randrange(100_000) for _ in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    bucket, rho = hll_bucket_rho(F.col("k").cast("string"))
    got = {
        r.bucket: r.mj
        for r in df.select(bucket, rho).groupBy("bucket").agg(F.max("rho").alias("mj")).collect()
    }
    assert got == _registers(keys)
