"""Semantic checks for the span/sketch operator families (DuckDB oracles
certify cross-engine equality; these certify the semantics and the plans)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from phabricator_etl_spark.operators.sketches import (
    BLOOM_K,
    HLL_M,
    join_bloom_prefilter,
    sketch_hll_distinct,
)
from phabricator_etl_spark.operators.spans import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    corpus_chunk_sliding,
    dedup_common_spans,
    text_word_entropy,
)

SF = "/root/testdata/sf0.001"


def _doc_world(spark, rows):
    d = tempfile.mkdtemp(prefix="spanworld_")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_common_spans_flags_shared_boilerplate(spark):
    # 3 docs share one 5-word boilerplate span; unique tails are not flagged.
    boiler = "terms of service apply here"
    rows = [
        (0, boiler + " alpha beta gamma delta epsilon"),
        (1, boiler + " one two three four five"),
        (2, boiler + " red green blue yellow pink"),
        (3, "totally unrelated text with no shared spans at all"),
    ]
    world = _doc_world(spark, rows)
    got = {r.doc_id: r for r in dedup_common_spans(spark, world).collect()}
    assert got[3].n_common == 0
    for doc in (0, 1, 2):
        assert got[doc].n_common >= 1  # at least the full boilerplate span
        assert got[doc].n_common < got[doc].n_spans  # tails stay unique
    assert 0 < got[0].common_ratio_x1000 < 1000


def test_chunk_sliding_boundaries_exact(spark):
    # 100 tokens, size 64 / stride 48 -> chunks at 0 and 48; second chunk
    # has 100-48 = 52 tokens (tail shorter than size, never empty).
    rows = [(0, " ".join(f"w{i}" for i in range(100))), (1, "a b c")]
    world = _doc_world(spark, rows)
    got = corpus_chunk_sliding(spark, world).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    c0 = sorted(by_doc[0], key=lambda r: r.chunk_idx)
    assert [r.chunk_idx for r in c0] == [0, 1]
    assert c0[0].chunk_tokens == CHUNK_SIZE
    assert c0[1].chunk_tokens == 100 - CHUNK_STRIDE
    # short doc -> exactly one chunk with all its tokens
    c1 = by_doc[1]
    assert len(c1) == 1 and c1[0].chunk_tokens == 3
    # overlap means total chunk tokens >= doc tokens
    assert sum(r.chunk_tokens for r in c0) >= 100


def test_chunk_hash_identifies_equal_passages(spark):
    rows = [(0, "x y z"), (1, "x y z"), (2, "x y q")]
    world = _doc_world(spark, rows)
    got = {r.doc_id: r.chunk_hash for r in corpus_chunk_sliding(spark, world).collect()}
    assert got[0] == got[1] != got[2]


def test_word_entropy_known_values(spark):
    # 4 equiprobable words -> 2 bits; constant doc -> 0 bits.
    rows = [(0, "a b c d"), (1, "a a a a a a")]
    world = _doc_world(spark, rows)
    got = {r.doc_id: r for r in text_word_entropy(spark, world).collect()}
    assert abs(got[0].entropy_bits - 2.0) < 1e-9
    assert got[0].n_distinct == 4
    assert abs(got[1].entropy_bits) < 1e-9


def test_hll_estimate_within_sketch_error(spark):
    # Standard HLL error is ~1.04/sqrt(m); allow 4 sigma.
    rows = sketch_hll_distinct(spark, SF).collect()
    assert len(rows) == 5
    tol = 4 * 1.04 / (HLL_M**0.5)
    for r in rows:
        est = r.hll_estimate_x10000 / 10000.0
        assert abs(est - r.exact_distinct) <= tol * r.exact_distinct + 2, r
        assert 0 < r.n_registers_used <= HLL_M


def test_bloom_prefilter_exactness_and_selectivity(spark):
    # Result must equal the plain semi-join (bloom invisible) ...
    from phabricator_etl_spark.sources.catalog import load_table

    got = {r.l_returnflag: r for r in join_bloom_prefilter(spark, SF).collect()}
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    expect = {
        r.l_returnflag: r
        for r in li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")).alias(
                "revenue_cents"
            ),
        )
        .collect()
    }
    assert set(got) == set(expect)
    for k in got:
        assert got[k].n_items == expect[k].n_items
        assert got[k].revenue_cents == expect[k].revenue_cents
    # ... and the bitmap must actually discriminate: a key absent from the
    # build side fails at least one of its BLOOM_K bit probes with high
    # probability at this load factor (checked structurally: the filter
    # condition contains BLOOM_K element_at probes).
    plan = join_bloom_prefilter(spark, SF)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("element_at") >= BLOOM_K


def test_histogram_quantile_within_one_bin(spark):
    from pyspark.sql import functions as F

    from phabricator_etl_spark.operators.sketches import (
        HIST_BINS,
        sketch_histogram_quantiles,
    )
    from phabricator_etl_spark.sources.catalog import load_table

    li = load_table(spark, SF, "lineitem").select(
        "l_returnflag", F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    mn, mx = li.agg(F.min("cents"), F.max("cents")).first()
    width = (mx - mn) // HIST_BINS + 1
    exact = {
        (r.l_returnflag, q): r[f"q{q}"]
        for r in li.groupBy("l_returnflag")
        .agg(
            *[
                F.expr(f"percentile(cents, {q / 1000})").alias(f"q{q}")
                for q in (500, 950, 990)
            ]
        )
        .collect()
        for q in (500, 950, 990)
    }
    for r in sketch_histogram_quantiles(spark, SF).collect():
        q = {"p50": 500, "p95": 950, "p99": 990}[r.quantile]
        assert abs(r.est_cents - exact[(r.l_returnflag, q)]) <= width + 1, r


def test_countmin_overestimates_only_and_twin_hash_agrees(spark):
    """CMS estimates can only exceed truth (collisions add); the Python
    bucket twin must agree with the Spark-side seeded_hash expression."""
    from pyspark.sql import functions as F

    from phabricator_etl_spark.functions.hashing import hash_seeds, seeded_hash
    from phabricator_etl_spark.operators.sketches import (
        CMS_WIDTH,
        _cms_bucket,
        sketch_countmin_freq,
    )

    rows = sketch_countmin_freq(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["cms_estimate"] >= r["true_count"], r

    (a, b) = hash_seeds(4)[2]
    keys = ["1", "17", "4099", "hello world"]
    df = spark.createDataFrame([(k,) for k in keys], "k string").select(
        "k", (seeded_hash(F.col("k"), a, b) % CMS_WIDTH).alias("bucket")
    )
    got = {r["k"]: r["bucket"] for r in df.collect()}
    assert got == {k: _cms_bucket(k, a, b) for k in keys}
