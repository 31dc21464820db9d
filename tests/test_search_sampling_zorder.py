"""Semantic invariants for the retrieval (BM25/phrase), temperature-sampling,
group-holdout, and Z-order operators added in round 4.

Correctness vs DuckDB is covered by the oracle gate (test_oracle_parity.py);
these tests pin the properties an oracle hash can't express: ranking
monotonicity, split disjointness, bit-level Morton correctness, and the plan
shape that makes Z-order skipping actually work.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from phabricator_etl_spark.operators.search import (
    BM25_QUERY_TERMS,
    BM25_TOP_K,
    search_bm25_topk,
    search_phrase_positions,
)
from phabricator_etl_spark.plans.sampling_stats import (
    TEMP_PPM,
    sample_group_holdout,
    sample_temperature_lang,
)
from phabricator_etl_spark.plans.scale_techniques import _morton, zorder_file_skipping
from phabricator_etl_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _py_morton(p: int, s: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((p >> i) & 1) << (2 * i + 1)
        z |= ((s >> i) & 1) << (2 * i)
    return z


def test_morton_matches_python_reference(spark):
    pairs = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 678), (200, 39)]
    df = spark.createDataFrame(pairs, "p long, s long").select(
        "p", "s", _morton(F.col("p"), F.col("s")).alias("z")
    )
    for row in df.collect():
        assert row["z"] == _py_morton(row["p"], row["s"]), (row["p"], row["s"])


def test_morton_preserves_rectangle_locality(spark):
    # All z-values of a 2^k-aligned tile form one contiguous range — the
    # property that makes min/max row-group stats effective after z-sort.
    tile = [(p, s) for p in range(96, 128) for s in range(0, 32)]  # 32x32 aligned tile
    zs = sorted(_py_morton(p, s) for p, s in tile)
    assert zs[-1] - zs[0] == len(zs) - 1  # contiguous


def test_zorder_scan_pushes_both_predicates(spark):
    plan = zorder_file_skipping(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1][:400]
    assert "l_partkey" in pushed and "l_suppkey" in pushed, pushed


def test_bm25_ranking_invariants(spark):
    rows = search_bm25_topk(spark, SF).collect()
    assert 0 < len(rows) <= BM25_TOP_K
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 1 <= r["n_terms_matched"] <= len(BM25_QUERY_TERMS)
        assert r["bm25"] > 0.0


def test_phrase_positions_are_real_matches(spark):
    # Every reported (doc_id, first_pos) must correspond to an actual
    # adjacent occurrence in the raw text's whitespace tokenization.
    hits = {r["doc_id"]: (r["n_occurrences"], r["first_pos"]) for r in
            search_phrase_positions(spark, SF).collect()}
    assert hits, "phrase should occur at sf0.001"
    docs = dict(
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id").isin([int(k) for k in hits]))
        .select("doc_id", "text")
        .collect()
    )
    from phabricator_etl_spark.operators.search import PHRASE

    for doc_id, (n, first) in hits.items():
        toks = docs[doc_id].split()
        occ = [i for i in range(len(toks) - 1) if toks[i] == PHRASE[0] and toks[i + 1] == PHRASE[1]]
        assert (len(occ), occ[0]) == (n, first), doc_id


def test_temperature_rates_flatten_distribution(spark):
    rows = sample_temperature_lang(spark, SF).collect()
    assert len(rows) >= 2
    by_rate = sorted(rows, key=lambda r: r["n_docs"])
    # rarest language is kept whole; rates fall as counts rise
    assert by_rate[0]["rate_ppm"] == TEMP_PPM
    rates = [r["rate_ppm"] for r in by_rate]
    assert rates == sorted(rates, reverse=True)
    for r in rows:
        assert 0 < r["rate_ppm"] <= TEMP_PPM
        assert r["n_sampled"] <= r["n_docs"]


def test_weighted_reservoir_invariants(spark):
    from phabricator_etl_spark.plans.sampling_stats import (
        RESERVOIR_K,
        sample_weighted_reservoir,
    )

    rows = sample_weighted_reservoir(spark, SF).collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["o_orderpriority"], []).append(r)
    for grp, members in by_grp.items():
        assert [m["rk"] for m in sorted(members, key=lambda m: m["rk"])] == list(
            range(1, RESERVOIR_K + 1)
        ), grp
        assert all(m["weight_cents"] > 0 for m in members)
    # deterministic: a second build returns the identical sample
    again = sample_weighted_reservoir(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_group_holdout_splits_are_disjoint(spark):
    rows = sample_group_holdout(spark, SF).collect()
    total_groups = sum(r["n_groups"] for r in rows)
    n_sources = load_table(spark, SF, "documents").select("source").distinct().count()
    # a source appearing in two splits would double-count here
    assert total_groups == n_sources
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
