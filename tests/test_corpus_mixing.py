"""Semantic checks for the round-4 corpus additions (the DuckDB oracles
certify cross-engine equality; these certify the operators mean what they
claim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from phabricator_etl_spark.functions.text import text_repetition_stats
from phabricator_etl_spark.operators.corpus import (
    MIX_TARGET_PERMILLE,
    corpus_mix_sample,
    corpus_redact_pii,
)

SF = "/root/testdata/sf0.001"


def test_mix_sample_downsamples_toward_target(spark):
    rows = {r.lang: r for r in corpus_mix_sample(spark, SF).collect()}
    assert set(rows) <= set(MIX_TARGET_PERMILLE)
    total_kept = sum(r.n_kept for r in rows.values())
    assert total_kept > 0
    for lang, r in rows.items():
        # downsampling only
        assert r.n_kept <= r.n_docs
        # achieved mixture within Bernoulli noise of the target share:
        # tolerance 3*sqrt(p*(1-p)/n) + granularity slack
        p = MIX_TARGET_PERMILLE[lang] / 1000
        achieved = r.n_kept / total_kept
        tol = 3 * (p * (1 - p) / max(total_kept, 1)) ** 0.5 + 0.02
        assert abs(achieved - p) <= tol, (lang, achieved, p, tol)


def test_redact_pii_strips_injected_contacts(spark):
    df = corpus_redact_pii(spark, SF)
    bad = df.filter((F.col("n_emails") < 1) | (F.col("n_phones") < 1)).count()
    assert bad == 0  # every doc got an injected email + phone, all detected


def test_repetition_stats_bounds(spark):
    df = text_repetition_stats(spark, SF)
    out_of_range = df.filter(
        (F.col("dup_token_x1000") < 0)
        | (F.col("dup_token_x1000") > 1000)
        | (F.col("top_bigram_x1000") < 0)
        | (F.col("top_bigram_x1000") > 2000)  # 2*top_c/n can exceed 1000 only via rounding of tiny docs
    ).count()
    assert out_of_range == 0
    # a perfectly repetitive constructed doc: 6 tokens, 1 distinct
    # -> dup = round(1000*5/6) = 833; top bigram "spam spam" x5
    # -> round(1000*2*5/6) = 1667
    import os
    import tempfile

    one = spark.createDataFrame([(0, "spam spam spam spam spam spam")], "doc_id long, text string")
    with tempfile.TemporaryDirectory(prefix="repdoc_") as d:
        one.write.parquet(os.path.join(d, "documents.parquet"))
        got = {r.doc_id: r for r in text_repetition_stats(spark, d).collect()}
    assert got[0].dup_token_x1000 == 833
    assert got[0].top_bigram_x1000 == 1667
