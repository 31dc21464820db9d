"""E2E corpus funnel semantics: stage monotonicity and constructed-world
stage attribution (the oracle certifies cross-engine equality)."""

from __future__ import annotations

import os
import tempfile

from phabricator_etl_spark.operators.corpus import EVAL_DOCS
from phabricator_etl_spark.operators.pipeline_e2e import corpus_e2e_funnel

SF = "/root/testdata/sf0.001"


def test_funnel_monotone(spark):
    rows = corpus_e2e_funnel(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= r.n_quality >= r.n_unique >= r.n_final >= 0
        if r.n_final == 0:
            assert r.final_tokens == 0


def test_constructed_world_stages(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 toks
    rows = []
    # eval slice occupies doc_id < EVAL_DOCS: one eval doc carrying a 5-gram
    rows.append((0, "one two three four five six seven eight nine ten", "en", "eval"))
    for i in range(1, EVAL_DOCS):
        rows.append((i, f"filler{i} " * 12, "en", "eval"))
    # 100: clean unique doc (passes everything)
    rows.append((100, base, "en", "web"))
    # 101: exact duplicate of 100 -> deduped
    rows.append((101, base, "en", "web"))
    # 102: contains the eval doc's 5-gram -> decontaminated away
    rows.append((102, "zzz one two three four five yyy xxx www vvv", "en", "web"))
    # 103: too short -> fails quality
    rows.append((103, "tiny doc", "en", "web"))
    d = tempfile.mkdtemp(prefix="e2eworld_")
    spark.createDataFrame(rows, "doc_id long, text string, lang string, source string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))

    got = {(r.lang, r.source): r for r in corpus_e2e_funnel(spark, d).collect()}
    web = got[("en", "web")]
    assert web.n_docs == 4
    assert web.n_quality == 3  # 103 fails the token gate
    assert web.n_unique == 2  # 101 deduped against 100
    assert web.n_final == 1  # 102 decontaminated
    assert web.final_tokens == 10  # doc 100's tokens
