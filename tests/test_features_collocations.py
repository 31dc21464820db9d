"""Semantic invariants for the feature-engineering operators (hashing trick,
JL random projection), directed containment dedup, and PMI collocations.

Cross-engine value equality is covered by the oracle gate; these tests pin
the mathematical properties: JL distance distortion, containment direction
and ground truth, PMI positivity/min-count.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from phabricator_etl_spark.operators.corpus import PMI_MIN_COUNT, corpus_pmi_collocations
from phabricator_etl_spark.operators.dedup import (
    CONTAINMENT_THRESHOLD_X1000,
    MAX_SHINGLE_DF,
    dedup_containment,
)
from phabricator_etl_spark.operators.features import (
    FH_DIM,
    JL_IN_DIM,
    JL_OUT_DIM,
    _jl_signs,
    embed_random_projection,
    feature_hashing_trick,
)
from phabricator_etl_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_jl_signs_deterministic_and_balanced():
    signs = _jl_signs()
    assert len(signs) == JL_IN_DIM * JL_OUT_DIM
    assert signs == _jl_signs()  # pure function of md5, no RNG state
    plus = sum(1 for _, _, s in signs if s == 1)
    # md5 bits are fair coins; binomial(1024, .5) stays within ±4 sigma
    assert abs(plus - len(signs) / 2) < 4 * math.sqrt(len(signs)) / 2


def test_jl_projection_preserves_distances(spark):
    """Mean relative distortion of pairwise L2 distances under the ±1
    projection (scaled by 1/sqrt(out_dim)) stays within the JL envelope for
    out_dim=16: loose per-pair, tight on average."""
    import numpy as np

    rows = (
        load_table(spark, SF, "embeddings")
        .orderBy("vec_id")
        .limit(40)
        .select("vec_id", "embedding")
        .collect()
    )
    orig = np.array([r["embedding"] for r in rows], dtype=np.float64)
    proj_rows = embed_random_projection(spark, SF).orderBy("vec_id").limit(40).collect()
    proj = (
        np.array([[int(x) for x in r["proj"].split("|")] for r in proj_rows], dtype=np.float64)
        / 10_000.0  # undo fixed-point quantization
        / math.sqrt(JL_OUT_DIM)  # JL normalization
    )
    dists_o, dists_p = [], []
    for i in range(0, 40, 5):
        for j in range(i + 1, 40, 7):
            dists_o.append(np.linalg.norm(orig[i] - orig[j]))
            dists_p.append(np.linalg.norm(proj[i] - proj[j]))
    ratios = np.array(dists_p) / np.array(dists_o)
    assert 0.7 < float(ratios.mean()) < 1.3, ratios.mean()


def test_feature_hashing_shape_and_mass(spark):
    rows = feature_hashing_trick(spark, SF).collect()
    assert all(0 <= r["dim"] < FH_DIM for r in rows)
    n_cust = load_table(spark, SF, "customer").count()
    # each customer contributes exactly 2 features of mass ±1
    total_mass = sum(abs(r["val"]) for r in rows)
    assert 0 < total_mass <= 2 * n_cust


def test_containment_is_directed_and_correct(spark):
    """Recompute containment for reported pairs from raw text (Python set
    arithmetic with the same shingling + df cap) and compare exactly."""
    pairs = dedup_containment(spark, SF).collect()
    assert pairs, "sf0.001 documents contain duplicated/near-dup docs"
    docs = dict(load_table(spark, SF, "documents").select("doc_id", "text").collect())

    def shingle_set(text: str) -> set[str]:
        t = text.split()
        if len(t) < 3:
            return {" ".join(t)}
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    # df cap over the whole corpus, as the operator applies it
    from collections import Counter

    df = Counter(s for text in docs.values() for s in shingle_set(text))
    kept = {s for s, c in df.items() if c <= MAX_SHINGLE_DF}
    for r in pairs[:25]:
        sa = shingle_set(docs[r["a"]])
        sb = shingle_set(docs[r["b"]]) & kept
        inter = len((sa & kept) & sb)
        expect = round(1000.0 * inter / len(sa))
        assert expect == r["containment_x1000"], (r["a"], r["b"])
        assert expect >= CONTAINMENT_THRESHOLD_X1000


def test_pmi_collocations_sane(spark):
    rows = corpus_pmi_collocations(spark, SF).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["cxy"] >= PMI_MIN_COUNT
    pmis = [r["pmi"] for r in rows]
    # ranked by the exact ratio => the rounded display column is monotone
    # non-increasing too (ties possible at 4 decimals)
    assert all(pmis[i] >= pmis[i + 1] - 1e-9 for i in range(len(pmis) - 1))
