"""PQ-ANN accuracy and structure certification (rows-only gate entry, so the
quality evidence lives here: recall vs exact truth, determinism, and the
codes-not-vectors payload claim)."""

from __future__ import annotations

from phabricator_etl_spark.operators.quantization import (
    PQ_K,
    PQ_M,
    ann_pq_adc,
    pq_encode,
)
from phabricator_etl_spark.operators.similarity import TOP_K, ann_topk_bruteforce

SF = "/root/testdata/sf0.001"


def _recall_at_k(spark, sf):
    truth, got = {}, {}
    for r in ann_topk_bruteforce(spark, sf).collect():
        truth.setdefault(r.query_id, set()).add(r.cand_id)
    for r in ann_pq_adc(spark, sf).collect():
        got.setdefault(r.query_id, set()).add(r.cand_id)
    return sum(len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth) / len(truth)


def test_pq_recall_beats_floor(spark):
    # Measured 0.78 at sf0.001 / 0.76 at sf0.01 (PQ 4x16 codes, 12*k ADC
    # shortlist, exact re-rank); 0.6 is the regression floor.
    assert _recall_at_k(spark, SF) >= 0.6


def test_pq_codes_shape_and_range(spark):
    codes = pq_encode(spark, SF)
    assert codes.columns == ["vec_id"] + [f"code{m}" for m in range(PQ_M)]
    rows = codes.collect()
    n_vecs = len(rows)
    assert n_vecs > 0
    for r in rows:
        for m in range(PQ_M):
            assert 0 <= r[f"code{m}"] < PQ_K
    # every sub-space should actually use multiple codes (codebook not
    # collapsed to one centroid)
    for m in range(PQ_M):
        assert len({r[f"code{m}"] for r in rows}) > PQ_K // 4


def test_pq_deterministic_and_exact_ranked(spark):
    a = sorted(map(tuple, ann_pq_adc(spark, SF).collect()))
    b = sorted(map(tuple, ann_pq_adc(spark, SF).collect()))
    assert a == b
    # per query: exactly TOP_K rows, ranks 1..k, dot non-increasing with rank
    per_q = {}
    for qid, cand, dot, rank in a:
        per_q.setdefault(qid, []).append((rank, dot, cand))
    for qid, rows in per_q.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, TOP_K + 1))
        dots = [r[1] for r in rows]
        assert dots == sorted(dots, reverse=True)
