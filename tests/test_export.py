"""Training-shard export manifest (plans/export.py)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phabricator_etl_spark.plans.export import N_SHARDS, export_train_shards  # noqa: E402


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.01"


def test_shards_balanced(spark, sf_dir):
    """Content-hash sharding balances statistically: every shard count stays
    within 5 sigma of the binomial mean (sf0.01 has ~500 docs, so mean ~31
    and sd ~ sqrt(mean·15/16) ~ 5.4 — the bound scales with the data)."""
    rows = export_train_shards(spark, sf_dir).collect()
    assert len(rows) == N_SHARDS
    counts = [r.n_docs for r in rows]
    mean = sum(counts) / N_SHARDS
    sd = (mean * (N_SHARDS - 1) / N_SHARDS) ** 0.5
    for c in counts:
        assert abs(c - mean) <= 5 * sd, f"shard count {c} vs mean {mean:.1f}: {counts}"


def test_manifest_order_invariant(spark, sf_dir):
    """Shard membership and the XOR signature are content-defined: shuffling
    the input rows (different partitioning AND order) yields the identical
    manifest — the property chunk-by-scan-order export lacks."""
    base = {r.shard: tuple(r) for r in export_train_shards(spark, sf_dir).collect()}

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy(F.reverse(F.col("text")))  # adversarial reorder
        .repartition(7)
    )
    tmp = f"/tmp/export_reordered_{os.getpid()}"
    docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    try:
        got = {r.shard: tuple(r) for r in export_train_shards(spark, tmp).collect()}
        assert got == base
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def test_signature_detects_single_doc_change(spark, sf_dir):
    """Flipping one document's text flips exactly that shard's xor_sig and
    leaves every other shard row identical (token/byte deltas land in the
    same shard too — membership is keyed on doc_id, not content)."""
    base = {r.shard: r for r in export_train_shards(spark, sf_dir).collect()}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    victim = docs.select("doc_id").orderBy("doc_id").head()["doc_id"]
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == victim, F.concat(F.col("text"), F.lit(" corrupted"))).otherwise(
            F.col("text")
        ),
    )
    tmp = f"/tmp/export_mutated_{os.getpid()}"
    mutated.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    try:
        got = {r.shard: r for r in export_train_shards(spark, tmp).collect()}
        changed = [s for s in base if tuple(base[s]) != tuple(got[s])]
        assert len(changed) == 1, f"expected exactly one changed shard, got {changed}"
        s = changed[0]
        assert base[s].xor_sig != got[s].xor_sig
        assert base[s].n_docs == got[s].n_docs
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
