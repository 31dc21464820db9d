"""Delta MERGE INTO == join-rewrite equivalence (S5 seam).

incremental_runner.merge_upsert is documented as "exactly what Delta MERGE
compiles to for whole-row upserts"; this test proves it where delta-spark
is installed. The build container ships no delta-spark, so the test skips
there with a visible reason — the module-level seam (plans/delta_merge.py)
is still import-tested either way.
"""

from __future__ import annotations

import tempfile

import pytest

from phabricator_etl_spark.plans import delta_merge as D
from phabricator_etl_spark.plans.incremental_runner import dedup_latest, merge_upsert


def test_seam_importable():
    # The gate function must answer cleanly regardless of environment.
    assert D.delta_available() in (True, False)


@pytest.mark.skipif(not D.delta_available(), reason="delta-spark not installed")
def test_delta_merge_equals_join_rewrite():
    spark = D.get_delta_spark("delta-merge-test")
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, v string, ts long"
    )
    staging_raw = spark.createDataFrame(
        [(2, "B", 25), (2, "B-old", 21), (4, "d", 40)], "k long, v string, ts long"
    )
    staging = dedup_latest(staging_raw, "k", "ts")

    expected = sorted(tuple(r) for r in merge_upsert(target, staging, "k").collect())

    with tempfile.TemporaryDirectory(prefix="delta_") as d:
        path = f"{d}/t"
        target.write.format("delta").save(path)
        D.merge_into(spark, path, staging, "k")
        got = sorted(tuple(r) for r in spark.read.format("delta").load(path).collect())

    assert got == expected
