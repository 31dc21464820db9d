"""Block hygiene for iterative fixpoints (ckpt.py).

Spark's DataFrame.unpersist() cannot free localCheckpoint blocks (the cache
manager doesn't own them), so iterative operators used to accumulate one
dead block set per round — measured as 52 s -> 161 s run-to-run degradation
of the sf10 connected-components query. These tests pin the disposal
mechanism actually works and the two-generation chain invariant holds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phabricator_etl_spark.ckpt import CheckpointChain, tracked_local_checkpoint


def _n_persistent(spark) -> int:
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    n = 0
    while it.hasNext():
        it.next()
        n += 1
    return n


def test_tracked_checkpoint_disposes_blocks(spark):
    base = _n_persistent(spark)
    df, dispose = tracked_local_checkpoint(spark.range(10_000))
    assert df.count() == 10_000
    assert _n_persistent(spark) > base
    dispose()
    assert _n_persistent(spark) == base


def test_chain_keeps_exactly_two_generations(spark):
    base = _n_persistent(spark)
    chain = CheckpointChain()
    cur = chain.step(spark.range(1_000).select(F.col("id")))
    for _ in range(5):
        # each round derives from the previous AND the previous must stay
        # queryable until the round after (convergence checks compare them)
        prev = cur
        cur = chain.step(prev.select((F.col("id") + 1).alias("id")))
        assert prev.count() == 1_000  # previous generation still live
    assert _n_persistent(spark) - base <= 2
    assert cur.agg(F.sum("id")).first()[0] == sum(range(5, 1_005))
    chain.dispose_all()
    assert _n_persistent(spark) == base


def test_connected_components_no_block_accumulation(spark):
    """The CC fixpoint must not leave per-round blocks behind: after the
    result is collected, at most the final two label generations (+ nothing
    from sym/edges) may remain persistent."""
    from phabricator_etl_spark.operators.graph import connected_components

    base = _n_persistent(spark)
    n = 3_000
    v = spark.range(n).select(F.col("id"))
    # a path graph -> many pointer-jumping rounds
    e = spark.range(n - 1).select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    out = connected_components(v, e, local_threshold=0)
    assert out.filter(F.col("component") != 0).count() == 0
    assert _n_persistent(spark) - base <= 2


def test_chain_rejects_foreign_thread(spark):
    """A CheckpointChain must refuse step/dispose from a thread other than
    its creator (r5 ADVICE: a pooled build step stepping another thread's
    chain could dispose blocks that thread still reads)."""
    import threading

    from phabricator_etl_spark.ckpt import CheckpointChain

    chain = CheckpointChain()
    chain.step(spark.range(10))
    errs: list[BaseException] = []

    def misuse():
        try:
            chain.step(spark.range(5))
        except AssertionError as e:
            errs.append(e)

    t = threading.Thread(target=misuse)
    t.start()
    t.join()
    assert len(errs) == 1 and "owned by thread" in str(errs[0])
