"""Physical-plan audits: the 100 TB design assertions, checked on .explain
output so regressions in plan shape fail CI, not a production run.

What must hold (SURVEY.md §4, session.py design notes):
- predicate pushdown reaches the parquet scan (PushedFilters non-empty);
- column pruning reaches the scan (ReadSchema ≠ full table);
- dimension joins are broadcast hash joins, never sort-merge;
- aggregations have a partial (map-side) phase before the shuffle;
- the Phabricator parity pipelines contain ZERO Python evaluation
  (no BatchEvalPython / ArrowEvalPython / mapInPandas nodes) — §2.10's
  zero-UDF constraint, the whole-stage-codegen guarantee.
"""

from __future__ import annotations

import pytest

from phabricator_etl_spark.plans import phab_pipelines as P
from phabricator_etl_spark.plans.relational import (
    p_filters_compound,
    q1_pricing_summary,
    q3_shipping_priority,
)
from phabricator_etl_spark.sources import phab_fixtures


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def fixtures(spark):
    return phab_fixtures.generate(spark, seed=7)


def test_filter_pushdown_reaches_scan(spark, sf_smoke):
    plan = _plan(p_filters_compound(spark, sf_smoke))
    assert "PushedFilters: [" in plan, "filters must push into the parquet scan"
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("IsNotNull" in ln or "EqualTo" in ln or "GreaterThan" in ln for ln in pushed), (
        f"expected real pushed predicates, got: {pushed}"
    )


def test_column_pruning_reaches_scan(spark, sf_smoke):
    plan = _plan(q1_pricing_summary(spark, sf_smoke))
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, "no parquet scan found"
    # q1 touches 6 of 11 lineitem columns; the scan must not read the rest
    assert "l_orderkey" not in scan_lines[0], f"column pruning failed: {scan_lines[0]}"
    assert "l_shipdate" in scan_lines[0]


def test_dimension_join_is_broadcast(spark, sf_smoke):
    plan = _plan(q3_shipping_priority(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan, "filtered customer dim must broadcast"


def test_aggregation_is_partial(spark, sf_smoke):
    plan = _plan(q1_pricing_summary(spark, sf_smoke))
    assert plan.count("HashAggregate") >= 2, (
        "expected partial (map-side) + final aggregate pair around the shuffle"
    )


def test_q1_uses_whole_stage_codegen(spark, sf_smoke):
    df = q1_pricing_summary(spark, sf_smoke)
    df.collect()  # AQE finalizes the physical plan only on execution
    simple = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark whole-stage-codegen'd subtrees in the compact form
    import re

    assert re.search(r"\*\(\d+\)\s*HashAggregate", simple), (
        "aggregation must run inside a whole-stage-codegen subtree"
    )


@pytest.mark.parametrize("table", ["revisions", "diffs", "comments", "transactions",
                                   "review_requests", "review_groups", "project_transactions",
                                   "changesets"])
def test_phab_pipelines_have_no_python_nodes(fixtures, table):
    out = P.build_all(fixtures)[table]
    plan = _plan(out)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonUDF"):
        assert marker not in plan, (
            f"{table}: {marker} found — parity pipelines must be pure JVM (SURVEY §2.10)"
        )


def test_bucketed_join_is_colocated(spark, sf_smoke):
    """Bucketed tables must join without an Exchange before the join: the
    scans read buckets directly (Bucketed: true) and only the post-join
    aggregation shuffles (SURVEY §4.4's co-located join lever)."""
    from phabricator_etl_spark.plans.scale_techniques import bucketed_colocated_join

    plan = _plan(bucketed_colocated_join(spark, sf_smoke))
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    # no Exchange may appear below the join: in the formatted plan the join
    # inputs are the numbered operators before the SortMergeJoin node
    lines = plan.splitlines()
    join_idx = next(i for i, ln in enumerate(lines) if "SortMergeJoin" in ln and ln.lstrip().startswith("+-"))
    tree_above_join = "\n".join(lines[join_idx:join_idx + 8])
    assert "Exchange" not in tree_above_join, tree_above_join


def test_phab_dimension_joins_broadcast(fixtures):
    plan = _plan(P.build_all(fixtures)["review_requests"])
    assert "BroadcastHashJoin" in plan, "user/project dims must broadcast"
