"""Every registered query must hash-match its DuckDB oracle at sf0.001.

This mirrors the driver's CORRECTNESS gate (which runs at sf0.01) so
mismatches surface locally first.
"""

from __future__ import annotations

import pytest

from phabricator_etl_spark.oracle_check import check_query
from phabricator_etl_spark.registry import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("q", QUERIES, ids=[q.name for q in QUERIES])
def test_oracle_parity(spark, sf_smoke, q):
    res = check_query(spark, q, sf_smoke)
    assert res.ok, f"{res.name}: {res.detail}"
