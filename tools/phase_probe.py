#!/usr/bin/env python
"""One-off phase decomposition probe for the etl_e2e entries: runs each
entry once in a fresh warmed session and prints incremental_runner.PHASE_LOG
so the (watermark_and_cc, expand_and_pin_dims, merge_write_wall) split can
be compared across code arms without waiting for a full bench capture."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from tools.opt_probe import _session
    from phabricator_etl_spark.registry import all_queries
    from phabricator_etl_spark.plans import incremental_runner as R

    by_name = {q.name: q for q in all_queries()}
    spark = _session("etl_e2e_full")
    for name in ("etl_e2e_full", "etl_e2e_incremental"):
        for rep in range(int(os.environ.get("PHASE_REPS", "2"))):
            R.PHASE_LOG.clear()
            import time

            t0 = time.perf_counter()
            by_name[name].build(spark, SF_DIR).count()
            wall = time.perf_counter() - t0
            print(f"{name} rep{rep}: wall={wall:.2f}s")
            for run in R.PHASE_LOG:
                print("   ", {k: v for k, v in sorted(run.items(), key=lambda x: -x[1])})


if __name__ == "__main__":
    main()
