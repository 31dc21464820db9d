#!/usr/bin/env python
"""Per-stage decomposition probe for the k-core scale cell (VERDICT r8 #2).

Runs graph_kcore_bipartite at the given SFs in a fresh session per run,
min-of-N with the benchutil rollback discipline, and prints the
iterative.STAGE_TIMES decomposition of the BEST run — so the over-linear
sf10->sf30 growth is attributable to a named materialization barrier
(edge checkpoint / initial degree agg / round-1 peel count / round-1
decremental update) instead of a single opaque wall number.

Usage:
  SPARK_GRAFT_KCORE_BCAST_CAP=0 python tools/kcore_probe.py --sfs 10,30  # shuffle arm
  python tools/kcore_probe.py --sfs 10,30                                # broadcast arm
"""
from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="10,30")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--query", default="graph_kcore_bipartite")
    a = ap.parse_args()

    import __spark_entry__ as entry
    from tools.scale_bench import sf_dir_for

    from phabricator_etl_spark.operators import iterative
    from phabricator_etl_spark.session import get_spark

    qs = entry.queries()
    out: dict[str, dict] = {}
    for sf in a.sfs.split(","):
        d = sf_dir_for(sf)
        if not os.path.isdir(d):
            print(f"# sf{sf}: {d} missing", file=sys.stderr)
            continue
        spark = get_spark(f"kcore-probe-sf{sf}")
        # same CPU warm-up shape as scale_bench so the first rep is not JIT
        spark.range(50_000_000).selectExpr("sum(id * 3 + (id & 7))").collect()
        best, best_stages = None, None
        for _ in range(a.repeat):
            t0 = time.perf_counter()
            n = qs[a.query](spark, d).count()
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best, best_stages = dt, dict(iterative.STAGE_TIMES)
            gc.collect()
        canary_t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr("sum(id * 3 + (id & 7))").collect()
        canary = time.perf_counter() - canary_t0
        out[sf] = {
            "total": round(best, 2),
            "rows": n,
            "canary": round(canary, 3),
            "cap": iterative._kcore_broadcast_cap(),
            "stages": best_stages,
        }
        print(f"# sf{sf}: {best:.2f}s total, canary {canary:.3f}s", file=sys.stderr)
        for k, v in best_stages.items():
            print(f"#   {k}: {v}", file=sys.stderr)
        spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
