#!/usr/bin/env python
"""Scale curve for the END-TO-END ETL runner (full + incremental protocol).

The 43-family SCALE_BENCH curve covers individual queries over the sf-scaled
TPC-H-ish tables, but the e2e runner (the reference's ``process()`` analog:
watermark readback -> changed-revision filter -> graph-aware invalidation ->
8-table build -> recency dedup -> MERGE -> partitioned write) runs on the
fixed-size Phabricator fixture world, so it had no scale column. This probe
generates deterministically-seeded worlds at 1x / 10x / 100x the gate
fixture size (the generator is fully parameterized) and times

- a FULL run (first-load path: every table built and inserted), and
- an INCREMENTAL run on top of it (destination watermark -> half the
  revisions arrive "new" -> stack-component expansion -> MERGE upsert),

with generation cost excluded from the timed region. Near-linear growth in
both columns is the pass criterion; the CC invalidation pass crosses its
documented driver-cutover (operators/graph.py LOCAL_EDGE_THRESHOLD) only far
above 100x, so the curve here isolates the runner protocol itself.

Run from repo root:  python tools/etl_scale_probe.py [multipliers...]
Prints one JSON line per multiplier plus a summary growth table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from phabricator_etl_spark.session import get_spark  # noqa: E402
from phabricator_etl_spark.sources.phab_fixtures import PhabSources, generate, inject_hot_object  # noqa: E402
from phabricator_etl_spark.plans import incremental_runner as R  # noqa: E402

_END = 2_000_000_000


def probe(mult: int, hot: int = 0) -> dict:
    """One timed world. ``hot`` > 0 additionally injects that many comments
    (split across both OR-join arms) and reviewer rows onto ONE revision —
    the real-world mega-review shape (r5 verdict #8); correctness under the
    same skew is pytest-gated in tests/test_skew_world.py."""
    spark = get_spark("etl-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    src = generate(
        spark,
        seed=7,
        n_users=40 * mult,
        n_projects=12 * mult,
        n_repos=8 * mult,
        n_revisions=120 * mult,
    )
    if hot:
        src = inject_hot_object(src, n_hot=hot)
    # materialize sources so generation/driver-upload cost stays out of the
    # timed region (the gate fixture layer caches the same way)
    src = PhabSources(**{k: v.localCheckpoint(eager=True) for k, v in src.__dict__.items()})

    dest = os.path.join(tempfile.gettempdir(), f"etl_scale_probe_{mult}x")
    shutil.rmtree(dest, ignore_errors=True)

    t0 = time.time()
    out = R.run_incremental(spark, src, dest, now=_END, full=True)
    n_rows = {k: v.count() for k, v in out.items()}
    full_s = time.time() - t0

    # arrival split: half the revisions were present at "first run"; rerun
    # from a fresh destination, then incrementally pick up the rest
    rows = sorted(r[0] for r in src.revision.select("dateModified").collect())
    cut = int(rows[len(rows) // 2])
    early = PhabSources(
        **{**src.__dict__, "revision": src.revision.filter(F.col("dateModified") <= cut)}
    )
    shutil.rmtree(dest, ignore_errors=True)
    R.run_incremental(spark, early, dest, now=_END)
    t0 = time.time()
    out2 = R.run_incremental(spark, src, dest, now=_END)
    incr_s = time.time() - t0
    n2 = {k: v.count() for k, v in out2.items()}
    assert n2 == n_rows, f"incremental != full recompute at {mult}x: {n2} vs {n_rows}"

    shutil.rmtree(dest, ignore_errors=True)
    rec = {
        "mult": mult,
        "n_revisions": 120 * mult,
        "hot": hot,
        "full_s": round(full_s, 2),
        "incremental_s": round(incr_s, 2),
        "rows_out": sum(n_rows.values()),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    # args: multipliers; the literal "skew" adds a hot-object world row
    # (10k comments/reviewers on one revision at the base multiplier) so the
    # skewed e2e has a bench row next to the uniform curve.
    args = sys.argv[1:]
    skew = "skew" in args
    mults = [int(a) for a in args if a != "skew"] or ([] if skew else [1, 10, 100])
    if skew:
        probe(1, hot=10_000)
    recs = [probe(m) for m in mults]
    for a, b in zip(recs, recs[1:]):
        step = b["mult"] / a["mult"]
        print(
            f"# {a['mult']}x -> {b['mult']}x (data x{step:.0f}): "
            f"full x{b['full_s'] / a['full_s']:.2f}, "
            f"incremental x{b['incremental_s'] / a['incremental_s']:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
