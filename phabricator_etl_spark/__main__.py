"""CLI entry point — the reference's console script, Spark-shaped.

Reference: `phabricator-etl = phabricator_etl.stats:process`
(pyproject.toml:16) with `--full` to bypass the incremental watermark
(parse_args, stats.py:1014-1024) and a debug mode that prints instead of
loading (stats.py:1071-1073, S8).

    python -m phabricator_etl_spark --dest /tmp/out [--full] [--debug] \
        [--fixture-seed 7]

Reads the deterministic fixture world by default (no MySQL in this
environment); a production deployment swaps sources via
sources/jdbc.load_phabricator and the same pipelines run unchanged.

Ad-hoc query mode (any of the registered analytics queries by name):

    python -m phabricator_etl_spark --run-query dedup_minhash_lsh \
        [--sf-dir /root/testdata/sf0.01] [--list-queries]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="phabricator-etl-spark")
    parser.add_argument("--dest", help="destination directory for the 8 output tables")
    parser.add_argument("--full", action="store_true", help="ignore the incremental watermark (reference --full)")
    parser.add_argument("--debug", action="store_true", help="show result samples instead of row counts only")
    parser.add_argument("--fixture-seed", type=int, default=7, help="fixture world seed (test environments)")
    parser.add_argument("--run-query", metavar="NAME", help="run one registered query and show its result")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="parquet table directory for --run-query")
    parser.add_argument("--list-queries", action="store_true", help="list registered query names and exit")
    args = parser.parse_args(argv)

    if args.list_queries:
        from .registry import all_queries

        for q in all_queries():
            print(f"{q.name}\t{q.doc}")
        return 0

    if args.run_query:
        from .registry import queries_dict
        from .session import get_spark

        qd = queries_dict()
        if args.run_query not in qd:
            print(f"unknown query {args.run_query!r}; use --list-queries", file=sys.stderr)
            return 2
        spark = get_spark("phabricator-etl-spark")
        spark.sparkContext.setLogLevel("WARN")
        df = qd[args.run_query](spark, args.sf_dir)
        df.show(50, truncate=False)
        print(f"{args.run_query}: {df.count()} rows")
        return 0

    if not args.dest:
        parser.error("--dest is required (or use --run-query / --list-queries)")

    from .plans.incremental_runner import run_incremental
    from .session import get_spark
    from .sources import phab_fixtures

    spark = get_spark("phabricator-etl-spark")
    spark.sparkContext.setLogLevel("WARN")
    src = phab_fixtures.generate(spark, seed=args.fixture_seed)

    now = int(time.time())
    out = run_incremental(spark, src, args.dest, now=now, full=args.full)
    for name, df in out.items():
        if args.debug:
            print(f"== {name} ==")
            df.show(5, truncate=False)
        else:
            print(f"{name}: {df.count()} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
