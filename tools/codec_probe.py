#!/usr/bin/env python
"""Shuffle-codec A/B probe (guide §2.3: "There is no universal answer —
measure shuffle bytes written and stage time with each").

Fixture-independent synthetic shuffle at a volume where the codec has
discriminating power (GBs — the sf0.1 bench entries shuffle KBs-MBs, where
any codec delta drowns in noise): a full keyed repartition of a
realistic mixed-entropy payload (compressible prose prefix + hex-entropy
tail), consumed by the noop sink (guide §1.4) so every byte is computed
and shuffled but nothing is written.

One arm per PROCESS: spark.io.compression.codec is read at SparkContext
start and this repo's sessions reuse the first JVM. The driver loop
interleaves arms round-robin so host drift lands on both arms equally
(the change-1 retraction lesson: unpaired arms measure the host).

Usage:
    python tools/codec_probe.py --codec lz4  --rows 30000000   # one arm, one round
    python tools/codec_probe.py --ab --rounds 3                # interleaved A/B
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_arm(codec: str, rows: int, reps: int) -> dict:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = (
        SparkSession.builder.appName(f"codec-probe-{codec}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.io.compression.codec", codec)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # JIT/codegen warm-up, no shuffle
    spark.range(20_000_000).selectExpr("sum(id * 3 + (id & 7))").collect()

    # ~150 B/row: compressible prose + per-row low-cardinality tokens +
    # a 64-hex-char entropy tail — the mixed profile of the engine's text /
    # transaction shuffles, where codec ratio differences actually show.
    df = (
        spark.range(rows)
        .select(
            F.col("id"),
            F.concat(
                F.lit("revision comment body with ordinary prose words "),
                (F.col("id") % 997).cast("string"),
                F.lit(" status accepted reviewer "),
                (F.col("id") % 31).cast("string"),
                F.sha2(F.col("id").cast("string"), 256),
            ).alias("payload"),
            F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("k"),
        )
        .repartition(F.col("k"))
    )
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    return {"codec": codec, "rows": rows, "best_s": round(best, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec", default=None)
    ap.add_argument("--rows", type=int, default=30_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--ab", action="store_true")
    ap.add_argument("--rounds", type=int, default=3)
    a = ap.parse_args()

    if not a.ab:
        print(json.dumps(run_arm(a.codec or "lz4", a.rows, a.reps)))
        return

    results: dict[str, list[float]] = {"lz4": [], "zstd": []}
    for rnd in range(a.rounds):
        for codec in ("lz4", "zstd"):
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--codec",
                    codec,
                    "--rows",
                    str(a.rows),
                    "--reps",
                    str(a.reps),
                ],
                capture_output=True,
                text=True,
                cwd=REPO,
            )
            line = out.stdout.strip().splitlines()[-1]
            rec = json.loads(line)
            results[codec].append(rec["best_s"])
            print(f"# round {rnd} {codec}: {rec['best_s']}s", file=sys.stderr)
    print(json.dumps({"rows": a.rows, "reps": a.reps, "rounds": a.rounds, "results": results}))


if __name__ == "__main__":
    main()
