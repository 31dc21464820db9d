"""Incremental ETL runner: the reference's full protocol end to end.

process() in the reference (stats.py:1094-1164) per run: read the
destination's MAX(date_modified) watermark -> filter sources to changed
revisions -> build rows -> stage -> monthly MERGE with recency-winner dedup.
This module is the Spark-native runner: same watermark semantics, the merge
as the deterministic join-rewrite, the month unit as a ym partition column,
crash-safety from write atomicity instead of staging tables (S3/S6/S7
disappear — Delta MERGE INTO is the drop-in upgrade where available).

The invariant tests/test_incremental_runner.py checks is the one that
matters: incremental run over (old ∪ new) == full recompute over the same
world, for any split point — the property the reference's protocol is
designed to deliver but never tests.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..sources.phab_fixtures import PhabSources
from . import phab_pipelines as P

MERGE_KEYS = {  # merge key + recency column per table (stats.py:976-984)
    "revisions": ("revision_id", "date_modified"),
    "diffs": ("diff_id", "date_created"),
    "changesets": ("changeset_id", None),
    "comments": ("comment_id", "date_created"),
    "review_requests": ("review_id", "date_modified"),
    "transactions": ("transaction_id", "date_created"),
    "review_groups": ("group_id", None),
    "project_transactions": ("transaction_id", "date_created"),
}

# snapshot tables are fully recomputed every run (stats.py:1125-1138)
SNAPSHOT_TABLES = {"review_groups", "project_transactions"}


def _dest_exists(spark: SparkSession, path: str) -> bool:
    """Cluster-correct existence probe via the Hadoop FS API (file://,
    hdfs://, s3a:// alike). Probing with a failing ``spark.read.parquet``
    instead would store a PATH_NOT_FOUND analysis error that Spark 4's
    ObservationManager listener re-raises into the log on every first run
    (ERROR ExecutionListenerBus) — probe the filesystem, not the analyzer."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def read_watermark(spark: SparkSession, dest_dir: str) -> int | None:
    """S2: MAX(date_modified) of the loaded revisions table; None on first
    run (destination absent/empty)."""
    path = os.path.join(dest_dir, "revisions")
    if not _dest_exists(spark, path):
        return None
    try:
        df = spark.read.parquet(path)
    except Exception:
        return None
    row = df.agg(F.max("date_modified").alias("wm")).collect()[0]
    return row.wm


def filter_changed_revisions(src: PhabSources, last_run: int | None, now: int) -> PhabSources:
    """P6: the reference's get_time_queries window — revisions created or
    modified in (last_run, now). Downstream tables follow their revision
    (the reference processes per changed revision), so only the revision
    table needs the filter; joins prune the rest."""
    cond = (F.col("dateCreated") < now) | (F.col("dateModified") < now)
    if last_run is not None:
        cond = cond & ((F.col("dateCreated") > last_run) | (F.col("dateModified") > last_run))
    filtered = src.revision.filter(cond)
    return PhabSources(**{**src.__dict__, "revision": filtered})


def expand_by_stack_component(
    src: PhabSources, changed: PhabSources, comp: DataFrame | None = None
) -> PhabSources:
    """Graph-aware invalidation — a deliberate IMPROVEMENT on the reference.

    The reference recomputes stack_size only for CHANGED revisions, so an
    unchanged revision keeps a stale stack_size when a new revision joins
    its dependency stack (inherent to its per-revision protocol). This
    engine widens the changed set to every revision sharing a same-bug
    dependency component with a changed one, so stack_size is always
    current and incremental == full recompute. The expansion is one join
    against the CC labels already needed for stack_size — free at scale.
    Pass `comp` to reuse an already-materialized component table (the
    runner shares ONE CC pass between this expansion and stack_sizes)."""
    if comp is None:
        comp = P.stack_components(src)
    changed_phids = changed.revision.select(F.col("phid").alias("rev_phid"))
    hot = (
        comp.join(changed_phids, "rev_phid")
        .select("component")
        .distinct()
    )
    expanded_phids = (
        comp.join(hot, "component")
        .select("rev_phid")
        .unionByName(changed_phids)
        .distinct()
        .withColumnRenamed("rev_phid", "phid")
    )
    expanded = src.revision.join(expanded_phids, "phid")
    return PhabSources(**{**src.__dict__, "revision": expanded})


def dedup_latest(df: DataFrame, key: str, recency: str | None) -> DataFrame:
    """W2: one winner per merge key. With a recency column the latest wins
    (max recency; ties broken by the full remaining tuple — strictly more
    deterministic than the reference's ORDER BY (SELECT NULL),
    stats.py:918); without one the full remaining tuple decides
    (SURVEY §7.8).

    Implemented as a struct-max_by aggregation rather than the
    ROW_NUMBER-over-window form (r10 optimization, guide §2.3): the
    aggregate does PARTIAL (map-side) combination, so duplicate keys
    collapse before the exchange, and max_by (a TypedImperativeAggregate)
    plans as ObjectHashAggregate — no Sort on either side of the exchange,
    where the window form paid Exchange+Sort+Window and a plain max(struct)
    would fall back to SortAggregate. Struct comparison orders
    field-by-field (recency first), with NULL low — identical winner choice
    to the desc-NULLS-LAST window wherever recency differs, and a
    deterministic full-tuple tiebreak where it doesn't."""
    rest = [c for c in df.columns if c != key]
    if recency:
        ordered = [recency] + [c for c in rest if c != recency]
    else:
        ordered = rest
    win = df.groupBy(key).agg(
        F.max_by(F.struct(*ordered), F.struct(*ordered)).alias("__w")
    )
    return win.select(key, *[F.col(f"__w.{c}").alias(c) for c in ordered]).select(*df.columns)


def merge_upsert(target: DataFrame | None, staging: DataFrame, key: str) -> DataFrame:
    """S5 join-rewrite: matched -> replaced by staging, unmatched target
    kept, new staging keys inserted. Delta MERGE INTO compiles to the same
    plan for whole-row updates."""
    if target is None:
        return staging
    return target.join(staging.select(key), key, "left_anti").unionByName(staging)


# Wall-clock decomposition of every run_incremental call, appended per run
# (r6 verdict #7: the e2e bench entry moved +30% r5->r6 and the phases were
# not separable from the one total). bench.py snapshots this around the
# etl_e2e_* entries and writes it to BENCH_DETAIL.json; it costs five
# perf_counter() reads per run, nothing more. The branch_* keys are wall
# time INSIDE the concurrent merge pool, so they overlap each other and sum
# to more than merge_write_wall.
PHASE_LOG: list[dict[str, float]] = []


def run_incremental(
    spark: SparkSession,
    src: PhabSources,
    dest_dir: str,
    *,
    now: int,
    full: bool = False,
) -> dict[str, DataFrame]:
    """One ETL run. Returns the post-merge tables (also written to dest_dir,
    revisions ym-partitioned per SURVEY §4.4)."""
    phases: dict[str, float] = {}
    t_phase = time.perf_counter()
    last_run = None if full else read_watermark(spark, dest_dir)
    world = filter_changed_revisions(src, last_run, now)
    # ONE materialized CC pass feeds both the graph-aware invalidation and
    # stack_sizes (previously two independent fixpoints per run — the
    # single biggest cost in the e2e profile). This is the staged-artifact
    # shape a production run uses: components are computed once per batch
    # and consumed by every downstream step.
    comp = P.stack_components(src).localCheckpoint(eager=True)
    phases["watermark_and_cc"] = round(time.perf_counter() - t_phase, 3)
    t_phase = time.perf_counter()
    world = expand_by_stack_component(src, world, comp=comp)
    # Materialize the INVALIDATION SET once: every one of the eight table
    # builds hangs off the expanded revision table, and without this each
    # branch would re-run the CC-label join + distinct that computes it.
    # The expanded set is the changed subset (small by construction), so
    # this is cheap to pin and is the staged-artifact shape a production
    # batch uses — invalidation computed once, consumed by every build.
    expanded = world
    with ThreadPoolExecutor(max_workers=5) as pool:
        f_rev = pool.submit(lambda: expanded.revision.localCheckpoint(eager=True))
        # The user/project/repo dims are broadcast-small and shared by up
        # to five branches each — pin them too so concurrent branches
        # don't each rebuild the dim scans. All four pins are independent
        # jobs; submit them together.
        f_users = pool.submit(lambda: P.dim_users(expanded).localCheckpoint(eager=True))
        f_projects = pool.submit(lambda: P.dim_projects(expanded).localCheckpoint(eager=True))
        f_repos = pool.submit(lambda: P.dim_repositories(expanded).localCheckpoint(eager=True))
        users, projects, repos = f_users.result(), f_projects.result(), f_repos.result()
        world = PhabSources(**{**expanded.__dict__, "revision": f_rev.result()})
    phases["expand_and_pin_dims"] = round(time.perf_counter() - t_phase, 3)
    t_phase = time.perf_counter()
    # stack sizes come from the FULL graph (the filtered world can't see
    # unchanged stack members — stats.py:1117-1119 queries all_revisions)
    full_stacks = P.stack_sizes_from_components(src, comp)
    built = {
        "revisions": P.build_revisions(world, repos, projects, stacks=full_stacks),
        "diffs": P.build_diffs(world, users),
        "changesets": P.build_changesets(world),
        "comments": P.build_comments(world, users),
        "review_requests": P.build_review_requests(world, users, projects),
        "transactions": P.build_transactions(world, users, projects),
        # snapshots run over the UNFILTERED world every time; the pinned
        # user/project dims are safe to share — they read only the
        # user/user_email/project tables, which the changed-revision filter
        # never touches (src and the expanded world agree on them)
        "review_groups": P.build_review_groups(src, users),
        "project_transactions": P.build_project_transactions(src, users, projects),
    }

    def _merge_and_write(name: str, df: DataFrame) -> DataFrame:
        t_branch = time.perf_counter()
        key, recency = MERGE_KEYS[name]
        staging = dedup_latest(df, key, recency)
        path = os.path.join(dest_dir, name)
        target = None
        if name not in SNAPSHOT_TABLES and _dest_exists(spark, path):
            # the stored revisions table carries its ym partition column;
            # strip it so target and staging schemas line up for the merge
            try:
                target = spark.read.parquet(path).drop("ym")
            except Exception:
                # the path exists but holds no readable parquet (e.g. a
                # killed previous run left an empty/partial dir): treat
                # as first run rather than failing the whole batch. The
                # failed read does leave one ExecutionListenerBus log
                # line (the Spark 4 ObservationManager gotcha) — fine
                # for this corruption-recovery arm, which the happy path
                # never enters thanks to the FS-API probe above.
                target = None
        merged = staging if target is None else merge_upsert(target, staging, key)
        if name == "revisions":
            merged = merged.withColumn(
                "ym", F.date_format(F.timestamp_seconds("date_modified"), "yyyy-MM")
            )
        # r10 optimization (guide §2.4/§5): the old path localCheckpointed
        # `merged` before every write — a full extra materialization of every
        # table on every run — because the merge plan may READ the very path
        # it overwrites. Instead, write straight to the destination when
        # nothing reads it (first run / snapshot overwrite), and otherwise
        # write to a sibling tmp dir while the old files stay readable, then
        # swap. One materialization either way, and the swap is MORE
        # crash-safe than checkpoint+overwrite (the old table stays complete
        # until the new one is fully written).
        write_path = path if target is None else path + "__stage"
        writer = merged.write.mode("overwrite")
        if name == "revisions":
            writer = writer.partitionBy("ym")
        writer.parquet(write_path)
        if write_path != path:
            jvm_path = spark._jvm.org.apache.hadoop.fs.Path
            fs = jvm_path(path).getFileSystem(spark._jsc.hadoopConfiguration())
            fs.delete(jvm_path(path), True)
            if not fs.rename(jvm_path(write_path), jvm_path(path)):
                raise IOError(f"rename {write_path} -> {path} failed")
        phases[f"branch_{name}"] = round(time.perf_counter() - t_branch, 3)
        return spark.read.parquet(path)

    # The eight table branches are independent (distinct dest paths, shared
    # inputs all read-only) — submit them as CONCURRENT Spark jobs from a
    # thread pool instead of ~17 serial driver round-trips. On local[32]
    # this collapses the e2e wall time to the slowest branch; on a real
    # cluster it overlaps each branch's shuffle/write stages the same way
    # (SparkSession job submission is thread-safe; FIFO scheduling lets
    # later jobs use idle slots).
    with ThreadPoolExecutor(max_workers=len(built)) as pool:
        futures = {name: pool.submit(_merge_and_write, name, df) for name, df in built.items()}
        out = {name: fut.result() for name, fut in futures.items()}
    phases["merge_write_wall"] = round(time.perf_counter() - t_phase, 3)
    phases["full" if full else "incremental"] = 1.0
    PHASE_LOG.append(phases)
    return out
