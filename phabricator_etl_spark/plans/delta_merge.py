"""Delta Lake MERGE INTO seam for the incremental runner (SURVEY.md §2.9 S5).

The reference upserts via BigQuery MERGE (stats.py:896-939). This engine's
portable form is the join-rewrite in incremental_runner.merge_upsert
(`target LEFT ANTI staging UNION staging`), which is exactly the plan a
whole-row Delta MERGE compiles to. Where delta-spark IS installed, a real
ACID `MERGE INTO` is strictly better at scale: it rewrites only the files
containing matched keys (data-skipping on the merge key), gives concurrent
readers snapshot isolation, and removes the staging-table dance (S3/S6/S7)
entirely.

This module is the seam: `delta_available()` gates everything; `merge_into`
runs a real Delta MERGE keyed like MERGE_KEYS when the package is present;
tests/test_delta_merge.py asserts Delta MERGE == join-rewrite on the same
inputs (skipped, with the reason visible, where delta-spark is absent —
the build container does not ship it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    return True


def get_delta_spark(app_name: str = "delta-merge"):
    """A SparkSession with the Delta extension + catalog wired in; raises
    ImportError where delta-spark is absent (callers gate on
    delta_available())."""
    from delta import configure_spark_with_delta_pip  # type: ignore[import-not-found]
    from pyspark.sql import SparkSession

    from ..session import default_parallelism

    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config("spark.sql.catalog.spark_catalog", "org.apache.spark.sql.delta.catalog.DeltaCatalog")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return configure_spark_with_delta_pip(builder).getOrCreate()


def merge_into(spark: SparkSession, target_path: str, staging: DataFrame, key: str) -> None:
    """Whole-row upsert via Delta MERGE INTO: matched -> UPDATE SET *,
    not matched -> INSERT *. Semantically identical to
    incremental_runner.merge_upsert for a staging batch already deduped to
    one row per key (dedup_latest) — the equivalence the test asserts."""
    from delta.tables import DeltaTable  # type: ignore[import-not-found]

    if not DeltaTable.isDeltaTable(spark, target_path):
        staging.write.format("delta").mode("overwrite").save(target_path)
        return
    tgt = DeltaTable.forPath(spark, target_path)
    (
        tgt.alias("t")
        .merge(staging.alias("s"), f"t.{key} = s.{key}")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
