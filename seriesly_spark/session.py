"""SparkSession factory tuned for this engine.

Local test/bench runs use local[N] (single JVM); the configs are chosen so
the same code scales to a multi-executor cluster: AQE on (runtime shuffle
re-planning, skew-join splitting), shuffle partitions sized to cores locally
(cluster deployments should raise this to ~2-3x total cores or rely on AQE
coalescing), UTC session timezone so results are oracle-comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "seriesly-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The driver's events.parquet stores ts as TIMESTAMP(NANOS), which
        # Spark's vectorized reader otherwise rejects; reading it as a LONG
        # of ns-since-epoch is exactly the engine's ts_ns representation.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # NOTE: spark.sql.files.ignoreMissingFiles is deliberately NOT
        # set session-wide. Only the changes-feed FileStreamSource races
        # in-place maintenance (delete_range / compact dropping files it
        # already listed), and only that reader opts in per-source
        # (db.changes sets the reader option). Batch reads stay
        # fail-fast: a vanished file under a batch scan is data loss or
        # a maintenance bug and must surface as an error, not silently
        # truncate results.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
