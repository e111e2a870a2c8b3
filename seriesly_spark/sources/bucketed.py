"""Bucketed table layout — pre-shuffled storage for co-located joins and
aggregations.

At 100 TB the dominant cost of per-user operators (sessionize, as-of
alignment, per-user joins/apply) is the shuffle on ``user_id``. Bucketing
pays that shuffle ONCE at write time: ``bucketBy(n, key)`` hash-partitions
rows into a fixed bucket count recorded in the catalog, so every
subsequent groupBy/join/window on the key reads the existing distribution
and Catalyst drops the Exchange (and, with ``sortBy``, the Sort) from the
plan entirely. Two tables bucketed the same way join with ZERO shuffle on
either side.

This is the Spark-native analogue of the reference's one-DB-per-series
layout (each seriesly database is its own couchstore file — reference
database.go:85-134 — so per-series work never re-partitions); here the
same locality is declared per key column instead of per database.

Spark requires the session catalog for bucketing metadata (a bare
``.parquet(path)`` write cannot record bucket info), so tables are written
with ``saveAsTable`` + an explicit ``path`` when the data must live
outside the warehouse directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: "str | list[str]",
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_col`` (one column or a
    list — joins drop their Exchange only when the bucket columns
    EXACTLY match the join keys: requireAllClusterKeysForCoPartition)
    into ``n_buckets`` buckets (optionally sorted within each bucket
    file), registered as ``table`` in the session catalog. Choose
    ``n_buckets`` so one bucket of the largest table fits an executor's
    working memory — buckets are the post-scan parallelism for
    bucket-local stages."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = df.write.format("parquet").bucketBy(n_buckets, *cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.mode("overwrite").saveAsTable(table)


def load_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (the bucket spec
    only applies via the catalog read path)."""
    return spark.table(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
