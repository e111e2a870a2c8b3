"""Shared plan-shaping helpers for the operator library."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the input
    arrives in fewer partitions (e.g. one small parquet file) and the next
    stage does expensive per-row compute (hashing, signatures, projections).

    At real scale this is a no-op — a 100 TB scan already yields far more
    partitions than cores — but without it a compact input serializes an
    embarrassingly parallel stage onto one core. The round-robin shuffle it
    inserts moves only the raw rows, which is strictly cheaper than leaving
    (cores - 1) of the cluster idle through the compute stage.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
