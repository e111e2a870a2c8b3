"""Rate-family ("counter") dataflow.

The reference computes, per bucket and pointer, rates over consecutive
float-parseable samples: ``(x_{i+1} - x_i) / ((t_{i+1} - t_i)/1e9)`` per
second, skipping unparseable samples and dropping NaN/Inf pairs (reference
query.go:358-405). The pair straddling a bucket boundary is attributed to
the *earlier* sample's bucket (the reference feeds the next bucket's first
document into the current bucket's stream as a lookahead,
query.go:192-194,270-276).

Spark-first expression: a ``lead()`` window over ts order on the parseable
samples, then a re-bucket + hash aggregate. The window is partitioned by
the query's series columns — per series this reproduces the reference's
single-database stream. (A query with no series columns runs the window in
a single partition; at cluster scale callers should always provide series
columns, which is also the reference's own model: one couchstore file = one
series.)

Deviation (documented, strictly-more-complete): the reference only pairs a
bucket's last sample with the *first document* of the next non-empty bucket
— if that specific document is unparseable or filtered, the pair vanishes.
This engine pairs each parseable sample with the *next parseable sample* in
the series, wherever it lives. Both behaviors agree on every corpus where
samples are uniformly parseable (the common counter case and the
reference's own tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from seriesly_spark.functions.bucketing import bucket_ms_col
from seriesly_spark.operators.reducers import REDUCERS


def rate_aggregate(
    base: DataFrame,
    field_indexes: list[int],
    reducers_by_index: dict[int, str],
    aliases_by_index: dict[int, str],
    series_cols: tuple[str, ...],
    group_ms: int,
    exact_sums: bool = False,
) -> DataFrame:
    """Aggregate rate reducers for fields sharing one pointer.

    ``base`` holds ``ts_ns`` and ``nv{i}`` for one representative index
    (all fields in ``field_indexes`` share the same pointer, hence the same
    parseable sample set). Returns one row per (series, bucket_ms) that has
    at least one rate pair.
    """
    i0 = field_indexes[0]
    samples = base.select(
        *series_cols, "ts_ns", F.col(f"nv{i0}").alias("x")
    ).where(F.col("x").isNotNull())

    w = Window.partitionBy(*[F.col(c) for c in series_cols]).orderBy("ts_ns")
    paired = samples.select(
        *series_cols,
        "ts_ns",
        "x",
        F.lead("ts_ns").over(w).alias("next_ts_ns"),
        F.lead("x").over(w).alias("next_x"),
    )
    rate = (F.col("next_x") - F.col("x")) / (
        (F.col("next_ts_ns") - F.col("ts_ns")) / F.lit(1e9)
    )
    rates = (
        paired.withColumn("rate", rate)
        .where(
            F.col("rate").isNotNull()
            & ~F.isnan("rate")
            & (F.abs("rate") != F.lit(float("inf")))
        )
        .withColumn("bucket_ms", bucket_ms_col(F.col("ts_ns"), group_ms))
    )
    aggs = []
    for i in field_indexes:
        spec = REDUCERS[reducers_by_index[i]]
        # rate{i} aliases the shared pair column for the spec's SQL.
        expr = spec.rate_sql(i, exact_sums).replace(f"rate{i}", "rate")
        aggs.append(F.expr(expr).alias(aliases_by_index[i]))
    return rates.groupBy(*series_cols, "bucket_ms").agg(*aggs)
