"""The stream-stream join gate is only meaningful if pairs actually
cross the forced micro-batch boundary — pin that non-vacuity here."""

from pyspark.sql import functions as F

from seriesly_spark.sources.tables import normalize_events
from seriesly_spark.streaming.ingest import (
    _staging_split_ts,
    streaming_join_pairs,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
HORIZON_NS = 3_600_000_000_000


def test_pairs_cross_the_batch_boundary(spark):
    batch = normalize_events(spark.read.parquet(EVENTS))
    mid = _staging_split_ts(batch, "view", "click", HORIZON_NS)
    v = batch.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts_ns").alias("vt")
    )
    c = batch.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts_ns").alias("ct")
    )
    crossing = (
        v.join(c, "user_id")
        .where(
            (F.col("ct") > F.col("vt"))
            & (F.col("ct") <= F.col("vt") + HORIZON_NS)
            & (F.col("vt") <= mid)
            & (F.col("ct") > mid)
        )
        .count()
    )
    assert crossing > 0, "staging split produced no cross-batch pairs"

    out = streaming_join_pairs(
        spark, EVENTS, query_name="stream_join_unit"
    )
    total = out.count()
    batch_pairs = (
        v.join(c, "user_id")
        .where(
            (F.col("ct") > F.col("vt"))
            & (F.col("ct") <= F.col("vt") + HORIZON_NS)
        )
        .count()
    )
    # every pair emitted exactly once, including the cross-batch ones
    assert total == batch_pairs
