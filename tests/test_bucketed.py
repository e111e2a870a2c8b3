"""Bucketed layout: the write-time shuffle eliminates read-time exchanges
for aggregations, windows, and co-bucketed self-joins on the bucket key."""

import os
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from seriesly_spark.sources.bucketed import (
    drop_bucketed,
    load_bucketed,
    write_bucketed,
)
from seriesly_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def bucketed_events(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    write_bucketed(
        ev.select("user_id", "event_id", "ts_ns", "value"),
        "t_ev_bucketed",
        "user_id",
        8,
        sort_cols=["user_id", "ts_ns"],
        path=str(tmp_path / "ev"),
    )
    yield load_bucketed(spark, "t_ev_bucketed")
    drop_bucketed(spark, "t_ev_bucketed")


class TestBucketedLayout:
    def test_groupby_on_bucket_key_has_no_exchange(self, spark, bucketed_events):
        agg = bucketed_events.groupBy("user_id").agg(F.sum("value").alias("s"))
        assert "Exchange" not in _plan(agg)

    def test_window_on_bucket_key_has_no_exchange(self, spark, bucketed_events):
        w = Window.partitionBy("user_id").orderBy("ts_ns")
        assert "Exchange" not in _plan(
            bucketed_events.withColumn("rn", F.row_number().over(w))
        )

    def test_cobucketed_self_join_has_no_shuffle(self, spark, bucketed_events):
        # Force a non-broadcast join so co-bucketing (not broadcast) is
        # what eliminates the shuffle.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            left = bucketed_events.alias("l")
            right = load_bucketed(spark, "t_ev_bucketed").alias("r")
            j = left.join(right, "user_id")
            plan = _plan(j)
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_bucketed_results_equal_plain(self, spark, bucketed_events):
        plain = (
            load_table(spark, "/root/testdata/sf0.001", "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("s"))
        )
        b = bucketed_events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("s")
        )
        assert sorted(map(tuple, b.collect())) == sorted(map(tuple, plain.collect()))
