"""Tests for P8 (query deadline) and C1 (result memoization)."""

import json
import time

import pytest
from pyspark.sql import functions as F

from seriesly_spark.db import SerieslyDB
from seriesly_spark.plans.cache import QueryCache, db_version
from seriesly_spark.plans.limits import QueryTimeout, run_with_timeout
from seriesly_spark.plans.query import SerieslyQuery


class TestTimeout:
    def test_fast_query_unaffected(self, spark):
        df = spark.range(1000)
        assert run_with_timeout(spark, lambda: df.count(), 60.0) == 1000

    def test_slow_query_cancelled(self, spark):
        # A deliberately slow job: per-row sleep via a Python UDF.
        slow = spark.range(64).repartition(4).select(
            F.udf(lambda x: time.sleep(2) or x, "long")("id").alias("id")
        )
        t0 = time.monotonic()
        with pytest.raises(QueryTimeout):
            # collect() (not count()) so the sleeping UDF column can't be
            # pruned out of the plan.
            run_with_timeout(spark, lambda: slow.collect(), 2.0)
        # Cancelled well before the ~32s the job would need.
        assert time.monotonic() - t0 < 20

    def test_errors_pass_through(self, spark):
        bad = spark.range(10).select(F.expr("assert_true(id < 5)"))
        with pytest.raises(Exception) as ei:
            run_with_timeout(spark, lambda: bad.collect(), 60.0)
        assert not isinstance(ei.value, QueryTimeout)


class TestQueryCache:
    @pytest.fixture()
    def dbs(self, spark, tmp_path):
        d = SerieslyDB(spark, str(tmp_path / "dbroot"))
        d.create("t")
        d.write_batch(
            "t",
            [
                ("2024-01-01T00:00:00Z", json.dumps({"v": 1})),
                ("2024-01-01T00:10:00Z", json.dumps({"v": 2})),
            ],
        )
        return d

    def _q(self):
        return SerieslyQuery(
            group_ms=3_600_000, fields=[("/v", "sum")], aliases=["s"]
        )

    def test_hit_after_miss(self, dbs, tmp_path):
        qc = QueryCache(dbs, str(tmp_path / "cache"))
        r1 = qc.query("t", self._q()).collect()
        r2 = qc.query("t", self._q()).collect()
        assert (qc.misses, qc.hits) == (1, 1)
        assert r1 == r2
        assert r1[0].s == 3.0

    def test_write_invalidates(self, dbs, tmp_path):
        qc = QueryCache(dbs, str(tmp_path / "cache"))
        v0 = db_version(dbs, "t")
        assert qc.query("t", self._q()).collect()[0].s == 3.0
        dbs.write("t", json.dumps({"v": 10}), ts="2024-01-01T00:20:00Z")
        assert db_version(dbs, "t") != v0
        assert qc.query("t", self._q()).collect()[0].s == 13.0
        assert (qc.misses, qc.hits) == (2, 0)

    def test_different_query_different_entry(self, dbs, tmp_path):
        qc = QueryCache(dbs, str(tmp_path / "cache"))
        qc.query("t", self._q())
        q2 = SerieslyQuery(
            group_ms=3_600_000, fields=[("/v", "count")], aliases=["n"]
        )
        assert qc.query("t", q2).collect()[0].n == 2
        assert (qc.misses, qc.hits) == (2, 0)

    def test_compact_invalidates(self, dbs, tmp_path):
        qc = QueryCache(dbs, str(tmp_path / "cache"))
        qc.query("t", self._q())
        dbs.compact("t")
        qc.query("t", self._q())
        assert (qc.misses, qc.hits) == (2, 0)
