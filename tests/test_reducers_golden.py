"""The reference's own reducer golden table, end-to-end through the query
compiler (reference query_test.go:19-128,135-156 and the edge matrices at
query_test.go:158-240; restated in FIXTURES.md F2).

11 values at 1 s spacing in one bucket plus a boundary value in the next
bucket: the boundary participates ONLY in rate reducers (as the right edge
of the last pair), exactly the reference's lookahead semantics.
"""

import json
import math

import pytest

from seriesly_spark.plans.emit import iter_seriesly_rows
from seriesly_spark.plans.query import SerieslyQuery, seriesly_query

# Bucket-aligned layout: G=11000 ms, t0 = 122477787 * 11000 ms so the 11
# golden values (1 s apart) fill bucket 1 and the boundary "29" lands at
# +11 s = the first instant of bucket 2.
GROUP_MS = 11_000
T0_MS = 122_477_787 * 11_000

GOLDEN_VALUES = [
    '"31"', '"63"', '"foo"', '"17"', '"foo"', '"foo"', '"foo"', '"foo"',
    '{"key":"value1"}', '{"key":"value2"}', '{"key":"value3"}',
]
BOUNDARY = '"29"'

ALL_REDUCERS = [
    "any", "count", "sum", "sumsq", "max", "min", "avg",
    "c", "c_min", "c_avg", "c_max",
    "identity", "distinct", "obj_keys", "obj_distinct_keys",
]

EXPECTED_BUCKET1 = {
    "any": "31",
    "count": 11,
    "sum": 111.0,
    "sumsq": 5219.0,
    "max": 63.0,
    "min": 17.0,
    "avg": 37.0,
    "c": 10.5,
    "c_min": -23.0,
    "c_avg": 3.5,
    "c_max": 32.0,
    "obj_keys": ["key", "key", "key"],
    "obj_distinct_keys": ["key"],
}


def _mkdf(spark, values, t0_ms=T0_MS, spacing_ms=1000):
    from datetime import datetime, timezone

    rows = []
    for i, v in enumerate(values):
        ms = t0_ms + i * spacing_ms
        ts = datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).replace(tzinfo=None)
        rows.append((ts, '{"v": %s}' % v if v is not None else "{}"))
    return spark.createDataFrame(rows, "ts timestamp, doc string")


@pytest.fixture(scope="module")
def golden_result(spark):
    df = _mkdf(spark, GOLDEN_VALUES + [BOUNDARY])
    q = SerieslyQuery(
        group_ms=GROUP_MS,
        fields=[("/v", r) for r in ALL_REDUCERS],
        aliases=ALL_REDUCERS,
    )
    out = seriesly_query(df, q).collect()
    return {row["bucket_ms"]: row.asDict() for row in out}


class TestGoldenBucket:
    def test_bucket_keys(self, golden_result):
        assert sorted(golden_result) == [T0_MS, T0_MS + GROUP_MS]

    @pytest.mark.parametrize("reducer", sorted(EXPECTED_BUCKET1))
    def test_scalar_reducers(self, golden_result, reducer):
        got = golden_result[T0_MS][reducer]
        exp = EXPECTED_BUCKET1[reducer]
        if isinstance(exp, float):
            assert got == pytest.approx(exp)
        else:
            assert got == exp

    def test_identity_in_ts_order(self, golden_result):
        got = golden_result[T0_MS]["identity"]
        assert got == [
            "31", "63", "foo", "17", "foo", "foo", "foo", "foo",
            '{"key":"value1"}', '{"key":"value2"}', '{"key":"value3"}',
        ]

    def test_distinct_set(self, golden_result):
        # unordered in the reference; deterministic sorted here
        assert set(golden_result[T0_MS]["distinct"]) == {"foo", "17", "31", "63"}
        assert None not in golden_result[T0_MS]["distinct"]

    def test_boundary_bucket(self, golden_result):
        b2 = golden_result[T0_MS + GROUP_MS]
        assert b2["count"] == 1
        assert b2["sum"] == pytest.approx(29.0)
        assert b2["c"] == 0.0  # single sample, no pair
        assert b2["c_min"] is None


class TestEmptyAndNil:
    """reference query_test.go:158-240: empty stream and [nil] stream."""

    def _run(self, spark, values):
        df = _mkdf(spark, values)
        q = SerieslyQuery(
            group_ms=GROUP_MS,
            fields=[("/v", r) for r in ALL_REDUCERS],
            aliases=ALL_REDUCERS,
        )
        rows = seriesly_query(df, q).collect()
        assert len(rows) == 1
        return rows[0].asDict()

    def test_nil_stream(self, spark):
        got = self._run(spark, ["null"])
        assert got["any"] is None
        assert got["count"] == 0
        assert got["sum"] == 0.0
        assert got["sumsq"] == 0.0
        for r in ("max", "min", "avg", "c_min", "c_avg", "c_max"):
            assert got[r] is None, r
        assert got["c"] == 0.0
        assert got["identity"] == [None]  # [nil] -> [nil]
        assert got["distinct"] == [None]
        assert got["obj_keys"] == []
        assert got["obj_distinct_keys"] == []

    def test_missing_field_stream(self, spark):
        # doc exists but pointer missing -> same as nil value
        got = self._run(spark, [None])  # renders "{}"
        assert got["count"] == 0
        assert got["identity"] == [None]


class TestRateUnits:
    """reference query_test.go:52-96."""

    def test_single_sample_no_pair(self, spark):
        df = _mkdf(spark, ['"20"'])
        q = SerieslyQuery(group_ms=GROUP_MS, fields=[("/v", "c")], aliases=["c"])
        rows = seriesly_query(df, q).collect()
        assert rows[0]["c"] == 0.0

    def test_pair_rate(self, spark):
        # 20 -> 25 over 5 s => 1.0/s
        df = _mkdf(spark, ['"20"', '"25"'], spacing_ms=5000)
        q = SerieslyQuery(
            group_ms=GROUP_MS,
            fields=[("/v", "c"), ("/v", "c_avg")],
            aliases=["c", "c_avg"],
        )
        rows = seriesly_query(df, q).collect()
        assert rows[0]["c"] == pytest.approx(1.0)
        assert rows[0]["c_avg"] == pytest.approx(1.0)

    def test_unparseable_samples_skipped(self, spark):
        # 20, foo, 25: the pair is (20,25) over 10 s => 0.5/s
        df = _mkdf(spark, ['"20"', '"foo"', '"25"'], spacing_ms=5000)
        q = SerieslyQuery(group_ms=60_000, fields=[("/v", "c")], aliases=["c"])
        rows = seriesly_query(df, q).collect()
        assert rows[0]["c"] == pytest.approx(0.5)


class TestFiltersAndBuckets:
    def test_filter_keeps_bucket_alive(self, spark):
        # Two buckets; filter matches docs only in bucket 1. Bucket 2 must
        # still appear with empty-input reducer results (reference derives
        # buckets pre-filter, query.go:264-289).
        values = ['{"v": 1, "site": "a"}', '{"v": 2, "site": "b"}']
        from datetime import datetime, timezone

        rows = []
        for i, doc in enumerate(values):
            ms = T0_MS + i * GROUP_MS  # one doc per bucket
            ts = datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).replace(tzinfo=None)
            rows.append((ts, doc))
        df = spark.createDataFrame(rows, "ts timestamp, doc string")
        q = SerieslyQuery(
            group_ms=GROUP_MS,
            fields=[("/v", "sum"), ("/v", "count"), ("/v", "identity")],
            aliases=["sum", "count", "identity"],
            filters=[("/site", "a")],
        )
        out = {r["bucket_ms"]: r.asDict() for r in seriesly_query(df, q).collect()}
        assert sorted(out) == [T0_MS, T0_MS + GROUP_MS]
        assert out[T0_MS]["sum"] == 1.0 and out[T0_MS]["count"] == 1
        b2 = out[T0_MS + GROUP_MS]
        assert b2["sum"] == 0.0 and b2["count"] == 0 and b2["identity"] == []

    def test_numeric_filter_coercion(self, spark):
        # JSON number 25 must match filter string "25" (%v coercion)
        df = _mkdf(spark, ["25"])
        q = SerieslyQuery(
            group_ms=GROUP_MS,
            fields=[("/v", "count")],
            aliases=["count"],
            filters=[("/v", "25")],
        )
        rows = seriesly_query(df, q).collect()
        assert rows[0]["count"] == 1

    def test_id_pseudo_pointer(self, spark):
        df = _mkdf(spark, ['"1"'])
        q = SerieslyQuery(
            group_ms=GROUP_MS, fields=[("_id", "any")], aliases=["any"]
        )
        rows = seriesly_query(df, q).collect()
        assert rows[0]["any"] == "2012-09-10T05:40:57Z"


class TestEmitter:
    def test_json_object_shape(self, spark):
        df = _mkdf(spark, GOLDEN_VALUES)
        q = SerieslyQuery(
            group_ms=GROUP_MS, fields=[("/v", "sum"), ("/v", "count")],
            aliases=["sum", "count"],
        )
        res = seriesly_query(df, q)
        obj = dict(iter_seriesly_rows(res, ["sum", "count"]))
        assert obj == {str(T0_MS): [111.0, 11]}
