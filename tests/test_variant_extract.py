"""The opt-in Variant extraction path (``extract_impl="variant"`` /
``SERIESLY_EXTRACT_IMPL=variant``) must produce the SAME results as the
default ``get_json_object`` path on every gate query that goes through
``seriesly_query`` — plus targeted parity on the pointer shapes the
reference exercises (nested arrays, RFC 6901 escapes, string numbers,
structural values, filters). Documented deviations (Variant number
normalization of ``-0.0``/trailing ``.0``, sorted object keys) are pinned
by test_known_deviations so they cannot silently widen.
"""

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from seriesly_spark.plans.query import SerieslyQuery, seriesly_query

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_DOCS = [
    (1_000_000_000_000_000_000, '{"kind": "a", "nested": {"arr": [{"v": 3}, {"v": 4}]}, "a/b": 1, "m~n": "x", "obj": {"k": 1}}'),
    (1_000_000_001_000_000_000, '{"kind": "b", "nested": {"arr": [{"v": "12"}]}, "s": "42"}'),
    (1_000_000_002_000_000_000, '{"kind": "a", "other": null}'),
]


def _both(spark, q, **kw):
    df = spark.createDataFrame(_DOCS, "ts_ns long, doc string")
    j = seriesly_query(df, q, doc_col="doc", ts_ns_col="ts_ns",
                       extract_impl="json", **kw)
    v = seriesly_query(df, q, doc_col="doc", ts_ns_col="ts_ns",
                       extract_impl="variant", **kw)
    return j.collect(), v.collect()


def test_pointer_shapes_parity(spark):
    q = SerieslyQuery(
        group_ms=86_400_000,
        fields=[
            ("/kind", "distinct"),
            ("/nested/arr/0/v", "sum"),
            ("/nested/arr/1/v", "count"),
            ("/a~1b", "count"),
            ("/m~0n", "any"),
            ("/s", "identity"),
            ("_id", "any"),
        ],
    )
    j, v = _both(spark, q)
    assert j == v


def test_filter_parity(spark):
    q = SerieslyQuery(
        group_ms=86_400_000,
        fields=[("/kind", "count"), ("/nested/arr/0/v", "identity")],
        filters=[("/kind", "a")],
    )
    j, v = _both(spark, q)
    assert j == v


def test_structural_values_skip_filters_both_impls(spark):
    # A filter against a structural value must fail the doc on both paths
    # (reference query.go:112-128: only scalars compare).
    q = SerieslyQuery(
        group_ms=86_400_000,
        fields=[("/obj", "count")],
        filters=[("/obj", '{"k":1}')],
    )
    j, v = _both(spark, q)
    assert j == v
    assert j[0]["count_0"] == 0


GATE_QUERIES = [
    "s01_range_read", "p03_eq_filter", "p05_bucket_agg",
    "r01_list_reducers", "r02_obj_keys", "r03_rate_family",
    "p01_multi_pointer",
]


@pytest.mark.parametrize("name", GATE_QUERIES)
def test_gate_queries_same_under_variant_flag(spark, monkeypatch, name):
    qfn = entry_mod.queries()[name]
    base = sorted(map(tuple, qfn(spark, SF_DIR).collect()))
    monkeypatch.setenv("SERIESLY_EXTRACT_IMPL", "variant")
    flagged = sorted(map(tuple, qfn(spark, SF_DIR).collect()))
    assert base == flagged


def test_known_deviations(spark):
    """Pin the documented Variant normalizations so the deviation surface
    is explicit: -0.0 loses its sign and 1000000.0 its trailing .0 —
    exactly why the %v fixture queries pin extract_impl='json'."""
    df = spark.createDataFrame(
        [(1, '{"neg": -0.0, "f": 1000000.0}')], "ts_ns long, doc string"
    )
    v = F.parse_json("doc")
    row = df.select(
        F.try_variant_get(v, "$.neg", "string").alias("neg"),
        F.try_variant_get(v, "$.f", "string").alias("f"),
        F.get_json_object("doc", "$.neg").alias("neg_j"),
        F.get_json_object("doc", "$.f").alias("f_j"),
    ).first()
    assert (row.neg, row.f) == ("0", "1000000")
    assert (row.neg_j, row.f_j) == ("-0.0", "1000000.0")
