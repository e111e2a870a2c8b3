"""Property tests: the query compiler vs a brute-force Python reference.

The brute force reimplements the reference's semantics directly from
SURVEY §2.2/§2.3 (bucket existence from doc presence; numeric reducers over
float-parseable values; rate pairs over consecutive parseable samples in ts
order, attributed to the earlier sample's bucket, NaN/Inf pairs dropped) —
~40 lines of obvious Python, no Spark, no SQL. Hypothesis drives randomized
streams with duplicate timestamps, unparseable values, nils, and mixed
types through both implementations.
"""

import json
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from seriesly_spark.plans.query import SerieslyQuery, seriesly_query

GROUP_MS = 10_000  # 10s buckets
GROUP_NS = GROUP_MS * 1_000_000

# Values: JSON numbers, numeric strings, junk strings, nulls.
value_st = st.one_of(
    st.integers(-1000, 1000),
    st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False).map(
        lambda x: round(x, 3)
    ),
    st.integers(-50, 50).map(str),
    st.sampled_from(["abc", "", "12px"]),
    st.none(),
)

event_st = st.tuples(
    st.integers(0, 60 * 1_000_000_000),  # ts_ns within a minute => ~6 buckets
    value_st,
)

stream_st = st.lists(event_st, min_size=1, max_size=40)


def _parse(v):
    """Reference convertTofloat64: strings parseable as float; numbers."""
    if v is None or isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    try:
        return float(v)
    except ValueError:
        return None


def brute_force(stream):
    """(bucket_ms -> dict of reducer results) per the reference semantics."""
    out = {}
    for ts, v in stream:
        b = (ts // GROUP_NS) * GROUP_MS
        out.setdefault(b, {"vals": [], "nums": []})
        if v is not None:
            out[b]["vals"].append(v)
        n = _parse(v)
        if n is not None:
            out[b]["nums"].append(n)
    # rate pairs: consecutive parseable samples in (ts, value-arrival) order
    samples = sorted(
        [(ts, _parse(v)) for ts, v in stream if _parse(v) is not None]
    )
    rates = {}
    for (t1, x1), (t2, x2) in zip(samples, samples[1:]):
        if t2 == t1:
            continue  # dt=0 -> Inf/NaN pair, dropped
        r = (x2 - x1) / ((t2 - t1) / 1e9)
        rates.setdefault((t1 // GROUP_NS) * GROUP_MS, []).append(r)
    res = {}
    for b, d in out.items():
        nums, rs = d["nums"], rates.get(b, [])
        res[b] = {
            "cnt": len(d["vals"]),
            "sum": sum(nums) if nums else 0.0,
            "min": min(nums) if nums else None,
            "max": max(nums) if nums else None,
            "avg": (sum(nums) / len(nums)) if nums else None,
            "c": sum(rs) if rs else 0.0,
            "c_min": min(rs) if rs else None,
            "c_max": max(rs) if rs else None,
        }
    return res


def _close(a, b, tol=1e-6):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    return a == b


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(stream=stream_st)
def test_bucket_and_rate_math_matches_brute_force(spark, stream):
    # Duplicate timestamps collapse nondeterministically in the rate pairing
    # (both engine and brute force order by ts only); keep ts unique per doc
    # except intentionally equal *parseable* pairs, which both drop. To stay
    # simple: make ts unique by index when the value is parseable dup.
    seen = {}
    uniq = []
    for ts, v in stream:
        while ts in seen:
            ts += 1
        seen[ts] = True
        uniq.append((ts, v))

    rows = [(ts, json.dumps({"k": v})) for ts, v in uniq]
    df = spark.createDataFrame(rows, "ts_ns long, props string")
    q = SerieslyQuery(
        group_ms=GROUP_MS,
        fields=[
            ("/k", "count"), ("/k", "sum"), ("/k", "min"), ("/k", "max"),
            ("/k", "avg"), ("/k", "c"), ("/k", "c_min"), ("/k", "c_max"),
        ],
        aliases=["cnt", "sum", "min", "max", "avg", "c", "c_min", "c_max"],
    )
    got = {
        r["bucket_ms"]: r.asDict()
        for r in seriesly_query(df, q, doc_col="props", ts_ns_col="ts_ns").collect()
    }
    want = brute_force(uniq)

    assert set(got) == set(want), "bucket existence must follow doc presence"
    for b, w in want.items():
        g = got[b]
        for k in ("cnt", "sum", "min", "max", "avg", "c", "c_min", "c_max"):
            assert _close(g[k], w[k]), (b, k, g[k], w[k], uniq)
