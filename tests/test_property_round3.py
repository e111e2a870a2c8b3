"""Property tests for the round-3 numeric operators: invariants a
brute-force Python reference can check on randomized micro-inputs
(bounds, conservation, determinism) — the failure modes hand-picked
examples miss."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from seriesly_spark.operators.analytics import histogram, quantile_transform
from seriesly_spark.operators.textstats import char_entropy
from seriesly_spark.operators.windows import minmax_downsample, time_weighted_avg

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

vals_st = st.lists(
    st.floats(-50, 550, allow_nan=False, allow_infinity=False).map(
        lambda x: round(x, 3)
    ),
    min_size=1,
    max_size=30,
)


@given(vals=vals_st)
@settings(**_SETTINGS)
def test_histogram_conserves_rows_and_respects_bins(spark, vals):
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    out = histogram(df, "v", ["g"], lo=0.0, hi=500.0, bins=10).collect()
    assert sum(r.cnt for r in out) == len(vals)  # every row lands somewhere
    assert all(0 <= r.bin <= 9 for r in out)
    for r in out:
        assert r.bin_lo == round(r.bin * 50.0, 6)


@given(
    samples=st.lists(
        st.tuples(
            st.integers(0, 299_999_999),  # ts_us inside a 5-bucket range
            st.floats(-10, 10, allow_nan=False, allow_infinity=False).map(
                lambda x: round(x, 3)
            ),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
@settings(**_SETTINGS)
def test_twa_is_bounded_by_bucket_extremes(spark, samples):
    df = spark.createDataFrame(
        [("g", ts, i, v) for i, (ts, v) in enumerate(samples)],
        "g string, ts_us long, event_id long, v double",
    )
    out = time_weighted_avg(
        df, ["g"], "ts_us", "v", bucket_ms=60_000, tiebreak_col="event_id"
    ).collect()
    by_bucket = {}
    for ts, v in samples:
        by_bucket.setdefault(ts // 60_000_000, []).append(v)
    for r in out:
        vs = by_bucket[r.bucket_ms // 60_000]
        assert min(vs) - 1e-6 <= r.twa <= max(vs) + 1e-6


@given(vals=vals_st)
@settings(**_SETTINGS)
def test_minmax_downsample_matches_python(spark, vals):
    rows = [("g", i * 1000, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, ts_us long, v double")
    out = minmax_downsample(df, ["g"], "ts_us", "v", bucket_ms=1_000_000)
    for r in out.collect():
        in_bucket = [
            (v, t) for _, t, v in rows if t // 1_000_000_000 * 1000 == r.bucket_ms
        ]
        assert (r.min_v, r.min_ts_us) == min(in_bucket)
        assert (r.max_v, r.max_ts_us) == max(in_bucket)


@given(
    texts=st.lists(
        st.text(alphabet="abcd ", min_size=1, max_size=40).filter(str.strip),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_char_entropy_bounds(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in char_entropy(df).collect():
        assert r.n_chars == len(texts[r.doc_id])
        assert -1e-6 <= r.entropy <= math.log2(max(r.n_distinct_chars, 1)) + 1e-6


@given(vals=vals_st)
@settings(**_SETTINGS)
def test_quantile_transform_is_monotone_in_value(spark, vals):
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)],
        "event_id long, g string, v double",
    )
    out = quantile_transform(df, "v", ["g"], ["event_id"]).collect()
    ranked = sorted(((r.v, r.pct_rank) for r in out))
    assert all(0.0 <= p <= 1.0 for _, p in ranked)
    for (v1, p1), (v2, p2) in zip(ranked, ranked[1:]):
        assert p1 <= p2  # monotone
        if v1 == v2:
            assert p1 == p2  # ties share ranks
