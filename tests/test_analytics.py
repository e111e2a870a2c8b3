"""Semantic edge cases for operators/analytics.py and the linear fill
mode — ordering rules and renormalization behavior the oracle hash
implies but doesn't state."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from seriesly_spark.operators.analytics import (
    cohort_retention,
    ewma,
    funnel_counts,
    funnel_users,
    zscore_outliers,
)
from seriesly_spark.operators.windows import fill_gaps

D = 86_400_000


def ts(h):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


class TestCohortRetention:
    def test_triangle(self, spark):
        rows = [
            (1, 0), (1, D), (1, 3 * D),     # cohort day0, offsets 0,1,3
            (2, D), (2, 2 * D),             # cohort day1, offsets 0,1
            (3, 0),                          # cohort day0, offset 0
        ]
        df = spark.createDataFrame(rows, "user_id long, bucket_ms long")
        out = {
            (r.cohort_bucket, r.bucket_offset): r.n_users
            for r in cohort_retention(df, "user_id", "bucket_ms", D).collect()
        }
        assert out == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (D, 0): 1, (D, 1): 1}

    def test_duplicate_events_count_once(self, spark):
        df = spark.createDataFrame(
            [(1, 0), (1, 0), (1, 0)], "user_id long, bucket_ms long"
        )
        out = cohort_retention(df, "user_id", "bucket_ms", D).collect()
        assert [(r.cohort_bucket, r.bucket_offset, r.n_users) for r in out] == [
            (0, 0, 1)
        ]


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


class TestFunnel:
    STEPS = ["view", "click", "purchase"]

    def test_order_enforced(self, spark):
        rows = [
            # user 1: full ordered funnel
            (1, ts(0), "view"), (1, ts(1), "click"), (1, ts(2), "purchase"),
            # user 2: click BEFORE view -> stalls at view
            (2, ts(1), "view"), (2, ts(0), "click"), (2, ts(5), "purchase"),
            # user 3: no view at all -> never enters
            (3, ts(0), "click"), (3, ts(1), "purchase"),
        ]
        out = {
            r.step: r.n_users
            for r in funnel_counts(
                _ev(spark, rows), "user_id", "ts", "event_type", self.STEPS
            ).collect()
        }
        # user 2 purchases after view but never clicks after view? click@0 < view@1
        # -> stalls at step 1
        assert out == {"view": 2, "click": 1, "purchase": 1}

    def test_earliest_qualifying_times(self, spark):
        rows = [
            (1, ts(0), "view"), (1, ts(2), "click"), (1, ts(4), "click"),
            (1, ts(3), "purchase"), (1, ts(5), "purchase"),
        ]
        r = funnel_users(
            _ev(spark, rows), "user_id", "ts", "event_type", self.STEPS
        ).collect()[0]
        # click completes at h2; first purchase AFTER h2 is h3 (not h5)
        assert (r.t1, r.t2, r.t3) == (ts(0), ts(2), ts(3))

    def test_same_timestamp_not_after(self, spark):
        rows = [(1, ts(0), "view"), (1, ts(0), "click")]
        r = funnel_users(
            _ev(spark, rows), "user_id", "ts", "event_type", self.STEPS
        ).collect()[0]
        assert r.t1 == ts(0) and r.t2 is None and r.t3 is None

    def test_needs_two_steps(self, spark):
        with pytest.raises(ValueError):
            funnel_counts(_ev(spark, []), "user_id", "ts", "event_type", ["view"])


class TestZscore:
    def test_flags_only_outliers(self, spark):
        vals = [10.0] * 10 + [20.0]
        df = spark.createDataFrame(
            [(i, "a", v) for i, v in enumerate(vals)],
            "event_id long, event_type string, value double",
        )
        out = zscore_outliers(
            df, "value", ["event_type"], threshold=2.5, id_cols=["event_id"]
        ).collect()
        assert [r.event_id for r in out] == [10]
        # mean = 10.909..., sd = sqrt(82.6446/11); z ~ 3.162
        assert out[0].z == pytest.approx(3.1623, abs=1e-3)

    def test_groups_independent(self, spark):
        df = spark.createDataFrame(
            [(i, "a", 10.0) for i in range(10)] + [(10, "a", 20.0)]
            + [(i + 20, "b", float(v)) for i, v in enumerate([1, 2, 3, 2, 1, 2, 3])],
            "event_id long, event_type string, value double",
        )
        out = zscore_outliers(
            df, "value", ["event_type"], threshold=2.5, id_cols=["event_id"]
        ).collect()
        assert {r.event_type for r in out} == {"a"}


class TestLinearFill:
    def _series(self, spark, pts):
        return spark.createDataFrame(
            [("s", b, v) for b, v in pts],
            "k string, bucket_ms long, v double",
        )

    def test_interpolates_straight_line(self, spark):
        # observed at 0 -> 10.0 and 3000 -> 40.0; holes at 1000, 2000
        df = self._series(spark, [(0, 10.0), (3000, 40.0)])
        out = {
            r.bucket_ms: (r.v, r.filled)
            for r in fill_gaps(df, ["k"], "bucket_ms", "v", 1000, how="linear").collect()
        }
        assert out[0] == (10.0, False)
        assert out[1000] == (20.0, True)
        assert out[2000] == (30.0, True)
        assert out[3000] == (40.0, False)

    def test_multiple_segments(self, spark):
        df = self._series(spark, [(0, 0.0), (2000, 4.0), (4000, 0.0)])
        out = {
            r.bucket_ms: r.v
            for r in fill_gaps(df, ["k"], "bucket_ms", "v", 1000, how="linear").collect()
        }
        assert out == {0: 0.0, 1000: 2.0, 2000: 4.0, 3000: 2.0, 4000: 0.0}


class TestEwma:
    def _series(self, spark, vals):
        return spark.createDataFrame(
            [("s", i * 1000, float(v)) for i, v in enumerate(vals)],
            "k string, bucket_ms long, v double",
        )

    def test_head_renormalized(self, spark):
        out = ewma(
            self._series(spark, [10, 10, 10]), ["k"], "bucket_ms", "v", k=6
        ).collect()
        # constant series -> ewma == value at every position regardless of
        # how many lags exist yet
        assert all(r.ewma == 10.0 for r in out)

    def test_weights_halve(self, spark):
        out = sorted(
            ewma(self._series(spark, [0, 12]), ["k"], "bucket_ms", "v", k=2).collect(),
            key=lambda r: r.bucket_ms,
        )
        # second bucket: (2*12 + 1*0) / 3 = 8
        assert out[0].ewma == 0.0
        assert out[1].ewma == 8.0

    def test_truncation_at_k(self, spark):
        out = sorted(
            ewma(self._series(spark, [100, 0, 0]), ["k"], "bucket_ms", "v", k=2).collect(),
            key=lambda r: r.bucket_ms,
        )
        # third bucket only sees lags 0..1 -> the 100 fell out of the window
        assert out[2].ewma == 0.0

    def test_k_bounds(self, spark):
        with pytest.raises(ValueError):
            ewma(self._series(spark, [1]), ["k"], "bucket_ms", "v", k=0)


class TestHistogram:
    def test_clamps_out_of_range_into_edge_bins(self, spark):
        from seriesly_spark.operators.analytics import histogram

        rows = [("a", -10.0), ("a", 0.0), ("a", 49.9), ("a", 250.0),
                ("a", 500.0), ("a", 9999.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {
            (r.bin, r.bin_lo): r.cnt
            for r in histogram(df, "v", ["g"], lo=0.0, hi=500.0, bins=10).collect()
        }
        # -10 and 0 and 49.9 -> bin 0; 250 -> bin 5; 500 and 9999 clamp to 9.
        assert out == {(0, 0.0): 3, (5, 250.0): 1, (9, 450.0): 2}

    def test_null_values_dropped(self, spark):
        from seriesly_spark.operators.analytics import histogram

        df = spark.createDataFrame(
            [("a", None), ("a", 1.0)], "g string, v double"
        )
        out = histogram(df, "v", ["g"], lo=0.0, hi=10.0, bins=2).collect()
        assert [(r.bin, r.cnt) for r in out] == [(0, 1)]


class TestPivotCounts:
    def test_zero_fills_missing_cells(self, spark):
        from seriesly_spark.operators.analytics import pivot_counts

        rows = [(1, "x"), (1, "x"), (2, "y")]
        df = spark.createDataFrame(rows, "day long, t string")
        out = {
            r.day: (r.x, r.y, r.z)
            for r in pivot_counts(df, "day", "t", ["x", "y", "z"]).collect()
        }
        assert out == {1: (2, 0, 0), 2: (0, 1, 0)}

    def test_unlisted_values_ignored(self, spark):
        from seriesly_spark.operators.analytics import pivot_counts

        df = spark.createDataFrame([(1, "x"), (1, "other")], "day long, t string")
        out = pivot_counts(df, "day", "t", ["x"]).collect()
        assert [(r.day, r.x) for r in out] == [(1, 1)]


class TestMadOutliers:
    def test_flags_extreme_value_zscore_would_mask(self, spark):
        from seriesly_spark.operators.analytics import mad_outliers

        # 9 values near 10 plus one at 1000: MAD stays ~1, so the spike
        # is flagged, while its own pull on stddev keeps plain z < 3.
        rows = [(i, "a", 9.0 + (i % 3)) for i in range(9)] + [(99, "a", 1000.0)]
        df = spark.createDataFrame(rows, "event_id long, g string, v double")
        out = mad_outliers(df, "v", ["g"], threshold=3.5, id_cols=["event_id"])
        assert [r.event_id for r in out.collect()] == [99]

    def test_zero_mad_group_produces_no_outliers(self, spark):
        from seriesly_spark.operators.analytics import mad_outliers

        df = spark.createDataFrame(
            [(i, "a", 5.0) for i in range(6)] + [(9, "a", 6.0)],
            "event_id long, g string, v double",
        )
        # Median 5, MAD 0 (majority constant): guard must yield nothing,
        # not a division-by-zero flag of the whole group.
        assert mad_outliers(df, "v", ["g"]).collect() == []


class TestCharEntropy:
    def test_known_distributions(self, spark):
        from seriesly_spark.operators.textstats import char_entropy

        df = spark.createDataFrame(
            [(1, "aaaa"), (2, "abab"), (3, "abcd")], "doc_id long, text string"
        )
        out = {r.doc_id: (r.n_chars, r.n_distinct_chars, r.entropy)
               for r in char_entropy(df).collect()}
        assert out[1] == (4, 1, 0.0)       # constant -> 0 bits
        assert out[2] == (4, 2, 1.0)       # uniform over 2 -> 1 bit
        assert out[3] == (4, 4, 2.0)       # uniform over 4 -> 2 bits


class TestTimeWeightedAvg:
    def test_locf_weighting_beats_burst(self, spark):
        from seriesly_spark.operators.windows import time_weighted_avg

        # Bucket [0, 60s): value 10 holds 50s, then a 10-sample burst of
        # 0 in the last 10s. Count-mean = ~0.9; TWA stays near 10*5/6.
        rows = [("a", 0, 0, 10.0)] + [
            ("a", 50_000_000 + i * 1_000_000, i + 1, 0.0) for i in range(10)
        ]
        df = spark.createDataFrame(
            rows, "g string, ts_us long, event_id long, v double"
        )
        out = time_weighted_avg(
            df, ["g"], "ts_us", "v", bucket_ms=60_000, tiebreak_col="event_id"
        ).collect()
        assert len(out) == 1
        # 10.0 * 50s / 60s = 8.333333
        assert out[0].twa == 8.333333

    def test_same_ts_tiebreak_deterministic(self, spark):
        from seriesly_spark.operators.windows import time_weighted_avg

        # Two samples at the same microsecond: the lower event_id holds
        # for 0us, the higher carries to the bucket end.
        rows = [("a", 0, 1, 100.0), ("a", 0, 2, 4.0)]
        df = spark.createDataFrame(
            rows, "g string, ts_us long, event_id long, v double"
        )
        out = time_weighted_avg(
            df, ["g"], "ts_us", "v", bucket_ms=1, tiebreak_col="event_id"
        ).collect()
        assert out[0].twa == 4.0


class TestSeriesGaps:
    def test_reports_only_holes_above_threshold(self, spark):
        from seriesly_spark.operators.windows import series_gaps

        df = spark.createDataFrame(
            [("a", 0), ("a", 10), ("a", 1000), ("b", 0)],
            "g string, ts_us long",
        )
        out = [(r.g, r.gap_start_us, r.gap_end_us, r.gap_us)
               for r in series_gaps(df, ["g"], "ts_us", 100).collect()]
        assert out == [("a", 10, 1000, 990)]  # 0->10 too small; b has none


class TestMinmaxDownsample:
    def test_extrema_and_tiebreaks(self, spark):
        from seriesly_spark.operators.windows import minmax_downsample

        rows = [("a", 0, 5.0), ("a", 10, 1.0), ("a", 20, 1.0),
                ("a", 30, 9.0), ("a", 40, 9.0)]
        df = spark.createDataFrame(rows, "g string, ts_us long, v double")
        r = minmax_downsample(df, ["g"], "ts_us", "v", bucket_ms=1).collect()[0]
        # min ties -> earliest ts; max ties -> latest ts (struct lexicographic)
        assert (r.min_v, r.min_ts_us) == (1.0, 10)
        assert (r.max_v, r.max_ts_us) == (9.0, 40)


class TestQuantileTransform:
    def test_rank_normalization(self, spark):
        from seriesly_spark.operators.analytics import quantile_transform

        df = spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 20.0), (4, "a", 40.0),
             (5, "b", 7.0)],
            "event_id long, g string, v double",
        )
        out = {r.event_id: r.pct_rank
               for r in quantile_transform(df, "v", ["g"], ["event_id"]).collect()}
        assert out[1] == 0.0
        assert out[2] == out[3] == round(1 / 3, 6)  # ties share rank
        assert out[4] == 1.0
        assert out[5] == 0.0  # single-row group


class TestTrendSlope:
    def test_exact_line(self, spark):
        from seriesly_spark.operators.analytics import trend_slope

        # y = 2x + 1 with x in seconds from origin 0: slope 2/s.
        rows = [("a", i * 1_000_000, 2.0 * i + 1.0) for i in range(5)]
        df = spark.createDataFrame(rows, "g string, t_us long, v double")
        r = trend_slope(df, "t_us", "v", ["g"], 0).collect()[0]
        assert r.n == 5 and r.slope == 2.0 and r.intercept == 1.0

    def test_constant_x_returns_null(self, spark):
        from seriesly_spark.operators.analytics import trend_slope

        df = spark.createDataFrame(
            [("a", 7, 1.0), ("a", 7, 5.0)], "g string, t_us long, v double"
        )
        r = trend_slope(df, "t_us", "v", ["g"], 0).collect()[0]
        assert r.slope is None and r.intercept is None


class TestAutocorr:
    def test_alternating_series_is_anticorrelated(self, spark):
        from seriesly_spark.operators.analytics import autocorr_lag

        rows = [("a", i, i, (-1.0) ** i) for i in range(10)]
        df = spark.createDataFrame(rows, "g string, t long, id long, v double")
        r = autocorr_lag(df, "t", "v", ["g"], ["id"], lag=1).collect()[0]
        assert r.n_pairs == 9 and r.r == -1.0

    def test_constant_series_returns_null(self, spark):
        from seriesly_spark.operators.analytics import autocorr_lag

        rows = [("a", i, i, 3.0) for i in range(5)]
        df = spark.createDataFrame(rows, "g string, t long, id long, v double")
        r = autocorr_lag(df, "t", "v", ["g"], ["id"], lag=1).collect()[0]
        assert r.r is None


class TestCorrPairs:
    def test_perfect_and_anti(self, spark):
        from seriesly_spark.operators.analytics import corr_pairs

        rows = []
        for b in range(4):
            rows += [("x", b, float(b)), ("y", b, 2.0 * b + 3.0),
                     ("z", b, -1.0 * b)]
        df = spark.createDataFrame(rows, "s string, b long, v double")
        out = {(r.series_a, r.series_b): r.corr
               for r in corr_pairs(df, "s", "b", "v").collect()}
        assert out[("x", "y")] == 1.0
        assert out[("x", "z")] == -1.0
        assert out[("y", "z")] == -1.0


class TestIqrOutliers:
    def test_flags_only_fence_breakers(self, spark):
        from seriesly_spark.operators.analytics import iqr_outliers

        vals = [1.0, 2.0, 3.0, 4.0, 100.0]
        df = spark.createDataFrame(
            [(i, "a", v) for i, v in enumerate(vals)],
            "id long, g string, v double",
        )
        out = iqr_outliers(df, "v", ["g"], k=1.5, id_cols=["id"]).collect()
        assert [r.v for r in out] == [100.0]

    def test_constant_group_has_no_outliers(self, spark):
        from seriesly_spark.operators.analytics import iqr_outliers

        df = spark.createDataFrame(
            [(i, "a", 5.0) for i in range(6)], "id long, g string, v double"
        )
        assert iqr_outliers(df, "v", ["g"]).count() == 0


class TestRollupCounts:
    def test_grouping_id_levels(self, spark):
        from seriesly_spark.operators.analytics import rollup_counts

        rows = [(1, "a", 1.0), (1, "b", 2.0), (2, "a", 4.0)]
        df = spark.createDataFrame(rows, "d long, t string, v double")
        out = rollup_counts(df, ["d", "t"], "v").collect()
        by_gid = {}
        for r in out:
            by_gid.setdefault(r.grouping_id, []).append(r)
        # detail rows (gid 0): all 3 combos; level-1 (gid 1): per-d; total.
        assert len(by_gid[0]) == 3
        assert {(r.d, r.cnt, r.sum_v) for r in by_gid[1]} == {
            (1, 2, 3.0), (2, 1, 4.0)
        }
        total = by_gid[3][0]
        assert total.d is None and total.t is None
        assert total.cnt == 3 and total.sum_v == 7.0


class TestUnpivotProfile:
    def test_unpivot_shape(self, spark):
        from seriesly_spark.operators.analytics import unpivot_metrics

        df = spark.createDataFrame(
            [(1, 10.0, 20.0)], "k long, m1 double, m2 double"
        )
        out = unpivot_metrics(df, ["k"], ["m1", "m2"]).collect()
        assert {(r.k, r.metric, r.value) for r in out} == {
            (1, "m1", 10.0), (1, "m2", 20.0)
        }

    def test_column_profile_counts(self, spark):
        from seriesly_spark.operators.analytics import column_profile

        df = spark.createDataFrame(
            [(1, None), (2, "x"), (2, "x")], "a long, b string"
        )
        out = {r.column: r for r in column_profile(df, ["a", "b"]).collect()}
        assert out["a"].n_rows == 3 and out["a"].n_null == 0
        assert out["a"].n_distinct == 2
        assert out["b"].n_null == 1 and out["b"].n_distinct == 1


class TestMergeIntervals:
    def test_overlap_touch_and_gap(self, spark):
        from seriesly_spark.operators.windows import merge_intervals

        rows = [
            ("u", 0, 10, 1),    # island 1: [0,10) + [5,20) overlap
            ("u", 5, 20, 2),
            ("u", 20, 30, 3),   # touches 20 == prior max end -> merges
            ("u", 50, 60, 4),   # gap -> island 2
        ]
        df = spark.createDataFrame(rows, "u string, s long, e long, id long")
        out = sorted(
            merge_intervals(df, ["u"], "s", "e", "id").collect(),
            key=lambda r: r.island,
        )
        assert [(r.island_start_us, r.island_end_us, r.n_merged)
                for r in out] == [(0, 30, 3), (50, 60, 1)]

    def test_gap_tolerance_bridges(self, spark):
        from seriesly_spark.operators.windows import merge_intervals

        rows = [("u", 0, 10, 1), ("u", 15, 20, 2)]
        df = spark.createDataFrame(rows, "u string, s long, e long, id long")
        assert merge_intervals(df, ["u"], "s", "e", "id").count() == 2
        assert (
            merge_intervals(df, ["u"], "s", "e", "id", gap_us=5).count() == 1
        )

    def test_contained_interval_does_not_split(self, spark):
        from seriesly_spark.operators.windows import merge_intervals

        # [0,100) contains [10,20); a later [30,40) must still merge
        # because the running max end (100) covers it.
        rows = [("u", 0, 100, 1), ("u", 10, 20, 2), ("u", 30, 40, 3)]
        df = spark.createDataFrame(rows, "u string, s long, e long, id long")
        out = merge_intervals(df, ["u"], "s", "e", "id").collect()
        assert len(out) == 1
        assert (out[0].island_start_us, out[0].island_end_us,
                out[0].n_merged) == (0, 100, 3)
