"""Micro-input unit tests for the round-4 batch-2 operators:
bigram LM scoring, PII screening, exact-substring duplication,
CUSUM change-point, seasonal residuals, percent change."""

import math

import pytest
from pyspark.sql import functions as F

from seriesly_spark.operators.analytics import (
    cusum_changepoint,
    seasonal_residuals,
)
from seriesly_spark.operators.dedup import substring_dup_stats
from seriesly_spark.operators.textstats import bigram_lm_score, pii_screen
from seriesly_spark.operators.windows import pct_change


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSubstringDup:
    def test_fully_templated_doc_scores_one(self, spark):
        df = _docs(spark, [(1, "a b c a b c a b"), (2, "a b c x y z")])
        out = {
            r["doc_id"]: r
            for r in substring_dup_stats(df, n=3).collect()
        }
        # doc 1: windows abc bca cab abc bca cab -> every window recurs
        assert out[1]["n_windows"] == 6
        assert out[1]["dup_ratio"] == 1.0
        # doc 2: only its leading abc window recurs (via doc 1)
        assert out[2]["n_windows"] == 4
        assert out[2]["n_dup_windows"] == 1
        assert out[2]["dup_ratio"] == 0.25

    def test_short_docs_get_null_ratio_not_an_error(self, spark):
        df = _docs(spark, [(1, "q"), (2, ""), (3, "x y")])
        rows = substring_dup_stats(df, n=3).collect()
        assert all(r["n_windows"] == 0 for r in rows)
        assert all(r["dup_ratio"] is None for r in rows)

    def test_within_document_repeats_count_as_duplication(self, spark):
        # the 2107.06499 semantics: a window repeated INSIDE one doc is
        # still duplicated text
        df = _docs(spark, [(1, "p q r s p q r")])
        row = substring_dup_stats(df, n=3).collect()[0]
        # windows: pqr qrs rsp spq pqr -> pqr twice
        assert row["n_windows"] == 5
        assert row["n_dup_windows"] == 2


class TestBigramLm:
    def test_probabilities_hand_checked(self, spark):
        # corpus: "a b" x2, "a c" -> c(a,b)=2, c(a,c)=1, c_a=3, V=3
        df = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
        out = {r["doc_id"]: r for r in bigram_lm_score(df, k=0.5).collect()}
        p_ab = (2 + 0.5) / (3 + 0.5 * 3)
        p_ac = (1 + 0.5) / (3 + 0.5 * 3)
        assert out[1]["avg_logprob"] == pytest.approx(
            round(math.log2(p_ab), 6), abs=1e-6
        )
        assert out[3]["avg_logprob"] == pytest.approx(
            round(math.log2(p_ac), 6), abs=1e-6
        )
        # the common transition scores higher than the rare one
        assert out[1]["avg_logprob"] > out[3]["avg_logprob"]

    def test_short_docs_score_null(self, spark):
        df = _docs(spark, [(1, "a b"), (2, "solo")])
        out = {r["doc_id"]: r for r in bigram_lm_score(df).collect()}
        assert out[2]["n_bigrams"] == 0
        assert out[2]["avg_logprob"] is None


class TestPiiScreen:
    def test_each_pattern_detected_once(self, spark):
        df = _docs(
            spark,
            [(1, "write bob@example.com from 10.0.0.1 ssn 123-45-6789 "
                 "card 4111111111111111"),
             (2, "clean prose with no identifiers at all")],
        )
        out = {r["doc_id"]: r for r in pii_screen(df).collect()}
        assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_ssn"],
                out[1]["n_id_number"]) == (1, 1, 1, 1)
        assert out[1]["n_pii"] == 4 and out[1]["has_pii"]
        assert out[2]["n_pii"] == 0 and not out[2]["has_pii"]

    def test_boundaries_prevent_partial_hits(self, spark):
        # digits embedded in longer alphanumerics must not fire \\b rules
        df = _docs(spark, [(1, "ref abc123456789x and 1.2.3 only")])
        row = pii_screen(df).collect()[0]
        assert row["n_id_number"] == 0
        assert row["n_ipv4"] == 0


class TestCusum:
    def test_level_shift_peaks_at_the_shift(self, spark):
        # 0,0,0,0,10,10,10,10: mean 5, S walks -5,-10,-15,-20,-15,...;
        # |S| peaks at the last pre-shift point (t=4)
        rows = [(i + 1, "a", float(i * 1_000_000), 0.0 if i < 4 else 10.0)
                for i in range(8)]
        df = spark.createDataFrame(
            rows, "event_id long, g string, t double, v double"
        ).withColumn("t", F.col("t").cast("long"))
        out = cusum_changepoint(df, "v", ["g"], "t", "event_id").collect()
        assert len(out) == 1
        assert out[0]["cp_t_us"] == 3_000_000
        assert out[0]["cusum_peak"] == -20.0
        assert out[0]["n_points"] == 8

    def test_stationary_series_has_small_peak(self, spark):
        rows = [(i + 1, "a", i * 1_000_000, float(i % 2)) for i in range(10)]
        df = spark.createDataFrame(
            rows, "event_id long, g string, t long, v double"
        )
        out = cusum_changepoint(df, "v", ["g"], "t", "event_id").collect()
        assert abs(out[0]["cusum_peak"]) <= 0.5


class TestSeasonalResiduals:
    def test_profile_is_per_hour_mean(self, spark):
        import datetime as dt

        rows = [
            (1, "a", dt.datetime(2024, 1, 1, 3), 10.0),
            (2, "a", dt.datetime(2024, 1, 2, 3), 20.0),
            (3, "a", dt.datetime(2024, 1, 1, 7), 100.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, g string, ts timestamp, v double"
        )
        out = {r["event_id"]: r
               for r in seasonal_residuals(df, "v", ["g"], "ts", "event_id")
               .collect()}
        assert out[1]["expected"] == 15.0 and out[1]["residual"] == -5.0
        assert out[2]["residual"] == 5.0
        assert out[3]["expected"] == 100.0 and out[3]["residual"] == 0.0
        assert out[1]["hod"] == 3 and out[3]["hod"] == 7


class TestPctChange:
    def test_returns_and_guards(self, spark):
        rows = [(1, "a", 1, 100.0), (2, "a", 2, 110.0), (3, "a", 3, 0.0),
                (4, "a", 4, 50.0)]
        df = spark.createDataFrame(
            rows, "event_id long, g string, t long, v double"
        )
        out = {r["event_id"]: r
               for r in pct_change(df, "v", ["g"], "t", "event_id").collect()}
        assert out[1]["pct_change"] is None  # first row
        assert out[2]["pct_change"] == 0.1
        assert out[2]["log_return"] == pytest.approx(
            round(math.log(1.1), 6), abs=1e-6
        )
        assert out[3]["pct_change"] == -1.0  # to zero is defined
        assert out[3]["log_return"] is None  # log of zero is not
        assert out[4]["pct_change"] is None  # from zero is not
