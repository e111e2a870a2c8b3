"""Micro-input unit tests for the round-4 batch-3 statistics
operators: winsorized means, inter-event profiles, Welch's t,
chi-square independence, concentration (entropy + Gini)."""

import math

from pyspark.sql import functions as F  # noqa: F401

from seriesly_spark.operators.analytics import (
    chisq_independence,
    concentration_stats,
    inter_event_stats,
    welch_ttest,
    winsorize_stats,
)


class TestWinsorize:
    def test_caps_and_mean_hand_checked(self, spark):
        # 1..20: p05 interpolates to 1.95, p95 to 19.05 (linear,
        # index h = p*(n-1)); exactly one value clips on each side and
        # the winsorized mean is (1.95 + sum(2..19) + 19.05)/20 = 10.5.
        df = spark.createDataFrame(
            [("a", float(i)) for i in range(1, 21)], "g string, v double"
        )
        row = winsorize_stats(df, "v", ["g"], 0.05, 0.95).first()
        assert row["n"] == 20
        assert row["lo_cap"] == 1.95
        assert row["hi_cap"] == 19.05
        assert row["n_clip_lo"] == 1
        assert row["n_clip_hi"] == 1
        assert row["mean_winsorized"] == 10.5

    def test_groups_independent(self, spark):
        df = spark.createDataFrame(
            [("a", float(i)) for i in range(1, 21)]
            + [("b", 100.0)] * 10,
            "g string, v double",
        )
        rows = {
            r["g"]: r
            for r in winsorize_stats(df, "v", ["g"], 0.05, 0.95).collect()
        }
        # constant group: caps equal the value, nothing clips
        assert rows["b"]["n_clip_lo"] == 0
        assert rows["b"]["n_clip_hi"] == 0
        assert rows["b"]["mean_winsorized"] == 100.0
        assert rows["a"]["mean_winsorized"] == 10.5


class TestInterEventStats:
    def test_regular_stream_is_periodic(self, spark):
        # gaps 10 s, 10 s -> sigma 0, burstiness (0-10)/(0+10) = -1
        df = spark.createDataFrame(
            [(1, 0, 1), (1, 10_000_000, 2), (1, 20_000_000, 3)],
            "u long, t long, id long",
        )
        row = inter_event_stats(df, ["u"], "t", "id").first()
        assert row["n_events"] == 3
        assert row["n_gaps"] == 2
        assert row["mean_gap_s"] == 10.0
        assert row["max_gap_s"] == 10.0
        assert row["burstiness"] == -1.0

    def test_single_event_entity_drops(self, spark):
        df = spark.createDataFrame(
            [(1, 0, 1), (2, 5, 2), (2, 1_000_000, 3)],
            "u long, t long, id long",
        )
        rows = inter_event_stats(df, ["u"], "t", "id").collect()
        assert {r["u"] for r in rows} == {2}


class TestWelchTTest:
    def test_hand_checked_pair(self, spark):
        # a=[1,2,3] (mean 2, var 1), b=[2,4,6] (mean 4, var 4):
        # se2 = 1/3 + 4/3, t = -2/sqrt(5/3), dof = 50/17
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 3.0),
             ("b", 2.0), ("b", 4.0), ("b", 6.0)],
            "g string, v double",
        )
        row = welch_ttest(df, "v", "g").first()
        assert (row["group_a"], row["group_b"]) == ("a", "b")
        assert row["mean_diff"] == -2.0
        assert row["t_stat"] == round(-2.0 / math.sqrt(5.0 / 3.0), 6)
        assert row["dof"] == round(50.0 / 17.0, 6)

    def test_tiny_and_constant_groups_drop(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("b", 5.0), ("b", 5.0), ("c", 1.0), ("c", 2.0)],
            "g string, v double",
        )
        rows = welch_ttest(df, "v", "g").collect()
        # 'a' has n<2; the (b,c) pair survives (one-sided variance ok)
        assert {(r["group_a"], r["group_b"]) for r in rows} == {("b", "c")}


class TestChisq:
    def test_independent_table_scores_zero(self, spark):
        rows = [("x", 0)] * 5 + [("x", 1)] * 5 + [("y", 0)] * 5 + [
            ("y", 1)
        ] * 5
        df = spark.createDataFrame(rows, "a string, b long")
        out = chisq_independence(df, "a", "b").first()
        assert out["chi2_stat"] == 0.0
        assert out["dof"] == 1
        assert out["n"] == 20
        assert out["n_cells"] == 4

    def test_perfect_association_scores_n(self, spark):
        # 2x2 with empty off-diagonal cells: chi2 == n exactly
        rows = [("x", 0)] * 4 + [("y", 1)] * 6
        df = spark.createDataFrame(rows, "a string, b long")
        out = chisq_independence(df, "a", "b").first()
        assert out["chi2_stat"] == 10.0
        assert out["dof"] == 1


class TestConcentration:
    def test_uniform_distribution(self, spark):
        df = spark.createDataFrame(
            [(u,) for u in range(4) for _ in range(5)], "u long"
        )
        row = concentration_stats(df, "u").first()
        assert row["n_keys"] == 4
        assert row["n_total"] == 20
        assert row["entropy"] == round(math.log(4), 6)
        assert row["entropy_norm"] == 1.0
        assert row["gini"] == 0.0

    def test_single_key_degenerate(self, spark):
        df = spark.createDataFrame([(7,)] * 9, "u long")
        row = concentration_stats(df, "u").first()
        assert row["entropy"] == 0.0
        assert row["entropy_norm"] == 0.0
        assert row["gini"] == 0.0

    def test_skew_raises_gini_lowers_entropy_norm(self, spark):
        df = spark.createDataFrame(
            [(1,)] * 97 + [(2,)] * 1 + [(3,)] * 1 + [(4,)] * 1, "u long"
        )
        row = concentration_stats(df, "u").first()
        assert row["gini"] > 0.5
        assert row["entropy_norm"] < 0.2


from seriesly_spark.operators.textstats import (  # noqa: E402
    curriculum_bins,
    normalized_dedup,
)
from seriesly_spark.operators.windows import (  # noqa: E402
    interval_coverage,
    sliding_distinct,
)


class TestSlidingDistinct:
    def test_user_counted_once_per_window(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1, 5, 30)
        rows = [
            (base, 1), (base.replace(minute=45), 1),  # same user twice
            (base.replace(hour=6), 2),
        ]
        df = spark.createDataFrame(rows, "ts timestamp, u long")
        out = {
            r["bucket_ms"]: r
            for r in sliding_distinct(df, "ts", 7_200_000, 3_600_000, "u")
            .collect()
        }
        # window [05:00, 07:00) holds all three events, two users
        k = int(dt.datetime(2024, 1, 1, 5, 0)
                .replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
        assert out[k]["n_events"] == 3
        assert out[k]["n_keys"] == 2
        # window [06:00, 08:00) holds only user 2
        assert out[k + 3_600_000]["n_keys"] == 1


class TestIntervalCoverage:
    def test_counts_inside_and_outside(self, spark):
        isl = spark.createDataFrame(
            [(1, 0, 100, 10), (1, 200, 300, 11)],
            "u long, s long, e long, island long",
        )
        pts = spark.createDataFrame(
            [(1, 50), (1, 150), (1, 300), (2, 10)], "u long, t long"
        )
        rows = {
            r["u"]: r
            for r in interval_coverage(
                isl, pts, ["u"], "s", "e", "t"
            ).collect()
        }
        # t=50 inside, t=150 in the gap, t=300 on the inclusive edge
        assert rows[1]["n_islands"] == 2
        assert rows[1]["covered_us"] == 200
        assert rows[1]["n_points"] == 3
        assert rows[1]["n_covered"] == 2
        assert rows[1]["coverage_ratio"] == round(2 / 3, 6)
        # user 2 has points but no islands -> no row (left side is islands)
        assert 2 not in rows


class TestCurriculumBins:
    def test_equal_frequency_split(self, spark):
        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * n)) for i, n in
             enumerate([1, 2, 3, 4, 5, 6, 7, 8])],
            "doc_id long, text string",
        )
        out = {r["bin"]: r for r in curriculum_bins(docs, 2).collect()}
        assert out[0]["n_docs"] == 4 and out[0]["max_tokens"] == 4
        assert out[1]["n_docs"] == 4 and out[1]["min_tokens"] == 5

    def test_ties_never_split(self, spark):
        # 8 docs of length 3 would span bins 1..4 under NTILE; here
        # they ALL land in the bin of their start rank (bin 1).
        docs = spark.createDataFrame(
            [(0, "w"), (1, "w")]
            + [(i, "w w w") for i in range(2, 10)],
            "doc_id long, text string",
        )
        out = {r["bin"]: r for r in curriculum_bins(docs, 5).collect()}
        assert out[0]["n_docs"] == 2 and out[0]["max_tokens"] == 1
        assert out[1]["n_docs"] == 8 and out[1]["min_tokens"] == 3
        assert len(out) == 2


class TestNormalizedDedup:
    def test_case_and_punct_collapse(self, spark):
        docs = spark.createDataFrame(
            [(1, "hello world"), (2, "  HELLO,   world!! "),
             (3, "hello mars")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in normalized_dedup(docs).collect()}
        assert rows[2]["canonical_id"] == 1 and rows[2]["is_dup"]
        assert not rows[1]["is_dup"]
        assert rows[1]["group_size"] == 2
        assert not rows[3]["is_dup"] and rows[3]["group_size"] == 1


from seriesly_spark.operators.analytics import (  # noqa: E402
    cooccurrence,
    rfm_scores,
)
from seriesly_spark.operators.sampling import weighted_sample  # noqa: E402
from seriesly_spark.operators.textstats import source_profile  # noqa: E402


class TestCooccurrence:
    def test_jaccard_hand_checked(self, spark):
        # users 1,2 do both a+b; user 3 only a: |a|=3 |b|=2 both=2
        rows = [(1, "a"), (1, "b"), (1, "a"), (2, "a"), (2, "b"),
                (3, "a")]
        df = spark.createDataFrame(rows, "u long, i string")
        out = cooccurrence(df, "u", "i").collect()
        assert len(out) == 1
        r = out[0]
        assert (r["item_a"], r["item_b"]) == ("a", "b")
        assert (r["n_a"], r["n_b"], r["n_both"]) == (3, 2, 2)
        assert r["jaccard"] == round(2 / 3, 6)

    def test_disjoint_items_produce_no_pair(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "b")], "u long, i string"
        )
        assert cooccurrence(df, "u", "i").count() == 0


class TestSourceProfile:
    def test_entropy_and_means(self, spark):
        import math

        docs = spark.createDataFrame(
            [(1, "s1", "en", "a b"), (2, "s1", "de", "c d e f"),
             (3, "s2", "en", "x")],
            "doc_id long, source string, lang string, text string",
        )
        rows = {r["source"]: r for r in source_profile(docs).collect()}
        assert rows["s1"]["n_docs"] == 2
        assert rows["s1"]["avg_tokens"] == 3.0
        assert rows["s1"]["n_langs"] == 2
        assert rows["s1"]["lang_entropy"] == round(math.log(2), 6)
        assert rows["s2"]["lang_entropy"] == 0.0


class TestWeightedSample:
    def test_max_weight_always_kept_zero_never(self, spark):
        df = spark.createDataFrame(
            [(i, 100 if i % 2 == 0 else 0) for i in range(50)],
            "k long, w long",
        )
        out = weighted_sample(df, "k", "w").collect()
        # weight == max -> threshold 65536, every u16 qualifies;
        # weight 0 -> threshold 0, none qualifies
        assert {r["k"] % 2 for r in out} == {0}
        assert len(out) == 25

    def test_proportional_in_expectation(self, spark):
        df = spark.createDataFrame(
            [(i, 1) for i in range(400)] + [(i, 4) for i in
                                            range(400, 800)],
            "k long, w long",
        )
        out = weighted_sample(df, "k", "w").collect()
        lo = sum(1 for r in out if r["k"] < 400)
        hi = len(out) - lo
        # p=0.25 vs p=1.0: the heavy class keeps everything
        assert hi == 400
        assert 60 <= lo <= 140


class TestRfm:
    def test_scores_monotone_in_inputs(self, spark):
        import datetime as dt

        rows = []
        # customer c gets c orders of value 100*c, latest day c
        for c in range(1, 11):
            for j in range(c):
                rows.append(
                    (c, dt.date(2024, 1, c), 100.0 * c)
                )
        df = spark.createDataFrame(rows, "cust long, d date, amt double")
        out = {r["cust"]: r for r in
               rfm_scores(df, "cust", "d", "amt").collect()}
        assert out[10]["recency_days"] == 0
        assert out[1]["recency_days"] == 9
        assert out[10]["frequency"] == 10
        assert out[10]["monetary"] == 10 * 1000.0
        # top customer maxes all three scores; bottom customer bottoms
        assert (out[10]["r_score"], out[10]["f_score"],
                out[10]["m_score"]) == (5, 5, 5)
        assert (out[1]["r_score"], out[1]["f_score"],
                out[1]["m_score"]) == (1, 1, 1)
        # monotone in customer id by construction
        for c in range(1, 10):
            assert out[c]["m_score"] <= out[c + 1]["m_score"]
