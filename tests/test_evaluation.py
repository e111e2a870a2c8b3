"""Scorer-evaluation operators: rank-sum ROC-AUC (midrank ties) and
calibration-reliability bins, pinned against hand-computed values."""

import pytest
from pyspark.sql import functions as F

from seriesly_spark.operators.evaluation import (
    calibration_bins,
    ks_statistic,
    lift_table,
    pr_curve,
    psi_report,
    roc_auc,
    stopword_lang_scored,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score double, label boolean")


class TestRocAuc:
    def test_hand_computed_with_ties(self, spark):
        # positives: 0.9, 0.8, 0.2; negatives: 0.8, 0.3
        # U = (0.9: 2 below) + (0.8: 1 below + 0.5 tied) + (0.2: 0)
        #   = 3.5 -> AUC = 3.5 / 6 = 0.583333
        r = roc_auc(
            _scored(
                spark,
                [(0.9, True), (0.8, True), (0.8, False), (0.3, False),
                 (0.2, True)],
            )
        ).collect()[0]
        assert (r.n_pos, r.n_neg, r.n_skipped) == (3, 2, 0)
        assert r.auc == pytest.approx(0.583333)

    def test_perfect_and_inverted(self, spark):
        assert roc_auc(
            _scored(spark, [(0.9, True), (0.8, True), (0.1, False)])
        ).collect()[0].auc == 1.0
        assert roc_auc(
            _scored(spark, [(0.1, True), (0.9, False)])
        ).collect()[0].auc == 0.0

    def test_all_ties_is_half(self, spark):
        r = roc_auc(
            _scored(spark, [(0.5, True), (0.5, False), (0.5, True),
                            (0.5, False)])
        ).collect()[0]
        assert r.auc == pytest.approx(0.5)

    def test_single_class_yields_null(self, spark):
        r = roc_auc(_scored(spark, [(0.9, True), (0.1, True)])).collect()[0]
        assert r.auc is None and (r.n_pos, r.n_neg) == (2, 0)

    def test_null_rows_skipped_and_counted(self, spark):
        r = roc_auc(
            _scored(
                spark,
                [(0.9, True), (None, True), (0.1, None), (0.2, False)],
            )
        ).collect()[0]
        assert (r.n_pos, r.n_neg, r.n_skipped) == (1, 1, 2)
        assert r.auc == 1.0

    def test_partition_invariant(self, spark):
        rows = [((i * 37 % 100) / 100.0, i % 3 == 0) for i in range(500)]
        a = roc_auc(_scored(spark, rows).repartition(13)).collect()[0]
        b = roc_auc(_scored(spark, rows).coalesce(1)).collect()[0]
        assert a == b


class TestRocAucByGroup:
    def test_per_group_matches_separate_runs(self, spark):
        rows = [("a", 0.9, True), ("a", 0.8, False), ("a", 0.7, True),
                ("b", 0.1, True), ("b", 0.9, False)]
        df = spark.createDataFrame(
            rows, "source string, score double, label boolean"
        )
        got = {
            r.source: r
            for r in roc_auc(df, by=["source"]).collect()
        }
        # group a: pos 0.9, 0.7; neg 0.8 -> U = 1 + 0 = 1 / 2 = 0.5
        assert got["a"].auc == pytest.approx(0.5)
        # group b: inverted -> 0.0
        assert got["b"].auc == 0.0
        # and each equals the global AUC of that group alone
        for src in ("a", "b"):
            solo = roc_auc(df.where(F.col("source") == src)).collect()[0]
            assert solo.auc == got[src].auc

    def test_no_global_window_in_plan(self, spark):
        df = spark.createDataFrame(
            [("a", 0.5, True)], "source string, score double, label boolean"
        )
        plan = (
            roc_auc(df, by=["source"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the cumulative window partitions on the group key (the spec
        # lists source before the order column)
        assert "windowspecdefinition(source#" in plan
        assert "CartesianProduct" not in plan


class TestKsStatistic:
    def test_hand_computed_with_tie_break(self, spark):
        # pos {0.9, 0.8, 0.2}, neg {0.8, 0.3}; terms ascending by score:
        # 0.2 -> |1/3 - 0|   = 0.333333
        # 0.3 -> |1/3 - 1/2| = 0.166667
        # 0.8 -> |2/3 - 1|   = 0.333333   (tie with 0.2)
        # 0.9 -> 0
        # ks = 0.333333 at the SMALLEST achieving score, 0.2.
        r = ks_statistic(
            _scored(
                spark,
                [(0.9, True), (0.8, True), (0.8, False), (0.3, False),
                 (0.2, True)],
            )
        ).collect()[0]
        assert (r.n_pos, r.n_neg, r.n_skipped) == (3, 2, 0)
        assert r.ks == pytest.approx(0.333333)
        assert r.ks_score == 0.2

    def test_perfect_separation(self, spark):
        r = ks_statistic(
            _scored(spark, [(0.9, True), (0.8, True), (0.1, False)])
        ).collect()[0]
        assert r.ks == 1.0 and r.ks_score == 0.1

    def test_null_rows_skipped_and_counted(self, spark):
        r = ks_statistic(
            _scored(
                spark,
                [(0.9, True), (None, True), (0.1, None), (0.2, False)],
            )
        ).collect()[0]
        assert (r.n_pos, r.n_neg, r.n_skipped) == (1, 1, 2)
        assert r.ks == 1.0 and r.ks_score == 0.2

    def test_single_class_yields_null(self, spark):
        r = ks_statistic(
            _scored(spark, [(0.9, True), (0.1, True)])
        ).collect()[0]
        assert r.ks is None and r.ks_score is None
        assert (r.n_pos, r.n_neg) == (2, 0)

    def test_partition_invariant(self, spark):
        rows = [((i * 37 % 100) / 100.0, i % 3 == 0) for i in range(500)]
        a = ks_statistic(_scored(spark, rows).repartition(13)).collect()[0]
        b = ks_statistic(_scored(spark, rows).coalesce(1)).collect()[0]
        assert a == b


class TestLiftTable:
    def test_distinct_scores_hand_computed(self, spark):
        # 10 rows, scores 1.0 .. 0.1, positives at the top 3
        rows = [((10 - i) / 10.0, i < 3) for i in range(10)]
        out = lift_table(_scored(spark, rows)).collect()
        assert [r.decile for r in out] == list(range(1, 11))
        assert [r.cum_n for r in out] == list(range(1, 11))
        d1, d3, d10 = out[0], out[2], out[9]
        assert d1.threshold == 1.0 and d1.cum_pos == 1
        assert d1.gain == pytest.approx(1 / 3)
        assert d1.lift == pytest.approx((1 / 1) / (3 / 10))
        assert d3.cum_pos == 3 and d3.gain == 1.0
        assert d3.lift == pytest.approx((3 / 3) / (3 / 10))
        assert d10.cum_n == 10 and d10.gain == 1.0 and d10.lift == 1.0

    def test_mega_tie_spans_deciles(self, spark):
        # one score group covering the whole corpus: every decile
        # reports that group's threshold and its full population
        rows = [(0.5, True), (0.5, False), (0.5, True), (0.5, False)]
        out = lift_table(_scored(spark, rows), n_buckets=2).collect()
        assert [r.decile for r in out] == [1, 2]
        for r in out:
            assert r.threshold == 0.5 and r.cum_n == 4
            assert r.cum_share == 1.0 and r.gain == 1.0 and r.lift == 1.0

    def test_boundary_tie_is_honest(self, spark):
        # 5 rows: scores 0.9 (2 rows, tied), then 0.3, 0.2, 0.1;
        # n_buckets=5 -> decile 1 needs 1 row but the 0.9 group holds 2:
        # deciles 1 AND 2 both report threshold 0.9 with cum_n=2.
        rows = [(0.9, True), (0.9, False), (0.3, False), (0.2, True),
                (0.1, False)]
        out = {r.decile: r for r in
               lift_table(_scored(spark, rows), n_buckets=5).collect()}
        assert out[1].threshold == 0.9 and out[1].cum_n == 2
        assert out[2].threshold == 0.9 and out[2].cum_n == 2
        assert out[3].threshold == 0.3 and out[3].cum_n == 3
        assert out[5].cum_n == 5

    def test_no_positives_yields_null_gain_lift(self, spark):
        out = lift_table(
            _scored(spark, [(0.5, False), (0.2, False)]), n_buckets=2
        ).collect()
        assert all(r.gain is None and r.lift is None for r in out)
        assert [r.cum_n for r in out] == [1, 2]

    def test_partition_invariant(self, spark):
        rows = [((i * 37 % 100) / 100.0, i % 3 == 0) for i in range(500)]
        a = lift_table(_scored(spark, rows).repartition(13)).collect()
        b = lift_table(_scored(spark, rows).coalesce(1)).collect()
        assert a == b


class TestPrCurve:
    def test_hand_computed(self, spark):
        rows = [(0.9, True), (0.8, False), (0.8, True), (0.3, False)]
        out = pr_curve(_scored(spark, rows)).collect()
        # thresholds descending: 0.9, 0.8, 0.3
        assert [r.threshold for r in out] == [0.9, 0.8, 0.3]
        t9, t8, t3 = out
        assert (t9.tp, t9.fp) == (1, 0)
        assert t9.precision == 1.0 and t9.recall == 0.5
        assert (t8.tp, t8.fp) == (2, 1)
        assert t8.precision == pytest.approx(0.666667) and t8.recall == 1.0
        assert (t3.tp, t3.fp) == (2, 2)
        assert t3.precision == 0.5 and t3.recall == 1.0

    def test_no_positives_yields_null_recall(self, spark):
        out = pr_curve(
            _scored(spark, [(0.5, False), (0.2, False)])
        ).collect()
        assert all(r.recall is None for r in out)
        assert all(r.precision == 0.0 for r in out)


class TestCalibrationBins:
    def test_bins_and_rates(self, spark):
        rows = [(0.05, False), (0.05, True), (0.15, True), (0.95, True),
                (0.95, True)]
        got = {r.bin: r for r in calibration_bins(_scored(spark, rows)).collect()}
        assert set(got) == {0, 1, 9}
        assert got[0].n == 2 and got[0].pos_rate == 0.5
        assert got[0].mean_score == pytest.approx(0.05)
        assert got[1].n == 1 and got[1].pos_rate == 1.0
        assert got[9].n == 2 and got[9].pos_rate == 1.0
        assert got[9].gap == pytest.approx(abs(0.95 - 1.0))

    def test_edge_scores_clamped(self, spark):
        rows = [(1.0, True), (-0.2, False), (1.3, True)]
        got = {r.bin: r.n for r in calibration_bins(_scored(spark, rows)).collect()}
        assert got == {0: 1, 9: 2}

    def test_null_rows_dropped(self, spark):
        rows = [(0.5, True), (None, True), (0.5, None)]
        out = calibration_bins(_scored(spark, rows)).collect()
        assert len(out) == 1 and out[0].n == 1


class TestPsiReport:
    def _vals(self, spark, xs):
        return spark.createDataFrame([(float(x),) for x in xs], "score double")

    def test_identical_distributions_are_zero(self, spark):
        a = self._vals(spark, [0.05, 0.15, 0.15, 0.95])
        out = psi_report(a, a).collect()
        assert len(out) == 10  # full grid, empty bins included
        assert all(r.psi_term == 0.0 for r in out)

    def test_shift_is_positive_and_empty_bin_kept(self, spark):
        ref = self._vals(spark, [0.05] * 8 + [0.15] * 2)
        cur = self._vals(spark, [0.05] * 2 + [0.95] * 8)
        rows = {r.bin: r for r in psi_report(ref, cur).collect()}
        assert len(rows) == 10
        # bin 9: present only in cur -> ref side eps-clamped, large term
        assert rows[9].n_ref == 0 and rows[9].n_cur == 8
        assert rows[9].psi_term > 1.0
        # bin 1: present only in ref -> also positive (symmetric form)
        assert rows[1].psi_term > 0
        total = sum(r.psi_term for r in rows.values())
        assert total > 0.25  # "shifted" by the rule of thumb

    def test_empty_side_yields_null_terms(self, spark):
        ref = self._vals(spark, [0.5])
        cur = self._vals(spark, [])
        out = psi_report(ref, cur).collect()
        assert all(r.p_cur is None and r.psi_term is None for r in out)

    def test_out_of_range_clamps_to_edge_bins(self, spark):
        ref = self._vals(spark, [-0.5, 1.5])
        rows = {r.bin: r.n_ref for r in psi_report(ref, ref).collect()}
        assert rows[0] == 1 and rows[9] == 1


class TestStopwordLangScorer:
    def test_score_and_label(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "the cat sat on the mat", "en"),
                (2, "chat noir dort", "fr"),
                (3, "x", None),
            ],
            "doc_id long, text string, lang string",
        )
        got = {r.doc_id: r for r in stopword_lang_scored(docs).collect()}
        assert set(got) == {1, 2}  # NULL lang dropped
        # "the", "on", "the" -> 3 of 6 tokens
        assert got[1].score == pytest.approx(0.5) and got[1].label
        assert got[2].score == 0.0 and not got[2].label

    def test_plan_is_one_aggregate_no_cartesian(self, spark):
        docs = spark.createDataFrame(
            [(1, "the cat", "en")], "doc_id long, text string, lang string"
        )
        plan = (
            roc_auc(stopword_lang_scored(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan


class TestNullTextOracleParity:
    """NULL-text documents yield NULL scores; Spark's evaluators skip
    them (roc_auc counts n_skipped). The DuckDB oracles must do the
    same — the driver fixtures have no NULL text, so this fixture
    plants some and replays the full oracle gate over the score
    family (the r08 ADVICE gap)."""

    NAMES = [
        "score_auc",
        "score_ks",
        "score_lift",
        "score_auc_by_source",
        "score_calibration",
        "score_pr_curve",
        "score_psi_shards",
    ]

    @pytest.fixture(scope="class")
    def null_sf_dir(self, tmp_path_factory):
        import duckdb

        d = tmp_path_factory.mktemp("nulltext_sf")
        con = duckdb.connect()
        con.execute(
            """
            COPY (
              SELECT * FROM read_parquet(
                '/root/testdata/sf0.001/documents.parquet')
              UNION ALL
              SELECT * FROM (VALUES
                (900001, NULL, 'en', 'null-src', 0),
                (900002, NULL, 'fr', 'web', 0),
                (900003, NULL, 'en', 'web', 0),
                (900004, '', 'en', 'null-src', 0)
              ) v(doc_id, text, lang, source, n_chars)
            ) TO '%s' (FORMAT PARQUET)
            """
            % (d / "documents.parquet")
        )
        con.close()
        return str(d)

    @pytest.mark.parametrize("name", NAMES)
    def test_matches_oracle_with_null_text(self, spark, null_sf_dir, name):
        import duckdb
        import math

        import __spark_entry__ as entry_mod

        sdf = entry_mod.queries()[name](spark, null_sf_dir)
        s_cols = sdf.columns

        def norm(v):
            if isinstance(v, float):
                return "NaN" if math.isnan(v) else (0.0 if v == 0.0 else v)
            return v

        order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        s_rows = sorted(
            (tuple(norm(r[i]) for i in order) for r in sdf.collect()),
            key=repr,
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet('%s')"
            % (null_sf_dir + "/documents.parquet")
        )
        rel = con.sql(entry_mod.oracle_sql()[name])
        d_cols = rel.columns
        assert sorted(s_cols) == sorted(d_cols), name
        dorder = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
        d_rows = sorted(
            (tuple(norm(v) for v in (r[i] for i in dorder))
             for r in rel.fetchall()),
            key=repr,
        )
        con.close()
        assert s_rows == d_rows, f"{name}: value mismatch under NULL text"

    def test_skipped_mass_is_nonzero(self, spark, null_sf_dir):
        import __spark_entry__ as entry_mod

        row = entry_mod.queries()["score_auc"](spark, null_sf_dir).collect()[0]
        assert row["n_skipped"] >= 3  # the planted NULL-text docs
