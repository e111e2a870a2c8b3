"""Round-10b operators: Fleiss' kappa (multi-rater agreement),
operating-point selection (best F1 / Youden-J threshold), expected
calibration error, and the simplified-silhouette clustering gate.

Each is pinned against a hand-computed worked example (Fleiss gets the
classic constant-r algebra checked by hand; silhouette gets orthogonal
2-D clusters where the scores are exact), plus the degenerate edges the
operators promise: ragged-panel exclusion, single-class inputs, tied
argmaxes resolving to the smallest key.
"""

import pytest
from pyspark.sql import functions as F

from seriesly_spark.operators.clustering import silhouette_report
from seriesly_spark.operators.evaluation import (
    best_threshold,
    expected_calibration_error,
    fleiss_kappa,
)


class TestFleissKappa:
    def _long(self, spark, items):
        """items: dict item -> list of categories (None = missing)."""
        rows = [
            (i, c) for i, cats in items.items() for c in cats
        ]
        return spark.createDataFrame(rows, "item long, cat string")

    def test_hand_computed(self, spark):
        # item 1: A,A,A  -> s2 = 9, P_1 = 1
        # item 2: A,A,B  -> s2 = 5, P_2 = 1/3
        # item 3: A,B,NULL -> 2 ratings -> excluded whole
        # N = 2, S = 14, P_bar = (14 - 6) / 12 = 2/3
        # marginals over kept: A = 5, B = 1, T = 6
        # P_e = (25 + 1) / 36 = 13/18;  kappa = (2/3 - 13/18)/(5/18) = -0.2
        df = self._long(
            spark,
            {1: ["A", "A", "A"], 2: ["A", "A", "B"], 3: ["A", "B", None]},
        )
        r = fleiss_kappa(df, "item", "cat", raters=3).collect()[0]
        assert r.n_items == 2 and r.n_excluded == 1
        assert r.p_bar == pytest.approx(round(2 / 3, 6))
        assert r.p_e == pytest.approx(round(13 / 18, 6))
        assert r.kappa == pytest.approx(-0.2)

    def test_perfect_agreement_two_categories(self, spark):
        df = self._long(spark, {1: ["A", "A", "A"], 2: ["B", "B", "B"]})
        r = fleiss_kappa(df, "item", "cat", raters=3).collect()[0]
        assert r.p_bar == pytest.approx(1.0)
        assert r.p_e == pytest.approx(0.5)
        assert r.kappa == pytest.approx(1.0)

    def test_degenerate_single_category_is_null(self, spark):
        df = self._long(spark, {1: ["A", "A"], 2: ["A", "A"]})
        r = fleiss_kappa(df, "item", "cat", raters=2).collect()[0]
        assert r.p_e == pytest.approx(1.0)
        assert r.kappa is None

    def test_all_items_ragged_yields_nulls(self, spark):
        df = self._long(spark, {1: ["A", "B"], 2: ["A"]})
        r = fleiss_kappa(df, "item", "cat", raters=3).collect()[0]
        assert r.n_items == 0 and r.n_excluded == 2
        assert r.p_bar is None and r.kappa is None

    def test_raters_below_two_rejected(self, spark):
        df = self._long(spark, {1: ["A"]})
        with pytest.raises(ValueError):
            fleiss_kappa(df, "item", "cat", raters=1)


class TestBestThreshold:
    def _scored(self, spark, rows):
        return spark.createDataFrame(rows, "score double, label boolean")

    def test_hand_computed_sweep(self, spark):
        # desc sweep: t=.9 F1=2/3 J=.5 | t=.8 F1=.5 J=1/6
        #             t=.7 F1=.8 J=2/3 | t=.6 F1=2/3 J=1/3
        #             t=.5 F1=4/7 J=0
        df = self._scored(
            spark,
            [(0.9, True), (0.8, False), (0.7, True), (0.6, False),
             (0.5, False)],
        )
        out = {r.criterion: r for r in best_threshold(df).collect()}
        assert set(out) == {"f1", "youden"}
        assert out["f1"].threshold == pytest.approx(0.7)
        assert out["f1"].f1 == pytest.approx(0.8)
        assert out["f1"].tp == 2 and out["f1"].pp == 3
        assert out["f1"].precision == pytest.approx(round(2 / 3, 6))
        assert out["youden"].threshold == pytest.approx(0.7)
        assert out["youden"].youden == pytest.approx(round(2 / 3, 6))

    def test_tie_breaks_to_smallest_threshold(self, spark):
        # F1(t=.9) = 2*1/(2+1) = 2/3 and F1(t=.3) = 2*2/(2+4) = 2/3:
        # an exact round-6 tie -> the SMALLEST threshold must win.
        df = self._scored(
            spark,
            [(0.9, True), (0.7, False), (0.5, False), (0.3, True)],
        )
        out = {r.criterion: r for r in best_threshold(df).collect()}
        assert out["f1"].f1 == pytest.approx(round(2 / 3, 6))
        assert out["f1"].threshold == pytest.approx(0.3)

    def test_single_class_emits_f1_only(self, spark):
        df = self._scored(spark, [(0.9, True), (0.5, True)])
        rows = best_threshold(df).collect()
        assert [r.criterion for r in rows] == ["f1"]
        assert rows[0].f1 == pytest.approx(1.0)
        assert rows[0].youden is None

    def test_no_positives_emits_nothing(self, spark):
        df = self._scored(spark, [(0.9, False), (0.5, False)])
        assert best_threshold(df).collect() == []


class TestExpectedCalibrationError:
    def _scored(self, spark, rows):
        return spark.createDataFrame(rows, "score double, label boolean")

    def test_hand_computed_two_bins(self, spark):
        # n_bins=2: bin0 = {.2F, .4T}: mean .3, rate .5, gap .2
        #           bin1 = {.9T}:      mean .9, rate 1,  gap .1
        # ECE = (2*.2 + 1*.1)/3 = 1/6;  MCE = .2 at bin 0
        df = self._scored(spark, [(0.2, False), (0.4, True), (0.9, True)])
        r = expected_calibration_error(df, n_bins=2).collect()[0]
        assert r.n == 3 and r.n_bins_used == 2
        assert r.ece == pytest.approx(round(0.5 / 3, 6))
        assert r.mce == pytest.approx(0.2)
        assert r.worst_bin == 0

    def test_perfectly_calibrated(self, spark):
        # one bin at score .5 with half positives: gap = 0
        df = self._scored(spark, [(0.5, True), (0.5, False)])
        r = expected_calibration_error(df, n_bins=2).collect()[0]
        assert r.ece == pytest.approx(0.0)
        assert r.mce == pytest.approx(0.0)

    def test_worst_bin_tie_breaks_smallest(self, spark):
        # bin0: mean .25, rate 0 -> gap .25; bin1: mean .75, rate 1 ->
        # gap .25 — an exact tie, so the SMALLEST bin must win.
        df = self._scored(spark, [(0.25, False), (0.75, True)])
        r = expected_calibration_error(df, n_bins=2).collect()[0]
        assert r.mce == pytest.approx(0.25)
        assert r.worst_bin == 0

    def test_empty_input(self, spark):
        # NULL score/label rows are dropped by calibration_bins, so the
        # fold sees an empty bin table -> one all-NULL summary row.
        df = self._scored(spark, [(None, None)])
        r = expected_calibration_error(df, n_bins=2).collect()[0]
        assert r.n == 0 and r.n_bins_used == 0
        assert r.ece is None and r.mce is None and r.worst_bin is None


class TestSilhouetteReport:
    def _df(self, spark, rows, schema):
        return spark.createDataFrame(rows, schema)

    def test_orthogonal_clusters(self, spark):
        cents = self._df(
            spark,
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
            "centroid_id long, embedding array<double>",
        )
        vecs = self._df(
            spark,
            [
                (10, [1.0, 0.0]),   # c0 exactly: s = 1
                (11, [2.0, 0.0]),   # same direction: s = 1
                (12, [0.0, 3.0]),   # c1 exactly: s = 1
                (13, [1.0, 1.0]),   # equidistant: a = b -> s = 0, own = c0
            ],
            "vec_id long, embedding array<double>",
        )
        rows = {
            r.cluster: r
            for r in silhouette_report(vecs, cents).collect()
        }
        assert rows[0].n == 3
        assert rows[0].mean_sil == pytest.approx(round(2 / 3, 6))
        assert rows[1].n == 1
        assert rows[1].mean_sil == pytest.approx(1.0)
        assert rows[-1].n == 4
        assert rows[-1].mean_sil == pytest.approx(0.75)

    def test_tight_vs_smeared_cluster_ranks_lower(self, spark):
        cents = self._df(
            spark,
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
            "centroid_id long, embedding array<double>",
        )
        vecs = self._df(
            spark,
            [
                (1, [1.0, 0.05]),
                (2, [1.0, -0.05]),  # tight around c0
                (3, [0.6, 1.0]),
                (4, [1.0, 0.9]),    # smeared toward the boundary; own = c1/c0
            ],
            "vec_id long, embedding array<double>",
        )
        rows = {
            r.cluster: r
            for r in silhouette_report(vecs, cents).collect()
        }
        # tight cluster scores strictly higher than the global mean
        assert rows[0].mean_sil > rows[-1].mean_sil


class TestSimhashEval:
    def test_planted_clones_are_recalled(self, spark):
        # Two verbatim clones (hamming 0, jaccard 1) + unrelated docs:
        # the clone pair must be in truth AND candidates.
        rows = [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six seven"),
            (4, "red orange yellow green blue indigo"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from seriesly_spark.operators.dedup import simhash_eval

        r = simhash_eval(df).collect()[0]
        assert r.n_true >= 1 and r.n_hit >= 1
        assert r.recall == 1.0

    def test_empty_truth_gives_null_recall(self, spark):
        rows = [
            (1, "alpha beta gamma delta"),
            (2, "one two three four"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from seriesly_spark.operators.dedup import simhash_eval

        r = simhash_eval(df).collect()[0]
        assert r.n_true == 0 and r.recall is None


class TestKrippendorffAlpha:
    def _long(self, spark, items):
        rows = [(i, c) for i, cats in items.items() for c in cats]
        return spark.createDataFrame(rows, "item long, cat string")

    def test_hand_computed_with_unpairable(self, spark):
        # item 1: A,A (d=0) | item 2: A,B (d=2) | item 3: B (unpairable)
        # U = 2/1 = 2; n = 4; D_o = .5
        # marginals A=3, B=1 -> E = 16 - 10 = 6; D_e = 6/12 = .5
        # alpha = 1 - 2*3/6 = 0
        from seriesly_spark.operators.evaluation import krippendorff_alpha

        df = self._long(spark, {1: ["A", "A"], 2: ["A", "B"], 3: ["B"]})
        r = krippendorff_alpha(df, "item", "cat").collect()[0]
        assert r.n_items == 2 and r.n_unpairable == 1 and r.n_ratings == 4
        assert r.d_o == pytest.approx(0.5)
        assert r.d_e == pytest.approx(0.5)
        assert r.alpha == pytest.approx(0.0)

    def test_mixed_panel_sizes(self, spark):
        # item 1: A,A,A (r=3, d=0) | item 2: A,B (r=2, d=2)
        # U = 0/2 + 2/1 = 2; n = 5; D_o = .4
        # marginals A=4, B=1 -> E = 25 - 17 = 8; D_e = 8/20 = .4
        # alpha = 1 - 2*4/8 = 0
        from seriesly_spark.operators.evaluation import krippendorff_alpha

        df = self._long(spark, {1: ["A", "A", "A"], 2: ["A", "B"]})
        r = krippendorff_alpha(df, "item", "cat").collect()[0]
        assert r.n_ratings == 5
        assert r.d_o == pytest.approx(0.4)
        assert r.alpha == pytest.approx(0.0)

    def test_perfect_agreement(self, spark):
        from seriesly_spark.operators.evaluation import krippendorff_alpha

        df = self._long(spark, {1: ["A", "A"], 2: ["B", "B"]})
        r = krippendorff_alpha(df, "item", "cat").collect()[0]
        assert r.d_o == pytest.approx(0.0)
        assert r.alpha == pytest.approx(1.0)

    def test_single_category_alpha_null(self, spark):
        from seriesly_spark.operators.evaluation import krippendorff_alpha

        df = self._long(spark, {1: ["A", "A"], 2: ["A", "A"]})
        r = krippendorff_alpha(df, "item", "cat").collect()[0]
        assert r.d_e == pytest.approx(0.0)
        assert r.alpha is None


class TestEmbeddingDispersion:
    def test_hand_computed(self, spark):
        # [1,0],[0,1],[1,1]: M2 = 4, S = (2,2), Q = 8
        # mean_norm2 = 4/3; trace = 4/3 - 8/9 = 4/9
        # pairs: 2 + 1 + 1 -> mean_sq_dist = 4/3
        from seriesly_spark.operators.similarity import embedding_dispersion

        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        r = embedding_dispersion(df).collect()[0]
        assert r.n == 3 and r.dim == 2
        assert r.mean_norm2 == pytest.approx(round(4 / 3, 6))
        assert r.trace_cov == pytest.approx(round(4 / 9, 6))
        assert r.mean_sq_dist == pytest.approx(round(4 / 3, 6))

    def test_identical_vectors_zero_dispersion(self, spark):
        from seriesly_spark.operators.similarity import embedding_dispersion

        df = spark.createDataFrame(
            [(i, [3.0, 4.0]) for i in range(5)],
            "vec_id long, embedding array<double>",
        )
        r = embedding_dispersion(df).collect()[0]
        assert r.mean_norm2 == pytest.approx(25.0)
        assert r.trace_cov == pytest.approx(0.0)
        assert r.mean_sq_dist == pytest.approx(0.0)

    def test_single_vector_null_pairwise(self, spark):
        from seriesly_spark.operators.similarity import embedding_dispersion

        df = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
        r = embedding_dispersion(df).collect()[0]
        assert r.n == 1 and r.mean_sq_dist is None


class TestBtStrength:
    def _matches(self, spark, triples):
        rows = []
        for w, l, n in triples:
            rows.extend([(w, l)] * n)
        return spark.createDataFrame(rows, "winner long, loser long")

    def test_two_player_mle(self, spark):
        # A beats B 3-1: BT MLE has p_A/p_B = 3; MM converges in one
        # round from uniform start (D = 4/2 = 2 for both).
        # Normalized to mean 1: (1.5, 0.5).
        from seriesly_spark.operators.evaluation import bt_strength

        out = {
            r.item: r
            for r in bt_strength(
                self._matches(spark, [(0, 1, 3), (1, 0, 1)]), iterations=3
            ).collect()
        }
        assert out[0].wins == 3 and out[0].games == 4
        assert out[1].wins == 1 and out[1].games == 4
        assert out[0].strength == pytest.approx(1.5)
        assert out[1].strength == pytest.approx(0.5)

    def test_zero_win_item_has_zero_strength(self, spark):
        from seriesly_spark.operators.evaluation import bt_strength

        out = {
            r.item: r
            for r in bt_strength(
                self._matches(spark, [(0, 1, 3), (1, 0, 1), (0, 2, 2)]),
                iterations=3,
            ).collect()
        }
        assert out[2].wins == 0 and out[2].games == 2
        assert out[2].strength == 0.0
        assert out[0].strength > out[1].strength > 0.0

    def test_planted_gradient_orders_items(self, spark):
        # round-robin where the higher index wins every game: strengths
        # must be strictly increasing in the index.
        from seriesly_spark.operators.evaluation import bt_strength

        triples = [
            (j, i, 2) for i in range(4) for j in range(4) if j > i
        ]
        rows = bt_strength(
            self._matches(spark, triples), iterations=3
        ).collect()
        assert [r.item for r in rows] == [3, 2, 1, 0]
        assert rows[-1].strength == 0.0  # item 0 never wins

    def test_self_and_null_rows_ignored(self, spark):
        from seriesly_spark.operators.evaluation import bt_strength

        df = spark.createDataFrame(
            [(0, 0), (0, None), (None, 1), (0, 1)],
            "winner long, loser long",
        )
        out = bt_strength(df, iterations=2).collect()
        assert {(r.item, r.wins, r.games) for r in out} == {
            (0, 1, 1), (1, 0, 1)
        }


class TestSilhouetteAssignmentConsistency:
    def test_cluster_sizes_match_ivf_assign(self, spark):
        # silhouette_report's own-cluster argmax must agree with
        # ivf_assign's (same round-6 cosine, same (sim, -cid) tie-break)
        # — the gate and the router must see the same partition of the
        # corpus or the quality numbers describe a different layout.
        from seriesly_spark.operators.clustering import silhouette_report
        from seriesly_spark.operators.similarity import ivf_assign

        vecs = spark.range(60).selectExpr(
            "id AS vec_id",
            "array(cast(1 + id % 7 as double), cast(id % 3 as double),"
            " cast((id * 13) % 5 as double)) AS embedding",
        )
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),
             (2, [0.0, 0.0, 1.0])],
            "centroid_id long, embedding array<double>",
        )
        sil = {
            r.cluster: r.n
            for r in silhouette_report(vecs, cents).collect()
            if r.cluster >= 0
        }
        asg = {
            r.centroid_id: r.n
            for r in ivf_assign(vecs, cents)
            .groupBy("centroid_id")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        assert sil == asg


def test_silhouette_rejects_single_centroid(spark):
    from seriesly_spark.operators.clustering import silhouette_report

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "centroid_id long, embedding array<double>"
    )
    import pytest as _pt

    with _pt.raises(ValueError, match=">= 2 centroids"):
        silhouette_report(vecs, cents)


class TestSimhashIndexManku:
    """The Manku (WWW'07) 20-table split: same verified MATCHES as the
    4x16 pigeonhole split (both are lossless for Hamming <= 3), finer
    candidate keys. The split is frozen with the index."""

    def _corpus(self, spark):
        base = "one two three four five six seven eight nine ten"
        a = spark.createDataFrame(
            [
                (1, base),
                (2, "totally different content in this one here"),
                (3, "the quick brown fox jumps over the lazy dog"),
            ],
            "doc_id long, text string",
        )
        b = spark.createDataFrame(
            [
                (10, base),  # verbatim replay: Hamming 0
                (11, "nothing like anything prior at all ok then"),
                (12, "the quick brown fox jumps over the lazy dog"),
            ],
            "doc_id long, text string",
        )
        return a, b

    def test_modes_agree_on_verified_matches(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import SimhashIndex

        a, b = self._corpus(spark)
        outs = {}
        for mode in ("pigeonhole4", "manku20"):
            idx = SimhashIndex(
                spark, str(tmp_path / mode), tables=mode
            )
            idx.update(a)
            outs[mode] = {
                r.id: (r.near_dup, r.n_dup_hits)
                for r in idx.update(b).collect()
            }
        assert outs["pigeonhole4"] == outs["manku20"]
        assert outs["manku20"][10] == (True, 1)
        assert outs["manku20"][11] == (False, 0)

    def test_manku_compact_preserves_matches(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import SimhashIndex

        a, b = self._corpus(spark)
        idx = SimhashIndex(spark, str(tmp_path / "m"), tables="manku20")
        idx.update(a)
        idx.compact()
        out = {r.id: r.near_dup for r in idx.update(b).collect()}
        assert out[10] and out[12] and not out[11]

    def test_table_split_is_frozen(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import SimhashIndex

        SimhashIndex(spark, str(tmp_path / "f"), tables="manku20")
        with pytest.raises(ValueError, match="rebuild at a fresh path"):
            SimhashIndex(spark, str(tmp_path / "f"), tables="pigeonhole4")
        # reopening with the SAME split is fine
        SimhashIndex(spark, str(tmp_path / "f"), tables="manku20")
        # legacy default reopens as pigeonhole4
        SimhashIndex(spark, str(tmp_path / "g"))
        SimhashIndex(spark, str(tmp_path / "g"), tables="pigeonhole4")

    def test_unknown_split_rejected(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import SimhashIndex

        with pytest.raises(ValueError, match="pigeonhole4"):
            SimhashIndex(spark, str(tmp_path / "x"), tables="manku6")


class TestBpeTrain:
    def test_textbook_merges(self, spark):
        from seriesly_spark.operators.bpe import bpe_train

        df = spark.createDataFrame(
            [(1, "low lower lowest low low"), (2, "new newer newest new")],
            "doc_id long, text string",
        )
        got = [tuple(r) for r in bpe_train(df, merges=4).collect()]
        # (l,o) x5 wins round 1; then (lo,w) x5; the (e,w)/(n,e) x4 tie
        # breaks lexicographically to (e,w); then (n,ew).
        assert got == [
            (1, "l", "o", 5),
            (2, "lo", "w", 5),
            (3, "e", "w", 4),
            (4, "n", "ew", 4),
        ]

    def test_greedy_nonoverlapping_fusion(self, spark):
        from seriesly_spark.operators.bpe import bpe_train

        # 'aaaa': round 1 learns (a,a) with count 3 (three adjacent
        # slots); round 2 sees [aa, aa] -> learns (aa,aa) with count 1.
        df = spark.createDataFrame(
            [(1, "aaaa")], "doc_id long, text string"
        )
        got = [tuple(r) for r in bpe_train(df, merges=2).collect()]
        assert got == [(1, "a", "a", 3), (2, "aa", "aa", 1)]

    def test_runs_out_of_pairs(self, spark):
        from seriesly_spark.operators.bpe import bpe_train

        df = spark.createDataFrame(
            [(1, "ab ab")], "doc_id long, text string"
        )
        got = [tuple(r) for r in bpe_train(df, merges=5).collect()]
        # one merge exhausts every multi-symbol word
        assert got == [(1, "a", "b", 2)]

    def test_max_word_len_guard(self, spark):
        from seriesly_spark.operators.bpe import bpe_train

        df = spark.createDataFrame(
            [(1, "zzzzzzzzzz ab ab")], "doc_id long, text string"
        )
        got = [tuple(r) for r in bpe_train(
            df, merges=1, max_word_len=5
        ).collect()]
        assert got == [(1, "a", "b", 2)]  # the z-blob never participates

    def test_merges_below_one_rejected(self, spark):
        from seriesly_spark.operators.bpe import bpe_train

        df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
        import pytest as _pt

        with _pt.raises(ValueError):
            bpe_train(df, merges=0)


class TestBpeStats:
    def test_hand_computed_compression(self, spark):
        from seriesly_spark.operators.bpe import bpe_stats

        # vocab: ab x3 (2 chars), abc x1 (3): before = 3*2 + 1*3 = 9
        # merge 1 = (a,b) x4 -> ab:[ab] (1 sym), abc:[ab,c] (2 syms)
        # after one more merge (ab,c) x1 -> abc:[abc]
        # merges=2: after = 3*1 + 1*1 = 4; instances = 4
        df = spark.createDataFrame(
            [(1, "ab ab ab abc")], "doc_id long, text string"
        )
        r = bpe_stats(df, merges=2).collect()[0]
        assert r.n_words == 2 and r.n_word_instances == 4
        assert r.symbols_before == 9 and r.symbols_after == 4
        assert r.tokens_per_word == pytest.approx(1.0)
        assert r.compression == pytest.approx(round(4 / 9, 6))

    def test_zero_merges_rejected(self, spark):
        from seriesly_spark.operators.bpe import bpe_stats

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        import pytest as _pt

        with _pt.raises(ValueError):
            bpe_stats(df, merges=0)
