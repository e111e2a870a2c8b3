"""Round-8b operators: merged duplicated-span coverage, corpus
snapshot diff, temperature mixture planning, multi-query exact ANN and
its LSH recall gate — each pinned against hand-computed values."""

import pytest
from pyspark.sql import functions as F

from seriesly_spark.operators.dedup import dup_span_stats
from seriesly_spark.operators.evaluation import snapshot_diff
from seriesly_spark.operators.sampling import mixture_plan
from seriesly_spark.operators.similarity import (
    ann_lsh_recall,
    ann_topk_cosine,
    ann_topk_multi,
)


class TestDupSpanStats:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_overlapping_windows_merge_into_one_span(self, spark):
        # docs 1 and 2 share the 5-token run "a b c d e": with n=3 the
        # three duplicated windows at positions 0,1,2 merge into ONE
        # span covering 5 tokens.
        docs = self._docs(
            spark,
            [
                (1, "a b c d e f g h i j"),
                (2, "x y a b c d e z w q"),
                (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
            ],
        )
        out = {
            r["doc_id"]: r.asDict()
            for r in dup_span_stats(docs, n=3).collect()
        }
        assert out[1] == {
            "doc_id": 1, "n_tokens": 10, "n_spans": 1,
            "dup_tokens": 5, "dup_token_ratio": 0.5,
        }
        assert out[2]["n_spans"] == 1 and out[2]["dup_tokens"] == 5
        assert out[3] == {
            "doc_id": 3, "n_tokens": 10, "n_spans": 0,
            "dup_tokens": 0, "dup_token_ratio": 0.0,
        }

    def test_disjoint_repeats_stay_separate_spans(self, spark):
        # "a b c" repeats at the start and the END of doc 1 (positions
        # 0 and 7, gap 7 > n=3) -> two spans of 3 tokens each.
        docs = self._docs(
            spark,
            [
                (1, "a b c m1 m2 m3 m4 a b c"),
                (2, "a b c z1 z2 z3 z4 z5 z6 z7"),
            ],
        )
        row = {
            r["doc_id"]: r.asDict()
            for r in dup_span_stats(docs, n=3).collect()
        }[1]
        assert row["n_spans"] == 2
        assert row["dup_tokens"] == 6
        assert row["dup_token_ratio"] == 0.6

    def test_near_gap_merges_when_intervals_touch(self, spark):
        # dup windows at positions 0 and 3 with n=3: intervals [0,2]
        # and [3,5] touch -> one merged span of 6 tokens (gap == n
        # merges; only gap > n splits).
        docs = self._docs(
            spark,
            [
                (1, "a b c d e f t1 t2"),
                (2, "a b c q1 q2 q3 q4 q5"),
                (3, "d e f r1 r2 r3 r4 r5"),
            ],
        )
        row = {
            r["doc_id"]: r.asDict()
            for r in dup_span_stats(docs, n=3).collect()
        }[1]
        assert row["n_spans"] == 1
        assert row["dup_tokens"] == 6

    def test_whole_doc_duplicate_covers_everything(self, spark):
        docs = self._docs(spark, [(1, "p q r s t"), (2, "p q r s t")])
        for r in dup_span_stats(docs, n=5).collect():
            assert r["dup_token_ratio"] == 1.0
            assert r["n_spans"] == 1

    def test_short_docs_emit_zero_rows_not_missing(self, spark):
        docs = self._docs(spark, [(1, "a b"), (2, "a b")])
        out = {r["doc_id"]: r.asDict() for r in
               dup_span_stats(docs, n=3).collect()}
        assert set(out) == {1, 2}
        assert all(v["n_spans"] == 0 for v in out.values())


class TestSnapshotDiff:
    def test_all_four_statuses(self, spark):
        ref = spark.createDataFrame(
            [(1, "same"), (2, "old"), (3, "gone")],
            "doc_id long, text string",
        )
        cur = spark.createDataFrame(
            [(1, "same"), (2, "new"), (4, "born")],
            "doc_id long, text string",
        )
        out = {r["status"]: r["n_docs"]
               for r in snapshot_diff(ref, cur).collect()}
        assert out == {
            "added": 1, "removed": 1, "changed": 1, "unchanged": 1,
        }

    def test_dense_status_grid_zero_fills(self, spark):
        ref = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        out = {r["status"]: r["n_docs"]
               for r in snapshot_diff(ref, ref).collect()}
        assert out == {
            "added": 0, "removed": 0, "changed": 0, "unchanged": 1,
        }

    def test_null_content_compares_as_empty(self, spark):
        ref = spark.createDataFrame(
            [(1, None), (2, None)], "doc_id long, text string"
        )
        cur = spark.createDataFrame(
            [(1, None), (2, "now set")], "doc_id long, text string"
        )
        out = {r["status"]: r["n_docs"]
               for r in snapshot_diff(ref, cur).collect()}
        assert out["unchanged"] == 1 and out["changed"] == 1

    def test_grouped_counts_prefer_current_side(self, spark):
        ref = spark.createDataFrame(
            [(1, "a", "web"), (2, "b", "web")],
            "doc_id long, text string, source string",
        )
        cur = spark.createDataFrame(
            [(1, "a", "books")],  # id 1 moved source; id 2 removed
            "doc_id long, text string, source string",
        )
        rows = snapshot_diff(ref, cur, group_col="source").collect()
        by = {(r["status"], r["source"]): r["n_docs"] for r in rows}
        # unchanged id 1 counted under its CURRENT source
        assert by[("unchanged", "books")] == 1
        # removed id 2 falls back to the ref source
        assert by[("removed", "web")] == 1
        # dense grid: every (status, seen-group) cell exists
        assert by[("added", "web")] == 0 and by[("changed", "books")] == 0


class TestMixturePlan:
    def test_sqrt_temperature_hand_computed(self, spark):
        # sources: a=400 tokens (4 docs), b=100 tokens (1 doc)
        # sqrt weights 20 / 10 -> w_a=2/3, w_b=1/3; budget 300 ->
        # planned 200 / 100; epochs 0.5 / 1.0
        rows = [("a", 100)] * 4 + [("b", 100)]
        df = spark.createDataFrame(rows, "source string, n_tok long")
        out = {
            r["source"]: r.asDict()
            for r in mixture_plan(
                df, "source", budget_tokens=300, size_col="n_tok"
            ).collect()
        }
        a, b = out["a"], out["b"]
        assert a["n_docs"] == 4 and a["n_tokens"] == 400
        assert a["raw_share"] == 0.8 and b["raw_share"] == 0.2
        assert a["weight"] == round(2 / 3, 6)
        assert b["weight"] == round(1 / 3, 6)
        assert a["planned_tokens"] == 200 and b["planned_tokens"] == 100
        assert a["epochs"] == 0.5 and b["epochs"] == 1.0

    def test_temperature_one_matches_raw_share(self, spark):
        df = spark.createDataFrame(
            [("a", 300), ("b", 100)], "source string, n_tok long"
        )
        out = {
            r["source"]: r.asDict()
            for r in mixture_plan(
                df, "source", budget_tokens=1000,
                size_col="n_tok", temperature=1.0,
            ).collect()
        }
        assert out["a"]["weight"] == out["a"]["raw_share"] == 0.75
        assert out["a"]["planned_tokens"] == 750

    def test_upweights_small_source(self, spark):
        df = spark.createDataFrame(
            [("big", 10000), ("small", 100)], "source string, n_tok long"
        )
        out = {
            r["source"]: r.asDict()
            for r in mixture_plan(
                df, "source", budget_tokens=10100, size_col="n_tok"
            ).collect()
        }
        assert out["small"]["weight"] > out["small"]["raw_share"]
        assert out["big"]["weight"] < out["big"]["raw_share"]
        # sqrt weights 100/10 -> small gets 1/11 of budget
        assert out["small"]["planned_tokens"] == round(10100 / 11)


class TestAnnMulti:
    @pytest.fixture()
    def emb(self, spark):
        return spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )

    def test_matches_single_query_operator_per_query(self, emb):
        multi = ann_topk_multi(emb, [0, 3], k=5)
        got0 = [
            (r["vec_id"], r["cos_sim"])
            for r in multi.where(F.col("query_id") == 0)
            .orderBy("rnk").collect()
        ]
        want0 = [
            (r["vec_id"], r["cos_sim"])
            for r in ann_topk_cosine(emb, query_id=0, k=5).collect()
        ]
        assert got0 == want0
        got3 = [
            (r["vec_id"], r["cos_sim"])
            for r in multi.where(F.col("query_id") == 3)
            .orderBy("rnk").collect()
        ]
        want3 = [
            (r["vec_id"], r["cos_sim"])
            for r in ann_topk_cosine(emb, query_id=3, k=5).collect()
        ]
        assert got3 == want3

    def test_excludes_self_and_ranks_dense(self, emb):
        out = ann_topk_multi(emb, [1, 2], k=4).collect()
        for r in out:
            assert r["vec_id"] != r["query_id"]
        ranks = sorted(
            r["rnk"] for r in out if r["query_id"] == 1
        )
        assert ranks == [1, 2, 3, 4]

    def test_recall_bounds_and_denominator(self, emb):
        rec = ann_lsh_recall(
            emb, [0, 1, 2, 3], k=5, planes=32, bands=4
        ).collect()
        assert [r["query_id"] for r in rec] == [0, 1, 2, 3]
        for r in rec:
            assert r["n_exact"] == 5
            assert 0 <= r["n_hit"] <= 5
            assert r["recall"] == round(r["n_hit"] / r["n_exact"], 6)

    def test_recall_is_one_when_buckets_capture_truth(self, spark):
        # Identical vectors share every band chunk, so LSH candidates
        # are exactly the duplicates and recall@1 must be 1.
        import math
        base = [1.0] + [0.0] * 63
        other = [0.0, 1.0] + [0.0] * 62
        rows = [(0, base), (1, base), (2, other)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        rec = {
            r["query_id"]: r["recall"]
            for r in ann_lsh_recall(
                df, [0], k=1, planes=16, bands=4
            ).collect()
        }
        assert rec[0] == 1.0


class TestAnnIvfRecall:
    """2-D corpus where the query's TRUE nearest neighbor lives in the
    OTHER cell: nprobe=1 must miss it (recall 0.5), nprobe=2 must find
    it (recall 1.0), and n_cand must count exactly the scanned cells'
    members."""

    CORPUS = [
        (0, [1.0, 0.0]),    # centroid 0
        (1, [0.0, 1.0]),    # centroid 1
        (2, [0.9, 0.45]),   # query; cell 0
        (3, [0.7, 0.72]),   # cell 1 — and the query's top-1 neighbor
        (4, [1.0, 0.05]),   # cell 0
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.CORPUS, "vec_id long, embedding array<float>"
        )

    def test_nprobe_1_misses_cross_cell_neighbor(self, spark):
        from seriesly_spark.operators.similarity import ann_ivf_recall

        row = ann_ivf_recall(
            self._df(spark), [2], n_centroids=2, k=2, nprobe=1
        ).collect()[0]
        # cell 0 = {0, 2, 4}; candidates exclude the query itself
        assert row["n_cand"] == 2
        assert row["n_exact"] == 2 and row["n_hit"] == 1
        assert row["recall"] == 0.5

    def test_nprobe_2_recovers_full_recall(self, spark):
        from seriesly_spark.operators.similarity import ann_ivf_recall

        row = ann_ivf_recall(
            self._df(spark), [2], n_centroids=2, k=2, nprobe=2
        ).collect()[0]
        assert row["n_cand"] == 4
        assert row["n_exact"] == 2 and row["n_hit"] == 2
        assert row["recall"] == 1.0


class TestIvfCellPurity:
    def test_hand_computed_with_empty_cell(self, spark):
        from seriesly_spark.operators.similarity import ivf_cell_purity

        # centroids: c0=[1,0], c1=[0,1], c2=[-1,0] (never argmax: every
        # vector has positive x or dominant y)
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, 0.0])],
            "centroid_id int, embedding array<float>",
        )
        # cell 0: labels 7,7,8 -> purity 2/3; cell 1: label 9 -> 1.0
        vecs = spark.createDataFrame(
            [
                (10, [1.0, 0.1], 7),
                (11, [0.9, 0.2], 7),
                (12, [1.0, 0.0], 8),
                (13, [0.1, 1.0], 9),
            ],
            "vec_id long, embedding array<float>, label int",
        )
        out = {
            r["centroid_id"]: r.asDict()
            for r in ivf_cell_purity(vecs, cents).collect()
        }
        assert out[0]["n_vectors"] == 3 and out[0]["n_labels"] == 2
        assert out[0]["top_label"] == 7 and out[0]["top_n"] == 2
        assert out[0]["purity"] == round(2 / 3, 6)
        assert out[1] == {
            "centroid_id": 1, "n_vectors": 1, "n_labels": 1,
            "top_label": 9, "top_n": 1, "purity": 1.0,
        }
        # empty cell keeps its row: n=0, NULL purity/top_label
        assert out[2]["n_vectors"] == 0 and out[2]["purity"] is None
        assert out[2]["top_label"] is None and out[2]["top_n"] == 0

    def test_majority_tie_breaks_on_smallest_label(self, spark):
        from seriesly_spark.operators.similarity import ivf_cell_purity

        cents = spark.createDataFrame(
            [(0, [1.0, 0.0])], "centroid_id int, embedding array<float>"
        )
        vecs = spark.createDataFrame(
            [
                (1, [1.0, 0.0], 5),
                (2, [1.0, 0.1], 3),
                (3, [0.9, 0.0], 5),
                (4, [0.9, 0.1], 3),
            ],
            "vec_id long, embedding array<float>, label int",
        )
        row = ivf_cell_purity(vecs, cents).collect()[0]
        assert row["top_label"] == 3 and row["top_n"] == 2
        assert row["purity"] == 0.5

    def test_string_labels_tie_break_naturally(self, spark):
        # The tie-break must use the label column's NATURAL ordering —
        # a numeric cast would NULL string labels out and degrade the
        # documented smallest-label rule to an arbitrary pick.
        from seriesly_spark.operators.similarity import ivf_cell_purity

        cents = spark.createDataFrame(
            [(0, [1.0, 0.0])], "centroid_id int, embedding array<float>"
        )
        vecs = spark.createDataFrame(
            [
                (1, [1.0, 0.0], "fr"),
                (2, [1.0, 0.1], "de"),
                (3, [0.9, 0.0], "fr"),
                (4, [0.9, 0.1], "de"),
                (5, [0.8, 0.1], "en"),
            ],
            "vec_id long, embedding array<float>, label string",
        )
        row = ivf_cell_purity(vecs, cents).collect()[0]
        assert row["top_label"] == "de" and row["top_n"] == 2
        assert row["n_labels"] == 3 and row["purity"] == 0.4
