"""Round-14 operator tests: the r13 ADVICE fixes first (sparse weight
table rejection, cross-miner independent id spaces), then the round's
new operators as they land."""

import pytest
from pyspark.sql import functions as F

from seriesly_spark.operators.dedup import minhash_lsh_pairs_cross
from seriesly_spark.operators.quality import (
    score_quality_lr,
    train_quality_lr,
)
from seriesly_spark.operators.suffix import suffix_dup_stats


class TestSuffixRoundsAuto:
    def test_fixed_rounds_saturate_at_cap(self, spark):
        """A duplicated span longer than 2^rounds - 1 reports the cap
        (the documented saturation), not the true length."""
        span = " ".join(f"t{i}" for i in range(10))  # 10 tokens > cap 7
        docs = spark.createDataFrame(
            [(1, span), (2, span + " unique tail here")],
            "doc_id long, text string",
        )
        rows = {
            r.doc_id: r.max_dup_len
            for r in suffix_dup_stats(docs, rounds=3).collect()
        }
        assert rows == {1: 7, 2: 7}  # cap 2^3 - 1 binds on a 10-dup

    def test_auto_derives_exact_cap(self, spark):
        """rounds='auto' sizes the cap from max(doc tokens): the same
        >cap-127-style corpus is exact, and a short corpus is too."""
        span = " ".join(f"t{i}" for i in range(10))
        docs = spark.createDataFrame(
            [(1, span), (2, span + " unique tail here")],
            "doc_id long, text string",
        )
        rows = {
            r.doc_id: r.max_dup_len
            for r in suffix_dup_stats(docs, rounds="auto").collect()
        }
        assert rows == {1: 10, 2: 10}

    def test_auto_on_long_duplicated_doc(self, spark):
        """The verdict's exact ask: a >127-token duplicated doc. auto
        must report the true length where the default-7 cap saturates
        at 127."""
        span = " ".join(f"w{i}" for i in range(150))
        docs = spark.createDataFrame(
            [(1, span), (2, span)], "doc_id long, text string"
        )
        fixed = {
            r.doc_id: r.max_dup_len
            for r in suffix_dup_stats(docs, rounds=7).collect()
        }
        auto = {
            r.doc_id: r.max_dup_len
            for r in suffix_dup_stats(docs, rounds="auto").collect()
        }
        assert fixed == {1: 127, 2: 127}
        assert auto == {1: 150, 2: 150}

    def test_auto_all_null_text(self, spark):
        docs = spark.createDataFrame(
            [(1, None)], "doc_id long, text string"
        )
        rows = suffix_dup_stats(docs, rounds="auto").collect()
        assert [(r.doc_id, r.n_tokens, r.max_dup_len) for r in rows] == [
            (1, 0, 0)
        ]

    def test_bad_rounds_type(self, spark):
        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="int or"):
            suffix_dup_stats(docs, rounds="fast")


class TestScoreQualityLrDensity:
    def test_sparse_weight_table_raises(self, spark):
        """A weight table with zero-weight rows pruned (a natural
        sparse-storage step) must raise, not silently shrink the
        derived hash width and misalign every feature."""
        docs = spark.createDataFrame(
            [(1, "the cat sat", 1.0), (2, "le chat noir", 0.0)],
            "doc_id long, text string, label double",
        )
        w = train_quality_lr(docs, buckets=16, rounds=1)
        sparse = w.where(F.col("weight") != 0.0)
        assert sparse.count() < w.count()  # pruning really drops rows
        with pytest.raises(ValueError, match="not dense"):
            score_quality_lr(docs, sparse).collect()

    def test_dense_table_still_scores(self, spark):
        docs = spark.createDataFrame(
            [(1, "the cat sat", 1.0), (2, "le chat noir", 0.0)],
            "doc_id long, text string, label double",
        )
        w = train_quality_lr(docs, buckets=16, rounds=1)
        out = score_quality_lr(docs, w).collect()
        assert len(out) == 2 and all(r.score is not None for r in out)


class TestDedupSpansExactKeep1:
    def test_twins_keep_exactly_one_full_copy(self, spark):
        """The r13 verdict's missing capability: the earliest carrier
        keeps its span intact, every later occurrence is excised —
        where remove-all strips both."""
        from seriesly_spark.operators.dedup import dedup_spans_exact_keep1
        from seriesly_spark.operators.suffix import dedup_spans_exact

        span = "a b c d e f g h i j"
        docs = spark.createDataFrame(
            [
                (1, f"u1 u2 {span} u3"),
                (2, f"v1 {span} v2 v3"),
                (3, "w1 w2 w3 w4 w5 w6 w7 w8"),
            ],
            "doc_id long, text string",
        )
        keep1 = {
            r.doc_id: r
            for r in dedup_spans_exact_keep1(docs, min_len=8).collect()
        }
        assert keep1[1].text_clean == f"u1 u2 {span} u3"  # first carrier
        assert keep1[2].text_clean == "v1 v2 v3"
        assert keep1[3].n_removed == 0
        removeall = {
            r.doc_id: r for r in dedup_spans_exact(docs, min_len=8).collect()
        }
        assert removeall[1].text_clean == "u1 u2 u3"  # both copies gone
        assert removeall[2].text_clean == "v1 v2 v3"

    def test_within_doc_repeat_keeps_first(self, spark):
        from seriesly_spark.operators.dedup import dedup_spans_exact_keep1

        span = "p q r s"
        docs = spark.createDataFrame(
            [(1, f"{span} mid1 mid2 {span}")], "doc_id long, text string"
        )
        out = dedup_spans_exact_keep1(docs, min_len=4).collect()[0]
        assert out.text_clean == f"{span} mid1 mid2"

    def test_removal_is_subset_of_remove_all(self, spark):
        from seriesly_spark.operators.dedup import dedup_spans_exact_keep1
        from seriesly_spark.operators.suffix import dedup_spans_exact

        rows = [
            (i, " ".join("t%d" % ((i * 5 + j * 2) % 17)
                         for j in range(6 + i % 7)))
            for i in range(25)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        k1 = {
            r.doc_id: r.n_removed
            for r in dedup_spans_exact_keep1(docs, min_len=4).collect()
        }
        ra = {
            r.doc_id: r.n_removed
            for r in dedup_spans_exact(docs, min_len=4).collect()
        }
        assert all(k1[d] <= ra[d] for d in k1)
        assert sum(k1.values()) < sum(ra.values())  # exemption is real

    def test_matches_brute_force(self, spark):
        """Keep-one coverage semantics vs an O(n^4) python check:
        token (d, j) removed iff covered by a min_len-window whose
        content occurs at a strictly earlier (doc, pos)."""
        from seriesly_spark.operators.dedup import dedup_spans_exact_keep1

        rows = [
            (i, " ".join("t%d" % ((i * 5 + j * 2) % 17)
                         for j in range(6 + i % 7)))
            for i in range(25)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        L = 4
        got = {
            r.doc_id: r.n_removed
            for r in dedup_spans_exact_keep1(docs, min_len=L).collect()
        }
        toks = {i: t.split() for i, t in rows}

        def stale(d, s):
            sub = toks[d][s:s + L]
            for d2, t2 in toks.items():
                for s2 in range(len(t2) - L + 1):
                    if (d2, s2) < (d, s) and t2[s2:s2 + L] == sub:
                        return True
            return False

        def removed(d, j):
            t = toks[d]
            lo, hi = max(0, j - L + 1), min(j, len(t) - L)
            return any(stale(d, s) for s in range(lo, hi + 1))

        want = {d: sum(1 for j in range(len(t)) if removed(d, j))
                for d, t in toks.items()}
        assert got == want

    def test_periodic_text_edge(self, spark):
        """Internally repetitive span: each distinct window class
        keeps its earliest occurrence (documented granularity)."""
        from seriesly_spark.operators.dedup import dedup_spans_exact_keep1

        docs = spark.createDataFrame(
            [(1, "x y x y x y x y")], "doc_id long, text string"
        )
        out = dedup_spans_exact_keep1(docs, min_len=2).collect()[0]
        # windows: 'x y'@0 keeper, 'y x'@1 keeper; stale starts 2..6
        # cover tokens [2, 8) -> first unit survives
        assert out.text_clean == "x y"

    def test_null_and_short_docs(self, spark):
        from seriesly_spark.operators.dedup import dedup_spans_exact_keep1

        docs = spark.createDataFrame(
            [(1, None), (2, "a b")], "doc_id long, text string"
        )
        out = {
            r.doc_id: r
            for r in dedup_spans_exact_keep1(docs, min_len=8).collect()
        }
        assert out[1].text_clean == "" and out[2].n_removed == 0

    def test_min_len_guard(self, spark):
        from seriesly_spark.operators.dedup import dedup_spans_exact_keep1

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="min_len"):
            dedup_spans_exact_keep1(docs, min_len=0)


class TestLangLr:
    def test_learns_separable_vocab(self, spark):
        """Two languages with disjoint vocabularies: 3 GD rounds must
        classify every doc correctly — the separable-toy gate the
        binary trainer also passes."""
        from seriesly_spark.operators.quality import (
            score_lang_lr,
            train_lang_lr,
        )

        rows = [(i, "aa bb cc dd ee", "xx") for i in range(10)] + [
            (i + 10, "pp qq rr ss tt", "yy") for i in range(10)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        )
        w = train_lang_lr(docs, buckets=32, rounds=3, lr=4.0)
        pred = {
            r.doc_id: r.lang_pred
            for r in score_lang_lr(docs, w).collect()
        }
        want = {i: ("xx" if i < 10 else "yy") for i in range(20)}
        assert pred == want

    def test_weight_table_shape_dense(self, spark):
        from seriesly_spark.operators.quality import train_lang_lr

        docs = spark.createDataFrame(
            [(1, "a b c", "en"), (2, "d e f", "fr")],
            "doc_id long, text string, lang string",
        )
        w = train_lang_lr(docs, buckets=8, rounds=1).collect()
        assert len(w) == 2 * 9  # 2 classes x (8 buckets + bias)
        assert {r.lang for r in w} == {"en", "fr"}
        assert sorted({r.bucket for r in w}) == list(range(-1, 8))

    def test_null_text_predicts_null_and_null_label_excluded(self, spark):
        from seriesly_spark.operators.quality import (
            score_lang_lr,
            train_lang_lr,
        )

        docs = spark.createDataFrame(
            [
                (1, "aa bb cc", "xx"),
                (2, "pp qq rr", "yy"),
                (3, None, "xx"),  # no features -> NULL pred
                (4, "aa bb cc", None),  # no supervision -> excluded
            ],
            "doc_id long, text string, lang string",
        )
        w = train_lang_lr(docs, buckets=16, rounds=2, lr=4.0)
        assert {r.lang for r in w.collect()} == {"xx", "yy"}  # no NULL class
        pred = {
            r.doc_id: r.lang_pred
            for r in score_lang_lr(docs, w).collect()
        }
        assert pred[3] is None
        assert pred[1] == "xx" and pred[4] == "xx"

    def test_sparse_weight_table_raises(self, spark):
        from seriesly_spark.operators.quality import (
            score_lang_lr,
            train_lang_lr,
        )

        docs = spark.createDataFrame(
            [(1, "a b", "en"), (2, "c d", "fr")],
            "doc_id long, text string, lang string",
        )
        w = train_lang_lr(docs, buckets=8, rounds=1)
        sparse = w.where(F.col("weight") != 0.0)
        with pytest.raises(ValueError, match="not dense"):
            score_lang_lr(docs, sparse).collect()

    def test_empty_weight_table_raises(self, spark):
        from seriesly_spark.operators.quality import score_lang_lr

        docs = spark.createDataFrame(
            [(1, "a b")], "doc_id long, text string"
        )
        empty = spark.createDataFrame(
            [], "lang string, bucket int, weight double"
        )
        with pytest.raises(ValueError, match="empty"):
            score_lang_lr(docs, empty).collect()

    def test_all_null_labels_returns_empty_model(self, spark):
        from seriesly_spark.operators.quality import train_lang_lr

        docs = spark.createDataFrame(
            [(1, "a b", None)], "doc_id long, text string, lang string"
        )
        assert train_lang_lr(docs, buckets=8, rounds=2).count() == 0

    def test_rounds_guard(self, spark):
        from seriesly_spark.operators.quality import train_lang_lr

        docs = spark.createDataFrame(
            [(1, "a", "en")], "doc_id long, text string, lang string"
        )
        with pytest.raises(ValueError, match="rounds"):
            train_lang_lr(docs, rounds=0)


class TestUnigramLm:
    DOCS = [
        (1, "hello hello world"),
        (2, "hello word world"),
        (3, None),
    ]

    def test_model_shape_and_coverage(self, spark):
        from seriesly_spark.operators.unigram import unigram_train

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        m = unigram_train(
            docs, vocab_size=12, max_piece_len=3, rounds=2
        ).collect()
        pieces = {r.piece for r in m}
        # every corpus character survives (singles are never pruned)
        assert set("helowrd") <= pieces
        assert all(r.cnt >= 1 and r.logp < 0 for r in m)
        # probabilities normalize: counts over total
        tot = sum(r.cnt for r in m)
        import math

        for r in m:
            assert r.logp == round(math.log(r.cnt / tot), 6)

    def test_encode_reconstructs_text(self, spark):
        """The segmentation invariant: concatenating a doc's pieces
        (spaces dropped) reproduces its original characters."""
        from seriesly_spark.operators.unigram import (
            unigram_encode,
            unigram_train,
        )

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        m = unigram_train(docs, vocab_size=12, max_piece_len=3, rounds=2)
        enc = {
            r.doc_id: r for r in unigram_encode(docs, m, max_piece_len=3).collect()
        }
        for i, text in self.DOCS:
            want = "".join((text or "").split())
            assert enc[i].encoded.replace(" ", "") == want
            if text is None:
                assert enc[i].n_pieces == 0

    def test_em_merges_frequent_substrings(self, spark):
        """'hello' dominates the toy corpus: after EM its pieces are
        multi-char (the DP prefers fewer, higher-probability pieces),
        not 5 singles."""
        from seriesly_spark.operators.unigram import (
            unigram_encode,
            unigram_train,
        )

        docs = spark.createDataFrame(
            [(i, "hello hello hello") for i in range(5)],
            "doc_id long, text string",
        )
        m = unigram_train(docs, vocab_size=8, max_piece_len=3, rounds=2)
        enc = unigram_encode(docs, m, max_piece_len=3).collect()[0]
        assert enc.n_pieces < 15  # 3 words x < 5 pieces each

    def test_unknown_chars_pass_through(self, spark):
        from seriesly_spark.operators.unigram import (
            unigram_encode,
            unigram_train,
        )

        train = spark.createDataFrame(
            [(1, "aa bb aa")], "doc_id long, text string"
        )
        m = unigram_train(train, vocab_size=8, max_piece_len=2, rounds=1)
        new = spark.createDataFrame(
            [(9, "aa zz")], "doc_id long, text string"
        )
        enc = unigram_encode(new, m, max_piece_len=2).collect()[0]
        assert enc.encoded.replace(" ", "") == "aazz"

    def test_guards(self, spark):
        from seriesly_spark.operators.unigram import (
            unigram_encode,
            unigram_train,
        )

        docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="rounds"):
            unigram_train(docs, rounds=0)
        with pytest.raises(ValueError, match="max_piece_len"):
            unigram_train(docs, max_piece_len=0)
        empty = spark.createDataFrame(
            [], "piece string, cnt bigint, logp double"
        )
        with pytest.raises(ValueError, match="empty"):
            unigram_encode(docs, empty)

    def test_all_null_corpus_empty_model(self, spark):
        from seriesly_spark.operators.unigram import unigram_train

        docs = spark.createDataFrame(
            [(1, None)], "doc_id long, text string"
        )
        assert unigram_train(docs).count() == 0

    def test_stats_masses_consistent(self, spark):
        """bpe_stats symmetry: pieces_before = corpus chars,
        pieces_after matches the encode piece total, ratios are the
        two divisions."""
        from seriesly_spark.operators.unigram import (
            unigram_encode,
            unigram_stats,
            unigram_train,
        )

        docs = spark.createDataFrame(
            self.DOCS, "doc_id long, text string"
        )
        st = unigram_stats(
            docs, vocab_size=12, max_piece_len=3, rounds=2
        ).collect()[0]
        chars = sum(
            len(w) for _, t in self.DOCS if t for w in t.split()
        )
        assert st.pieces_before == chars
        m = unigram_train(docs, vocab_size=12, max_piece_len=3, rounds=2)
        total_pieces = sum(
            r.n_pieces
            for r in unigram_encode(docs, m, max_piece_len=3).collect()
        )
        assert st.pieces_after == total_pieces
        assert st.pieces_per_word == round(
            st.pieces_after / st.n_word_instances, 6
        )

    def test_impl_parity_pandas_vs_expr(self, spark):
        """The two Viterbi implementations are pinned bit-equal (the
        LSH impl convention) — including unknown single chars and the
        (score, len) tie-break."""
        from seriesly_spark.operators.unigram import _segment_words

        vocab = {
            "a": -1.2, "b": -2.345678, "ab": -1.9, "ba": -1.9,
            "abc": -3.5, "c": -4.0, "x": -0.5,
        }
        words = spark.createDataFrame(
            [("abcabz", 3), ("xxx", 1), ("ababab", 2), ("q", 1),
             ("abcba", 4), ("zzzz", 1)],
            "w string, freq long",
        )
        pd_rows = sorted(
            tuple(r)
            for r in _segment_words(words, vocab, 3, impl="pandas").collect()
        )
        ex_rows = sorted(
            tuple(r)
            for r in _segment_words(words, vocab, 3, impl="expr").collect()
        )
        assert pd_rows == ex_rows
        with pytest.raises(ValueError, match="impl"):
            _segment_words(words, vocab, 3, impl="numpy")

    def test_whitespace_only_text(self, spark):
        """'' splits to [''] — the empty pseudo-word must not enter
        the vocabulary or the encode stream (both engines guard it)."""
        from seriesly_spark.operators.unigram import (
            unigram_encode,
            unigram_train,
        )

        docs = spark.createDataFrame(
            [(1, "aa bb"), (2, "   "), (3, "")],
            "doc_id long, text string",
        )
        m = unigram_train(docs, vocab_size=8, max_piece_len=2, rounds=1)
        assert "" not in {r.piece for r in m.collect()}
        out = sorted(
            tuple(r)
            for r in unigram_encode(docs, m, max_piece_len=2).collect()
        )
        assert out == [(1, 2, "aa bb"), (2, 0, ""), (3, 0, "")]


class TestDecontamIndex:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "totally unrelated text with fresh content here"),
                (3, "the quick brown fox appears again in training"),
                (4, "benchmark only sentence nothing shared at all"),
            ],
            "doc_id long, text string",
        )

    def test_probe_matches_one_shot_cross(self, spark, tmp_path):
        from seriesly_spark.operators.dedup import dedup_spans_cross
        from seriesly_spark.operators.dedup_index import DecontamIndex

        docs = self._docs(spark)
        bench = docs.where(F.col("doc_id") >= 3)
        corpus = docs.where(F.col("doc_id") < 3)
        idx = DecontamIndex(spark, str(tmp_path / "idx"), n=3)
        idx.add_benchmark(bench)
        got = sorted(
            tuple(r) for r in idx.probe_clean(corpus).collect()
        )
        want = sorted(
            tuple(r) for r in dedup_spans_cross(corpus, bench, n=3).collect()
        )
        assert got == want

    def test_incremental_adds_compose_and_grow_by_novelty(
        self, spark, tmp_path
    ):
        from seriesly_spark.operators.dedup_index import DecontamIndex

        docs = self._docs(spark)
        idx = DecontamIndex(spark, str(tmp_path / "idx"), n=3)
        a1 = idx.add_benchmark(docs.where(F.col("doc_id") == 3))
        size1 = idx.size()
        a2 = idx.add_benchmark(docs.where(F.col("doc_id") >= 3))  # overlap
        assert a1 == size1
        assert a2 < a1 + 7  # doc 3's grams did not re-append
        assert idx.size() == a1 + a2
        # composition: probe now sees BOTH benchmarks' grams — doc 1
        # shares "the quick brown fox" with benchmark doc 3, doc 2
        # shares nothing
        hit = idx.probe_clean(docs.where(F.col("doc_id") < 3)).collect()
        assert {r.doc_id: r.n_removed > 0 for r in hit} == {
            1: True,
            2: False,
        }

    def test_compact_preserves_probe_and_survives_crash(
        self, spark, tmp_path
    ):
        import os
        import shutil

        from seriesly_spark.operators.dedup_index import DecontamIndex

        docs = self._docs(spark)
        path = str(tmp_path / "idx")
        idx = DecontamIndex(spark, path, n=3)
        idx.add_benchmark(docs.where(F.col("doc_id") >= 3))
        before = sorted(
            tuple(r)
            for r in idx.probe_clean(
                docs.where(F.col("doc_id") < 3)
            ).collect()
        )
        st = idx.compact()
        assert st["files_after"] >= 1
        # stranded compact-tmp from a pretend crash: repaired on open
        shutil.copytree(
            os.path.join(path, "data"), os.path.join(path, "data.compact-tmp")
        )
        idx2 = DecontamIndex(spark, path, n=3)
        after = sorted(
            tuple(r)
            for r in idx2.probe_clean(
                docs.where(F.col("doc_id") < 3)
            ).collect()
        )
        assert before == after
        assert not os.path.isdir(os.path.join(path, "data.compact-tmp"))

    def test_n_is_pinned(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import DecontamIndex

        DecontamIndex(spark, str(tmp_path / "idx"), n=3)
        with pytest.raises(ValueError, match="n=3"):
            DecontamIndex(spark, str(tmp_path / "idx"), n=4)


class TestBpeBatch:
    def _docs(self, spark):
        """Hex-word corpus (the 2M-word stress shape scaled down):
        flat pair distribution, no heavy merge chains — the regime
        where batched selection is exactly sequential."""
        import hashlib

        words = [
            hashlib.md5(str(i).encode()).hexdigest()[:8]
            for i in range(400)
        ]
        return spark.createDataFrame(
            [(i, " ".join(words[i * 40:(i + 1) * 40])) for i in range(10)],
            "doc_id long, text string",
        )

    def test_batched_equals_sequential(self, spark):
        from seriesly_spark.operators.bpe import bpe_train, bpe_train_fast

        docs = self._docs(spark)
        seq = [tuple(r) for r in bpe_train(docs, merges=10).collect()]
        for batch in (1, 3, 4):
            got = [
                tuple(r)
                for r in bpe_train_fast(
                    docs, merges=10, batch=batch
                ).collect()
            ]
            assert got == seq, batch

    def test_overlap_rule_forces_sequential(self, spark):
        """'the'-style chain: (h, e) and (t, h) overlap, so the batch
        collapses to one merge and the created (t, he) pair is picked
        next — identical to sequential."""
        from seriesly_spark.operators.bpe import bpe_train, bpe_train_fast

        docs = spark.createDataFrame(
            [(i, "the the the") for i in range(3)],
            "doc_id long, text string",
        )
        seq = [tuple(r) for r in bpe_train(docs, merges=2).collect()]
        got = [
            tuple(r)
            for r in bpe_train_fast(docs, merges=2, batch=2).collect()
        ]
        assert got == seq
        assert [r[1] + r[2] for r in seq] == ["he", "the"]

    def test_documented_divergence_window_b(self, spark):
        """Window (b): a conflicting pair skipped in-batch whose
        occurrences only PARTIALLY overlap the batch-mate's fusion —
        (b, c) survives with count 70 after (a, b) fuses, which
        sequential training merges next, while the batch picked
        (z, b) instead."""
        from seriesly_spark.operators.bpe import bpe_train, bpe_train_fast

        text = " ".join(
            ["abc"] * 30 + ["ab"] * 80 + ["zbc"] * 70 + ["de"] * 60
        )
        docs = spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        )
        seq = [(r.lhs, r.rhs) for r in bpe_train(docs, merges=2).collect()]
        bat = [
            (r.lhs, r.rhs)
            for r in bpe_train_fast(docs, merges=2, batch=2).collect()
        ]
        assert seq == [("a", "b"), ("b", "c")]
        assert bat == [("a", "b"), ("z", "b")]

    def test_batch_guard(self, spark):
        from seriesly_spark.operators.bpe import (
            bpe_train_batch,
            bpe_train_fast,
        )

        docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
        with pytest.raises(ValueError, match="batch"):
            bpe_train_fast(docs, merges=1, batch=0)
        with pytest.raises(ValueError, match="batch"):
            bpe_train_batch(docs, merges=1, batch=0)

    def test_documented_divergence_window(self, spark):
        """The ONE case batching admits (and the docstring documents):
        a pair CREATED by an in-batch fusion — (x, ab) here — outranks
        the batch's second pick under sequential training. Pinned so
        the contract stays honest; the driver oracle gate would fail
        loudly if the registry corpus ever hit this shape."""
        from seriesly_spark.operators.bpe import bpe_train, bpe_train_fast

        text = " ".join(["ab"] * 100 + ["xab"] * 90 + ["cd"] * 60)
        docs = spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        )
        seq = [(r.lhs, r.rhs) for r in bpe_train(docs, merges=2).collect()]
        bat = [
            (r.lhs, r.rhs)
            for r in bpe_train_fast(docs, merges=2, batch=2).collect()
        ]
        assert seq == [("a", "b"), ("x", "ab")]
        assert bat == [("a", "b"), ("c", "d")]  # the documented window


class TestStreamingDecontam:
    def test_verdicts_across_micro_batches(self, spark, tmp_path):
        """Two chunk files = two micro-batches; contaminated, clean,
        and gram-less docs all report correctly after the drain."""
        from seriesly_spark.operators.dedup_index import DecontamIndex
        from seriesly_spark.streaming.ingest import streaming_decontam

        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps")],
            "doc_id long, text string",
        )
        idx = DecontamIndex(spark, str(tmp_path / "idx"), n=3)
        idx.add_benchmark(bench)
        sdir = str(tmp_path / "stream")
        spark.createDataFrame(
            [(1, "intro the quick brown fox outro")],
            "doc_id long, text string",
        ).write.parquet(sdir)
        spark.createDataFrame(
            [(2, "completely clean other words here"), (3, "too short")],
            "doc_id long, text string",
        ).write.mode("append").parquet(sdir)
        out = {
            r.doc_id: r
            for r in streaming_decontam(
                spark, sdir, idx._index_df(), n=3,
                query_name="t_sdecontam",
            ).collect()
        }
        # windows of doc 1: (intro,the,quick) (the,quick,brown)
        # (quick,brown,fox) (brown,fox,outro) — the middle two appear
        # in the benchmark
        assert out[1].n_grams == 4 and out[1].n_hits == 2
        assert out[1].contaminated and out[1].gram_containment == 0.5
        assert out[2].n_hits == 0 and not out[2].contaminated
        assert out[3].n_grams == 0 and out[3].gram_containment is None


class TestCrossMinerIdSpaces:
    DOCS = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "one two three four five six seven"),
    ]

    def test_shared_space_suppresses_self_pair(self, spark):
        corpus = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        probe = spark.createDataFrame(
            [self.DOCS[0]], "doc_id long, text string"
        )
        pairs = minhash_lsh_pairs_cross(corpus, probe, n=2).collect()
        assert pairs == []  # same id = same doc: never reports itself

    def test_independent_spaces_keep_colliding_true_pair(self, spark):
        """Two 0-based id spaces: probe doc 0 IS corpus doc 0's text
        but a different document. shared_id_space=False must surface
        the pair the default silently suppressed."""
        corpus = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        probe = spark.createDataFrame(
            [(0, self.DOCS[0][1])], "doc_id long, text string"
        )
        pairs = minhash_lsh_pairs_cross(
            corpus, probe, n=2, shared_id_space=False
        ).collect()
        assert (0, 0) in {(r.corpus_id, r.probe_id) for r in pairs}
